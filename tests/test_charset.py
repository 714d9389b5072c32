"""Codec round-trips and reference-quirk checks (SURVEY.md §4 Unit)."""

import numpy as np
import pytest

from multimodal_scene_text_recognition_tpu.core.charset import (
    AttnCodec,
    CTCCodec,
    EOS_ID,
    GO_ID,
    PAD_ID,
    check_text,
)
from multimodal_scene_text_recognition_tpu.core.config import DEFAULT_CHARS


def make_codec():
    return AttnCodec(DEFAULT_CHARS, max_text_length=25)


def test_vocab_layout():
    c = make_codec()
    # reference utils.py:108-111: [GO]=0, [s]=1, [PAD]=2, then 94 printable
    assert c.num_classes == 97
    assert c.itos[0] == "[GO]" and c.itos[1] == "[s]" and c.itos[2] == "[PAD]"
    assert c.itos[3] == "0"  # string.printable starts with digits


def test_encode_layout():
    c = make_codec()
    toks, lengths = c.encode(["ab", ""])
    assert toks.shape == (2, 27)  # max_len + 2 (reference utils.py:131-133)
    assert toks[0, 0] == GO_ID
    assert toks[0, 1] == c.stoi["a"] and toks[0, 2] == c.stoi["b"]
    assert toks[0, 3] == EOS_ID
    assert (toks[0, 4:] == PAD_ID).all()
    # empty string: GO, EOS, PAD...
    assert toks[1, 1] == EOS_ID
    assert lengths.tolist() == [3, 1]  # len + 1 for [s] (reference utils.py:129)


def test_roundtrip():
    c = make_codec()
    texts = ["Hello", "a", "x1!@#", "Q" * 25]
    toks, _ = c.encode(texts)
    # decode model-output-style rows (strip the [GO] column)
    assert c.decode(toks[:, 1:]) == texts


def test_decode_prunes_at_eos():
    c = make_codec()
    row = np.array([[c.stoi["h"], c.stoi["i"], EOS_ID, c.stoi["z"], PAD_ID]])
    assert c.decode(row) == ["hi"]


def test_too_long_raises():
    c = make_codec()
    with pytest.raises(ValueError):
        c.encode(["a" * 26])


def test_check_text():
    # reference coco_dataset.py:264-272
    assert check_text("hello", DEFAULT_CHARS)
    assert not check_text("a" * 26, DEFAULT_CHARS)
    assert not check_text("café", DEFAULT_CHARS)


def test_ctc_codec_roundtrip():
    c = CTCCodec("abc")
    toks, lengths = c.encode(["abca"])
    assert toks[0, :4].tolist() == [1, 2, 3, 1]
    # collapse-repeats/blank semantics (reference utils.py:39-52)
    out = c.decode(np.array([[1, 1, 0, 2, 2, 3]]), [6])
    assert out == ["abc"]


def test_word_accuracy_variants():
    from multimodal_scene_text_recognition_tpu.core.metrics import (
        char_accuracy,
        word_accuracy,
    )

    assert word_accuracy(["ab", "CD"], ["ab", "cd"]) == 50.0
    assert word_accuracy(["ab", "CD"], ["ab", "cd"], case_sensitive=False) == 100.0
    assert char_accuracy(["abX", "ab"], ["abc", "ab"]) == round(
        (2 / 3 + 1.0) * 100 / 2, 5
    )
