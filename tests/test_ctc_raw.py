"""CTC loss parity vs torch + RawImageFolder dataset."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from multimodal_scene_text_recognition_tpu.core.charset import CTCCodec
from multimodal_scene_text_recognition_tpu.data.raw import RawImageFolder, natural_key
from multimodal_scene_text_recognition_tpu.train.steps import ctc_loss

RNG = np.random.default_rng(11)


def test_ctc_loss_matches_torch():
    B, T, C, L = 3, 12, 8, 4
    logits = RNG.standard_normal((B, T, C)).astype(np.float32)
    labels = RNG.integers(1, C, (B, L)).astype(np.int32)
    lengths = np.asarray([4, 2, 3], np.int32)
    labels_padded = labels.copy()
    for i, l in enumerate(lengths):
        labels_padded[i, l:] = 0

    ours = float(
        ctc_loss(jnp.asarray(logits), jnp.asarray(labels_padded),
                 jnp.asarray(lengths))
    )

    tl = torch.nn.functional.ctc_loss(
        torch.from_numpy(logits).log_softmax(-1).transpose(0, 1),  # [T, B, C]
        torch.from_numpy(labels_padded.astype(np.int64)),
        torch.full((B,), T, dtype=torch.long),
        torch.from_numpy(lengths.astype(np.int64)),
        blank=0,
        reduction="mean",
        zero_infinity=False,
    )
    # torch 'mean' divides each sample loss by its target length; optax
    # means the per-sample total losses, so compare against torch 'sum'/B
    tl_sum = torch.nn.functional.ctc_loss(
        torch.from_numpy(logits).log_softmax(-1).transpose(0, 1),
        torch.from_numpy(labels_padded.astype(np.int64)),
        torch.full((B,), T, dtype=torch.long),
        torch.from_numpy(lengths.astype(np.int64)),
        blank=0, reduction="sum",
    )
    np.testing.assert_allclose(ours, float(tl_sum) / B, rtol=1e-4)


def test_ctc_codec_with_loss_pipeline():
    codec = CTCCodec("abc")
    labels, lengths = codec.encode(["ab", "c"], max_len=5)
    logits = jnp.asarray(RNG.standard_normal((2, 10, codec.num_classes)),
                         jnp.float32)
    loss = ctc_loss(logits, jnp.asarray(labels), jnp.asarray(lengths))
    assert np.isfinite(float(loss))


def test_natural_key_ordering():
    names = ["img10.png", "img2.png", "img1.png"]
    assert sorted(names, key=natural_key) == ["img1.png", "img2.png", "img10.png"]


def test_raw_image_folder(tmp_path):
    from PIL import Image

    for name in ["b2.png", "b10.png", "a.jpg"]:
        Image.new("L", (60, 20), color=128).save(tmp_path / name)
    (tmp_path / "notes.txt").write_text("ignore me")
    ds = RawImageFolder(str(tmp_path))
    assert len(ds) == 3
    assert [s.label for s in ds] == ["a.jpg", "b2.png", "b10.png"]
    s = ds[0]
    assert s.image.shape == (32, 100, 1)
    np.testing.assert_allclose(s.image, 128 / 255.0, atol=1e-6)


def test_ctc_infeasible_rows_masked():
    """A label needing more frames than T (len + adjacent repeats > T) has
    no valid alignment; optax returns ~1e5 for it.  ctc_loss must exclude
    such rows from the mean instead of letting one row swamp the batch."""
    codec = CTCCodec("ab")
    T = 4
    # row 0 feasible ("ab" needs 2 frames); row 1 infeasible ("aabb" needs
    # 4 + 2 repeat-blanks = 6 > 4)
    labels, lengths = codec.encode(["ab", "aabb"], max_len=6)
    logits = jnp.asarray(RNG.standard_normal((2, T, codec.num_classes)),
                         jnp.float32)
    both = ctc_loss(logits, jnp.asarray(labels), jnp.asarray(lengths))
    only0 = ctc_loss(logits[:1], jnp.asarray(labels[:1]),
                     jnp.asarray(lengths[:1]))
    np.testing.assert_allclose(float(both), float(only0), rtol=1e-5)
    assert float(both) < 100.0
