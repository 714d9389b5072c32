"""Aux-subsystem tests: attention introspection, profiling, checkpoints, CLI."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_scene_text_recognition_tpu.core.config import (
    Config,
    ModelConfig,
    TrainConfig,
    apply_overrides,
)
from multimodal_scene_text_recognition_tpu.models.model import build_model

TINY = ModelConfig(
    enc_layers=1, dec_layers=1, ff_dim=64, hidden_dim=64, embed_dim=32,
    lstm_hidden=32, num_heads=4, compute_dtype="float32", dropout=0.0,
)


def make_batch(B=2):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.random((B, 32, 100, 1), dtype=np.float32)),
        "text": jnp.zeros((B, 27), jnp.int32),
        "overlap": jnp.zeros((B, 15), jnp.int32),
        "scene": jnp.zeros((B, 52), jnp.int32),
        "ious": jnp.full((B, 52), -1000.0),
    }


def init_vars(model, batch):
    rng = jax.random.PRNGKey(0)
    return model.init(
        {"params": rng, "dropout": rng},
        batch["image"], batch["text"][:, :-1], batch["overlap"],
        batch["scene"], batch["ious"], train=True,
    )


def test_attention_scores_collected():
    from multimodal_scene_text_recognition_tpu.eval.attention import (
        collect_attention_scores,
        format_scores,
    )

    cfg = ModelConfig(
        **{**TINY.__dict__, "pre_encoder_mlp": True, "pre_decoder_mlp": True}
    )
    model = build_model(cfg)
    batch = make_batch()
    variables = init_vars(model, batch)
    scores = collect_attention_scores(model, variables, batch)
    sites = sorted(scores)
    assert any("pre_encoder_scores" in s for s in sites)
    assert any("pre_decoder_scores" in s for s in sites)
    enc = [v for k, v in scores.items() if "pre_encoder_scores" in k][0]
    assert enc.shape == (2, 26, 15)  # cols x overlap objects
    np.testing.assert_allclose(enc.sum(-1), 1.0, atol=1e-5)  # softmax rows
    df = format_scores(enc)
    assert df.shape == (26, 15)


def test_config_overrides():
    cfg = Config()
    cfg = apply_overrides(
        cfg,
        ["model.encoder=lstm", "train.batch_size=96",
         "model.pre_encoder_mlp=true", "train.iteration_limit=100",
         "experiment=exp2"],
    )
    assert cfg.model.encoder == "lstm"
    assert cfg.train.batch_size == 96
    assert cfg.model.pre_encoder_mlp is True
    assert cfg.train.iteration_limit == 100
    assert cfg.experiment == "exp2"
    # originals untouched (frozen dataclasses)
    assert Config().model.encoder == "transformer"


def test_step_timer():
    from multimodal_scene_text_recognition_tpu.utils.profiling import StepTimer

    t = StepTimer(batch_size=8)
    t.tick()
    t.tick()
    t.tick()
    s = t.stats()
    assert "step_ms_p50" in s and s["crops_per_sec"] > 0


def test_orbax_checkpoint_roundtrip(tmp_path):
    from multimodal_scene_text_recognition_tpu.data.pipeline import device_batch
    from multimodal_scene_text_recognition_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from multimodal_scene_text_recognition_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )

    model = build_model(TINY)
    batch = make_batch()
    tx = make_optimizer(TrainConfig(batch_size=2))
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, jax.device_get(state))
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_params_bundle_roundtrip(tmp_path):
    """fp16 params bundle (git-committable serving weights): restore matches
    the source params to fp16 precision, preserves step + batch_stats, and
    greedy decode over the restored state is identical."""
    from multimodal_scene_text_recognition_tpu.train.checkpoint import (
        restore_params_bundle,
        save_params_bundle,
    )
    from multimodal_scene_text_recognition_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )

    model = build_model(TINY)
    batch = make_batch()
    tx = make_optimizer(TrainConfig(batch_size=2))
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    state = state.replace(step=123)
    path = str(tmp_path / "m.params.npz")
    save_params_bundle(path, state)

    template = create_train_state(model, tx, batch, jax.random.PRNGKey(7))
    restored = restore_params_bundle(path, template)
    assert int(restored.step) == 123
    for x, y in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        x, y = np.asarray(x, np.float32), np.asarray(y, np.float32)
        scale = max(float(np.max(np.abs(x))), 1e-8)
        assert float(np.max(np.abs(x - y))) / scale < 1e-3  # fp16 rounding
    for x, y in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(restored.batch_stats)):
        assert np.asarray(x).shape == np.asarray(y).shape

    def greedy(variables):
        logits = model.apply(variables, batch["image"], None,
                             batch["overlap"], batch["scene"], batch["ious"],
                             train=False)
        return np.asarray(jnp.argmax(logits, axis=-1))

    np.testing.assert_array_equal(greedy(state.variables()),
                                  greedy(restored.variables()))


def test_params_bundle_shape_mismatch_rejected(tmp_path):
    from multimodal_scene_text_recognition_tpu.train.checkpoint import (
        restore_params_bundle,
        save_params_bundle,
    )
    from multimodal_scene_text_recognition_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    import dataclasses

    model = build_model(TINY)
    batch = make_batch()
    tx = make_optimizer(TrainConfig(batch_size=2))
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    path = str(tmp_path / "m.params.npz")
    save_params_bundle(path, state)

    other = build_model(dataclasses.replace(TINY, ff_dim=96))
    template = create_train_state(other, tx, batch, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="shape"):
        restore_params_bundle(path, template)


def test_cli_validate_synthetic(tmp_path, capsys):
    from multimodal_scene_text_recognition_tpu.cli import main

    rc = main([
        "validate",
        "--dataset", "synthetic",
        "--set", "model.enc_layers=1", "--set", "model.dec_layers=1",
        "--set", "model.ff_dim=64", "--set", "model.hidden_dim=64",
        "--set", "model.embed_dim=32", "--set", "model.num_heads=4",
        "--set", "model.compute_dtype=float32",
        "--set", "train.batch_size=8",
        "--set", "data.synthetic_train_size=8",
        "--set", "data.synthetic_val_size=8",
        "--records", str(tmp_path / "records.csv"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "val accuracy" in out
    assert os.path.exists(tmp_path / "records.csv")


def test_error_diff_eval(tmp_path):
    from multimodal_scene_text_recognition_tpu.core.charset import AttnCodec
    from multimodal_scene_text_recognition_tpu.data.pipeline import Batcher, batches
    from multimodal_scene_text_recognition_tpu.data.synthetic import make_dataset
    from multimodal_scene_text_recognition_tpu.eval.evaluate import (
        error_diff_eval,
        load_class_labels,
        tags_for,
    )
    from multimodal_scene_text_recognition_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    from multimodal_scene_text_recognition_tpu.train.steps import make_eval_step
    from multimodal_scene_text_recognition_tpu.data.pipeline import device_batch

    model = build_model(TINY)
    codec = AttnCodec(TINY.chars, TINY.max_text_length)
    samples = make_dataset(8, seed=0, vocab_words=["ab", "cd"])
    batcher = Batcher(codec, 8)
    batch = device_batch(batcher.collate(samples))
    tx = make_optimizer(TrainConfig(batch_size=8))
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))

    # pretend the baseline got samples 1 and 3 wrong
    base_errors = {"1", "3"}
    out = error_diff_eval(
        make_eval_step(model), state.variables(),
        batches(samples, batcher, shuffle=False, drop_last=False),
        codec, base_errors,
    )
    assert out["total"] == 2
    assert 0 <= out["corrected"] <= 2
    assert len(out["detail"]) == 2

    labels = load_class_labels("assets/features", "coco")
    assert labels[0] == "background"
    assert tags_for([1, 0, 2], labels) == ["background", "person"]


def test_cli_recognize(tmp_path, capsys):
    from PIL import Image

    from multimodal_scene_text_recognition_tpu.cli import main

    for name in ["a.png", "b.png"]:
        Image.new("L", (100, 32), color=200).save(tmp_path / name)
    rc = main([
        "recognize", str(tmp_path),
        "--set", "model.enc_layers=1", "--set", "model.dec_layers=1",
        "--set", "model.ff_dim=64", "--set", "model.hidden_dim=64",
        "--set", "model.embed_dim=32", "--set", "model.num_heads=4",
        "--set", "model.compute_dtype=float32",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "a.png" in out and "b.png" in out


def test_image_utils(tmp_path):
    from multimodal_scene_text_recognition_tpu.utils.images import (
        array_to_image,
        save_image,
    )

    arr = np.linspace(0, 1, 32 * 100, dtype=np.float32).reshape(32, 100, 1)
    img = array_to_image(arr)
    assert img.dtype == np.uint8 and img.shape == (32, 100)
    # [-1, 1] normalised input
    img2 = array_to_image(arr * 2 - 1)
    np.testing.assert_allclose(img, img2, atol=1)
    save_image(arr, str(tmp_path / "x.png"))
    assert os.path.exists(tmp_path / "x.png")


def test_slope_ms_positive_and_guard(monkeypatch):
    """slope_ms must return the per-iteration slope for monotone timings and
    None (never a negative rate) when timings stay non-monotone after
    retries — the round-3 bench published a negative beam throughput from
    exactly that failure mode."""
    from multimodal_scene_text_recognition_tpu.utils import timing

    # deterministic clock: each f() "runs" k * 10ms + 5ms fixed dispatch
    class Clock:
        def __init__(self, ms_per_iter, fixed_ms=5.0):
            self.t = 0.0
            self.pending = None
            self.ms_per_iter = ms_per_iter
            self.fixed_ms = fixed_ms

        def perf_counter(self):
            return self.t

    clock = Clock(10.0)
    monkeypatch.setattr(timing.time, "perf_counter",
                        lambda: clock.perf_counter())

    def make_fn(k):
        def f():
            clock.t += (clock.fixed_ms + k * clock.ms_per_iter) / 1e3
            return np.zeros(())

        return f

    ms = timing.slope_ms(make_fn, 2, 6, reps=2)
    assert ms is not None
    np.testing.assert_allclose(ms, 10.0, rtol=1e-9)

    # adversarial clock: k=6 always reads *faster* than k=2 (tunnel jitter
    # dwarfing the body) — must return None, not a negative slope
    clock2 = Clock(10.0)
    monkeypatch.setattr(timing.time, "perf_counter",
                        lambda: clock2.perf_counter())

    def make_fn_bad(k):
        def f():
            clock2.t += (30.0 - 2.0 * k) / 1e3  # decreasing in k
            return np.zeros(())

        return f

    assert timing.slope_ms(make_fn_bad, 2, 6, reps=1, retries=2) is None
