"""Int8 PTQ backbone tests (models/resnet_int8.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.models.resnet import (
    ResNet31,
    to_column_sequence,
)
from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
    make_int8_eval_step,
    quantize_resnet,
    resnet31_int8_forward,
)

RNG = np.random.default_rng(11)


def test_int8_backbone_close_to_float():
    """Quantized backbone output stays close to the float32 backbone on the
    same weights (PTQ error small relative to feature scale)."""
    B = 4
    net = ResNet31(output_channels=128, layers=(1, 1, 1, 1),
                   dtype=jnp.float32)
    x = jnp.asarray(RNG.random((B, 32, 100, 1), dtype=np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, train=True)

    feats_f = net.apply(variables, x, train=False)

    wrapped = {
        "params": {"feature_extractor": variables["params"]},
        "batch_stats": {"feature_extractor": variables["batch_stats"]},
    }
    qsites = quantize_resnet(wrapped, x, output_channels=128,
                             layers=(1, 1, 1, 1))
    feats_q = resnet31_int8_forward(qsites, x, output_channels=128,
                                    layers=(1, 1, 1, 1))

    assert feats_q.shape == feats_f.shape
    f, q = np.asarray(feats_f), np.asarray(feats_q)
    rel = np.abs(f - q).mean() / (np.abs(f).mean() + 1e-9)
    assert rel < 0.08, rel
    # column features correlate strongly
    cf = np.asarray(to_column_sequence(feats_f)).ravel()
    cq = np.asarray(to_column_sequence(feats_q)).ravel()
    corr = np.corrcoef(cf, cq)[0, 1]
    assert corr > 0.99, corr


def test_int8_encoder_close_to_float():
    """encoder_int8 (PTQ int8 attention projections + FF matmuls,
    ops/int8.py) stays close to the float encoder on the same params."""
    from multimodal_scene_text_recognition_tpu.models.encoders import (
        TransformerEncoder,
    )

    kw = dict(d_model=64, embed_dim=32, num_heads=4, ff_dim=128,
              num_layers=2, dropout=0.0, max_len=26)
    enc_f = TransformerEncoder(**kw)
    enc_q = TransformerEncoder(**kw, int8=True)
    x = jnp.asarray(RNG.standard_normal((2, 26, 64)).astype(np.float32))
    variables = enc_f.init(
        {"params": jax.random.PRNGKey(0)}, x, None, train=False)
    f = np.asarray(enc_f.apply(variables, x, None, train=False))
    q = np.asarray(enc_q.apply(variables, x, None, train=False))
    assert q.shape == f.shape
    rel = np.abs(f - q).mean() / (np.abs(f).mean() + 1e-9)
    assert rel < 0.08, rel
    corr = np.corrcoef(f.ravel(), q.ravel())[0, 1]
    assert corr > 0.99, corr


def test_tps_int8_rectify_close_to_float():
    """Int8 loc-net rectification stays close to the float TPS warp on the
    same weights (the fiducial FC head and grid solve stay float)."""
    from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
        quantize_tps,
        tps_int8_rectify,
    )
    from multimodal_scene_text_recognition_tpu.models.transformation import (
        TPSTransform,
    )

    B = 4
    tps = TPSTransform(num_fiducial=20, out_h=32, out_w=100,
                       dtype=jnp.float32)
    x = jnp.asarray(RNG.random((B, 32, 100, 1), dtype=np.float32))
    variables = tps.init(jax.random.PRNGKey(0), x, train=True)
    rect_f = tps.apply(variables, x, train=False)

    wrapped = {
        "params": {"transformation": variables["params"]},
        "batch_stats": {"transformation": variables["batch_stats"]},
    }
    qsites = quantize_tps(wrapped, calib_images=x)
    rect_q = tps_int8_rectify(wrapped, qsites, x)

    assert rect_q.shape == rect_f.shape
    f, q = np.asarray(rect_f, np.float32), np.asarray(rect_q, np.float32)
    # sampled pixels live in [0,1]; the warp grids should nearly coincide
    assert np.abs(f - q).mean() < 0.02, np.abs(f - q).mean()


def test_tps_int8_eval_step_and_scale_prefix():
    """tps_int8=True routes the eval step through the int8 loc-net, and the
    combined qsites carry the tps/ key prefix for persisted calibration."""
    cfg = ModelConfig(enc_layers=1, dec_layers=1, ff_dim=64, hidden_dim=64,
                      embed_dim=32, num_heads=4, compute_dtype="float32",
                      tps_int8=True)
    model = build_model(cfg)
    B = 3
    batch = {
        "image": jnp.asarray(RNG.random((B, 32, 100, 1), dtype=np.float32)),
        "overlap": jnp.zeros((B, cfg.max_overlap_objs), jnp.int32),
        "scene": jnp.zeros((B, cfg.max_scene_objs), jnp.int32),
        "ious": jnp.full((B, cfg.max_scene_objs), -1000.0, jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    text = jnp.zeros((B, cfg.max_text_length + 2), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["image"], text,
        batch["overlap"], batch["scene"], batch["ious"], train=False,
    )
    eval_step, qsites = make_int8_eval_step(model, variables, batch)
    assert any(k.startswith("tps/") for k in qsites)
    ids = np.asarray(eval_step(variables, qsites, batch))
    assert ids.shape == (B, cfg.max_text_length)

    # persisted-scales path: rebuild the step from absmax values alone
    # (prefixed tps/ sites included) without a calibration batch
    from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
        calibrate_resnet,
        calibrate_tps,
    )
    from multimodal_scene_text_recognition_tpu.train.steps import prep_image

    rectified = model.apply(variables, prep_image(batch["image"]),
                            method=type(model).rectify)
    absmax = calibrate_resnet(variables, rectified,
                              output_channels=cfg.hidden_dim)
    absmax.update({f"tps/{k}": v for k, v in calibrate_tps(
        variables, prep_image(batch["image"])).items()})
    step2, qsites2 = make_int8_eval_step(model, variables, x_absmax=absmax)
    ids2 = np.asarray(step2(variables, qsites2, batch))
    np.testing.assert_array_equal(ids, ids2)


def test_int8_eval_step_end_to_end():
    """The spliced int8 eval step runs the full recognizer and returns ids
    that mostly agree with the float path on the same (random) weights."""
    cfg = ModelConfig(enc_layers=1, dec_layers=1, ff_dim=64, hidden_dim=64,
                      embed_dim=32, num_heads=4, compute_dtype="float32")
    model = build_model(cfg)
    B = 3
    batch = {
        "image": jnp.asarray(RNG.random((B, 32, 100, 1), dtype=np.float32)),
        "overlap": jnp.zeros((B, cfg.max_overlap_objs), jnp.int32),
        "scene": jnp.zeros((B, cfg.max_scene_objs), jnp.int32),
        "ious": jnp.full((B, cfg.max_scene_objs), -1000.0, jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    text = jnp.zeros((B, cfg.max_text_length + 2), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["image"], text,
        batch["overlap"], batch["scene"], batch["ious"], train=False,
    )
    eval_step, qsites = make_int8_eval_step(model, variables, batch)
    ids = np.asarray(eval_step(variables, qsites, batch))
    assert ids.shape == (B, cfg.max_text_length)

    float_logits = model.apply(
        variables, batch["image"], None, batch["overlap"], batch["scene"],
        batch["ious"], train=False,
    )
    float_ids = np.asarray(float_logits).argmax(-1)
    agree = (ids == float_ids).mean()
    assert agree > 0.8, agree
