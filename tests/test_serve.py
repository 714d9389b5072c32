"""Serving recognizer tests."""

import numpy as np

from multimodal_scene_text_recognition_tpu import api
from multimodal_scene_text_recognition_tpu.eval.serve import Recognizer
from tests.test_api import TINY_CFG


def test_recognizer_greedy_and_beam():
    bundle = api.get_model(cfg=TINY_CFG)
    rec = Recognizer.from_bundle(bundle, batch_sizes=(2, 4))
    rng = np.random.default_rng(0)
    # mixed sizes and dtypes; more crops than the largest bucket
    crops = [rng.random((32, 100), dtype=np.float32) for _ in range(3)]
    crops += [rng.integers(0, 256, (20, 60), dtype=np.uint8).astype(np.float32)
              for _ in range(3)]
    texts = rec.recognize(crops)
    assert len(texts) == 6
    assert all(isinstance(t, str) for t in texts)

    texts2, scores = rec.recognize(crops[:2], beam_size=3, return_scores=True)
    assert len(texts2) == 2 and len(scores) == 2

    # semantics pass-through
    sem = {
        "overlap": rng.integers(0, 50, (6, 15)).astype(np.int32),
        "scene": rng.integers(0, 50, (6, 52)).astype(np.int32),
        "ious": np.full((6, 52), -1000.0, np.float32),
    }
    texts3 = rec.recognize(crops, semantics=sem)
    assert len(texts3) == 6


def test_recognizer_int8_backbone():
    """int8_backbone serving mode decodes through the PTQ backbone and
    yields mostly the same strings as the float path."""
    import numpy as np

    from multimodal_scene_text_recognition_tpu.core.config import Config, apply_overrides
    from multimodal_scene_text_recognition_tpu.eval.serve import Recognizer
    from multimodal_scene_text_recognition_tpu.models.model import build_model
    import jax
    import jax.numpy as jnp

    cfg = apply_overrides(Config(), [
        "model.enc_layers=1", "model.dec_layers=1", "model.ff_dim=64",
        "model.hidden_dim=64", "model.embed_dim=32", "model.num_heads=4",
        "model.compute_dtype=float32",
    ])
    model = build_model(cfg.model)
    rng = jax.random.PRNGKey(0)
    B = 2
    img = jnp.asarray(np.random.default_rng(0).random(
        (B, 32, 100, 1), dtype=np.float32))
    text = jnp.zeros((B, cfg.model.max_text_length + 2), jnp.int32)
    ov = jnp.zeros((B, cfg.model.max_overlap_objs), jnp.int32)
    sc = jnp.zeros((B, cfg.model.max_scene_objs), jnp.int32)
    io = jnp.full((B, cfg.model.max_scene_objs), -1000.0, jnp.float32)
    variables = model.init({"params": rng, "dropout": rng},
                           img, text, ov, sc, io, train=False)

    crops = [np.asarray(img[i, :, :, 0]) for i in range(B)]
    rec_f = Recognizer(model, variables, cfg, batch_sizes=(2,))
    rec_q = Recognizer(model, variables, cfg, batch_sizes=(2,),
                       int8_backbone=True)
    tf = rec_f.recognize(crops)
    tq = rec_q.recognize(crops)
    assert len(tf) == len(tq) == B
    assert all(isinstance(t, str) for t in tq)

    # beam through the int8 backbone (model.beam_from_columns splice):
    # same strings as the float beam at these tiny shapes, scores finite
    bf, sf = rec_f.recognize(crops, beam_size=3, return_scores=True)
    bq, sq = rec_q.recognize(crops, beam_size=3, return_scores=True)
    assert len(bq) == B and len(sq) == B
    assert bq == bf
    assert all(np.isfinite(s) for s in sq)
    # greedy and beam int8 steps are cached separately
    assert set(rec_q._int8_steps) == {None, 3}


def test_recognizer_persisted_scales(tmp_path):
    """Persisted-calibration serving: scales saved next to a checkpoint are
    loaded (no lazy first-batch calibration) and produce the same strings
    as in-process calibration; from_bundle picks the npz up automatically."""
    import jax
    import jax.numpy as jnp

    from multimodal_scene_text_recognition_tpu.core.config import (
        Config,
        apply_overrides,
    )
    from multimodal_scene_text_recognition_tpu.models.model import build_model
    from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
        calibrate_resnet,
        save_activation_scales,
    )

    cfg = apply_overrides(Config(), [
        "model.enc_layers=1", "model.dec_layers=1", "model.ff_dim=64",
        "model.hidden_dim=64", "model.embed_dim=32", "model.num_heads=4",
        "model.compute_dtype=float32",
    ])
    model = build_model(cfg.model)
    rng = jax.random.PRNGKey(0)
    B = 2
    img = jnp.asarray(np.random.default_rng(0).random(
        (B, 32, 100, 1), dtype=np.float32))
    text = jnp.zeros((B, cfg.model.max_text_length + 2), jnp.int32)
    ov = jnp.zeros((B, cfg.model.max_overlap_objs), jnp.int32)
    sc = jnp.zeros((B, cfg.model.max_scene_objs), jnp.int32)
    io = jnp.full((B, cfg.model.max_scene_objs), -1000.0, jnp.float32)
    variables = model.init({"params": rng, "dropout": rng},
                           img, text, ov, sc, io, train=False)
    crops = [np.asarray(img[i, :, :, 0]) for i in range(B)]

    # persist scales computed over the same crops
    rectified = model.apply(variables, img, method=type(model).rectify)
    scales = calibrate_resnet(variables, rectified,
                              output_channels=cfg.model.hidden_dim)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    path = str(ckpt) + ".scales.npz"
    save_activation_scales(path, scales)

    rec_p = Recognizer(model, variables, cfg, batch_sizes=(2,),
                       int8_backbone=True, int8_scales_path=path)
    assert rec_p._int8_absmax is not None  # loaded, not lazy
    rec_l = Recognizer(model, variables, cfg, batch_sizes=(2,),
                       int8_backbone=True)
    assert rec_p.recognize(crops) == rec_l.recognize(crops)

    # from_bundle auto-pickup via cfg.saved_model
    import dataclasses

    class FakeBundle:
        def __init__(self):
            self.model = model
            self.variables = variables
            self.cfg = dataclasses.replace(cfg, saved_model=str(ckpt))

    rec_b = Recognizer.from_bundle(FakeBundle(), batch_sizes=(2,),
                                   int8_backbone=True)
    assert rec_b.int8_scales_path == path
    assert rec_b._int8_absmax is not None
