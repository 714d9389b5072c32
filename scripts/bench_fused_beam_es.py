"""Fused whole-beam kernel, early-stop config only: agreement + slope.

Lean variant of scripts/bench_fused_beam.py — the fused kernel's Mosaic
compile is ~15 min per enclosing XLA program at full scale (L=6, B=192),
so this measures just the production config: one agreement/accuracy call
plus the two slope trip counts.  Run on the real chip; serialize with
other TPU jobs.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_scene_text_recognition_tpu.core.charset import AttnCodec
from multimodal_scene_text_recognition_tpu.core.config import Config
from multimodal_scene_text_recognition_tpu.data.pipeline import (
    device_batch,
    packed_batches,
)
from multimodal_scene_text_recognition_tpu.data.synthetic import (
    make_packed_dataset,
)
from multimodal_scene_text_recognition_tpu.models.model import (
    SceneTextModel,
    build_model,
)
from multimodal_scene_text_recognition_tpu.train.checkpoint import (
    restore_checkpoint,
)
from multimodal_scene_text_recognition_tpu.train.state import (
    create_train_state,
    make_optimizer,
)
from multimodal_scene_text_recognition_tpu.utils.timing import (
    roundrobin,
    slope_ms,
)

CKPT = sys.argv[1] if len(sys.argv) > 1 else "results/models/synth_openvocab_xxl"
B, K = 192, 5

cfg = Config()
codec = AttnCodec(cfg.model.chars, cfg.model.max_text_length)
val = make_packed_dataset(codec, 2048, seed=cfg.train.seed + 1,
                          cache_dir="results/synth_cache")
full = [b for b in packed_batches(val, B, shuffle=False)
        if b["image"].shape[0] == B]
stacked = device_batch({k: np.stack([b[k] for b in full])
                        for k in ("image", "overlap", "scene", "ious")})
nB = len(full)
batch = device_batch(full[0])

model0 = build_model(cfg.model)
state = create_train_state(model0, make_optimizer(cfg.train), batch,
                           jax.random.PRNGKey(0))
state = restore_checkpoint(os.path.abspath(CKPT), state)
variables = state.variables()
print(f"restored step={int(state.step)}", flush=True)

mcfg = dataclasses.replace(cfg.model, decode_early_stop=True,
                           decode_beam_fused=True)
model = build_model(mcfg)
xmodel = build_model(dataclasses.replace(cfg.model, decode_early_stop=True))


def beam_of(m):
    def beam(v, b):
        img = b["image"].astype(jnp.float32) / 255.0
        return m.apply(v, img, b["overlap"], b["scene"], b["ious"],
                       K, method=SceneTextModel.beam_decode)
    return beam


t0 = time.time()
tok_f = np.asarray(jax.jit(beam_of(model))(variables, batch)[0])
print(f"fused beam agreement call: {time.time() - t0:.0f}s "
      f"(compile-dominated)", flush=True)
tok_x = np.asarray(jax.jit(beam_of(xmodel))(variables, batch)[0])
sf, sx = codec.decode(tok_f), codec.decode(tok_x)
agree = sum(a == b for a, b in zip(sf, sx)) / len(sf)
acc = sum(a == b for a, b in zip(sf, val.labels[:B])) / len(sf)
print(f"fused/xla token agreement: {agree:.4f}; fused word acc {acc:.4f}",
      flush=True)

t = slope_ms(roundrobin(lambda b, v: beam_of(model)(v, b)[0],
                        stacked, nB, consts=(variables,)), 6, 16)
print(f"fused beam k={K} early_stop: {t:6.2f} ms/batch = "
      f"{B / t * 1e3:6.0f} crops/s (slope, varied batches)", flush=True)
