"""Trained-model beam-search benchmark: fixed-length scan vs early-stop
while_loop (k=5, B=192) — VERDICT r2 #4b evidence.

Early stop only pays on a trained model (beams actually emit [s]).
Run on the real chip; serialize with other TPU jobs.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

CKPT = sys.argv[1] if len(sys.argv) > 1 else "results/models/synth_openvocab_xxl"
B, K = 192, 5

cfg = Config()
codec = AttnCodec(cfg.model.chars, cfg.model.max_text_length)
val = make_packed_dataset(codec, 2048, seed=cfg.train.seed + 1,
                          cache_dir="results/synth_cache")
batch = device_batch(next(iter(packed_batches(val, B, shuffle=False))))
batch["image"] = batch["image"].astype(jnp.float32) / 255.0

model0 = build_model(cfg.model)
state = create_train_state(model0, make_optimizer(cfg.train),
                           batch, jax.random.PRNGKey(0))
state = restore_checkpoint(os.path.abspath(CKPT), state)
variables = state.variables()
print(f"restored step={int(state.step)}", flush=True)


def timeit(fn, iters=10):
    np.asarray(fn()[0])
    np.asarray(fn()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out[0])
    return (time.perf_counter() - t0) / iters * 1e3


toks = {}
for early in (False, True):
    mcfg = dataclasses.replace(cfg.model, decode_early_stop=early)
    model = build_model(mcfg)
    f = jax.jit(lambda v, m=model: m.apply(
        v, batch["image"], batch["overlap"], batch["scene"], batch["ious"],
        K, method=SceneTextModel.beam_decode))
    t = timeit(lambda: f(variables))
    toks[early] = np.asarray(f(variables)[0])
    print(f"beam k={K} early_stop={early}: {t:6.1f} ms/batch = "
          f"{B / t * 1e3:6.0f} crops/s", flush=True)

s0, s1 = codec.decode(toks[False]), codec.decode(toks[True])
agree = sum(a == b for a, b in zip(s0, s1)) / len(s0)
acc = sum(a == b for a, b in zip(s1, val.labels[:B])) / len(s1)
print(f"early-stop agreement vs full scan: {agree:.4f}; "
      f"beam word acc on first batch: {acc:.4f}")
