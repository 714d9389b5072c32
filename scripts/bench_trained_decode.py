"""Trained-model decode benchmark: scan vs fused vs early-stop variants.

Run AFTER a training run produced results/models/<exp>: restores the
checkpoint and measures full-pipeline greedy decode throughput at B=192 for
the four path combinations.  Early stop only pays off on a trained model
(random-init models rarely emit [s]); this is the production-serving
number.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from multimodal_scene_text_recognition_tpu.core.charset import AttnCodec
from multimodal_scene_text_recognition_tpu.core.config import Config, apply_overrides
from multimodal_scene_text_recognition_tpu.data.synthetic import make_packed_dataset
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.train.checkpoint import restore_checkpoint
from multimodal_scene_text_recognition_tpu.train.state import (
    create_train_state,
    make_optimizer,
)
from multimodal_scene_text_recognition_tpu.data.pipeline import (
    device_batch,
    packed_batches,
)

CKPT = sys.argv[1] if len(sys.argv) > 1 else "results/models/synth_openvocab_xxl"
B = 192

cfg = Config()
codec = AttnCodec(cfg.model.chars, cfg.model.max_text_length)
val = make_packed_dataset(codec, 2048, seed=cfg.train.seed + 1,
                          cache_dir="results/synth_cache")
batch = device_batch(next(iter(packed_batches(val, B, shuffle=False))))
# normalize on device once: model.apply is called directly below (the jitted
# step fns would do this via prep_image)
import jax.numpy as jnp

batch["image"] = batch["image"].astype(jnp.float32) / 255.0

# restore the trained state via a template built from one init
model0 = build_model(cfg.model)
rng = jax.random.PRNGKey(0)
tx = make_optimizer(cfg.train, 1)
state = create_train_state(model0, tx, batch, rng)
state = restore_checkpoint(os.path.abspath(CKPT), state)
variables = state.variables()
print(f"restored step={int(state.step)}", flush=True)


def timeit(fn, iters=20):
    np.asarray(fn())
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


results = {}
ids_by_mode = {}
for fused in (False, True):
    for early in (False, True):
        mcfg = dataclasses.replace(cfg.model, decode_fused=fused,
                                   decode_early_stop=early)
        model = build_model(mcfg)

        def decode(v=variables, m=model):
            return m.apply(v, batch["image"], None, batch["overlap"],
                           batch["scene"], batch["ious"], train=False)

        f = jax.jit(lambda v: model.apply(
            v, batch["image"], None, batch["overlap"], batch["scene"],
            batch["ious"], train=False))
        t = timeit(lambda: f(variables))
        key = f"fused={int(fused)} early={int(early)}"
        results[key] = t
        ids_by_mode[key] = np.asarray(f(variables)).argmax(-1)
        print(f"{key}: {t:6.2f} ms/batch = {B / t * 1e3:7.0f} crops/s",
              flush=True)

# string-level agreement + accuracy of each mode vs ground truth
labels = val.labels[:B]
base = codec.decode(ids_by_mode["fused=0 early=0"])
for k, ids in ids_by_mode.items():
    s = codec.decode(ids)
    agree = sum(a == b for a, b in zip(s, base)) / len(s)
    acc = sum(a == b for a, b in zip(s, labels)) / len(s)
    print(f"{k}: val-batch word acc {acc:.4f}, agreement vs scan {agree:.4f}")
