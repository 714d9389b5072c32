"""Trained-model int8 backbone: accuracy + throughput on the real chip.

Restores results/models/synth_openvocab_xxl, quantizes the backbone (PTQ,
one calibration batch), and reports:
  * word accuracy over the full 2048-crop val set: float vs int8 backbone;
  * B=192 decode throughput: float backbone vs int8 backbone (both with the
    fused+early-stop decoder).
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
from multimodal_scene_text_recognition_tpu.data.synthetic import make_packed_dataset
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
    make_int8_eval_step,
)
from multimodal_scene_text_recognition_tpu.train.checkpoint import restore_checkpoint
from multimodal_scene_text_recognition_tpu.train.state import (
    create_train_state,
    make_optimizer,
)

CKPT = sys.argv[1] if len(sys.argv) > 1 else "results/models/synth_openvocab_xxl"
B = 192

cfg = Config()
mcfg = dataclasses.replace(cfg.model, decode_fused=True,
                           decode_early_stop=True)
codec = AttnCodec(mcfg.chars, mcfg.max_text_length)
val = make_packed_dataset(codec, 2048, seed=cfg.train.seed + 1,
                          cache_dir="results/synth_cache")

model = build_model(mcfg)
batches = [device_batch(b) for b in packed_batches(val, B, shuffle=False,
                                                   drop_last=False)]
rng = jax.random.PRNGKey(0)
state = create_train_state(model, make_optimizer(cfg.train, 1),
                           batches[0], rng)
state = restore_checkpoint(os.path.abspath(CKPT), state)
variables = state.variables()
print(f"restored step={int(state.step)}", flush=True)

from multimodal_scene_text_recognition_tpu.train.steps import make_eval_step

float_step = make_eval_step(model)
int8_step, qsites = make_int8_eval_step(model, variables, batches[0])


def accuracy(step_fn, *extra):
    correct = total = 0
    for i, b in enumerate(batches):
        ids = np.asarray(step_fn(variables, *extra, b))
        preds = codec.decode(ids)
        labels = val.labels[i * B : i * B + len(preds)]
        for p, l in zip(preds, labels[: len(preds)]):
            if l == "":
                continue
            correct += p == l
            total += 1
    return correct / total


def timeit(fn, iters=20):
    np.asarray(fn())
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


acc_f = accuracy(float_step)
print(f"float backbone:  val acc {acc_f:.4f}", flush=True)
acc_q = accuracy(int8_step, qsites)
print(f"int8  backbone:  val acc {acc_q:.4f}  (delta {acc_q-acc_f:+.4f})",
      flush=True)

b0 = batches[0]
t_f = timeit(lambda: float_step(variables, b0))
print(f"float backbone:  {t_f:6.2f} ms/batch = {B/t_f*1e3:7.0f} crops/s",
      flush=True)
t_q = timeit(lambda: int8_step(variables, qsites, b0))
print(f"int8  backbone:  {t_q:6.2f} ms/batch = {B/t_q*1e3:7.0f} crops/s "
      f"(speedup {t_f/t_q:.2f}x)", flush=True)
