"""Trained-model beam k=5 through the int8 PTQ backbone.

Beam rides the same int8-spliced pipeline as greedy serving
(models/resnet_int8.make_int8_eval_step(beam_size=k) ->
model.beam_from_columns): int8 TPS-loc-net-off ResNet + int8 encoder,
then the ancestry-bookkeeping beam decode.  Slope-timed over varied real
val batches (same methodology as scripts/mfu_table.py).

Run on the real chip; serialize with other TPU jobs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
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
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
    load_activation_scales,
    make_int8_eval_step,
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
K1, K2 = int(os.environ.get("K1", "3")), int(os.environ.get("K2", "9"))

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

FUSED = os.environ.get("FUSED", "0") == "1"
mcfg = dataclasses.replace(cfg.model, decode_early_stop=True,
                           encoder_int8=True, decode_beam_fused=FUSED)
model = build_model(mcfg)
state = create_train_state(model, make_optimizer(cfg.train), batch,
                           jax.random.PRNGKey(0))
state = restore_checkpoint(os.path.abspath(CKPT), state)
variables = state.variables()
print(f"restored step={int(state.step)}", flush=True)

scales = load_activation_scales(os.path.abspath(CKPT) + ".scales.npz")
step, qsites = make_int8_eval_step(model, variables, x_absmax=scales,
                                   beam_size=K)

t = slope_ms(roundrobin(lambda b, v, q: step(v, q, b)[0],
                        stacked, nB, consts=(variables, qsites)), K1, K2)
print(f"beam k={K} int8 backbone+encoder, early stop,"
      f" fused={FUSED}: {t:6.2f} ms/batch = "
      f"{B / t * 1e3:6.0f} crops/s (slope, varied batches)", flush=True)

ids, scores = jax.jit(step)(variables, qsites, batch)
preds = codec.decode(np.asarray(ids))
acc = sum(p == l for p, l in zip(preds, val.labels[:B])) / len(preds)
print(f"int8 beam word acc on first batch: {acc:.4f} "
      f"(scores finite: {bool(np.isfinite(np.asarray(scores)).all())})")
