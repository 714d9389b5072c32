"""Slope-time the trained serving step over real varied batches.

Question (round 3): the pipelined whole-corpus scan measures 13.7 ms/batch
while the per-phase MFU table sums to ~11.4 ms fixed-length (and early stop
should cut the decode further on real ~6-char words).  Where do the extra
milliseconds go — and does the per-call 11.88 ms number survive varied
data (identical re-enqueues can be deduped by the runtime)?

Method: one jit program scans the serving step over K batches drawn
round-robin from the 10 real val batches; per-batch ms = slope between two
trip counts (dispatch cost cancels).  Run for early_stop on/off and for
the int8 vs bf16 encoder.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

B = 192
K1, K2 = int(os.environ.get("K1", "6")), int(os.environ.get("K2", "16"))
CKPT = os.path.abspath("results/models/synth_openvocab_xxl")

cfg = Config()
codec = AttnCodec(cfg.model.chars, cfg.model.max_text_length)
val = make_packed_dataset(codec, 2048, seed=cfg.train.seed + 1,
                          cache_dir="results/synth_cache")
full = [b for b in packed_batches(val, B, shuffle=False)
        if b["image"].shape[0] == B]
stacked = device_batch({k: np.stack([b[k] for b in full])
                        for k in ("image", "overlap", "scene", "ious")})
nB = len(full)
batch0 = device_batch(full[0])

model0 = build_model(cfg.model)
state = create_train_state(model0, make_optimizer(cfg.train), batch0,
                           jax.random.PRNGKey(0))
state = restore_checkpoint(CKPT, state)
variables = state.variables()
print(f"restored step={int(state.step)}", flush=True)


def probe(name, mcfg):
    model = build_model(mcfg)
    step, qsites = make_int8_eval_step(model, variables, calib_batch=batch0)

    ms = slope_ms(roundrobin(lambda b, v, q: step(v, q, b),
                             stacked, nB, consts=(variables, qsites)),
                  K1, K2)
    print(f"{name}: {ms:.2f} ms/batch = {B / ms * 1e3:.0f} crops/s",
          flush=True)


base = dataclasses.replace(cfg.model, decode_fused=True, encoder_int8=True)
VARIANTS = {
    "es+enc8": dataclasses.replace(base, decode_early_stop=True),
    "fixed+enc8": dataclasses.replace(base, decode_early_stop=False),
    "es+encbf16": dataclasses.replace(base, decode_early_stop=True,
                                      encoder_int8=False),
    "es+enc8+tps8": dataclasses.replace(base, decode_early_stop=True,
                                        tps_int8=True),
}
only = os.environ.get("VARIANTS", "")
for name, mcfg in VARIANTS.items():
    if only and name not in only.split(","):
        continue
    probe(name, mcfg)
