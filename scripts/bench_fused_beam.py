"""Fused whole-beam Pallas kernel vs the XLA ancestry beam, on the chip.

Token agreement on a real val batch + slope-timed throughput (k=5, B=192,
early stop on/off) on the trained checkpoint.  Run on the real chip;
serialize with other TPU jobs.
"""
import dataclasses
import os
import sys

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

toks = {}
for fused in (False, True):
    for early in (False, True):
        mcfg = dataclasses.replace(cfg.model, decode_early_stop=early,
                                   decode_beam_fused=fused)
        model = build_model(mcfg)

        def beam(v, b, m=model):
            img = b["image"].astype(jnp.float32) / 255.0
            return m.apply(v, img, b["overlap"], b["scene"], b["ious"],
                           K, method=SceneTextModel.beam_decode)

        t = slope_ms(roundrobin(lambda b, v, f=beam: f(v, b)[0],
                                stacked, nB, consts=(variables,)), 3, 9)
        toks[(fused, early)] = np.asarray(jax.jit(beam)(variables, batch)[0])
        label = "fused" if fused else "xla  "
        print(f"{label} early_stop={early}: {t:6.2f} ms/batch = "
              f"{B / t * 1e3:6.0f} crops/s", flush=True)

base = codec.decode(toks[(False, False)])
for key, tk in toks.items():
    s = codec.decode(tk)
    agree = sum(x == y for x, y in zip(base, s)) / len(s)
    acc = sum(x == y for x, y in zip(s, val.labels[:B])) / len(s)
    print(f"{key}: agreement vs xla-full {agree:.4f}, word acc {acc:.4f}")
