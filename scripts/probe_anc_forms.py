"""A/B the two ancestry-attention formulations on the chip (perf triage).

Slope-times the trained-model beam decode (k=5, B=192, early stop on/off)
with ops/attention.attend_ancestry (select-form contractions, the default)
vs attend_ancestry_flat (flat masked MHA over the J*T axis), by
monkeypatching the name models/decoders.py imported.  Measured result
(select wins ~1.25x — recorded in both docstrings): select 77.7/44.9
ms/batch (fixed/early-stop) vs flat 101.2/55.7.  Run on the real chip;
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
from multimodal_scene_text_recognition_tpu.models import decoders as dec_mod
from multimodal_scene_text_recognition_tpu.models.model import (
    SceneTextModel,
    build_model,
)
from multimodal_scene_text_recognition_tpu.ops.attention import (
    attend_ancestry,
    attend_ancestry_flat,
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
for name, fn in (("select", attend_ancestry), ("flat", attend_ancestry_flat)):
    dec_mod.attend_ancestry = fn
    for early in (False, True):
        mcfg = dataclasses.replace(cfg.model, decode_early_stop=early)
        model = build_model(mcfg)

        def beam(v, b, m=model):
            img = b["image"].astype(jnp.float32) / 255.0
            return m.apply(v, img, b["overlap"], b["scene"], b["ious"],
                           K, method=SceneTextModel.beam_decode)

        t = slope_ms(roundrobin(lambda b, v, f=beam: f(v, b)[0],
                                stacked, nB, consts=(variables,)), 3, 9)
        toks[(name, early)] = np.asarray(jax.jit(beam)(variables, batch)[0])
        print(f"{name:6s} early_stop={early}: {t:6.2f} ms/batch = "
              f"{B / t * 1e3:6.0f} crops/s", flush=True)

for early in (False, True):
    a = codec.decode(toks[("flat", early)])
    b = codec.decode(toks[("select", early)])
    agree = sum(x == y for x, y in zip(a, b)) / len(a)
    print(f"flat/select token agreement (early={early}): {agree:.4f}")
