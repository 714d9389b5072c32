"""Export a trained Orbax checkpoint as a compact git-committable bundle.

Writes ``assets/trained/<name>.params.npz`` (fp16 params + batch_stats +
step — ~150 MB at 75M params vs ~900 MB for the full Orbax train state)
and copies the persisted int8 calibration scales alongside as
``<name>.scales.npz`` when present.  bench.py / api.get_model /
Recognizer.from_bundle all restore from the bundle when the Orbax dir is
absent, so trained-model serving metrics survive a disk reset between
build sessions.

Usage: python scripts/export_params_bundle.py [ckpt_dir] [out_dir]
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from multimodal_scene_text_recognition_tpu.core.config import Config
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.train.checkpoint import (
    restore_checkpoint,
    restore_params_bundle,
    save_params_bundle,
)
from multimodal_scene_text_recognition_tpu.train.state import (
    create_train_state,
    make_optimizer,
)

CKPT = os.path.abspath(
    sys.argv[1] if len(sys.argv) > 1 else "results/models/synth_openvocab_xxl"
)
OUT_DIR = os.path.abspath(
    sys.argv[2] if len(sys.argv) > 2 else "assets/trained"
)

cfg = Config()
m = cfg.model
B = 8
sample = {
    "image": np.zeros((B, m.img_h, m.img_w, 1), np.float32),
    "text": np.zeros((B, m.max_text_length + 2), np.int32),
    "overlap": np.zeros((B, m.max_overlap_objs), np.int32),
    "scene": np.zeros((B, m.max_scene_objs), np.int32),
    "ious": np.full((B, m.max_scene_objs), -1000.0, np.float32),
}
model = build_model(cfg.model)
state = create_train_state(model, make_optimizer(cfg.train), sample,
                           jax.random.PRNGKey(0))
state = restore_checkpoint(CKPT, state)
print(f"restored {CKPT} (step {int(state.step)})")

name = os.path.basename(CKPT.rstrip("/"))
out = os.path.join(OUT_DIR, f"{name}.params.npz")
save_params_bundle(out, state)
print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB)")

scales = CKPT + ".scales.npz"
if os.path.exists(scales):
    dst = os.path.join(OUT_DIR, f"{name}.scales.npz")
    shutil.copyfile(scales, dst)
    print(f"copied scales -> {dst}")

# verify round-trip: fp16 quantization error on every leaf
back = restore_params_bundle(out, state)
worst = 0.0
for a, b in zip(jax.tree_util.tree_leaves(state.params),
                jax.tree_util.tree_leaves(back.params)):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    denom = max(float(np.max(np.abs(a))), 1e-8)
    worst = max(worst, float(np.max(np.abs(a - b))) / denom)
print(f"round-trip max relative leaf error: {worst:.2e} (fp16 quantization)")
assert int(back.step) == int(state.step)
