"""Parity check: fused Pallas whole-decode kernel vs the XLA scan path.

CPU (interpret mode) in float32: logits should agree to ~1e-4 and argmax
sequences exactly.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
from multimodal_scene_text_recognition_tpu.models.model import build_model

B = 8

cfg = ModelConfig(compute_dtype="float32")
model = build_model(cfg)
fused_model = build_model(
    ModelConfig(compute_dtype="float32", decode_fused=True))
rng = jax.random.PRNGKey(0)
img = jax.random.normal(rng, (B, cfg.img_h, cfg.img_w, 1), jnp.float32)
text = jnp.zeros((B, cfg.max_text_length + 2), jnp.int32)
overlap = jnp.zeros((B, cfg.max_overlap_objs), jnp.int32)
scene = jnp.zeros((B, cfg.max_scene_objs), jnp.int32)
ious = jnp.full((B, cfg.max_scene_objs), -1000.0, jnp.float32)

variables = model.init(
    {"params": rng, "dropout": rng}, img, text, overlap, scene, ious,
    train=False,
)

args = (img, text, overlap, scene, ious)
ref = np.asarray(model.apply(variables, *args, train=False))
fus = np.asarray(fused_model.apply(variables, *args, train=False))

print("shapes:", ref.shape, fus.shape)
diff = np.abs(ref - fus).max()
am_ref, am_fus = ref.argmax(-1), fus.argmax(-1)
print(f"max |logit diff| = {diff:.2e}")
print(f"argmax mismatch  = {(am_ref != am_fus).sum()} / {am_ref.size}")
assert diff < 1e-3, diff
assert (am_ref == am_fus).all()
print("PASS")
