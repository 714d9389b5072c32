"""Beam-search (k=5) decode throughput at B=192 (BASELINE.json config 3)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from bench import build
from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
from multimodal_scene_text_recognition_tpu.models.model import SceneTextModel

cfg = ModelConfig()
model, variables, batch = build(cfg)

@jax.jit
def beam5(variables, image, overlap, scene, ious):
    return model.apply(variables, image, overlap, scene, ious, 5,
                       method=SceneTextModel.beam_decode)

args = (variables, batch["image"], batch["overlap"], batch["scene"], batch["ious"])
tok, sc = beam5(*args); np.asarray(tok)
t0 = time.perf_counter()
for _ in range(10): tok, sc = beam5(*args)
np.asarray(tok)
dt = (time.perf_counter() - t0) / 10
print(f"beam5 decode: {dt*1e3:.1f} ms/batch, {192/dt:.0f} crops/s", flush=True)
