import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from bench import build
from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
cfg = ModelConfig()
model, variables, batch = build(cfg)
print("built", flush=True)
@jax.jit
def decode(variables, image, overlap, scene, ious):
    logits = model.apply(variables, image, None, overlap, scene, ious, train=False)
    return jnp.argmax(logits, axis=-1)
args=(variables, batch["image"], batch["overlap"], batch["scene"], batch["ious"])
t0=time.perf_counter()
np.asarray(decode(*args))
print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
for _ in range(20): out=decode(*args)
np.asarray(out)
dt=(time.perf_counter()-t0)/20
print(f"decode: {dt*1e3:.2f} ms/batch, {192/dt:.0f} crops/s", flush=True)
