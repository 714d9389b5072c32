"""Validate + time the pallas grid_sample kernel on the real TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from multimodal_scene_text_recognition_tpu.ops.grid_sample import (
    grid_sample, grid_sample_pallas)

rng = np.random.default_rng(0)
B, H, W = 192, 32, 100
img = jnp.asarray(rng.random((B, H, W, 1), dtype=np.float32))
grid = jnp.asarray((rng.random((B, H, W, 2), dtype=np.float32) * 2 - 1) * 1.1)

f_ref = jax.jit(grid_sample)
f_pal = jax.jit(grid_sample_pallas)
a = np.asarray(f_ref(img, grid))
b = np.asarray(f_pal(img, grid))
print("max diff pallas vs jnp:", np.abs(a - b).max(), flush=True)

for name, f in [("jnp", f_ref), ("pallas", f_pal)]:
    np.asarray(f(img, grid))
    t0 = time.perf_counter()
    for _ in range(50): out = f(img, grid)
    np.asarray(out)
    print(f"{name}: {(time.perf_counter()-t0)/50*1e3:.3f} ms/batch", flush=True)
