"""TPU benchmark: fused whole-decode Pallas kernel vs the XLA scan path.

Flagship decoder shapes (B=192, E=256, L=6, T=25, bf16).  Run on the real
chip; serialize with other TPU jobs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_scene_text_recognition_tpu.models.decoders import (
    TransformerDecoder,
)

B, H, E, T = 192, 512, 256, 25
DT = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"

common = dict(num_classes=97, d_model=E, memory_dim=H, num_heads=8,
              ff_dim=2048, num_layers=6, dropout=0.1, max_text_length=T,
              dtype=DT)
dec_scan = TransformerDecoder(**common)
dec_fused = TransformerDecoder(**common, fused=True)

rng = jax.random.PRNGKey(0)
enc_out = jax.random.normal(rng, (B, 26, H), jnp.float32)
variables = dec_scan.init(
    {"params": rng, "dropout": rng},
    enc_out, jnp.zeros((B, 26), jnp.int32), None, train=True,
)


def timeit(fn, iters=30):
    np.asarray(fn())  # compile + warm
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


print(f"backend: {jax.default_backend()}, dtype: {DT}")

scan_fn = jax.jit(lambda v, e: dec_scan.apply(v, e, None, None, train=False))
t_scan = timeit(lambda: scan_fn(variables, enc_out))
print(f"XLA scan decode:    {t_scan:6.2f} ms  ({t_scan / T * 1000:5.0f} us/step)")

fused_fn = jax.jit(lambda v, e: dec_fused.apply(v, e, None, None, train=False))
t_fused = timeit(lambda: fused_fn(variables, enc_out))
print(f"fused Pallas decode:{t_fused:6.2f} ms  ({t_fused / T * 1000:5.0f} us/step)")
print(f"speedup: {t_scan / t_fused:.2f}x")

a = np.asarray(scan_fn(variables, enc_out))
b = np.asarray(fused_fn(variables, enc_out))
am, bm = a.argmax(-1), b.argmax(-1)
print(f"argmax mismatch: {(am != bm).sum()} / {am.size}, "
      f"max |logit diff| {np.abs(a - b).max():.3e}")
