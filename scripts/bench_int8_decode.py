"""TPU benchmark: int8-quantized fused decode kernel vs bf16 fused kernel.

Flagship decoder shapes (B=192, E=256, L=6, T=25).  Decoder-only isolation
for attribution; end-to-end trained numbers come from bench.py's
bench_trained.  Run on the real chip; serialize with other TPU jobs.
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

common = dict(num_classes=97, d_model=E, memory_dim=H, num_heads=8,
              ff_dim=2048, num_layers=6, dropout=0.1, max_text_length=T,
              dtype="bfloat16")
dec_bf16 = TransformerDecoder(**common, fused=True)
dec_int8 = TransformerDecoder(**common, fused=True, int8=True)

rng = jax.random.PRNGKey(0)
enc_out = jax.random.normal(rng, (B, 26, H), jnp.float32)
variables = dec_bf16.init(
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


print(f"backend: {jax.default_backend()}")

f_bf16 = jax.jit(lambda v, e: dec_bf16.apply(v, e, None, None, train=False))
t_bf16 = timeit(lambda: f_bf16(variables, enc_out))
print(f"fused bf16 decode: {t_bf16:6.2f} ms  ({t_bf16 / T * 1000:5.0f} us/step)")

f_int8 = jax.jit(lambda v, e: dec_int8.apply(v, e, None, None, train=False))
t_int8 = timeit(lambda: f_int8(variables, enc_out))
print(f"fused int8 decode: {t_int8:6.2f} ms  ({t_int8 / T * 1000:5.0f} us/step)")
print(f"speedup: {t_bf16 / t_int8:.2f}x")

a = np.asarray(f_bf16(variables, enc_out))
b = np.asarray(f_int8(variables, enc_out))
am, bm = a.argmax(-1), b.argmax(-1)
print(f"argmax mismatch vs bf16: {(am != bm).sum()} / {am.size} "
      f"(random-init weights; trained-model accuracy is the real check)")
