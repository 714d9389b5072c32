"""Decompose the greedy decode scan's cost on TPU.

Isolates the TransformerDecoder from the backbone: feeds fixed encoder
memory [B, 26, 512] and times `greedy_decode` while varying layer count,
scan length and dtype, to separate fixed per-step overhead from per-layer
compute and cache traffic (VERDICT round-1 weak #5).
"""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from multimodal_scene_text_recognition_tpu.models.decoders import TransformerDecoder

B = 192
MEM_T = 26
H = 512


def timeit(fn, *args, iters=20):
    np.asarray(jax.tree.leaves(fn(*args))[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def bench(num_layers=6, max_len=25, dtype="bfloat16", label=""):
    dec = TransformerDecoder(num_classes=97, num_layers=num_layers,
                             max_text_length=max_len, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    mem = jax.random.normal(rng, (B, MEM_T, H), jnp.float32)
    text = jnp.zeros((B, max_len + 1), jnp.int32)
    variables = dec.init({"params": rng, "dropout": rng}, mem, text, train=True)

    @jax.jit
    def decode(v, mem):
        return jnp.argmax(dec.apply(v, mem, None, train=False), -1)

    ms = timeit(decode, variables, mem)
    print(f"{label or f'L={num_layers} T={max_len} {dtype}':30s} {ms:7.2f} ms "
          f"({ms / max_len * 1000:6.0f} us/step, {ms / max_len / max(num_layers,1) * 1000:5.1f} us/layer-step)")
    return ms


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    full = bench(6, 25, "bfloat16", "baseline L=6 T=25 bf16")
    bench(6, 25, "float32", "f32 L=6 T=25")
    l1 = bench(1, 25, "bfloat16", "L=1 T=25")
    l3 = bench(3, 25, "bfloat16", "L=3 T=25")
    t5 = bench(6, 5, "bfloat16", "L=6 T=5")
    t12 = bench(6, 12, "bfloat16", "L=6 T=12")
    # fixed-vs-marginal decomposition
    per_layer = (full - l1) / 5
    fixed = l1 - per_layer
    print(f"\nper-extra-layer cost: {per_layer:.2f} ms; non-layer overhead: {fixed:.2f} ms")
    per_step = (full - t5) / 20
    print(f"per-extra-step cost (L=6): {per_step * 1000:.0f} us")
