"""Probe: int8 vs bf16 conv throughput on ResNet-31-like shapes (v5e).

v5e peaks at 394 int8 TOPS vs 197 bf16 TFLOPs — IF XLA maps
int8xint8->int32 convs onto the MXU at rate, a quantized inference backbone
would roughly halve the ~10 ms ResNet stage.  Each measurement chains CHAIN
channel-preserving convs inside ONE jitted fori_loop so per-call dispatch
and transfer cost is amortized away (single-call timings over the tunnel
are dispatch-dominated and meaningless).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B = 192
CHAIN = 30
# (H, W, C) channel-preserving 3x3 convs at the ResNet-31 stage geometries
SHAPES = [
    (32, 100, 64),
    (16, 50, 128),
    (8, 25, 256),
    (8, 26, 512),
]


def timeit(fn, *args, iters=5):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def make_chain(acc, out_cast):
    def f(x, w):
        def body(i, y):
            y = jax.lax.conv_general_dilated(
                y, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc,
            )
            return out_cast(y)

        return jax.lax.fori_loop(0, CHAIN, body, x)

    return jax.jit(f)


print(f"backend: {jax.default_backend()}, chain={CHAIN}")
rng = np.random.default_rng(0)
for (H, W, C) in SHAPES:
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    w = (rng.standard_normal((3, 3, C, C)) * 0.05).astype(np.float32)
    flops = 2 * B * H * W * C * C * 9 * CHAIN

    f_bf = make_chain(jnp.float32, lambda y: y.astype(jnp.bfloat16))
    t_bf = timeit(f_bf, jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16))

    # int8 chain: conv in int8 -> int32, then requantize to int8 (shift) —
    # models the dequant/requant cost a real PTQ backbone pays
    f_i8 = make_chain(
        jnp.int32, lambda y: jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
    )
    xi = jnp.asarray(np.clip(x * 16, -127, 127).astype(np.int8))
    wi = jnp.asarray(np.clip(w * 64, -127, 127).astype(np.int8))
    t_i8 = timeit(f_i8, xi, wi)

    print(f"{H}x{W}x{C}: bf16 {t_bf/CHAIN:7.3f} ms/conv "
          f"({flops/t_bf/1e9:6.0f} GF/s)  int8 {t_i8/CHAIN:7.3f} ms/conv "
          f"({flops/t_i8/1e9:6.0f} Gop/s)  speedup {t_bf/t_i8:.2f}x",
          flush=True)
