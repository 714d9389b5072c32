"""Probe: does an int8 x int8 -> int32 dot lower through Mosaic on this
stack, and is it faster than bf16 inside a kernel?

Usage: python scripts/probe_int8_pallas.py [--run]
Without --run only lowers (client-side, no chip time).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, E, F = 192, 256, 2048
ITERS = 200  # chained matmuls inside the kernel to amortize


def kern_int8(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...]  # [B, E] float32
    acc = jnp.zeros((B, F), jnp.float32)

    def body(i, carry):
        x, acc = carry
        ax = jnp.max(jnp.abs(x), keepdims=True)  # [1,1]
        inv = 127.0 / jnp.maximum(ax, 1e-12)
        xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
        a32 = jax.lax.dot_general(
            xq, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = a32.astype(jnp.float32) * (s_ref[...] / inv)
        # feed a slice back so the loop is sequential (not DCE'd)
        return jax.lax.slice_in_dim(out, 0, E, axis=1), acc + out

    x, acc = jax.lax.fori_loop(0, ITERS, body, (x, acc))
    o_ref[...] = acc


def kern_bf16(x_ref, w_ref, o_ref):
    x = x_ref[...]
    acc = jnp.zeros((B, F), jnp.float32)

    def body(i, carry):
        x, acc = carry
        out = jax.lax.dot_general(
            x.astype(jnp.bfloat16), w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.slice_in_dim(out, 0, E, axis=1), acc + out

    x, acc = jax.lax.fori_loop(0, ITERS, body, (x, acc))
    o_ref[...] = acc


def main():
    run = "--run" in sys.argv
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, E)).astype(np.float32))
    w = rng.normal(size=(E, F)).astype(np.float32)
    ws = np.abs(w).max(axis=0) / 127.0
    wq = jnp.asarray(np.clip(np.round(w / ws), -127, 127).astype(np.int8))
    wbf = jnp.asarray(w, jnp.bfloat16)
    ws = jnp.asarray(ws[None, :], jnp.float32)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    f_int8 = jax.jit(lambda x, wq, ws: pl.pallas_call(
        kern_int8, out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
        in_specs=[vspec] * 3, out_specs=vspec)(x, wq, ws))
    f_bf16 = jax.jit(lambda x, w: pl.pallas_call(
        kern_bf16, out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
        in_specs=[vspec] * 2, out_specs=vspec)(x, w))

    print("lowering int8 kernel...", flush=True)
    print(f_int8.lower(x, wq, ws).compile().cost_analysis())
    print("int8 kernel lowers OK", flush=True)
    print("lowering bf16 kernel...", flush=True)
    f_bf16.lower(x, wbf).compile()
    print("bf16 kernel lowers OK", flush=True)

    if not run:
        return
    for name, f, args in (("bf16", f_bf16, (x, wbf)),
                          ("int8", f_int8, (x, wq, ws))):
        np.asarray(f(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(10):
            out = f(*args)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / 10
        fl = 2 * B * E * F * ITERS
        print(f"{name}: {dt*1e3:.2f} ms/call -> {fl/dt/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
