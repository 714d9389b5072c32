"""Per-phase MFU accounting (VERDICT r2 #7): FLOPs, measured ms, achieved
TF/s vs the chip's measured peaks — turns every "roofline" claim into
arithmetic.

Usage: python scripts/mfu_table.py [ckpt_dir]
Runs each pipeline phase in isolation at B=192 on the real chip, takes
FLOPs from XLA's cost analysis, and prints a markdown table for RESULTS.md.
Also measures the chip's achievable bf16 / int8 matmul peaks with a chained
large-matmul probe (datasheet numbers are meaningless on a shared slice).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_scene_text_recognition_tpu.core.config import Config
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.train.state import (
    create_train_state,
    make_optimizer,
)
from multimodal_scene_text_recognition_tpu.train.steps import make_train_step

B = 192
cfg = Config()


def timeit(fn, *args, iters=20):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def flops_of(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def measured_peak(dtype, iters=64, n=2048):
    """Chained large matmuls -> achievable TF/s for this dtype."""
    if dtype == "int8":
        a = jnp.ones((n, n), jnp.int8)

        @jax.jit
        def chain(a):
            def body(i, x):
                y = jax.lax.dot_general(
                    x, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return jnp.clip(y, -127, 127).astype(jnp.int8)
            return jax.lax.fori_loop(0, iters, body, a)
    else:
        a = jnp.ones((n, n), jnp.bfloat16)

        @jax.jit
        def chain(a):
            def body(i, x):
                y = jax.lax.dot_general(
                    x, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return y.astype(jnp.bfloat16) / n
            return jax.lax.fori_loop(0, iters, body, a)

    dt = timeit(chain, a, iters=3)
    return 2 * n * n * n * iters / dt / 1e12


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((B, 32, 100, 1), dtype=np.float32))
    overlap = jnp.zeros((B, 15), jnp.int32)
    scene = jnp.zeros((B, 52), jnp.int32)
    ious = jnp.full((B, 52), -1000.0, jnp.float32)
    text = jnp.zeros((B, 27), jnp.int32)

    peaks = {}
    for d in ("bf16", "int8"):
        peaks[d] = measured_peak(d)
        print(f"measured {d} peak: {peaks[d]:.1f} TF/s", flush=True)

    rows = []

    def stage(name, jitted, *args, peak="bf16", iters=20):
        fl = flops_of(jitted, *args)
        dt = timeit(jitted, *args, iters=iters)
        tf = fl / dt / 1e12
        rows.append((name, fl / 1e9, dt * 1e3, tf,
                     100.0 * tf / peaks[peak]))
        print(f"{name}: {fl/1e9:.1f} GFLOP, {dt*1e3:.2f} ms, "
              f"{tf:.1f} TF/s ({100*tf/peaks[peak]:.0f}% of {peak} peak)",
              flush=True)

    for variant, mcfg in (
        ("bf16", dataclasses.replace(cfg.model, decode_fused=True)),
        ("int8", dataclasses.replace(cfg.model, decode_fused=True,
                                     decode_int8=True, encoder_int8=True)),
    ):
        model = build_model(mcfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0)},
            img, text[:, :-1], overlap, scene, ious, train=True)
        peak = "int8" if variant == "int8" else "bf16"

        rect = jax.jit(lambda v, x: model.apply(
            v, x, method=type(model).rectify))
        stage(f"TPS rectify ({variant})", rect, variables, img)
        rectified = rect(variables, img)

        if variant == "bf16":
            feats = jax.jit(lambda v, x: model.apply(
                v, x, method=type(model).features))
            try:
                stage("ResNet-31 (bf16)", feats, variables, rectified)
            except Exception as e:
                print(f"features method unavailable: {e}")
        else:
            from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
                make_int8_eval_step, quantize_resnet, resnet31_int8_forward,
            )

            qsites = quantize_resnet(variables, rectified,
                                     output_channels=mcfg.hidden_dim)
            f_int8 = jax.jit(lambda q, x: resnet31_int8_forward(
                q, x, output_channels=mcfg.hidden_dim))
            stage("ResNet-31 (int8)", f_int8, qsites, rectified, peak="int8")

        dec = jax.jit(lambda v, x, o, s, i: model.apply(
            v, x, o, s, i, method=type(model).decode_from_columns))
        cols = jnp.asarray(
            rng.standard_normal((B, 26, mcfg.hidden_dim)).astype(np.float32))
        stage(f"encoder+decode ({variant})", dec, variables, cols,
              overlap, scene, ious, peak=peak)

    # train step (bf16)
    model = build_model(cfg.model)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        img, text[:, :-1], overlap, scene, ious, train=True)
    tx = make_optimizer(dataclasses.replace(cfg.train))
    batch = {"image": img, "text": text, "overlap": overlap,
             "scene": scene, "ious": ious}
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, donate=False)
    stage("train fwd+bwd+opt (bf16)", step, state, batch,
          jax.random.PRNGKey(0), iters=10)

    print("\n| phase | GFLOP | ms | TF/s | % of measured peak |")
    print("|---|---|---|---|---|")
    for name, gf, ms, tf, mfu in rows:
        print(f"| {name} | {gf:.1f} | {ms:.2f} | {tf:.1f} | {mfu:.0f}% |")
    print(f"\nmeasured peaks: bf16 {peaks['bf16']:.1f} TF/s, "
          f"int8 {peaks['int8']:.1f} TF/s")


if __name__ == "__main__":
    main()
