"""Where does the train step's non-MXU time go?  (VERDICT r3 #6)

Round 3 measured the full train step at 45% MFU vs the backbone's 80% and
asserted — from arithmetic alone — that BN/reduction chains in the backward
pass plus small decoder matmuls bound it.  This script replaces the
arithmetic with measurements:

  1. decomposes the step into slope-timed phases, each with its own XLA
     cost analysis: fwd loss / fwd+bwd grad / optimizer update, and then
     phase-level fwd+bwd programs (TPS+backbone, encoder, decoder+loss) so
     the backward cost of each stage is measured, not inferred;
  2. attempts a jax.profiler device trace (committed under docs/ when the
     tunneled runtime supports it — the decomposition stands either way);
  3. A/Bs one concrete fix: ``model.remat=True`` (rematerialise the conv
     backbone in backward: trades HBM activation traffic for recompute).

Methodology identical to scripts/mfu_table.py: every number is the slope
of ONE jit program running the body K1/K2 times in a fori_loop with a data
dependence, so per-call dispatch cancels.  Run on the real chip:

    python scripts/profile_train_phases.py
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_scene_text_recognition_tpu.core.config import (
    ModelConfig,
    TrainConfig,
)
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.train.state import (
    create_train_state,
    make_optimizer,
)
from multimodal_scene_text_recognition_tpu.train.steps import (
    cross_entropy,
    make_train_step,
)
from multimodal_scene_text_recognition_tpu.utils.timing import slope_ms

B = int(os.environ.get("MFU_B", "192"))
K1 = int(os.environ.get("MFU_K1", "2"))
K2 = int(os.environ.get("MFU_K2", "8"))
PEAK_BF16 = 197.0  # v5e datasheet TF/s


def flops_of(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def timed(name, make_loop, flops=None):
    ms = slope_ms(make_loop, K1, K2)
    if ms is None:
        print(f"{name}: slope non-monotone — null", flush=True)
        return None
    line = f"{name}: {ms:8.2f} ms"
    if flops:
        tf = flops / (ms * 1e-3) / 1e12
        line += (f", {flops / 1e9:8.1f} GFLOP, {tf:6.1f} TF/s "
                 f"({100 * tf / PEAK_BF16:.0f}% of bf16 peak)")
    print(line, flush=True)
    return ms


def grad_loop(grad_fn, params, consts):
    """fori_loop over a grad program with a param perturbation as the data
    dependence (grads feed back into params, so nothing can be hoisted)."""

    def make_loop(k):
        @jax.jit
        def loop(params, consts):
            def body(i, p):
                g = grad_fn(p, *consts)
                # microscopic coupled update: keeps shapes/dtypes identical
                return jax.tree.map(
                    lambda a, b: a + 1e-30 * b.astype(a.dtype), p, g)

            out = jax.lax.fori_loop(0, k, body, params)
            # consume EVERY leaf — reducing only one would let XLA
            # dead-code-eliminate the rest of the update chain
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(out))

        return lambda: loop(params, consts)

    return make_loop


def main():
    # JAX_PLATFORMS alone can't override the axon plugin (registered at
    # interpreter start); force via config before the backend initializes
    if os.environ.get("MFU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MFU_PLATFORM"])
    print(f"devices: {jax.devices()}", flush=True)
    rng_np = np.random.default_rng(0)
    img = jnp.asarray(rng_np.random((B, 32, 100, 1), dtype=np.float32))
    overlap = jnp.zeros((B, 15), jnp.int32)
    scene = jnp.zeros((B, 52), jnp.int32)
    ious = jnp.full((B, 52), -1000.0, jnp.float32)
    text = jnp.asarray(rng_np.integers(0, 97, (B, 27)).astype(np.int32))
    batch = {"image": img, "text": text, "overlap": overlap,
             "scene": scene, "ious": ious}
    rng = jax.random.PRNGKey(0)

    results = {}
    for variant in ("baseline", "remat"):
        mcfg = ModelConfig(remat=(variant == "remat"))
        model = build_model(mcfg)
        variables = model.init(
            {"params": rng, "dropout": rng},
            img, text[:, :-1], overlap, scene, ious, train=True)
        params, bstats = variables["params"], variables["batch_stats"]

        def loss_fn(params, bstats, batch):
            logits, _ = model.apply(
                {"params": params, "batch_stats": bstats},
                batch["image"], batch["text"][:, :-1], batch["overlap"],
                batch["scene"], batch["ious"], train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            return cross_entropy(logits, batch["text"][:, 1:])

        print(f"\n=== {variant} (B={B}) ===", flush=True)

        # --- full step / fwd / fwd+bwd ---------------------------------
        tx = make_optimizer(TrainConfig())
        state = create_train_state(model, tx, batch, rng)
        raw_step = make_train_step(model, tx, donate=False,
                                   jit_compile=False)

        def step_loop(k):
            @jax.jit
            def loop(state, batch, rng):
                def body(st, _):
                    st2, m = raw_step(st, batch, rng)
                    return st2, m["loss"]

                _, losses = jax.lax.scan(body, state, None, length=k)
                return losses[-1]

            return lambda: loop(state, batch, rng)

        step_flops = flops_of(
            jax.jit(raw_step), state, batch, rng)
        results[variant, "full"] = timed(
            "full train step  ", step_loop, step_flops)

        def fwd_only(p, bs, b):
            return loss_fn(p, bs, b)

        fwd_flops = flops_of(jax.jit(fwd_only), params, bstats, batch)

        def fwd_loop(k):
            @jax.jit
            def loop(params, consts):
                bstats, batch = consts

                def body(i, carry):
                    acc, img = carry
                    b = dict(batch, image=img)
                    l = fwd_only(params, bstats, b)
                    # loss feeds back into the image: a sequential data
                    # dependence so XLA cannot hoist the (otherwise
                    # loop-invariant) forward pass out of the fori_loop
                    return acc + l, img + 1e-30 * l.astype(img.dtype)

                acc, img = jax.lax.fori_loop(
                    0, k, body, (jnp.float32(0), batch["image"]))
                return acc + jnp.sum(img)

            return lambda: loop(params, (bstats, batch))

        results[variant, "fwd"] = timed(
            "fwd loss only    ", fwd_loop, fwd_flops)

        grad_fn = jax.grad(loss_fn)
        grad_flops = flops_of(jax.jit(grad_fn), params, bstats, batch)
        results[variant, "grad"] = timed(
            "fwd+bwd grad     ", grad_loop(grad_fn, params, (bstats, batch)),
            grad_flops)

        # --- optimizer update alone -------------------------------------
        grads = jax.jit(grad_fn)(params, bstats, batch)

        def opt_loop(k):
            @jax.jit
            def loop(params, consts):
                opt_state, grads = consts

                def body(i, p):
                    upd, _ = tx.update(grads, opt_state, p)
                    import optax

                    return optax.apply_updates(p, upd)

                out = jax.lax.fori_loop(0, k, body, params)
                return sum(jnp.sum(x.astype(jnp.float32))
                           for x in jax.tree.leaves(out))

            return lambda: loop(params, (state.opt_state, grads))

        results[variant, "opt"] = timed("optimizer update ", opt_loop)

        if variant == "remat":
            continue  # phase decomposition only needed once

        # --- phase-level fwd+bwd -----------------------------------------
        # TPS + ResNet backbone (everything up to the column features),
        # train-mode BN so the batch-stat reductions are in the program
        from multimodal_scene_text_recognition_tpu.models.resnet import (
            to_column_sequence,
        )

        def backbone_fwd(m, image, train):
            rect = m.transformation(image, train=train)
            feats = m.feature_extractor(rect, train)
            return to_column_sequence(feats).astype(jnp.float32)

        def feat_loss(params, bstats, b):
            out, _ = model.apply(
                {"params": params, "batch_stats": bstats}, b["image"],
                train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
                method=backbone_fwd)
            return jnp.mean(out.astype(jnp.float32))

        try:
            g = jax.grad(feat_loss)
            fl = flops_of(jax.jit(g), params, bstats, batch)
            results["phase", "backbone"] = timed(
                "TPS+ResNet fwd+bwd", grad_loop(g, params, (bstats, batch)),
                fl)
        except Exception as e:
            print(f"backbone phase failed: {e}", flush=True)

        # encoder fwd+bwd over fixed columns
        try:
            cols, _ = model.apply(
                {"params": params, "batch_stats": bstats}, img,
                train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
                method=backbone_fwd)
            cols = jax.lax.stop_gradient(cols)

            def enc_loss(params, bstats, cols):
                def f(m, c, train):
                    return m.encoder(c, semantics=None, train=train)

                out = model.apply(
                    {"params": params, "batch_stats": bstats}, cols,
                    train=True, rngs={"dropout": rng}, method=f)
                return jnp.mean(out.astype(jnp.float32))

            g = jax.grad(enc_loss)
            fl = flops_of(jax.jit(g), params, bstats, cols)
            results["phase", "encoder"] = timed(
                "encoder fwd+bwd   ", grad_loop(g, params, (bstats, cols)),
                fl)

            # decoder (+ loss) fwd+bwd over fixed encoder output
            def enc_fwd(m, c, train):
                return m.encoder(c, semantics=None, train=train)

            enc_out = jax.lax.stop_gradient(model.apply(
                {"params": params, "batch_stats": bstats}, cols,
                train=True, rngs={"dropout": rng}, method=enc_fwd))

            def dec_loss(params, bstats, enc_out, text):
                def f(m, mem, text, train):
                    return m.decoder(mem, text, semantics=None, train=train)

                logits = model.apply(
                    {"params": params, "batch_stats": bstats}, enc_out,
                    text[:, :-1], train=True, rngs={"dropout": rng},
                    method=f)
                return cross_entropy(logits, text[:, 1:])

            g = jax.grad(dec_loss)
            fl = flops_of(jax.jit(g), params, bstats, enc_out, text)
            results["phase", "decoder"] = timed(
                "decoder fwd+bwd   ",
                grad_loop(g, params, (bstats, enc_out, text)), fl)
        except Exception as e:
            print(f"encoder/decoder phase failed: {e}", flush=True)

    # --- summary ---------------------------------------------------------
    full = results.get(("baseline", "full"))
    fwd = results.get(("baseline", "fwd"))
    grad = results.get(("baseline", "grad"))
    if full and fwd and grad:
        print(f"\nbwd-only ≈ {grad - fwd:.2f} ms "
              f"({100 * (grad - fwd) / full:.0f}% of step); "
              f"opt+stats ≈ {full - grad:.2f} ms", flush=True)
    rfull = results.get(("remat", "full"))
    if full and rfull:
        print(f"remat A/B: {full:.2f} -> {rfull:.2f} ms "
              f"({'+' if rfull > full else ''}{rfull - full:.2f} ms)",
              flush=True)

    # --- jax.profiler trace (best effort over the tunnel) -----------------
    trace_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "trace_train")
    try:
        mcfg = ModelConfig()
        model = build_model(mcfg)
        variables = model.init(
            {"params": rng, "dropout": rng},
            img, text[:, :-1], overlap, scene, ious, train=True)
        tx = make_optimizer(TrainConfig())
        state = create_train_state(model, tx, batch, rng)
        step = make_train_step(model, tx, donate=False)
        state, m = step(state, batch, rng)  # compile outside the trace
        np.asarray(m["loss"])
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                state, m = step(state, batch, rng)
            np.asarray(m["loss"])
        print(f"profiler trace written to {trace_dir}", flush=True)
    except Exception as e:
        print(f"jax.profiler trace unavailable over this runtime: {e}",
              flush=True)


if __name__ == "__main__":
    main()
