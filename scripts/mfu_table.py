"""Per-phase MFU accounting (VERDICT r2 #7): FLOPs, measured ms, achieved
TF/s vs the chip's peak — turns every "roofline" claim into arithmetic.

Usage: python scripts/mfu_table.py

Methodology (the hard part on a tunneled 1-core host):
  * Per-call host overhead (pytree flatten + tunnel dispatch) is 10-30 ms —
    larger than most stages — and back-to-back *independent* enqueues are
    not reliably serialized by this runtime (a 71.7 ms train step "measures"
    4.5 ms that way).  So every stage is timed as ONE jit program that runs
    the stage body K times inside lax.fori_loop with an explicit data
    dependence between iterations (x' = x + eps*mean(out) — cannot be
    hoisted or DCE'd), and the per-stage time is the slope between two trip
    counts: (t_K2 - t_K1) / (K2 - K1).  The fixed per-call cost cancels
    exactly.
  * FLOPs come from XLA cost analysis of the single-call program (loop
    programs under-count).
  * Denominators: v5e datasheet peaks (bf16 197 / int8 394 TF/s).  Convs
    reach >60% of datasheet here, so the datasheet is the honest anchor;
    stages far below it are small-shape/latency-bound, not evidence of a
    throttled chip.
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

B = int(os.environ.get("MFU_B", "192"))  # small B for CPU smoke tests
K1 = int(os.environ.get("MFU_K1", "4"))
K2 = int(os.environ.get("MFU_K2", "24"))
PEAKS = {"bf16": 197.0, "int8": 394.0}  # v5e datasheet
cfg = Config()


def flops_of(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def chained_time_ms(make_loop, reps=3):
    """ms per body iteration via the two-trip-count slope."""
    from multimodal_scene_text_recognition_tpu.utils.timing import slope_ms

    return slope_ms(make_loop, K1, K2, reps=reps)


def couple(x, out):
    """Data dependence that cannot be folded away or hoisted."""
    return x + (jnp.mean(out.astype(jnp.float32)) * 1e-20).astype(x.dtype)


rows = []
ONLY = os.environ.get("MFU_ONLY", "")  # substring filter for partial reruns


def fused_decode_flops(b, t=25, layers=6, e=256, mem_t=26, ff=2048, c=97):
    """Analytic FLOPs of the fused whole-decode Pallas kernel: XLA's cost
    analysis cannot see inside a custom call, so the kernel's matmuls are
    counted by hand (qkv/out/cross/ff projections per layer per step +
    cached self-attention + head)."""
    per_layer_step = 2 * b * e * (3 * e) + 2 * b * e * e \
        + (2 * b * e * e * 2 + 4 * b * mem_t * e) + 4 * b * e * ff
    self_attn = 4 * b * (t / 2) * e * layers  # average cache length t/2
    head = 2 * b * e * c
    return t * (layers * per_layer_step + self_attn + head)


def stage(name, body_fn, x0, flops_fn=None, flops_args=None, peak="bf16",
          extra_flops=0.0, consts=()):
    """body_fn: (x, *consts) -> (out, x_next); timed chained, FLOPs from a
    single call.  ``consts`` (params/qsites) ride as jit ARGUMENTS — a
    closure capture would embed them as HLO literal constants (~300 MB),
    which the axon remote-compile endpoint rejects with HTTP 413."""
    if ONLY and ONLY not in name:
        return

    def make_loop(k):
        @jax.jit
        def loop(x0, consts):
            def body(i, x):
                _, x_next = body_fn(x, *consts)
                return x_next

            return jnp.sum(jax.lax.fori_loop(0, k, body, x0)
                           .astype(jnp.float32))

        return lambda: loop(x0, consts)

    ms = chained_time_ms(make_loop)
    fl = flops_of(flops_fn, *flops_args) if flops_fn is not None else 0.0
    fl += extra_flops
    tf = fl / (ms * 1e-3) / 1e12
    mfu = 100.0 * tf / PEAKS[peak]
    rows.append((name, fl / 1e9, ms, tf, mfu, peak))
    print(f"{name}: {fl/1e9:.1f} GFLOP, {ms:.2f} ms, "
          f"{tf:.1f} TF/s ({mfu:.0f}% of {peak} datasheet peak)", flush=True)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((B, 32, 100, 1), dtype=np.float32))
    overlap = jnp.zeros((B, 15), jnp.int32)
    scene = jnp.zeros((B, 52), jnp.int32)
    ious = jnp.full((B, 52), -1000.0, jnp.float32)
    text = jnp.zeros((B, 27), jnp.int32)

    mcfg = dataclasses.replace(cfg.model, decode_fused=True)
    model = build_model(mcfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        img, text[:, :-1], overlap, scene, ious, train=True)

    # ---- TPS rectify (bf16 convs inside) --------------------------------
    def tps_body(x, v):
        out = model.apply(v, x, method=type(model).rectify)
        # output is a sampled image in [0,1] with the input's shape: feed it
        # straight back (keeps the loc-net input distribution realistic)
        return out, out

    tps_flops = jax.jit(
        lambda v, x: model.apply(v, x, method=type(model).rectify))
    stage("TPS rectify", tps_body, img, consts=(variables,),
          flops_fn=tps_flops, flops_args=(variables, img))

    rectified = tps_flops(variables, img)

    # ---- ResNet-31 backbone, bf16 ---------------------------------------
    def feats_fn(v, x):
        return model.apply(v, x, method=type(model).features)

    def resnet_body(x, v):
        out = feats_fn(v, x)
        return out, couple(x, out)

    stage("ResNet-31 bf16", resnet_body, rectified, consts=(variables,),
          flops_fn=jax.jit(feats_fn), flops_args=(variables, rectified))

    # ---- ResNet-31 backbone, int8 PTQ -----------------------------------
    from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
        quantize_resnet, resnet31_int8_forward,
    )

    qsites = quantize_resnet(variables, rectified,
                             output_channels=mcfg.hidden_dim)

    def resnet8_body(x, q):
        out = resnet31_int8_forward(q, x,
                                    output_channels=mcfg.hidden_dim)
        return out, couple(x, out)

    stage("ResNet-31 int8", resnet8_body, rectified, peak="int8",
          consts=(qsites,),
          flops_fn=jax.jit(lambda q, x: resnet31_int8_forward(
              q, x, output_channels=mcfg.hidden_dim)),
          flops_args=(qsites, rectified))

    # ---- encoder (6L TF, d=512), bf16 and int8 --------------------------
    cols = feats_fn(variables, rectified)  # already [B, W', H] f32

    for variant, emcfg in (
        ("bf16", mcfg),
        ("int8", dataclasses.replace(mcfg, encoder_int8=True)),
    ):
        emodel = build_model(emcfg)

        def enc_fn(v, c, _m=emodel):
            def f(m, c, train):
                return m.encoder(c, semantics=None, train=train)

            return _m.apply(v, c, train=False, method=f)

        def enc_body(x, v, _fn=enc_fn):
            out = _fn(v, x)
            return out, couple(x, out)

        stage(f"encoder {variant}", enc_body, cols, consts=(variables,),
              peak="int8" if variant == "int8" else "bf16",
              flops_fn=jax.jit(enc_fn), flops_args=(variables, cols))

    # ---- fused whole-decode kernel (25 fixed steps), bf16 and int8 ------
    enc_out = enc_fn(variables, cols)

    for variant, dmcfg in (
        ("bf16", mcfg),
        ("int8", dataclasses.replace(mcfg, decode_int8=True)),
    ):
        dmodel = build_model(dmcfg)

        def dec_fn(v, e, _m=dmodel):
            def f(m, e, train):
                return m.decoder(e, None, None, train=train)

            return _m.apply(v, e, train=False, method=f)

        def dec_body(x, v, _fn=dec_fn):
            out = _fn(v, x)
            return out, couple(x, out)

        # XLA's cost analysis cannot see inside the Pallas custom call, so
        # the kernel's matmul FLOPs are added analytically on top of what
        # XLA counts for the surrounding ops (hid_to_emb, log-softmax, ...).
        stage(f"fused decode 25-step {variant}", dec_body, enc_out,
              consts=(variables,),
              peak="int8" if variant == "int8" else "bf16",
              flops_fn=jax.jit(dec_fn), flops_args=(variables, enc_out),
              extra_flops=fused_decode_flops(B))

    # ---- train step (fwd+bwd+opt), chained through the state ------------
    tx = make_optimizer(cfg.train)
    batch = {"image": img, "text": text, "overlap": overlap,
             "scene": scene, "ious": ious}
    state0 = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    raw_step = make_train_step(model, tx, donate=False, jit_compile=False)

    def make_train_loop(k):
        @jax.jit
        def loop(state, batch):
            def body(st, i):
                st2, _ = raw_step(st, batch, jax.random.fold_in(
                    jax.random.PRNGKey(0), i))
                return st2, ()

            st, _ = jax.lax.scan(body, state, jnp.arange(k))
            # Returning only st.step lets XLA DCE the entire grad+update
            # computation (measured 0.39 ms for a ~72 ms step).  Reduce over
            # every param leaf so nothing is dead.
            return jax.tree_util.tree_reduce(
                lambda a, leaf: a + jnp.sum(leaf.astype(jnp.float32)),
                st.params, jnp.float32(0.0)) + st.step

        return lambda: loop(state0, batch)

    ms = chained_time_ms(make_train_loop)
    fl = flops_of(jax.jit(lambda s, b: raw_step(s, b, jax.random.PRNGKey(0))),
                  state0, batch)
    tf = fl / (ms * 1e-3) / 1e12
    rows.append(("train fwd+bwd+opt", fl / 1e9, ms, tf,
                 100.0 * tf / PEAKS["bf16"], "bf16"))
    print(f"train fwd+bwd+opt: {fl/1e9:.1f} GFLOP, {ms:.2f} ms, "
          f"{tf:.1f} TF/s ({100*tf/PEAKS['bf16']:.0f}% of bf16 peak)",
          flush=True)

    print("\n| phase | GFLOP | ms | TF/s | MFU (datasheet) |")
    print("|---|---|---|---|---|")
    for name, gf, ms, tf, mfu, peak in rows:
        print(f"| {name} | {gf:.1f} | {ms:.2f} | {tf:.1f} | "
              f"{mfu:.0f}% of {peak} |")


if __name__ == "__main__":
    main()
