"""Benchmark harness: word crops/sec/chip at B=192 on the flagship model.

Prints the driver-contract JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
to stdout — and prints it INCREMENTALLY: the headline line is emitted as
soon as the decode stage finishes, then re-emitted (enriched) after every
completed stage, so a timeout can never zero the round (round-3
postmortem: rc=124 with `parsed: null` lost every number that had already
been measured).  The last line on stdout is always the most complete one.

Self-diagnosis contract (VERDICT round 4 #1):
  * the run opens with a ``device_health`` stage — a known-FLOPs bf16
    matmul chain, slope-timed — publishing ``device_tfs`` and
    ``device_health_pct`` (vs the 197 TF/s v5e bf16 datasheet peak) so a
    degraded shared device is *labeled in the artifact* instead of
    masquerading as a code regression (round 4's 2,583 crops/s headline
    was unexplainable for exactly this reason);
  * measurement costs ADAPT to that number: on a degraded device or
    tunnel, slope pairs drop 5→3, trip counts (6,16)→(4,10) and the
    per-call latency loops shrink, so the stage plan still completes;
  * stages are ordered so the cheap, high-value fields always land:
    the CPU denominator (cached in the committed BASELINE_LOCAL.json) is
    read FIRST, and train / p50_b{1,8,32} / int8 run before the long
    accuracy sweep.  Target: no null field, ever.

Robustness contract (VERDICT round 3 #1-3): global wall-clock budget
(env BENCH_BUDGET_S) enforced by a watchdog that emits the final JSON and
exits rc=0; every stage budget-gated + exception-isolated; throughputs
slope-timed over varied device-resident batches (utils/timing.py) and a
non-monotone slope is retried then reported null with a reason, never
published as a negative rate.

Headline metric (BASELINE.json): greedy-decode throughput (word crops/sec/
chip) at batch 192 on the full TPS + ResNet-31 + 6L TF encoder + 6L TF
decoder pipeline.  ``vs_baseline`` is the ratio against a CPU run of the
same program (the reference is a CPU/GPU torch pipeline with no published
numbers — BASELINE.md; the north star is >=10x CPU crops/sec).  The CPU
denominator is measured once and cached in BASELINE_LOCAL.json.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from multimodal_scene_text_recognition_tpu.core.config import ModelConfig, TrainConfig
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.train.state import (
    create_train_state,
    make_optimizer,
)
from multimodal_scene_text_recognition_tpu.train.steps import make_train_step
from multimodal_scene_text_recognition_tpu.utils.timing import roundrobin, slope_ms

B = 192
CACHE = os.path.join(REPO, "BASELINE_LOCAL.json")
# CPU baseline methodology tag: per-call back-to-back averaging (dispatch
# cost is negligible on CPU, and the slope path would run ~88 full CPU
# decodes — minutes each uncached; ADVICE r3 #1).  Bump when the CPU
# measurement methodology changes so a stale cached denominator re-measures.
CPU_METHODOLOGY = "percall-avg"
# Persistent XLA/Mosaic compilation cache.  VERDICT r4 #2: the cache lived
# in gitignored results/ and therefore NEVER survived to a driver session
# (two rounds of null fused-beam numbers).  It now lives in the TRACKED
# assets/xla_cache/ — the warm entries (including the ~13-min-compile
# fused whole-beam Mosaic programs and every jit_loop slope program) are
# committed to git, so a bare driver clone starts warm.
XLA_CACHE_DIR = os.path.join(REPO, "assets", "xla_cache")
FUSED_BEAM_MARKER = os.path.join(XLA_CACHE_DIR, "FUSED_BEAM_WARM.json")
# bf16 peak of one TPU v5e (v5 lite) chip — the datasheet number the
# device_health stage reports against.
V5E_PEAK_TFS = 197.0

T0 = time.time()
# 25 min ceiling; a warm-cache run (committed assets/xla_cache) needs far
# less.  Even if a driver-side timeout is tighter, incremental emission
# means every completed stage is already on stdout.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))

RESULT = {
    "metric": "greedy-decode word crops/sec/chip @ B=192 "
              "(TPS+ResNet31+TF6+TF6, fused Pallas whole-decode kernel, "
              "slope-timed over varied batches)",
    "value": None,
    "unit": "crops/sec",
    "vs_baseline": None,
    "extra": {"stages": [], "skipped": [], "failed": []},
}
_EMIT_LOCK = threading.Lock()

# Measurement-cost knobs, tightened by ``apply_degradation`` when the
# device-health / dispatch probes say the session is degraded (VERDICT r4
# #1b): fewer slope pairs, lower trip counts, shorter latency loops.
TUNE = {
    "pairs": 5,          # slope pair count (utils/timing.py)
    "trips": (6, 16),    # roundrobin slope trip counts
    "train_trips": (2, 6),
    "lat_iters": 10,     # per-call latency loop length
    "degraded": False,
}


def elapsed() -> float:
    return time.time() - T0


def remaining() -> float:
    return BUDGET_S - elapsed()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit():
    """Print the current result JSON line to stdout (the driver parses the
    last such line); called after every completed stage."""
    with _EMIT_LOCK:
        RESULT["extra"]["elapsed_s"] = round(elapsed(), 1)
        print(json.dumps(RESULT), flush=True)


def start_watchdog(margin_s: float = 20.0):
    """Emit the final JSON and exit 0 when the budget runs out — the
    ultimate guard against a driver-side `timeout` producing rc=124 with
    nothing parsed."""

    def run():
        while remaining() > margin_s:
            time.sleep(min(5.0, max(0.5, remaining() - margin_s)))
        log(f"watchdog: budget ({BUDGET_S:.0f}s) exhausted — emitting final "
            "JSON and exiting 0")
        emit()
        os._exit(0)

    threading.Thread(target=run, daemon=True).start()


def stage(name: str, fn, min_budget_s: float):
    """Run one bench stage: budget-gated, exception-isolated, followed by a
    JSON re-emit so partial progress is never lost."""
    if remaining() < min_budget_s:
        log(f"stage {name}: SKIPPED ({remaining():.0f}s left < "
            f"{min_budget_s:.0f}s estimated)")
        RESULT["extra"]["skipped"].append(
            f"{name} (needed ~{min_budget_s:.0f}s, had {remaining():.0f}s)")
        emit()
        return None
    t0 = time.time()
    try:
        out = fn()
        RESULT["extra"]["stages"].append(
            {"name": name, "s": round(time.time() - t0, 1)})
        emit()
        return out
    except Exception as e:  # noqa: BLE001 — a stage must never kill the run
        log(f"stage {name} FAILED after {time.time() - t0:.0f}s: {e!r}")
        RESULT["extra"]["failed"].append(f"{name}: {e}")
        emit()
        return None


def enable_compilation_cache():
    os.makedirs(XLA_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", XLA_CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def apply_degradation(reason: str):
    """Cut measurement costs so the stage plan completes on a degraded
    session (the numbers stay honest — slope pairs/trips shrink, the
    median-of-pairs methodology is unchanged)."""
    if TUNE["degraded"]:
        return
    TUNE.update(pairs=3, trips=(4, 10), train_trips=(2, 5), lat_iters=4,
                degraded=True)
    RESULT["extra"]["degraded"] = True
    RESULT["extra"]["degraded_reason"] = reason
    log(f"DEGRADED session ({reason}) — slope pairs 5->3, trips (6,16)->"
        "(4,10), latency loops shrunk")


def _fused_beam_cfg(cfg: ModelConfig) -> ModelConfig:
    return dataclasses.replace(cfg, decode_early_stop=True,
                               decode_beam_fused=True)


def _fused_beam_env(cfg: ModelConfig):
    """Fingerprint for the fused-beam warm marker.

    The persistent cache is keyed on the compiled program, so the marker
    must capture everything that changes it: jax AND jaxlib versions,
    device kind, the kernel source itself, and the model config the bench
    builds (ADVICE r3 #2/#3) — otherwise an edit invalidates the cache
    entry while a stale marker still promises a free compile.
    """
    import jaxlib

    kernel = os.path.join(REPO, "multimodal_scene_text_recognition_tpu",
                          "ops", "fused_beam.py")
    with open(kernel, "rb") as f:
        ksha = hashlib.sha256(f.read()).hexdigest()[:16]
    return {
        "jax": jax.__version__,
        "jaxlib": jaxlib.version.__version__,
        "device": jax.devices()[0].device_kind,
        "kernel_sha": ksha,
        "cfg": repr(_fused_beam_cfg(cfg)),
        "batch": B,
        "beam_k": 5,
    }


def fused_beam_state(cfg: ModelConfig) -> str:
    """'forced' | 'warm' | 'cold' | 'off'."""
    flag = os.environ.get("BENCH_FUSED_BEAM")
    if flag == "1":
        return "forced"
    if flag == "0":
        return "off"
    try:
        with open(FUSED_BEAM_MARKER) as f:
            return "warm" if json.load(f) == _fused_beam_env(cfg) else "cold"
    except Exception:
        return "cold"


def example_batch(cfg: ModelConfig, batch=B):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(
            rng.random((batch, cfg.img_h, cfg.img_w, 1), dtype=np.float32)),
        "text": jnp.asarray(
            rng.integers(0, cfg.num_classes,
                         (batch, cfg.max_text_length + 2)).astype(np.int32)),
        "overlap": jnp.asarray(
            rng.integers(0, 100, (batch, cfg.max_overlap_objs)).astype(np.int32)),
        "scene": jnp.asarray(
            rng.integers(0, 100, (batch, cfg.max_scene_objs)).astype(np.int32)),
        "ious": jnp.full((batch, cfg.max_scene_objs), -1000.0, jnp.float32),
    }


def build(cfg: ModelConfig):
    model = build_model(cfg)
    batch = example_batch(cfg)
    # init at a tiny batch — param/batch_stats shapes don't depend on B and
    # the B=192 init program is a ~3 min compile the bench never reuses
    small = example_batch(cfg, batch=2)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        small["image"], small["text"][:, :-1], small["overlap"],
        small["scene"], small["ious"], train=True)
    return model, variables, batch


def measure_dispatch_ms(n: int = 12) -> float:
    """Median per-call host cost of a trivial jitted op: pytree flatten +
    tunnel round trip + result fetch.  ~1-30 ms on a healthy session; the
    round-3 failure session measured ~6,900 ms.  Everything per-call in
    this harness is interpreted against this number."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((), jnp.float32)
    np.asarray(f(x))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def measure_device_health() -> dict:
    """Achieved bf16 matmul TF/s on a fixed known-FLOPs chain (VERDICT r4
    #1a).  8192^3 bf16 matmuls (1.1 TFLOP each) in a fori_loop with a
    data dependence between iterations (``a += out * 1e-9`` defeats LICM);
    slope-timed so tunnel dispatch cancels.  On a healthy v5e this lands
    near the 197 TF/s datasheet peak; a shared/contended device shows up
    directly as a low ``device_health_pct`` — which is the label that
    separates "repo regressed" from "device degraded" in the artifact.
    """
    n = 8192
    flops_per_iter = 2 * n ** 3
    key = jax.random.PRNGKey(0)
    a0 = jax.random.normal(key, (n, n), jnp.bfloat16)
    b0 = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

    def make_fn(k):
        @jax.jit
        def loop(a, b):
            def body(_, a):
                out = jnp.dot(a, b, preferred_element_type=jnp.bfloat16)
                # loop-carried dependence; *1e-9 is below bf16 epsilon for
                # O(100)-magnitude outputs so the chain stays finite
                return a + out * jnp.bfloat16(1e-9)

            return jnp.sum(jax.lax.fori_loop(0, k, body, a).astype(
                jnp.float32))

        return lambda: loop(a0, b0)

    ms = slope_ms(make_fn, 8, 24, pairs=3)
    if ms is None:
        return {"device_tfs": None, "device_health_pct": None}
    tfs = flops_per_iter / (ms * 1e-3) / 1e12
    return {"device_tfs": round(tfs, 1),
            "device_health_pct": round(100.0 * tfs / V5E_PEAK_TFS, 1)}


def _stacked_noise(batch, nK=8, seed=1):
    rng = np.random.default_rng(seed)
    return jax.device_put({
        "image": rng.random((nK,) + batch["image"].shape, dtype=np.float32),
        "overlap": rng.integers(
            0, 100, (nK,) + batch["overlap"].shape).astype(np.int32),
        "scene": rng.integers(
            0, 100, (nK,) + batch["scene"].shape).astype(np.int32),
        "ious": np.broadcast_to(
            np.asarray(batch["ious"]), (nK,) + batch["ious"].shape).copy(),
    })


def make_decode(model):
    # params go in as arguments, not closure constants — captured constants
    # bloat the serialized HLO by the full model size
    @jax.jit
    def decode(variables, image, overlap, scene, ious):
        logits = model.apply(variables, image, None, overlap, scene, ious,
                             train=False)
        return jnp.argmax(logits, axis=-1)

    return decode


def make_packed_decode(model, variables):
    """Greedy decode whose params ride as one buffer per dtype instead of
    a ~500-leaf pytree (utils/packing.py).  Per-call dispatch cost over
    the tunnel is per argument buffer (~10-15 ms each), so the raw-pytree
    per-call latency is ~6-8 s regardless of batch size — round 4's
    unexplained "p50 7,312 ms vs 74 ms marginal" (VERDICT r4 #5).  The
    packed form is what a latency-sensitive serving process uses
    (eval/serve.Recognizer packs by default), so p50 metrics are measured
    through it; the raw form is kept as a labeled comparison field."""
    from multimodal_scene_text_recognition_tpu.utils.packing import (
        PackedTree,
    )

    pt = PackedTree(variables)
    packed = pt.pack(variables)

    @jax.jit
    def decode(pk, image, overlap, scene, ious):
        logits = model.apply(pt.unpack(pk), image, None, overlap, scene,
                             ious, train=False)
        return jnp.argmax(logits, axis=-1)

    return decode, packed


def bench_decode(model, variables, batch, dispatch_ms, lat_iters=None,
                 use_slope=True):
    """Headline decode: slope-timed throughput + per-call latency.

    Throughput: one jit program decodes K varied batches round-robin from a
    device-resident stack; marginal ms/batch is the slope between two trip
    counts — per-dispatch host cost cancels exactly and varied inputs
    defeat identical-enqueue dedup.  Latency: per-call with the result
    materialised on host (the serving-relevant number).

    p50-anomaly diagnosis (VERDICT r4 #5): round 4 published p50=7,312 ms
    against a 74 ms marginal batch time with no explanation.  The latency
    loop now (a) re-probes dispatch immediately before timing (the tunnel
    can degrade mid-run), (b) drains the device queue first, and (c) when
    p50 > 10x the slope's marginal time, re-times after a settle and
    publishes both, plus the ``p50_over_marginal`` ratio — so a queueing/
    contention artifact is labeled rather than mysterious.
    """
    if lat_iters is None:
        lat_iters = TUNE["lat_iters"]
    decode = make_decode(model)
    args = (variables, batch["image"], batch["overlap"], batch["scene"],
            batch["ious"])
    batch_size = batch["image"].shape[0]
    np.asarray(decode(*args))  # warm/compile

    out = {}

    def time_percall(iters):
        ts = []
        for _ in range(max(iters, 3)):
            t0 = time.perf_counter()
            np.asarray(decode(*args))
            ts.append(time.perf_counter() - t0)
        return np.asarray(ts)

    # (a) dispatch re-probe + (b) queue drain before the latency loop
    dispatch_now = measure_dispatch_ms(n=3)
    out["dispatch_at_decode_ms"] = round(dispatch_now, 2)
    percall = time_percall(lat_iters)
    out["p50_latency_ms"] = float(np.median(percall)) * 1e3
    out["p90_latency_ms"] = float(np.percentile(percall, 90)) * 1e3
    out["latency_host_bound"] = max(dispatch_ms, dispatch_now) > 100.0

    if use_slope:
        nK = 8
        stacked = _stacked_noise(batch)
        k1, k2 = TUNE["trips"]
        ms = slope_ms(roundrobin(
            lambda b, v: decode(v, b["image"], b["overlap"], b["scene"],
                                b["ious"]),
            stacked, nK, consts=(variables,)), k1, k2, pairs=TUNE["pairs"])
        if ms is not None:
            out["crops_per_sec"] = batch_size / (ms / 1e3)
            out["throughput_methodology"] = "slope"
            out["p50_over_marginal"] = round(out["p50_latency_ms"] / ms, 2)
            if out["p50_latency_ms"] - ms > 100.0:
                out["latency_host_bound"] = True
            # (c) anomalous per-call latency vs marginal time: settle the
            # queue and re-time; publish both so the artifact explains
            # itself (a persistent gap = device contention, not the repo)
            if out["p50_latency_ms"] > 10 * ms and dispatch_now < 100.0:
                time.sleep(1.0)
                redo = time_percall(3)
                out["p50_latency_retry_ms"] = float(np.median(redo)) * 1e3
                log(f"p50 anomaly: {out['p50_latency_ms']:.0f} ms vs "
                    f"{ms:.0f} ms marginal (dispatch {dispatch_now:.0f} ms);"
                    f" retry p50 {out['p50_latency_retry_ms']:.0f} ms — "
                    "device queue/contention, not host dispatch")
        else:
            # slope irrecoverably non-monotone: fall back to per-call mean,
            # clearly labelled (never publish garbage, never publish <= 0)
            out["crops_per_sec"] = batch_size / float(np.mean(percall))
            out["throughput_methodology"] = "percall-host-bound"
            log("decode slope non-monotone after retries — falling back to "
                "per-call throughput (host-bound)")
    else:
        out["crops_per_sec"] = batch_size / float(np.mean(percall))
        out["throughput_methodology"] = "percall-avg"
    return out


def bench_train(model, batch, rng_seed=0, state=None):
    """Train-step throughput, slope-timed: one jit program runs k full
    train steps via lax.scan carrying the state, so per-dispatch cost
    cancels in the slope just like the decode bench.  ``state`` reuses an
    already-built train state (skips a ~1 min init over the tunnel)."""
    tcfg = TrainConfig()
    tx = make_optimizer(tcfg)
    rng = jax.random.PRNGKey(rng_seed)
    if state is None:
        state = create_train_state(model, tx, batch, rng)
    raw_step = make_train_step(model, tx, donate=False, jit_compile=False)
    batch_size = batch["image"].shape[0]

    def make_fn(k):
        @jax.jit
        def loop(state, batch, rng):
            def body(st, _):
                st2, metrics = raw_step(st, batch, rng)
                return st2, metrics["loss"]

            st, losses = jax.lax.scan(body, state, None, length=k)
            return losses[-1]

        return lambda: loop(state, batch, rng)

    k1, k2 = TUNE["train_trips"]
    ms = slope_ms(make_fn, k1, k2, pairs=TUNE["pairs"])
    if ms is None:
        return None
    return {"crops_per_sec": batch_size / (ms / 1e3), "step_ms": ms}


def bench_int8(model, variables, batch, calib_batch=None):
    """Slope-timed throughput of the int8-PTQ-backbone pipeline.

    ``calib_batch``: real crops for activation calibration; falls back to
    the bench batch itself (random noise — throughput-only; honest accuracy
    numbers come from :func:`trained_accuracy`)."""
    from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
        make_int8_eval_step,
    )

    step, qsites = make_int8_eval_step(
        model, variables, calib_batch if calib_batch is not None else batch
    )
    bsz = batch["image"].shape[0]
    np.asarray(step(variables, qsites, batch))
    nK = 8
    stacked = _stacked_noise(batch, seed=2)
    k1, k2 = TUNE["trips"]
    ms = slope_ms(roundrobin(lambda b, v, q: step(v, q, b), stacked, nK,
                             consts=(variables, qsites)), k1, k2,
                  pairs=TUNE["pairs"])
    return bsz / (ms / 1e3) if ms is not None else None


def load_real_val(cfg: ModelConfig, n: int = 2048):
    """Cached synthetic val corpus (the trained checkpoint's held-out set);
    None when unavailable (rendering from scratch is seconds, but PIL may
    be absent in a stripped driver image)."""
    try:
        from multimodal_scene_text_recognition_tpu.core.charset import AttnCodec
        from multimodal_scene_text_recognition_tpu.data.synthetic import (
            make_packed_dataset,
        )

        codec = AttnCodec(cfg.chars, cfg.max_text_length)
        val = make_packed_dataset(
            codec, n, seed=TrainConfig().seed + 1,  # the held-out set
            cache_dir=os.path.join(REPO, "results", "synth_cache"),
        )
        return val, codec
    except Exception as e:
        log(f"real val set unavailable: {e}")
        return None, None


TRAINED_CKPT = os.path.join(REPO, "results", "models", "synth_openvocab_xxl")
# git-committed fallback (fp16 params + batch_stats + persisted int8
# scales): the Orbax dir lives outside version control and a disk reset
# between sessions loses it — the bundle keeps trained-model bench metrics
# reproducible from a bare clone (train/checkpoint.save_params_bundle).
TRAINED_BUNDLE = os.path.join(REPO, "assets", "trained",
                              "synth_openvocab_xxl.params.npz")


def restore_trained(cfg: ModelConfig):
    """Restore the trained flagship checkpoint into serving config; None
    when no checkpoint is in the tree."""
    from multimodal_scene_text_recognition_tpu.data.pipeline import (
        device_batch,
        packed_batches,
    )
    from multimodal_scene_text_recognition_tpu.train.checkpoint import (
        restore_checkpoint,
        restore_params_bundle,
    )

    if not os.path.isdir(TRAINED_CKPT) and not os.path.exists(TRAINED_BUNDLE):
        log("no trained checkpoint in tree — skipping trained bench")
        return None
    val, codec = load_real_val(cfg)
    if val is None:
        return None

    # decode_int8 is deliberately OFF: the fused decode kernel is VMEM/
    # latency-bound (16% MFU), so int8's quantize/dequantize overhead makes
    # it *slower* than bf16 at device level (3.21 vs 2.94 ms per 25 steps —
    # scripts/mfu_table.py; the earlier "1.41x" claim was per-call dispatch
    # overhead, not device time).
    mcfg = dataclasses.replace(cfg, decode_fused=True,
                               decode_early_stop=True,
                               encoder_int8=True)
    model = build_model(mcfg)
    batch0 = device_batch(next(iter(packed_batches(val, B, shuffle=False))))

    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(TrainConfig())
    state = create_train_state(model, tx, batch0, rng)
    if os.path.isdir(TRAINED_CKPT):
        state = restore_checkpoint(TRAINED_CKPT, state)
        log(f"trained checkpoint restored (step {int(state.step)})")
    else:
        state = restore_params_bundle(TRAINED_BUNDLE, state)
        log(f"trained params bundle restored (step {int(state.step)}, fp16)")
    variables = state.variables()

    full = [b for b in packed_batches(val, B, shuffle=False)
            if b["image"].shape[0] == B]
    stacked = device_batch({
        k: np.stack([b[k] for b in full])
        for k in ("image", "overlap", "scene", "ious")})

    # int8 serving step: PTQ backbone spliced + int8 encoder matmuls.
    # Activation scales come from the calibration npz shipped next to the
    # checkpoint when present (scripts/persist_int8_scales.py — serving
    # must not depend on the first batch seen); otherwise calibrate on this
    # real val batch.
    from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
        load_activation_scales,
        make_int8_eval_step,
    )

    scales_path = TRAINED_CKPT + ".scales.npz"
    if not os.path.exists(scales_path):
        scales_path = TRAINED_BUNDLE.replace(".params.npz", ".scales.npz")
    if os.path.exists(scales_path):
        log(f"int8 scales: persisted ({os.path.basename(scales_path)})")
        step, qsites = make_int8_eval_step(
            model, variables, x_absmax=load_activation_scales(scales_path))
    else:
        step, qsites = make_int8_eval_step(model, variables,
                                           calib_batch=batch0)

    return {"model": model, "variables": variables, "val": val,
            "codec": codec, "batch0": batch0, "stacked": stacked,
            "nK": len(full), "step": step, "qsites": qsites,
            "state": state}


def trained_pipelined(cfg: ModelConfig, tr) -> dict:
    """Pipelined int8 serving throughput over varied REAL batches — the
    steady-state rate of a production serving loop with a device-resident
    queue.  Slope-timed; the round-3 per-call 'trained serving' number (a
    dispatch artifact) is gone."""
    step, qsites, variables = tr["step"], tr["qsites"], tr["variables"]
    np.asarray(step(variables, qsites, tr["batch0"]))

    out = {}
    k1, k2 = TUNE["trips"]
    ms = slope_ms(roundrobin(lambda b, v, q: step(v, q, b),
                             tr["stacked"], tr["nK"],
                             consts=(variables, qsites)), k1, k2,
                  pairs=TUNE["pairs"])
    if ms is not None:
        out["trained_pipelined_crops_per_sec"] = round(B / ms * 1e3, 1)
        out["trained_batch_ms_marginal"] = round(ms, 2)
        log(f"pipelined serving: {B / ms * 1e3:.1f} crops/s "
            f"({ms:.2f} ms/batch marginal, varied real batches)")
    else:
        out["trained_pipelined_crops_per_sec"] = None
        log("pipelined serving: slope non-monotone after retries — null")
    return out


def trained_accuracy(cfg: ModelConfig, tr) -> dict:
    """Word accuracy over the val set: int8 pipeline vs float pipeline.

    Runs per-call (the host needs every batch's ids), so under a degraded
    tunnel the sweep shrinks instead of stalling the round."""
    from multimodal_scene_text_recognition_tpu.data.pipeline import (
        device_batch,
        packed_batches,
    )

    step, qsites, variables = tr["step"], tr["qsites"], tr["variables"]
    val, codec = tr["val"], tr["codec"]
    dispatch_ms = RESULT["extra"].get("dispatch_ms", 0.0) or 0.0
    max_batches = 4 if (dispatch_ms > 500 or TUNE["degraded"]) else None
    if max_batches:
        log(f"degraded session — accuracy sweep shrunk to "
            f"{max_batches} batches")

    def accuracy(decode_fn):
        correct = total = nb = 0
        for b in packed_batches(val, B, shuffle=False, drop_last=False):
            dev = device_batch(b)
            ids = np.asarray(decode_fn(dev))
            preds = codec.decode(ids)
            for p, label, ok in zip(preds, b["labels"], b["valid"]
                                    if "valid" in b else [True] * B):
                if not ok:
                    continue
                total += 1
                correct += p == label
            nb += 1
            if max_batches and nb >= max_batches:
                break
        return 100.0 * correct / max(total, 1), total

    out = {}
    acc_int8, n_int8 = accuracy(lambda dev: step(variables, qsites, dev))
    out["trained_val_accuracy_int8"] = round(acc_int8, 2)

    fmodel = build_model(dataclasses.replace(
        cfg, decode_fused=True, decode_early_stop=True))
    fdecode = make_decode(fmodel)
    acc_float, _ = accuracy(lambda dev: fdecode(
        variables, dev["image"].astype(jnp.float32) / 255.0
        if dev["image"].dtype == jnp.uint8 else dev["image"],
        dev["overlap"], dev["scene"], dev["ious"]))
    out["trained_val_accuracy_float"] = round(acc_float, 2)
    out["trained_val_n"] = n_int8
    log(f"val acc int8 {acc_int8:.2f}% vs float {acc_float:.2f}% "
        f"({n_int8} crops)")
    return out


def trained_beam(cfg: ModelConfig, tr) -> dict:
    """Batched beam search k=5 (a BASELINE.json config) on the trained
    checkpoint — slope-timed at the same trip counts as every other
    throughput (round 3 used (2,6) and published a negative rate)."""
    from multimodal_scene_text_recognition_tpu.models.model import (
        SceneTextModel,
    )

    variables = tr["variables"]
    fmodel = build_model(dataclasses.replace(
        cfg, decode_fused=True, decode_early_stop=True))

    def beam_ids(b, v):
        img = b["image"]
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        ids, _ = fmodel.apply(v, img, b["overlap"], b["scene"], b["ious"], 5,
                              method=SceneTextModel.beam_decode)
        return ids

    k1, k2 = TUNE["trips"]
    bms = slope_ms(roundrobin(beam_ids, tr["stacked"], tr["nK"],
                              consts=(variables,)), k1, k2,
                   pairs=TUNE["pairs"])
    if bms is None:
        log("beam k=5: slope non-monotone after retries — null")
        return {"beam5_crops_per_sec": None}
    log(f"beam k=5: {B / bms * 1e3:.1f} crops/s ({bms:.2f} ms/batch, "
        f"early stop, varied real batches)")
    return {"beam5_crops_per_sec": round(B / bms * 1e3, 1)}


def trained_fused_beam(cfg: ModelConfig, tr) -> dict:
    """Fused whole-beam Pallas kernel (ops/fused_beam.py).  Reached when
    the warm marker matches, when BENCH_FUSED_BEAM=1, or — VERDICT r4 #2c
    — cold whenever enough budget remains (a healthy session can afford
    the Mosaic compile; the persistent cache then makes every later run
    warm)."""
    from multimodal_scene_text_recognition_tpu.models.model import (
        SceneTextModel,
    )

    variables = tr["variables"]
    bfmodel = build_model(_fused_beam_cfg(cfg))

    def fbeam_ids(b, v):
        img = b["image"]
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        ids, _ = bfmodel.apply(v, img, b["overlap"], b["scene"], b["ious"], 5,
                               method=SceneTextModel.beam_decode)
        return ids

    # trip counts are FIXED (6,16) here even on a degraded session: the
    # committed warm cache holds exactly these two Mosaic programs, and a
    # different trip count would trade a ~2 min warm stage for a ~26 min
    # cold compile — the opposite of adapting
    bms = slope_ms(roundrobin(fbeam_ids, tr["stacked"], tr["nK"],
                              consts=(variables,)), 6, 16,
                   pairs=TUNE["pairs"])
    if bms is None:
        log("fused beam k=5: slope non-monotone after retries — null")
        return {"beam5_fused_crops_per_sec": None}
    log(f"fused beam k=5: {B / bms * 1e3:.1f} crops/s ({bms:.2f} ms/batch)")
    # record that this env/kernel/config combination has the fused-beam
    # programs in the persistent cache — future runs auto-enable
    with open(FUSED_BEAM_MARKER, "w") as f:
        json.dump(_fused_beam_env(cfg), f)
    return {"beam5_fused_crops_per_sec": round(B / bms * 1e3, 1)}


def cpu_baseline(cfg: ModelConfig) -> float:
    """CPU denominator for ``vs_baseline``.  The cached value rides in the
    COMMITTED BASELINE_LOCAL.json, so on a driver run this stage is a file
    read — which is why it runs FIRST (VERDICT r4 #3: the r04 budget died
    before the cpu stage and the north-star ratio went unwitnessed)."""
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cached = json.load(f)
        if cached.get("methodology", CPU_METHODOLOGY) == CPU_METHODOLOGY:
            if "methodology" not in cached:
                with open(CACHE, "w") as f:
                    json.dump({**cached, "methodology": CPU_METHODOLOGY}, f)
            return cached["cpu_crops_per_sec"]
        log("cached CPU baseline has stale methodology — re-measuring")
    log("measuring CPU baseline (one-time)...")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # scan decode on CPU — the fused kernel would run in (very slow)
        # pallas interpret mode there
        model = build_model(dataclasses.replace(cfg, decode_fused=False))
        small = example_batch(cfg, batch=24)  # full B=192 takes minutes on CPU
        rng = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": rng, "dropout": rng},
            small["image"], small["text"][:, :-1], small["overlap"],
            small["scene"], small["ious"], train=True)
        # per-call averaging: dispatch cost is negligible on CPU and the
        # slope path would run ~88 full minutes-long CPU decodes (ADVICE r3)
        res = bench_decode(model, variables, small, dispatch_ms=0.0,
                           lat_iters=3, use_slope=False)
    value = res["crops_per_sec"]
    with open(CACHE, "w") as f:
        json.dump({"cpu_crops_per_sec": value,
                   "methodology": CPU_METHODOLOGY}, f)
    log(f"CPU baseline: {value:.1f} crops/sec")
    return value


def _wait_for_backend(deadline_s: float, probe_timeout: int = 120):
    """Block until the TPU backend is reachable (or the deadline passes).

    The axon tunnel can be down for minutes at a time; a failed plugin init
    is cached for the life of the process, so probe from a SUBPROCESS and
    only touch jax in this process once a probe succeeds.  Falls through
    after the deadline (the real error will surface naturally)."""
    import subprocess

    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                if attempt > 1:
                    log(f"TPU backend up after {time.time() - t0:.0f}s")
                return True
        except subprocess.TimeoutExpired:
            pass
        left = deadline_s - (time.time() - t0)
        if left <= 0:
            log(f"TPU backend still unreachable after {deadline_s:.0f}s — "
                "proceeding (the real error will surface)")
            return False
        log(f"TPU backend unreachable (probe {attempt}); retrying "
            f"({left:.0f}s left)")
        time.sleep(min(30, left))


def _retry(fn, attempts=3, label=""):
    """The axon tunnel occasionally drops a remote-compile response; retry."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            log(f"{label} attempt {i + 1}/{attempts} failed: {e}")
            if i == attempts - 1:
                raise
            time.sleep(10)


def bench_mesh(model, batch):
    """Mesh-mode evidence: jit the sharded train and eval steps over a
    real-device mesh and run them on TPU hardware (opt-in via --mesh).

    With one chip the mesh is (data=1, model=1) — the point is that the
    *sharded* program (explicit in/out NamedShardings, TP param specs)
    compiles and executes on the real backend, not just the virtual CPU
    mesh the tests use.
    """
    from multimodal_scene_text_recognition_tpu.parallel.mesh import (
        make_mesh, shard_batch,
    )
    from multimodal_scene_text_recognition_tpu.train.steps import (
        shard_eval_step, shard_train_step,
    )

    n = len(jax.devices())
    mesh = make_mesh(n, model_axis=2 if n % 2 == 0 else 1)
    log(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    tcfg = TrainConfig()
    tx = make_optimizer(tcfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, tx, batch, rng)
    raw_step = make_train_step(model, tx, jit_compile=False)
    step_fn, state = shard_train_step(raw_step, mesh, state)
    dev_batch = shard_batch(mesh, batch)

    for _ in range(3):
        state, metrics = step_fn(state, dev_batch, rng)
    np.asarray(metrics["loss"])
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, metrics = step_fn(state, dev_batch, rng)
    np.asarray(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    bsz = batch["image"].shape[0]
    log(f"mesh train step: {bsz / dt:.1f} crops/s ({dt * 1e3:.2f} ms)")

    eval_fn, placed_vars = shard_eval_step(
        model, mesh, {"params": state.params, "batch_stats": state.batch_stats}
    )
    np.asarray(eval_fn(placed_vars, dev_batch))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = eval_fn(placed_vars, dev_batch)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    log(f"mesh greedy decode: {bsz / dt:.1f} crops/s ({dt * 1e3:.2f} ms)")
    return {"train_crops_per_sec": bsz / dt, "decode_crops_per_sec": bsz / dt}


def main():
    mesh_mode = "--mesh" in sys.argv
    extra = RESULT["extra"]
    start_watchdog()
    enable_compilation_cache()
    # the fused whole-decode Pallas kernel (ops/fused_decode.py) is the
    # flagship decode path: ~+7% end-to-end over the XLA scan at B=192
    cfg = ModelConfig(decode_fused=True)

    # --- CPU denominator first: committed cache makes this a file read,
    # so vs_baseline can never again be lost to an exhausted budget ---
    cpu_den = stage("cpu_baseline", lambda: cpu_baseline(cfg),
                    30 if os.path.exists(CACHE) else 420)
    if cpu_den:
        extra["cpu_crops_per_sec"] = round(cpu_den, 2)

    t_wait = time.time()
    if os.environ.get("BENCH_NO_WAIT") != "1":
        _wait_for_backend(deadline_s=max(60.0, min(600.0, remaining() - 300)))
    # backend attach timed separately so it can't masquerade as probe cost
    # (VERDICT r4 #6: r04's 179 s "dispatch_probe" was mostly backend init)
    devs = jax.devices()
    extra["backend_init_s"] = round(time.time() - t_wait, 1)
    log(f"backend: {jax.default_backend()}, devices: {devs} "
        f"(attach {extra['backend_init_s']}s, budget {BUDGET_S:.0f}s)")

    if os.environ.get("BENCH_FORCE_DEGRADED") == "1":
        # testing/cache-warming hook: exercise the degraded-mode program
        # variants (smaller trip counts) regardless of measured health
        apply_degradation("forced by BENCH_FORCE_DEGRADED=1")

    dispatch_ms = stage("dispatch_probe", measure_dispatch_ms, 30)
    if dispatch_ms is not None:
        extra["dispatch_ms"] = round(dispatch_ms, 2)
        log(f"per-dispatch host cost: {dispatch_ms:.1f} ms")
        if dispatch_ms > 100:
            apply_degradation(f"dispatch {dispatch_ms:.0f} ms > 100 ms")
    dispatch_ms = dispatch_ms or 0.0

    def run_health():
        h = measure_device_health()
        extra.update(h)
        if h["device_health_pct"] is not None:
            log(f"device health: {h['device_tfs']} TF/s bf16 = "
                f"{h['device_health_pct']}% of v5e peak ({V5E_PEAK_TFS} TF/s)")
            if h["device_health_pct"] < 50:
                apply_degradation(
                    f"device at {h['device_health_pct']}% of peak")
        return h

    stage("device_health", run_health, 45)

    # restore the trained checkpoint: its params serve every stage (the
    # decode programs are shape-bound, so the headline number doesn't
    # depend on the weights), which skips a separate ~3 min flagship init.
    # Random-init fallback when no checkpoint is in the tree.
    tr = stage("trained_restore",
               lambda: _retry(lambda: restore_trained(cfg),
                              label="restore"), 150)
    if tr is not None:
        model = build_model(cfg)
        variables = tr["variables"]
        batch = example_batch(cfg)
    else:
        built = stage("build",
                      lambda: _retry(lambda: build(cfg), label="build"), 120)
        if built is None:
            log("flagship build failed — nothing more to measure")
            emit()
            return
        model, variables, batch = built

    if mesh_mode:
        stage("mesh", lambda: bench_mesh(model, batch), 300)

    def run_decode():
        dec = _retry(lambda: bench_decode(model, variables, batch,
                                          dispatch_ms), label="decode")
        RESULT["value"] = round(dec["crops_per_sec"], 1)
        if cpu_den:
            RESULT["vs_baseline"] = round(dec["crops_per_sec"] / cpu_den, 2)
        # raw-pytree per-call latency: a dispatch artifact (one tunnel RPC
        # per param leaf) — published under an explicit name; the packed
        # serving p50 below is the headline latency
        extra["p50_unpacked_ms"] = round(dec["p50_latency_ms"], 2)
        for k in ("dispatch_at_decode_ms", "p50_over_marginal",
                  "p50_latency_retry_ms"):
            if k in dec:
                extra[k] = round(dec[k], 2) if isinstance(
                    dec[k], float) else dec[k]
        extra["latency_host_bound"] = dec["latency_host_bound"]
        extra["throughput_methodology"] = dec["throughput_methodology"]
        log(f"decode: {dec['crops_per_sec']:.1f} crops/s, "
            f"raw-pytree p50 {dec['p50_latency_ms']:.2f} ms")

        # serving-form (packed params) per-call latency at B=192 — the
        # BASELINE.json p50 metric, measured the way a serving process
        # actually dispatches (eval/serve.Recognizer packs by default)
        pdec, packed = make_packed_decode(model, variables)
        pargs = (packed, batch["image"], batch["overlap"], batch["scene"],
                 batch["ious"])
        np.asarray(pdec(*pargs))  # compile/warm
        ts = []
        for _ in range(max(TUNE["lat_iters"], 3)):
            t0 = time.perf_counter()
            np.asarray(pdec(*pargs))
            ts.append(time.perf_counter() - t0)
        extra["p50_latency_ms"] = round(float(np.median(ts)) * 1e3, 2)
        extra["p90_latency_ms"] = round(
            float(np.percentile(ts, 90)) * 1e3, 2)
        extra["latency_methodology"] = "packed-args"
        log(f"decode p50 (packed serving form): "
            f"{extra['p50_latency_ms']:.2f} ms, "
            f"p90 {extra['p90_latency_ms']:.2f} ms")
        return dec

    stage("decode", run_decode, 150)

    # train BEFORE the serving stages (VERDICT r4 #3: r01/r02 had the
    # train number, r04 lost it to the budget; it also witnesses the
    # fused_bn default on real hardware)
    def run_train():
        t = _retry(lambda: bench_train(
            model, batch, state=tr["state"] if tr else None), label="train")
        if t is None:
            log("train: null (slope non-monotone)")
            return None
        extra["train_crops_per_sec"] = round(t["crops_per_sec"], 1)
        extra["train_step_ms"] = round(t["step_ms"], 2)
        log(f"train: {t['crops_per_sec']:.1f} crops/s, "
            f"step {t['step_ms']:.2f} ms")
        return t

    stage("train", run_train, 150)

    if tr is not None:
        def run_tserve():
            extra.update(trained_pipelined(cfg, tr))
            return True

        stage("trained_pipelined", run_tserve, 120)

    # small-batch serving latency (p50 is a BASELINE.json metric) —
    # packed-params dispatch, the form a serving process uses
    def run_serving():
        pdec, packed = make_packed_decode(model, variables)
        for b in (1, 8, 32):
            sb = example_batch(cfg, batch=b)
            pargs = (packed, sb["image"], sb["overlap"], sb["scene"],
                     sb["ious"])
            np.asarray(pdec(*pargs))  # compile/warm
            ts = []
            for _ in range(max(TUNE["lat_iters"], 3)):
                t0 = time.perf_counter()
                np.asarray(pdec(*pargs))
                ts.append(time.perf_counter() - t0)
            extra[f"p50_b{b}_ms"] = round(float(np.median(ts)) * 1e3, 2)
            log(f"serving B={b}: p50 {extra[f'p50_b{b}_ms']:.2f} ms "
                "(packed)")
        return True

    stage("serving_p50", run_serving, 120)

    if tr is not None:
        def run_beam():
            extra.update(trained_beam(cfg, tr))
            return True

        stage("beam5", run_beam, 150)

        fb = fused_beam_state(cfg)
        if fb == "cold" and remaining() > 1900:
            # enough budget to pay the Mosaic compile once — do it; the
            # persistent cache makes every later run warm (VERDICT r4 #2c)
            log("fused beam: cold but budget allows — compiling now")
            fb = "forced"
        if fb in ("forced", "warm"):
            def run_fused_beam():
                extra.update(trained_fused_beam(cfg, tr))
                return True

            # a warm persistent cache makes this ~2 min; a cold one is
            # ~2x13 min of Mosaic compile — budget accordingly
            stage("fused_beam5", run_fused_beam,
                  250 if fb == "warm" else 1900)
        else:
            log(f"fused beam: not run (state={fb}; warm the cache with "
                "BENCH_FUSED_BEAM=1 or fix the marker)")
            extra["beam5_fused_crops_per_sec"] = None

    # int8 PTQ backbone serving mode (models/resnet_int8.py): activation
    # scales calibrated on real rendered crops when available (the bench
    # batch is uniform noise — fine for throughput, wrong for calibration)
    def run_int8():
        calib = None
        val, _ = load_real_val(cfg, n=256)
        if val is not None:
            from multimodal_scene_text_recognition_tpu.data.pipeline import (
                device_batch as _db,
                packed_batches as _pb,
            )

            calib = _db(next(iter(_pb(val, min(len(val), B),
                                      shuffle=False, drop_last=False))))
        int8 = _retry(lambda: bench_int8(model, variables, batch,
                                         calib_batch=calib), label="int8")
        extra["int8_backbone_crops_per_sec"] = (
            round(int8, 1) if int8 else None)
        log(f"int8 backbone: {int8:.1f} crops/s" if int8
            else "int8 backbone: null (slope non-monotone)")
        return int8

    stage("int8", run_int8, 120)

    if tr is not None:
        def run_acc():
            extra.update(trained_accuracy(cfg, tr))
            return True

        stage("trained_accuracy", run_acc, 180)

    # bracket the run: a second health sample catches contention that
    # arrived mid-run (this session's stages can straddle a co-tenant's
    # burst; one sample at startup can't see that)
    def run_health_end():
        h = measure_device_health()
        extra["device_tfs_end"] = h["device_tfs"]
        extra["device_health_pct_end"] = h["device_health_pct"]
        if h["device_health_pct"] is not None:
            log(f"device health (end): {h['device_tfs']} TF/s = "
                f"{h['device_health_pct']}% of peak")
        return h

    stage("device_health_end", run_health_end, 40)

    emit()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — always leave a parsed line
        log(f"bench top-level failure: {e!r}")
        RESULT["extra"]["failed"].append(f"top-level: {e}")
        emit()
