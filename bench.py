"""Benchmark harness: word crops/sec/chip at B=192 on the flagship model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): greedy-decode throughput (word crops/sec/
chip) at batch 192 on the full TPS + ResNet-31 + 6L TF encoder + 6L TF
decoder pipeline.  ``vs_baseline`` is the ratio against a CPU run of the
same program (the reference is a CPU/GPU torch pipeline with no published
numbers — BASELINE.md; the north star is >=10x CPU crops/sec).  The CPU
denominator is measured once and cached in BASELINE_LOCAL.json.

Also measured and reported on stderr: train-step throughput and p50 decode
latency.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multimodal_scene_text_recognition_tpu.core.config import ModelConfig, TrainConfig
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.train.state import (
    create_train_state,
    make_optimizer,
)
from multimodal_scene_text_recognition_tpu.train.steps import make_train_step

B = 192
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BASELINE_LOCAL.json")
# Persistent XLA/Mosaic compilation cache (results/xla_cache, gitignored).
# Every program that takes >=1 s to compile is cached on disk, so repeat
# bench runs skip recompiles entirely — most importantly the fused
# whole-beam Pallas kernel, whose Mosaic compile is ~13 min at flagship
# scale.  scripts/warm_fused_beam marker: once a warm run has paid that
# compile under the SAME jaxlib/device, the fused-beam bench auto-enables
# (cache hit makes it cheap); without the marker it stays opt-in via
# BENCH_FUSED_BEAM=1.
XLA_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "results", "xla_cache")
FUSED_BEAM_MARKER = os.path.join(XLA_CACHE_DIR, "FUSED_BEAM_WARM.json")


def enable_compilation_cache():
    os.makedirs(XLA_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", XLA_CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fused_beam_env():
    return {"jax": jax.__version__,
            "device": jax.devices()[0].device_kind}


def fused_beam_enabled() -> bool:
    flag = os.environ.get("BENCH_FUSED_BEAM")
    if flag == "1":
        return True
    if flag == "0":
        return False
    try:
        with open(FUSED_BEAM_MARKER) as f:
            return json.load(f) == _fused_beam_env()
    except Exception:
        return False


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        batch["image"], batch["text"][:, :-1], batch["overlap"],
        batch["scene"], batch["ious"], train=True)
    return model, variables, batch


def bench_decode(model, variables, batch, iters=20, warmup=3):
    # params go in as arguments, not closure constants — captured constants
    # bloat the serialized HLO by the full model size
    @jax.jit
    def decode(variables, image, overlap, scene, ious):
        logits = model.apply(variables, image, None, overlap, scene, ious,
                             train=False)
        return jnp.argmax(logits, axis=-1)

    args = (variables, batch["image"], batch["overlap"], batch["scene"],
            batch["ious"])
    batch_size = batch["image"].shape[0]
    np.asarray(decode(*args))  # warm/compile

    # Throughput: slope-timed over VARIED random batches — one jit program
    # decodes K batches round-robin from a device-resident stack; marginal
    # ms/batch is the slope between two trip counts (utils/timing.py).
    # Per-dispatch host cost (pytree flatten + tunnel round trip, 10-30 ms)
    # cancels exactly, and varied inputs defeat identical-enqueue dedup —
    # the same methodology as the trained/pipelined and MFU benches.
    from multimodal_scene_text_recognition_tpu.utils.timing import (
        roundrobin,
        slope_ms,
    )

    nK = 8
    rng = np.random.default_rng(1)
    stacked = jax.device_put({
        "image": rng.random(
            (nK,) + batch["image"].shape, dtype=np.float32),
        "overlap": rng.integers(
            0, 100, (nK,) + batch["overlap"].shape).astype(np.int32),
        "scene": rng.integers(
            0, 100, (nK,) + batch["scene"].shape).astype(np.int32),
        "ious": np.broadcast_to(
            np.asarray(batch["ious"]), (nK,) + batch["ious"].shape).copy(),
    })
    ms = slope_ms(roundrobin(
        lambda b, v: decode(v, b["image"], b["overlap"], b["scene"],
                            b["ious"]),
        stacked, nK, consts=(variables,)), 6, 16)
    steady = ms / 1e3

    # Latency: per-call, result materialised on host each time.
    lat = []
    for _ in range(max(iters // 2, 3)):
        t0 = time.perf_counter()
        np.asarray(decode(*args))
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    return {
        "crops_per_sec": batch_size / steady,
        "p50_latency_ms": float(np.median(lat)) * 1e3,
        "p90_latency_ms": float(np.percentile(lat, 90)) * 1e3,
    }


def bench_train(model, variables, batch, iters=10, warmup=2):
    tcfg = TrainConfig()
    tx = make_optimizer(tcfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, tx, batch, rng)
    step = make_train_step(model, tx, donate=True)
    batch_size = batch["image"].shape[0]
    for _ in range(warmup):
        state, metrics = step(state, batch, rng)
    np.asarray(metrics["loss"])  # drain
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rng)
    np.asarray(metrics["loss"])  # drain
    dt = (time.perf_counter() - t0) / iters
    return {"crops_per_sec": batch_size / dt, "step_ms": dt * 1e3}


def bench_int8(model, variables, batch, iters=20, calib_batch=None):
    """Throughput of the int8-PTQ-backbone pipeline (fixed-length decode).

    ``calib_batch``: real crops for activation calibration; falls back to
    the bench batch itself (random noise — throughput-only; honest accuracy
    numbers come from :func:`bench_trained`)."""
    from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
        make_int8_eval_step,
    )

    step, qsites = make_int8_eval_step(
        model, variables, calib_batch if calib_batch is not None else batch
    )
    B = batch["image"].shape[0]
    np.asarray(step(variables, qsites, batch))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = step(variables, qsites, batch)
    np.asarray(out)
    return B / ((time.perf_counter() - t0) / iters)


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
            cache_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "results", "synth_cache"),
        )
        return val, codec
    except Exception as e:
        log(f"real val set unavailable: {e}")
        return None, None


TRAINED_CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "models", "synth_openvocab_xxl")
# git-committed fallback (fp16 params + batch_stats + persisted int8
# scales): the Orbax dir lives outside version control and a disk reset
# between sessions loses it — the bundle keeps trained-model bench metrics
# reproducible from a bare clone (train/checkpoint.save_params_bundle).
TRAINED_BUNDLE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "assets", "trained",
                              "synth_openvocab_xxl.params.npz")


def bench_trained(cfg: ModelConfig, iters=20):
    """Trained-model serving numbers, driver-captured (VERDICT r2 #2).

    Restores the shipped Orbax checkpoint and measures the production
    serving path — fused bf16 Pallas decode kernel with in-kernel early
    stop, int8 PTQ backbone + int8 encoder matmuls, activation scales
    calibrated on real held-out crops — plus word accuracy over the full
    2048-crop val set for both the float and int8 pipelines.
    """
    import dataclasses

    from multimodal_scene_text_recognition_tpu.data.pipeline import (
        device_batch,
        packed_batches,
    )
    from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
        make_int8_eval_step,
    )
    from multimodal_scene_text_recognition_tpu.train.checkpoint import (
        restore_checkpoint,
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
        from multimodal_scene_text_recognition_tpu.train.checkpoint import (
            restore_params_bundle,
        )

        state = restore_params_bundle(TRAINED_BUNDLE, state)
        log(f"trained params bundle restored (step {int(state.step)}, fp16)")
    variables = state.variables()

    # int8 serving step: PTQ backbone spliced + int8 fused decode kernel
    # (the decoder quantization rides the model config).  Activation scales
    # come from the calibration npz shipped next to the checkpoint when
    # present (scripts/persist_int8_scales.py — serving must not depend on
    # the first batch seen); otherwise calibrate on this real val batch.
    scales_path = TRAINED_CKPT + ".scales.npz"
    if not os.path.exists(scales_path):
        scales_path = TRAINED_BUNDLE.replace(".params.npz", ".scales.npz")
    if os.path.exists(scales_path):
        from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
            load_activation_scales,
        )

        log(f"int8 scales: persisted ({os.path.basename(scales_path)})")
        step, qsites = make_int8_eval_step(
            model, variables, x_absmax=load_activation_scales(scales_path))
    else:
        step, qsites = make_int8_eval_step(model, variables,
                                           calib_batch=batch0)
    np.asarray(step(variables, qsites, batch0))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = step(variables, qsites, batch0)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    crops_per_sec = B / dt

    # Pipelined offline-serving throughput over varied REAL batches: one
    # jit program decodes K batches round-robin from the device-resident
    # val corpus; per-batch ms is the slope between two trip counts, so the
    # per-dispatch host cost (pytree flatten + tunnel round trip, ~10 ms —
    # comparable to the device time of a whole batch) cancels exactly.
    # This is the steady-state rate of a production serving loop with a
    # device-resident queue; per-call loops re-enqueueing one identical
    # batch are vulnerable to runtime dedup and kept only for latency.
    from multimodal_scene_text_recognition_tpu.utils.timing import (
        roundrobin,
        slope_ms,
    )

    full = [b for b in packed_batches(val, B, shuffle=False) if
            b["image"].shape[0] == B]
    stacked = device_batch({
        k: np.stack([b[k] for b in full])
        for k in ("image", "overlap", "scene", "ious")})
    nK = len(full)

    ms = slope_ms(roundrobin(lambda b, v, q: step(v, q, b),
                             stacked, nK, consts=(variables, qsites)), 6, 16)
    pipelined = B / ms * 1e3
    log(f"pipelined serving: {pipelined:.1f} crops/s "
        f"({ms:.2f} ms/batch marginal, varied real batches)")

    # word accuracy over the full val set: int8 pipeline vs float pipeline
    def accuracy(decode_fn):
        correct = total = 0
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
        return 100.0 * correct / max(total, 1)

    acc_int8 = accuracy(lambda dev: step(variables, qsites, dev))

    fmodel = build_model(dataclasses.replace(
        cfg, decode_fused=True, decode_early_stop=True))

    @jax.jit
    def fdecode(variables, image, overlap, scene, ious):
        logits = fmodel.apply(variables, image, None, overlap, scene, ious,
                              train=False)
        return jnp.argmax(logits, axis=-1)

    acc_float = accuracy(lambda dev: fdecode(
        variables, dev["image"].astype(jnp.float32) / 255.0
        if dev["image"].dtype == jnp.uint8 else dev["image"],
        dev["overlap"], dev["scene"], dev["ious"]))

    log(f"trained serving: {crops_per_sec:.1f} crops/s "
        f"({dt * 1e3:.2f} ms/batch), val acc int8 {acc_int8:.2f}% "
        f"vs float {acc_float:.2f}%")

    # batched beam search k=5 (a BASELINE.json config) on the trained
    # checkpoint — slope-timed over the same varied device-resident batches
    # (beam rides the XLA scan stepper + early stop; the fused kernel is
    # greedy-only)
    beam = None
    try:
        from multimodal_scene_text_recognition_tpu.models.model import (
            SceneTextModel,
        )

        def beam_ids(b, v):
            img = b["image"]
            if img.dtype == jnp.uint8:
                img = img.astype(jnp.float32) / 255.0
            ids, _ = fmodel.apply(v, img, b["overlap"], b["scene"],
                                  b["ious"], 5,
                                  method=SceneTextModel.beam_decode)
            return ids

        bms = slope_ms(roundrobin(beam_ids, stacked, nK,
                                  consts=(variables,)), 2, 6)
        beam = B / bms * 1e3
        log(f"beam k=5: {beam:.1f} crops/s ({bms:.2f} ms/batch, "
            f"early stop, varied real batches)")
    except Exception as e:
        log(f"beam bench failed: {e}")

    # fused whole-beam Pallas kernel (ops/fused_beam.py): 8.05k crops/s
    # measured (docs/RESULTS.md round 3), but its Mosaic compile is ~13 min
    # per enclosing program — 2 programs here would add ~25 min to a cold
    # driver bench.  It therefore runs only when the persistent compilation
    # cache has been pre-warmed for this jaxlib/device (marker written
    # below after a successful run; cache hit makes the compile free) or
    # when forced with BENCH_FUSED_BEAM=1.
    beam_fused = None
    if fused_beam_enabled():
        try:
            bfmodel = build_model(dataclasses.replace(
                cfg, decode_early_stop=True, decode_beam_fused=True))

            def fbeam_ids(b, v):
                img = b["image"]
                if img.dtype == jnp.uint8:
                    img = img.astype(jnp.float32) / 255.0
                ids, _ = bfmodel.apply(v, img, b["overlap"], b["scene"],
                                       b["ious"], 5,
                                       method=SceneTextModel.beam_decode)
                return ids

            bms = slope_ms(roundrobin(fbeam_ids, stacked, nK,
                                      consts=(variables,)), 2, 6)
            beam_fused = B / bms * 1e3
            log(f"fused beam k=5: {beam_fused:.1f} crops/s "
                f"({bms:.2f} ms/batch)")
            # record that this jaxlib/device combination has the fused-beam
            # programs in the persistent cache — future runs auto-enable
            with open(FUSED_BEAM_MARKER, "w") as f:
                json.dump(_fused_beam_env(), f)
        except Exception as e:
            log(f"fused beam bench failed: {e}")

    return {
        "trained_decode_crops_per_sec": round(crops_per_sec, 1),
        "trained_batch_ms": round(dt * 1e3, 2),
        "trained_pipelined_crops_per_sec": round(pipelined, 1),
        "trained_val_accuracy_int8": round(acc_int8, 2),
        "trained_val_accuracy_float": round(acc_float, 2),
        "beam5_crops_per_sec": round(beam, 1) if beam else None,
        **({"beam5_fused_crops_per_sec": round(beam_fused, 1)}
           if beam_fused else {}),
    }


def cpu_baseline(cfg: ModelConfig) -> float:
    """One-time CPU denominator, cached."""
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["cpu_crops_per_sec"]
    log("measuring CPU baseline (one-time)...")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # scan decode on CPU — the fused kernel would run in (very slow)
        # pallas interpret mode there
        import dataclasses

        model = build_model(dataclasses.replace(cfg, decode_fused=False))
        small = example_batch(cfg, batch=24)  # full B=192 takes minutes on CPU
        rng = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": rng, "dropout": rng},
            small["image"], small["text"][:, :-1], small["overlap"],
            small["scene"], small["ious"], train=True)
        res = bench_decode(model, variables, small, iters=3)
    value = res["crops_per_sec"]
    with open(CACHE, "w") as f:
        json.dump({"cpu_crops_per_sec": value}, f)
    log(f"CPU baseline: {value:.1f} crops/sec")
    return value


def _wait_for_backend(deadline_s: float = 1200.0, probe_timeout: int = 300):
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
        remaining = deadline_s - (time.time() - t0)
        if remaining <= 0:
            log(f"TPU backend still unreachable after {deadline_s:.0f}s — "
                "proceeding (the real error will surface)")
            return False
        log(f"TPU backend unreachable (probe {attempt}); retrying "
            f"({remaining:.0f}s left)")
        time.sleep(min(60, remaining))


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


def bench_mesh(model, variables, batch):
    """Mesh-mode evidence (VERDICT round-1 #9): jit the sharded train and
    eval steps over a real-device mesh and run them on TPU hardware.

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
    from multimodal_scene_text_recognition_tpu.train.state import (
        create_train_state,
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
    B = batch["image"].shape[0]
    train_rate = B / dt
    log(f"mesh train step: {train_rate:.1f} crops/s ({dt * 1e3:.2f} ms)")

    eval_fn, placed_vars = shard_eval_step(
        model, mesh, {"params": state.params, "batch_stats": state.batch_stats}
    )
    np.asarray(eval_fn(placed_vars, dev_batch))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = eval_fn(placed_vars, dev_batch)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    log(f"mesh greedy decode: {B / dt:.1f} crops/s ({dt * 1e3:.2f} ms)")
    return {"train_crops_per_sec": train_rate, "decode_crops_per_sec": B / dt}


def bench_serving(model, variables, cfg, batch_sizes=(1, 8, 32)):
    """Small-batch p50 decode latency (serving profile)."""
    out = {}
    for b in batch_sizes:
        batch = example_batch(cfg, batch=b)
        res = bench_decode(model, variables, batch, iters=10)
        out[b] = res["p50_latency_ms"]
        log(f"serving B={b}: p50 {res['p50_latency_ms']:.2f} ms "
            f"({res['crops_per_sec']:.0f} crops/s)")
    return out


def main():
    serving = "--serving" in sys.argv
    mesh_mode = "--mesh" in sys.argv
    enable_compilation_cache()
    # the fused whole-decode Pallas kernel (ops/fused_decode.py) is the
    # flagship decode path: ~+7% end-to-end over the XLA scan at B=192
    cfg = ModelConfig(decode_fused=True)
    if os.environ.get("BENCH_NO_WAIT") != "1":
        _wait_for_backend()
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    model, variables, batch = _retry(lambda: build(cfg), label="build")

    if mesh_mode:
        _retry(lambda: bench_mesh(model, variables, batch), label="mesh")
    dec = _retry(lambda: bench_decode(model, variables, batch), label="decode")
    log(f"decode: {dec['crops_per_sec']:.1f} crops/s, "
        f"p50 {dec['p50_latency_ms']:.2f} ms, p90 {dec['p90_latency_ms']:.2f} ms")

    # int8 PTQ backbone serving mode (models/resnet_int8.py): activation
    # scales calibrated on real rendered crops when available (the bench
    # batch is uniform noise — fine for throughput, wrong for calibration)
    try:
        val, _ = load_real_val(cfg, n=256)
        calib = None
        if val is not None:
            from multimodal_scene_text_recognition_tpu.data.pipeline import (
                device_batch as _db,
                packed_batches as _pb,
            )

            calib = _db(next(iter(_pb(val, min(len(val), B),
                                      shuffle=False, drop_last=False))))
        int8 = _retry(lambda: bench_int8(model, variables, batch,
                                         calib_batch=calib), label="int8")
        log(f"int8 backbone: {int8:.1f} crops/s")
    except Exception as e:
        log(f"int8 bench failed: {e}")
        int8 = None

    # trained-model serving (fused + early-stop + int8 backbone & decode
    # kernel, real calibration) + val accuracy — driver-captured evidence
    try:
        trained = _retry(lambda: bench_trained(cfg), label="trained")
    except Exception as e:
        log(f"trained bench failed: {e}")
        trained = None
    try:
        tr = _retry(lambda: bench_train(model, variables, batch), label="train")
    except Exception:
        tr = {"crops_per_sec": float("nan"), "step_ms": float("nan")}
    log(f"train: {tr['crops_per_sec']:.1f} crops/s, step {tr['step_ms']:.2f} ms")

    if serving:
        bench_serving(model, variables, cfg)

    try:
        cpu = cpu_baseline(cfg)
        ratio = dec["crops_per_sec"] / cpu if cpu else None
    except Exception as e:  # CPU baseline is best-effort
        log(f"cpu baseline failed: {e}")
        ratio = None

    print(json.dumps({
        "metric": "greedy-decode word crops/sec/chip @ B=192 "
                  "(TPS+ResNet31+TF6+TF6, fused Pallas whole-decode kernel, "
                  "slope-timed over varied batches)",
        "value": round(dec["crops_per_sec"], 1),
        "unit": "crops/sec",
        "vs_baseline": round(ratio, 2) if ratio else None,
        "extra": {
            "p50_latency_ms": round(dec["p50_latency_ms"], 2),
            "train_crops_per_sec": round(tr["crops_per_sec"], 1),
            "train_step_ms": round(tr["step_ms"], 2),
            "int8_backbone_crops_per_sec":
                round(int8, 1) if int8 else None,
            **(trained or {}),
        },
    }))


if __name__ == "__main__":
    main()
