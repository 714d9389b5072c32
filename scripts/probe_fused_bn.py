"""A/B the fused-BatchNorm backward (ops/batchnorm.py) in the train step.

VERDICT r3 #6: the round-4 profiler trace (docs/trace_train) attributed
~21 ms of the 67.6 ms train step to XLA ``convert_reduce`` fusions — the
BN backward reductions over bf16[192,H,W,C] backbone activations running
~10x off memory-bound speed on the VPU.  ``ModelConfig.fused_bn`` routes
train-mode BN through a custom_vjp whose (dgamma, dbeta) reductions run as
one sequential Pallas pass (identical gradient values,
tests/test_batchnorm.py).  This script measures the actual delta.

Methodology = scripts/mfu_table.py: each number is the slope of ONE jit
program running the body K1/K2 times in a fori_loop/scan with a data
dependence, so per-dispatch cost cancels.  Run on the real chip:

    python scripts/probe_fused_bn.py
"""
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
from multimodal_scene_text_recognition_tpu.train.steps import make_train_step
from multimodal_scene_text_recognition_tpu.utils.timing import slope_ms

B = int(os.environ.get("MFU_B", "192"))
K1 = int(os.environ.get("MFU_K1", "2"))
K2 = int(os.environ.get("MFU_K2", "8"))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng_np = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng_np.random((B, 32, 100, 1), dtype=np.float32)),
        "text": jnp.asarray(rng_np.integers(0, 97, (B, 27)).astype(np.int32)),
        "overlap": jnp.zeros((B, 15), jnp.int32),
        "scene": jnp.zeros((B, 52), jnp.int32),
        "ious": jnp.full((B, 52), -1000.0, jnp.float32),
    }
    rng = jax.random.PRNGKey(0)

    out = {}
    for variant in ("plain_bn", "fused_bn"):
        mcfg = ModelConfig(fused_bn=(variant == "fused_bn"))
        model = build_model(mcfg)
        tx = make_optimizer(TrainConfig())
        state = create_train_state(model, tx, batch, rng)
        raw_step = make_train_step(model, tx, donate=False, jit_compile=False)

        def step_loop(k):
            @jax.jit
            def loop(state, batch, rng):
                def body(st, _):
                    st2, m = raw_step(st, batch, rng)
                    return st2, m["loss"]

                _, losses = jax.lax.scan(body, state, None, length=k)
                return losses[-1]

            return lambda: loop(state, batch, rng)

        ms = slope_ms(step_loop, K1, K2)
        out[variant] = ms
        if ms is None:
            print(f"RESULT {variant}: slope non-monotone — null", flush=True)
        else:
            print(f"RESULT {variant}: {ms:.2f} ms/step, "
                  f"{B / (ms * 1e-3):.1f} crops/s", flush=True)

    if out.get("plain_bn") and out.get("fused_bn"):
        print(f"SPEEDUP fused/plain: {out['plain_bn'] / out['fused_bn']:.3f}x "
              f"({out['plain_bn'] - out['fused_bn']:+.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
