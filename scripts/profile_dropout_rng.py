"""A/B the dropout-RNG cost in the train step (VERDICT r3 #6 follow-up).

profile_train_phases.py showed the encoder/decoder fwd+bwd run at 26%/13%
MFU vs the backbone's 67%.  One concrete suspect at these tiny sequence
lengths (26/27) is dropout: every layer draws threefry random bits for
attention-weight and activation masks, and on TPU threefry is a long
uint32 ALU chain that XLA cannot fuse into the surrounding matmuls.

Three variants of the SAME full train step, slope-timed:

  base      — dropout 0.1, default threefry2x32 PRNG
  rbg       — dropout 0.1, jax_default_prng_impl=rbg (hardware RNG;
              different stream, same distribution — dropout semantics are
              stochastic, so training behavior is statistically identical)
  nodrop    — dropout 0.0 (upper bound on any RNG+mask win; NOT
              semantics-preserving, measurement only)

Run each variant in a SEPARATE process (PRNG impl is global):

    python scripts/profile_dropout_rng.py base
    python scripts/profile_dropout_rng.py rbg
    python scripts/profile_dropout_rng.py nodrop
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "base"
if VARIANT == "rbg":
    jax.config.update("jax_default_prng_impl", "rbg")

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
    print(f"devices: {jax.devices()}  variant={VARIANT}", flush=True)
    rng_np = np.random.default_rng(0)
    img = jnp.asarray(rng_np.random((B, 32, 100, 1), dtype=np.float32))
    batch = {
        "image": img,
        "text": jnp.asarray(rng_np.integers(0, 97, (B, 27)).astype(np.int32)),
        "overlap": jnp.zeros((B, 15), jnp.int32),
        "scene": jnp.zeros((B, 52), jnp.int32),
        "ious": jnp.full((B, 52), -1000.0, jnp.float32),
    }
    rng = jax.random.PRNGKey(0)

    mcfg = ModelConfig(dropout=0.0 if VARIANT == "nodrop" else 0.1)
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
    if ms is None:
        print(f"{VARIANT}: slope non-monotone — null", flush=True)
        return
    print(f"RESULT {VARIANT}: {ms:.2f} ms/step, "
          f"{B / (ms * 1e-3):.1f} crops/s", flush=True)


if __name__ == "__main__":
    main()
