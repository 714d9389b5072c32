"""Int8 PTQ matmul building blocks (XLA path).

The serving-time quantization recipe shared across the framework
(models/resnet_int8.py convs, ops/fused_decode.py kernel projections, and
the encoder matmuls here):

  * weights: symmetric per-output-channel int8 (abs-max / 127), quantized
    in-graph — a pure function of the params, so no separate weight cache
    or calibration artifact is needed;
  * activations: symmetric per-row dynamic int8 (row abs-max / 127) — no
    calibration batch, robust to distribution shift;
  * int8 x int8 -> int32 on the MXU (~2x bf16 throughput on v5e),
    dequantized and accumulated in float32.

Used on inference paths only; training always runs bf16/f32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray):
    """[D_in, D_out] -> (int8 table, [1, D_out] f32 per-channel scale)."""
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def int8_linear(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x [..., D_in] @ w [D_in, D_out] via int8 MXU, f32 result.

    Dynamic per-row activation quantization; weights quantized in-graph
    per-output-channel.
    """
    wq, ws = quantize_weight(w)
    x32 = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    inv = 127.0 / jnp.maximum(ax, 1e-12)
    xq = jnp.clip(jnp.round(x32 * inv), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * ((ax / 127.0) * ws)
    return out + b if b is not None else out
