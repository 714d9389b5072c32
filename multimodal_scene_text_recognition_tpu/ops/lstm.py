"""LSTM primitives as `lax.scan` over fused gate matmuls.

TPU-native replacement for the reference's cuDNN-less `nn.LSTM` /
`nn.LSTMCell` (reference: modules/encoders.py:14, modules/decoders.py:74).
Design: the input projection for the whole sequence is one big [B*T, I] x
[I, 4H] matmul done outside the scan (MXU-friendly); only the [B, H] x
[H, 4H] recurrent matmul lives in the scan body.

Gate order is torch's (i, f, g, o) so `.pth` checkpoints import without
permutation.  `flatten_parameters` (reference: encoders.py:23) is a CUDA-ism
with no TPU analog and is dropped.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LSTMWeights(NamedTuple):
    """Torch-layout LSTM weights: w_ih [I, 4H], w_hh [H, 4H], biases [4H]."""

    w_ih: jnp.ndarray
    w_hh: jnp.ndarray
    b_ih: jnp.ndarray
    b_hh: jnp.ndarray


def lstm_cell(
    x_proj: jnp.ndarray,
    h: jnp.ndarray,
    c: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_hh: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step given a precomputed input projection ``x_proj = x @ w_ih + b_ih``."""
    H = h.shape[-1]
    gates = x_proj + h @ w_hh + b_hh  # [B, 4H]
    i, f, g, o = (
        gates[..., :H],
        gates[..., H : 2 * H],
        gates[..., 2 * H : 3 * H],
        gates[..., 3 * H :],
    )
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(
    x: jnp.ndarray,
    weights: LSTMWeights,
    reverse: bool = False,
) -> jnp.ndarray:
    """Run an LSTM over [B, T, I]; returns hidden states [B, T, H].

    The sequence-wide input projection happens before the scan so the MXU
    sees one [B*T, I]x[I, 4H] matmul instead of T small ones.
    """
    B, T, _ = x.shape
    H = weights.w_hh.shape[0]
    x_proj = x @ weights.w_ih + weights.b_ih  # [B, T, 4H]

    def step(carry, xp):
        h, c = carry
        h, c = lstm_cell(xp, h, c, weights.w_hh, weights.b_hh)
        return (h, c), h

    init = (
        jnp.zeros((B, H), x_proj.dtype),
        jnp.zeros((B, H), x_proj.dtype),
    )
    xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H]
    _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)  # [B, T, H]


def bilstm(
    x: jnp.ndarray, fwd: LSTMWeights, bwd: LSTMWeights
) -> jnp.ndarray:
    """Bidirectional LSTM: concat(forward, reverse) hidden states [B, T, 2H].

    Matches torch `nn.LSTM(bidirectional=True)` output layout
    (reference: encoders.py:14,25).
    """
    h_f = lstm_scan(x, fwd, reverse=False)
    h_b = lstm_scan(x, bwd, reverse=True)
    return jnp.concatenate([h_f, h_b], axis=-1)
