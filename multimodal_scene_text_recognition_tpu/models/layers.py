"""Shared linen building blocks.

Parameter-owning modules that delegate math to the pure functions in
``ops/`` — this keeps the decode loops (lax.scan with closures over bound
params) trivial and makes `.pth` import a flat key-mapping exercise.

Torch-parity notes:
  * LayerNorm/BatchNorm epsilon = 1e-5 (torch defaults; linen defaults differ).
  * LSTM params initialised U(-1/sqrt(H), 1/sqrt(H)) like torch nn.LSTM.
  * MHA packed in-projection initialised Xavier-uniform like torch
    nn.MultiheadAttention.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import MHAWeights
from ..ops.lstm import LSTMWeights


def torch_layer_norm(name: str = "ln"):
    return nn.LayerNorm(epsilon=1e-5, name=name)


class TorchBatchNorm(nn.Module):
    """BatchNorm2d semantics over NHWC: torch eps/momentum defaults."""

    use_running_average: bool

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
        )(x)


class MultiHeadAttention(nn.Module):
    """Param container for :func:`ops.attention.multihead_attention`."""

    embed_dim: int
    num_heads: int

    def setup(self):
        E = self.embed_dim
        self.w_qkv = self.param(
            "w_qkv", nn.initializers.xavier_uniform(), (E, 3 * E)
        )
        self.b_qkv = self.param("b_qkv", nn.initializers.zeros, (3 * E,))
        self.w_out = self.param(
            "w_out", nn.initializers.xavier_uniform(), (E, E)
        )
        self.b_out = self.param("b_out", nn.initializers.zeros, (E,))

    def weights(self) -> MHAWeights:
        return MHAWeights(self.w_qkv, self.b_qkv, self.w_out, self.b_out)

    def __call__(self, query, key, value, mask=None, int8: bool = False):
        from ..ops.attention import multihead_attention

        return multihead_attention(
            query, key, value, self.weights(), self.num_heads, mask,
            int8=int8,
        )


class Int8Dense(nn.Module):
    """nn.Dense-compatible layer (same kernel/bias param layout) computing
    through the PTQ int8 matmul (ops/int8.py) — an inference-only drop-in:
    checkpoints trained with nn.Dense restore unchanged."""

    features: int

    @nn.compact
    def __call__(self, x):
        from ..ops.int8 import int8_linear

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return int8_linear(x, kernel, bias).astype(x.dtype)


class LSTM(nn.Module):
    """Param container for :func:`ops.lstm.lstm_scan` (torch gate order)."""

    input_dim: int
    hidden_dim: int
    suffix: str = ""

    def setup(self):
        H, I = self.hidden_dim, self.input_dim
        k = 1.0 / math.sqrt(H)
        init = nn.initializers.uniform(scale=2 * k)

        def shifted(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - k

        self.w_ih = self.param(f"w_ih{self.suffix}", shifted, (I, 4 * H))
        self.w_hh = self.param(f"w_hh{self.suffix}", shifted, (H, 4 * H))
        self.b_ih = self.param(f"b_ih{self.suffix}", shifted, (4 * H,))
        self.b_hh = self.param(f"b_hh{self.suffix}", shifted, (4 * H,))

    def weights(self) -> LSTMWeights:
        return LSTMWeights(self.w_ih, self.w_hh, self.b_ih, self.b_hh)

    def __call__(self, x, reverse: bool = False):
        from ..ops.lstm import lstm_scan

        return lstm_scan(x, self.weights(), reverse=reverse)


class MLP(nn.Module):
    """The reference's fusion MLP (reference: encoders.py:198-242): ``num_layers``
    Dense layers, ReLU between, weights ~ N(0, sqrt(2/fan_in)), zero bias."""

    hidden_dim: int
    out_dim: int
    num_layers: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_layers):
            odim = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            fan_in = x.shape[-1]
            x = nn.Dense(
                odim,
                kernel_init=nn.initializers.normal(stddev=math.sqrt(2.0 / fan_in)),
                bias_init=nn.initializers.zeros,
                name=f"fc{i}",
            )(x)
            if i != self.num_layers - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


def torch_linear_init(in_dim: int):
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both
    weight and bias."""
    k = 1.0 / math.sqrt(in_dim)
    init = nn.initializers.uniform(scale=2 * k)

    def shifted(key, shape, dtype=jnp.float32):
        return init(key, shape, dtype) - k

    return shifted


class LinearP(nn.Module):
    """Linear layer with weights retrievable as arrays (for scan closures)."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    def setup(self):
        init = torch_linear_init(self.in_dim)
        self.kernel = self.param("kernel", init, (self.in_dim, self.out_dim))
        if self.use_bias:
            self.bias = self.param("bias", init, (self.out_dim,))

    def weights(self):
        return (self.kernel, self.bias if self.use_bias else None)

    def __call__(self, x):
        y = x @ self.kernel
        return y + self.bias if self.use_bias else y


def linear_apply(x, w):
    k, b = w
    y = x @ k
    return y + b if b is not None else y


class LayerNormP(nn.Module):
    """LayerNorm with weights retrievable as arrays (torch eps)."""

    dim: int
    eps: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.dim,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.dim,))

    def weights(self):
        return (self.scale, self.bias)

    def __call__(self, x):
        return layer_norm_apply(x, self.weights(), self.eps)


def layer_norm_apply(x, w, eps: float = 1e-5):
    scale, bias = w
    # statistics always in float32 (x may be bf16 on the decode fast path)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def mlp_apply(x, layer_weights):
    """Pure-function MLP forward (ReLU between layers, none after last)."""
    for i, w in enumerate(layer_weights):
        x = linear_apply(x, w)
        if i != len(layer_weights) - 1:
            x = jax.nn.relu(x)
    return x


class MLPP(nn.Module):
    """Param-container version of :class:`MLP` (reference init) whose weights
    can be closed over in scan bodies."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int

    def setup(self):
        ws = []
        for i in range(self.num_layers):
            idim = self.in_dim if i == 0 else self.hidden_dim
            odim = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            k = self.param(
                f"fc{i}_kernel",
                nn.initializers.normal(stddev=math.sqrt(2.0 / idim)),
                (idim, odim),
            )
            b = self.param(f"fc{i}_bias", nn.initializers.zeros, (odim,))
            ws.append((k, b))
        self.ws = ws

    def weights(self):
        return list(self.ws)

    def __call__(self, x):
        return mlp_apply(x, self.weights())


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """Sinusoidal positional-encoding table [max_len, d_model]
    (reference: encoders.py:147-164)."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionalEncoding(nn.Module):
    """Additive sinusoidal PE + dropout, batch-first [B, T, D]
    (reference: encoders.py:147-164; max_len=26)."""

    d_model: int
    max_len: int = 26
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True, offset: int | jnp.ndarray = 0):
        table = jnp.asarray(sinusoidal_table(self.max_len, self.d_model))
        T = x.shape[1]
        if isinstance(offset, int) and offset == 0:
            pe = table[:T]
        else:
            pe = jax.lax.dynamic_slice_in_dim(table, offset, T, axis=0)
        x = x + pe[None, :, :]
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


def relevance_fusion(
    feats: jnp.ndarray,
    sem: jnp.ndarray,
    score_mlp: Callable[[jnp.ndarray], jnp.ndarray],
    return_scores: bool = False,
):
    """Per-position soft selection of semantic vectors — the fusion primitive
    used at every MLP fusion site (reference: encoders.py:93-113,
    decoders.py:143-164, decoders.py:400-420).

    scores[b, t, o] = softmax_o(MLP([feats[b, t]; sem[b, o]]))
    returns sum_o scores * sem  — [B, T, E_sem].

    The [B, T, O, 2D] pairwise tensor is built by broadcast (XLA fuses it into
    the first MLP matmul) rather than the reference's repeat+cat copies.
    """
    B, T, _ = feats.shape
    O = sem.shape[1]
    pair = jnp.concatenate(
        [
            jnp.broadcast_to(feats[:, :, None, :], (B, T, O, feats.shape[-1])),
            jnp.broadcast_to(sem[:, None, :, :], (B, T, O, sem.shape[-1])),
        ],
        axis=-1,
    )
    scores = score_mlp(pair)  # [B, T, O, 1]
    scores = jax.nn.softmax(scores, axis=2)
    fused = jnp.sum(sem[:, None, :, :] * scores, axis=2)
    if return_scores:
        return fused, scores[..., 0]
    return fused


class FusedBatchNorm(nn.Module):
    """Drop-in for ``nn.BatchNorm(momentum=0.9, epsilon=1e-5)`` whose train
    mode routes through :func:`ops.batchnorm.bn_train` — identical forward
    values, but the backward's (dgamma, dbeta) reductions run in one fused
    Pallas pass (see docs/RESULTS.md round 4: XLA's autodiff emits
    ``convert_reduce`` fusions ~10x off memory-bound speed that account for
    ~21 ms of the 67.6 ms train step).

    The variable tree ('scale'/'bias' params, 'mean'/'var' batch_stats)
    matches nn.BatchNorm exactly, so checkpoints and the `.pth` importer are
    unaffected.  Eval mode is the same arithmetic flax runs.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        from ..ops.batchnorm import bn_train

        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        out_dtype = self.dtype or x.dtype

        if self.use_running_average:
            y = (x.astype(jnp.float32) - ra_mean.value) * (
                jax.lax.rsqrt(ra_var.value + self.epsilon) * scale) + bias
            return y.astype(out_dtype)

        y, mean, var = bn_train(
            x.astype(out_dtype), scale, bias, self.epsilon)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)
        return y
