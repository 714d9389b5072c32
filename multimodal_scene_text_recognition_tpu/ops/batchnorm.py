"""Train-mode BatchNorm with a hand-fused Pallas backward.

Why this exists: the committed round-4 profiler trace (docs/trace_train,
parsed in docs/RESULTS.md) shows ~21 ms of every 67.6 ms train step inside
XLA ``convert_reduce`` fusions — the BatchNorm backward reductions over the
backbone's ``bf16[192, H, W, C]`` activations run ~10x off memory-bound
speed on the VPU.  The analytic BN gradient needs exactly two passes over
(x, dy): one reduction pass for (dgamma, dbeta), one elementwise pass for
dx.  The Pallas kernel below does the reduction pass as a single sequential
accumulation at HBM speed; the dx pass is a clean elementwise expression
XLA already fuses well.

Forward semantics exactly match ``flax.linen.BatchNorm`` in training mode
(reference capability: torch ``nn.BatchNorm2d`` as used by
/root/reference/modules/feature_extraction.py:21-27): statistics in
float32 with the fast-variance form E[x^2] - E[x]^2 clipped at zero,
normalization arithmetic in float32, output cast to the compute dtype.
The custom_vjp only changes HOW the gradient is computed, not its value —
tests/test_batchnorm.py checks both against jax.grad of the plain
composition.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step of the reduction kernel; multiples of the 8-row
# sublane, big enough that the per-step bookkeeping amortises
_TILE_N = 1024
# lane width: channels below this would waste most of the VPU — jnp handles
# the two cheap stem layers
_MIN_C = 128


def _bn_bwd_reduce_kernel(x_ref, dy_ref, mean_ref, rstd_ref,
                          dgamma_ref, dbeta_ref, acc_ref, *, n_valid):
    """Accumulate dgamma = sum(dy * xhat), dbeta = sum(dy) over row tiles.

    Sequential grid over N tiles; acc_ref is a [2, C] f32 VMEM scratch that
    lives across grid steps.  The tail tile is masked to n_valid rows.
    """
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    # the tail tile reads past n_valid rows (Pallas pads boundary blocks
    # with unspecified values): mask the PRODUCTS so garbage never reduces
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=0)
    valid = (row + i * x.shape[0]) < n_valid
    xhat = (x - mean_ref[...]) * rstd_ref[...]
    acc_ref[0, :] += jnp.sum(jnp.where(valid, dy * xhat, 0.0), axis=0)
    acc_ref[1, :] += jnp.sum(jnp.where(valid, dy, 0.0), axis=0)

    @pl.when(i == nsteps - 1)
    def _():
        dgamma_ref[...] = acc_ref[0:1, :]
        dbeta_ref[...] = acc_ref[1:2, :]


def _bn_bwd_sums_pallas(x2d, dy2d, mean, rstd):
    """(dgamma, dbeta) f32[C] via the Pallas reduction kernel."""
    n, c = x2d.shape
    nsteps = pl.cdiv(n, _TILE_N)
    dgamma, dbeta = pl.pallas_call(
        functools.partial(_bn_bwd_reduce_kernel, n_valid=n),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((_TILE_N, c), lambda i: (i, 0)),
            pl.BlockSpec((_TILE_N, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x2d, dy2d, mean[None, :], rstd[None, :])
    return dgamma[0], dbeta[0]


def _bn_bwd_sums_jnp(x2d, dy2d, mean, rstd):
    dy = dy2d.astype(jnp.float32)
    xhat = (x2d.astype(jnp.float32) - mean) * rstd
    return jnp.sum(dy * xhat, axis=0), jnp.sum(dy, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train(x, scale, bias, eps=1e-5):
    """Training-mode batch normalization over all axes but the last.

    Returns (y, mean, var): y in x.dtype, stats in float32 (for the
    caller's running-average update — no gradient flows to them).
    """
    y, mean, var, _ = _bn_fwd_impl(x, scale, bias, eps)
    return y, mean, var


def _bn_fwd_impl(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axes)
    var = jnp.maximum(jnp.mean(xf * xf, axes) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    sf = scale.astype(jnp.float32)
    y = (xf - mean) * (rstd * sf) + bias.astype(jnp.float32)
    return y.astype(x.dtype), mean, var, rstd


def _bn_fwd(x, scale, bias, eps):
    y, mean, var, rstd = _bn_fwd_impl(x, scale, bias, eps)
    return (y, mean, var), (x, scale, bias, mean, rstd)


def _bn_bwd(eps, res, cts):
    x, scale, bias, mean, rstd = res
    dy = cts[0]  # cotangents for the mean/var outputs are structurally
    # zero: they only feed the (non-differentiated) running-stat update

    shape = x.shape
    c = shape[-1]
    n = x.size // c
    x2d = x.reshape(n, c)
    dy2d = dy.reshape(n, c)

    # Pallas only on a single-device TPU: a pallas custom call has no SPMD
    # partitioning rule, so under a >1-device mesh the jnp reductions (which
    # XLA partitions with a psum) are the correct path
    if (jax.default_backend() == "tpu" and jax.device_count() == 1
            and c >= _MIN_C):
        dgamma, dbeta = _bn_bwd_sums_pallas(x2d, dy2d, mean, rstd)
    else:
        dgamma, dbeta = _bn_bwd_sums_jnp(x2d, dy2d, mean, rstd)

    # dx: one elementwise pass; XLA fuses this into neighbouring ops
    sf = scale.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rstd
    dx = (sf * rstd) * (dy.astype(jnp.float32)
                        - dbeta / n - xhat * (dgamma / n))
    return (dx.astype(x.dtype),
            dgamma.astype(scale.dtype),
            dbeta.astype(bias.dtype))


bn_train.defvjp(_bn_fwd, _bn_bwd)
