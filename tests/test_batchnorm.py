"""Fused train-mode BatchNorm (ops/batchnorm.py): value and gradient parity
with the plain jnp composition (== flax.linen.BatchNorm train semantics)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multimodal_scene_text_recognition_tpu.ops import batchnorm as bnops


def _plain_bn(x, scale, bias, eps=1e-5):
    """The exact composition flax.linen.BatchNorm executes in train mode."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axes)
    var = jnp.maximum(jnp.mean(xf * xf, axes) - mean * mean, 0.0)
    y = (xf - mean) * (jax.lax.rsqrt(var + eps) * scale) + bias
    return y.astype(x.dtype), mean, var


@pytest.mark.parametrize("shape,dtype", [
    ((8, 4, 6, 16), jnp.float32),
    ((16, 3, 5, 32), jnp.bfloat16),
])
def test_bn_forward_matches_plain(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), dtype)
    scale = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)

    y, mean, var = bnops.bn_train(x, scale, bias)
    y_ref, mean_ref, var_ref = _plain_bn(x, scale, bias)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(mean, mean_ref, atol=1e-6)
    np.testing.assert_allclose(var, var_ref, atol=1e-6)


def test_bn_forward_matches_flax_module():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 4, 6, 24)), jnp.float32)
    mod = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y_ref, _ = mod.apply(variables, x, mutable=["batch_stats"])
    scale = variables["params"]["scale"]
    bias = variables["params"]["bias"]
    y, _, _ = bnops.bn_train(x, scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("shape", [(8, 4, 6, 16), (64, 2, 3, 8)])
def test_bn_gradient_matches_autodiff(shape):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    scale = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
    w = jnp.asarray(rng.normal(size=shape), jnp.float32)

    def loss_fused(x, s, b):
        y, _, _ = bnops.bn_train(x, s, b)
        return jnp.sum(y.astype(jnp.float32) * w)

    def loss_plain(x, s, b):
        y, _, _ = _plain_bn(x, s, b)
        return jnp.sum(y.astype(jnp.float32) * w)

    gx, gs, gb = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    rx, rs, rb = jax.grad(loss_plain, argnums=(0, 1, 2))(x, scale, bias)
    np.testing.assert_allclose(gx, rx, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gs, rs, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gb, rb, atol=1e-4, rtol=1e-4)


def test_bn_pallas_reduce_interpret_matches_jnp():
    """The Pallas reduction kernel itself (interpret mode), incl. a ragged
    tail tile that must be masked."""
    rng = np.random.default_rng(3)
    n, c = 2500, 128  # not a multiple of the 1024-row tile
    x = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
    dy = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
    mean = jnp.asarray(rng.normal(size=c), jnp.float32)
    rstd = jnp.asarray(rng.uniform(0.5, 2.0, size=c), jnp.float32)

    import jax.experimental.pallas as pl  # noqa: F401
    from unittest import mock

    real_call = bnops.pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    with mock.patch.object(bnops.pl, "pallas_call", interp_call):
        dg, db = bnops._bn_bwd_sums_pallas(x, dy, mean, rstd)
    dg_ref, db_ref = bnops._bn_bwd_sums_jnp(x, dy, mean, rstd)
    np.testing.assert_allclose(dg, dg_ref, atol=1e-2, rtol=1e-4)
    np.testing.assert_allclose(db, db_ref, atol=1e-2, rtol=1e-4)


def test_bn_grad_bf16_close_to_f32_reference():
    """bf16 activations through the fused vjp stay close to an f32 oracle."""
    rng = np.random.default_rng(4)
    shape = (32, 2, 4, 16)
    xf = rng.normal(size=shape).astype(np.float32)
    x = jnp.asarray(xf, jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)

    def loss_fused(x, s, b):
        y, _, _ = bnops.bn_train(x, s, b)
        return jnp.mean(y.astype(jnp.float32) ** 2)

    def loss_plain(x, s, b):
        y, _, _ = _plain_bn(x, s, b)
        return jnp.mean(y.astype(jnp.float32) ** 2)

    g = jax.grad(loss_fused, argnums=1)(x, scale, bias)
    r = jax.grad(loss_plain, argnums=1)(jnp.asarray(xf), scale, bias)
    np.testing.assert_allclose(g, r, atol=5e-2, rtol=5e-2)
