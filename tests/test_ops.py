"""Op-level golden tests against torch CPU primitives (SURVEY.md §4 Unit).

torch is used ONLY as an oracle: we compare our TPU-native formulations
against the exact primitives the reference calls (`F.grid_sample`, `nn.LSTM`,
`nn.MultiheadAttention`) with identical weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from multimodal_scene_text_recognition_tpu.ops import tps
from multimodal_scene_text_recognition_tpu.ops.attention import (
    MHAWeights,
    causal_mask,
    mha_with_kv_cache,
    multihead_attention,
)
from multimodal_scene_text_recognition_tpu.ops.grid_sample import (
    grid_sample,
    grid_sample_hybrid,
)
from multimodal_scene_text_recognition_tpu.ops.lstm import LSTMWeights, bilstm, lstm_scan

RNG = np.random.default_rng(0)


# ---------------------------------------------------------------------------
# grid_sample
# ---------------------------------------------------------------------------


def _rand_grid(B, H, W, scale=1.2):
    # include out-of-bounds coords to exercise border clamping
    return (RNG.random((B, H, W, 2), dtype=np.float32) * 2 - 1) * scale


@pytest.mark.parametrize("C", [1, 3])
def test_grid_sample_matches_torch(C):
    B, H, W = 4, 32, 100
    img = RNG.random((B, H, W, C), dtype=np.float32)
    grid = _rand_grid(B, H, W)

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)  # NCHW
    tgrid = torch.from_numpy(grid)
    ref = TF.grid_sample(timg, tgrid, mode="bilinear", padding_mode="border",
                         align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_grid_sample_grad_matches_torch():
    B, H, W = 2, 8, 10
    img = RNG.random((B, H, W, 1), dtype=np.float32)
    grid = _rand_grid(B, H, W, scale=0.9)

    def loss_jax(i, g):
        return jnp.sum(grid_sample(i, g) ** 2)

    gi, gg = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(grid))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2).requires_grad_(True)
    tgrid = torch.from_numpy(grid).requires_grad_(True)
    out = TF.grid_sample(timg, tgrid, mode="bilinear", padding_mode="border",
                         align_corners=True)
    (out**2).sum().backward()

    np.testing.assert_allclose(
        np.asarray(gi)[..., 0], timg.grad.numpy()[:, 0], atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(gg), tgrid.grad.numpy(), atol=1e-4, rtol=1e-4)


def test_grid_sample_hybrid_cpu_fallback():
    B, H, W = 2, 32, 100
    img = RNG.random((B, H, W, 1), dtype=np.float32)
    grid = _rand_grid(B, H, W)
    a = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    b = np.asarray(grid_sample_hybrid(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(a, b, atol=1e-6)


# ---------------------------------------------------------------------------
# TPS grid generation
# ---------------------------------------------------------------------------


def test_tps_identity_warp():
    """With predicted fiducials equal to the canonical C the warp is identity."""
    F = 20
    C_prime = tps.build_fiducial_grid(F).astype(np.float32).reshape(1, F, 2)
    grid = np.asarray(tps.build_sampling_grid(jnp.asarray(C_prime), 32, 100))
    # expected: the canonical P grid (cell-centre coords)
    gx = (np.arange(-100, 100, 2) + 1.0) / 100
    gy = (np.arange(-32, 32, 2) + 1.0) / 32
    P = np.stack(np.meshgrid(gx, gy), axis=2)
    np.testing.assert_allclose(grid[0], P, atol=1e-4)


def test_tps_constants_shapes_and_inverse():
    inv_delta_C, P_hat = tps.tps_constants(20, 32, 100)
    assert inv_delta_C.shape == (23, 23)
    assert P_hat.shape == (3200, 23)
    # inv_delta_C is a true inverse of the TPS system matrix
    C = tps.build_fiducial_grid(20)
    hat_C = np.linalg.norm(C[:, None] - C[None, :], axis=2)
    np.fill_diagonal(hat_C, 1.0)
    hat_C = hat_C**2 * np.log(hat_C)
    delta_C = np.block(
        [
            [np.ones((20, 1)), C, hat_C],
            [np.zeros((2, 3)), C.T],
            [np.zeros((1, 3)), np.ones((1, 20))],
        ]
    )
    np.testing.assert_allclose(inv_delta_C @ delta_C, np.eye(23), atol=1e-4)


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------


def _torch_lstm_weights(lstm, suffix=""):
    return LSTMWeights(
        w_ih=jnp.asarray(getattr(lstm, f"weight_ih_l0{suffix}").detach().numpy().T),
        w_hh=jnp.asarray(getattr(lstm, f"weight_hh_l0{suffix}").detach().numpy().T),
        b_ih=jnp.asarray(getattr(lstm, f"bias_ih_l0{suffix}").detach().numpy()),
        b_hh=jnp.asarray(getattr(lstm, f"bias_hh_l0{suffix}").detach().numpy()),
    )


def test_lstm_scan_matches_torch():
    B, T, I, H = 3, 26, 16, 8
    x = RNG.standard_normal((B, T, I), dtype=np.float32)
    tl = torch.nn.LSTM(I, H, batch_first=True)
    ref, _ = tl(torch.from_numpy(x))
    ours = lstm_scan(jnp.asarray(x), _torch_lstm_weights(tl))
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=1e-5)


def test_bilstm_matches_torch():
    B, T, I, H = 3, 26, 16, 8
    x = RNG.standard_normal((B, T, I), dtype=np.float32)
    tl = torch.nn.LSTM(I, H, batch_first=True, bidirectional=True)
    ref, _ = tl(torch.from_numpy(x))
    ours = bilstm(
        jnp.asarray(x), _torch_lstm_weights(tl), _torch_lstm_weights(tl, "_reverse")
    )
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# Multi-head attention
# ---------------------------------------------------------------------------


def _torch_mha_weights(mha):
    return MHAWeights(
        w_qkv=jnp.asarray(mha.in_proj_weight.detach().numpy().T),
        b_qkv=jnp.asarray(mha.in_proj_bias.detach().numpy()),
        w_out=jnp.asarray(mha.out_proj.weight.detach().numpy().T),
        b_out=jnp.asarray(mha.out_proj.bias.detach().numpy()),
    )


def test_mha_matches_torch():
    B, T, E, H = 2, 26, 32, 4
    q = RNG.standard_normal((B, T, E), dtype=np.float32)
    kv = RNG.standard_normal((B, 10, E), dtype=np.float32)
    tm = torch.nn.MultiheadAttention(E, H)
    tm.eval()
    ref, _ = tm(
        torch.from_numpy(q).transpose(0, 1),
        torch.from_numpy(kv).transpose(0, 1),
        torch.from_numpy(kv).transpose(0, 1),
    )
    ours = multihead_attention(
        jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), _torch_mha_weights(tm), H
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.transpose(0, 1).detach().numpy(), atol=1e-5
    )


def test_mha_causal_matches_torch():
    B, T, E, H = 2, 12, 32, 4
    x = RNG.standard_normal((B, T, E), dtype=np.float32)
    tm = torch.nn.MultiheadAttention(E, H)
    tm.eval()
    tmask = torch.triu(torch.full((T, T), float("-inf")), diagonal=1)
    ref, _ = tm(*([torch.from_numpy(x).transpose(0, 1)] * 3), attn_mask=tmask)
    ours = multihead_attention(
        jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
        _torch_mha_weights(tm), H, mask=causal_mask(T),
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.transpose(0, 1).detach().numpy(), atol=1e-5
    )


def test_kv_cache_decode_matches_full_pass():
    """Step-by-step cached self-attention == full causal pass."""
    B, T, E, H = 2, 8, 32, 4
    x = RNG.standard_normal((B, T, E), dtype=np.float32)
    tm = torch.nn.MultiheadAttention(E, H)
    w = _torch_mha_weights(tm)

    full = multihead_attention(
        jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), w, H, mask=causal_mask(T)
    )

    k_cache = jnp.zeros((B, T, E))
    v_cache = jnp.zeros((B, T, E))
    outs = []
    for t in range(T):
        out_t, k_cache, v_cache = mha_with_kv_cache(
            jnp.asarray(x[:, t : t + 1]), k_cache, v_cache, jnp.int32(t), w, H
        )
        outs.append(out_t)
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full), atol=1e-5)
