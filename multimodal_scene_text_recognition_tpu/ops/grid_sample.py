"""Bilinear grid sampling as MXU matmuls — the TPU-native `F.grid_sample`.

The reference warps crops with ``F.grid_sample(img, grid,
padding_mode='border', align_corners=True)`` (reference:
modules/transformation.py:34).  A literal port would be a gather — the worst
primitive on TPU.  Instead we use the identity

    out[n] = sum_{r,c}  wy[n, r] * wx[n, c] * I[r, c]

where ``wy[n, r] = relu(1 - |y_src[n] - r|)`` is the bilinear hat weight of
source row r for output pixel n (two nonzeros per row), and likewise ``wx``.
Border padding == clamping the source coordinate to [0, S-1] before building
the weights; align_corners=True == mapping g in [-1,1] to g' = (g+1)/2*(S-1).

That turns sampling into one [N, H] x [H, W] matmul plus an elementwise
multiply-reduce over [N, W] — pure MXU/VPU, no gathers, and differentiable
(the VJP XLA derives from this formula equals the analytic grid_sample
gradient in border mode).

Two implementations:
  * :func:`grid_sample` — jnp; XLA fuses weight construction into the matmul
    epilogue.  Used everywhere (CPU tests included).
  * :func:`grid_sample_pallas` — fused Pallas kernel (weights built in VMEM,
    single pass over HBM) for the production TPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _source_coords(grid: jnp.ndarray, size: int) -> jnp.ndarray:
    """Map normalised grid coords [-1, 1] to clamped pixel coords [0, size-1]
    (align_corners=True + border padding)."""
    pix = (grid + 1.0) * 0.5 * (size - 1)
    return jnp.clip(pix, 0.0, size - 1.0)


def _hat_weights(src: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear hat weights: W[..., n, r] = relu(1 - |src[..., n] - r|).

    Rows sum to 1 for src in [0, size-1] — exactly the two-tap lerp weights.
    """
    idx = jax.lax.broadcasted_iota(jnp.float32, (1, size), 1)  # [1, size]
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - idx[0]))


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Bilinear sample ``img`` at ``grid`` (border padding, align_corners).

    Args:
      img:  [B, H, W, C] input (NHWC — TPU-native layout).
      grid: [B, Ho, Wo, 2] normalised (x, y) sample locations in [-1, 1]
            (same layout as torch: last dim is (x, y)).
      precision: matmul precision.  HIGHEST (default) gives torch-level
        pixel parity; DEFAULT uses a single bf16 MXU pass (~4e-3 pixel
        error on [0,1] images) and is ~3x faster — fine for training.

    Returns:
      [B, Ho, Wo, C] sampled output.
    """
    B, H, W, C = img.shape
    _, Ho, Wo, _ = grid.shape
    N = Ho * Wo

    gx = grid[..., 0].reshape(B, N)
    gy = grid[..., 1].reshape(B, N)
    sx = _source_coords(gx, W)  # [B, N]
    sy = _source_coords(gy, H)

    wy = _hat_weights(sy, H)  # [B, N, H]
    wx = _hat_weights(sx, W)  # [B, N, W]

    # rows[b, n, w, c] = sum_h wy[b, n, h] * img[b, h, w, c]
    rows = jnp.einsum("bnh,bhwc->bnwc", wy, img.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=precision)
    # out[b, n, c] = sum_w wx[b, n, w] * rows[b, n, w, c]
    out = jnp.einsum("bnw,bnwc->bnc", wx, rows,
                     preferred_element_type=jnp.float32,
                     precision=precision)
    return out.reshape(B, Ho, Wo, C).astype(img.dtype)


# ---------------------------------------------------------------------------
# Pallas fused kernel: one batch element per grid step; image + weights live
# entirely in VMEM (32x128 padded image = 16 KB, weights 3200x(32+128) ~ 2 MB).
# ---------------------------------------------------------------------------


# batch elements per grid step — TPU pallas needs the sublane dim of each
# block divisible by 8 (or equal to the full array dim)
_B_BLK = 8


def _grid_sample_kernel(img_ref, gx_ref, gy_ref, out_ref, *, H, W, N):
    # iota must be integer-typed inside pallas (Mosaic constraint)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (N, H), 1).astype(jnp.float32)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (N, W), 1).astype(jnp.float32)

    def body(i, _):
        # sequential loop (not a static unroll) so only one iteration's
        # temporaries are live in VMEM at a time
        img = img_ref[i]      # [H, W]
        gx = gx_ref[i]        # [N]
        gy = gy_ref[i]

        sx = jnp.clip((gx + 1.0) * 0.5 * (W - 1), 0.0, W - 1.0)  # [N]
        sy = jnp.clip((gy + 1.0) * 0.5 * (H - 1), 0.0, H - 1.0)

        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[:, None] - row_idx))  # [N, H]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, None] - col_idx))  # [N, W]

        rows = jnp.dot(wy, img, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)          # [N, W]
        out_ref[i] = jnp.sum(rows * wx, axis=1)                      # [N]
        return 0

    jax.lax.fori_loop(0, _B_BLK, body, 0)


def grid_sample_pallas(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Fused Pallas version of :func:`grid_sample` for single-channel NHWC.

    Forward-only building block; gradients route through the jnp formulation
    via :func:`grid_sample_hybrid`.  Requires B % 8 == 0 (the TPU block
    constraint); callers fall back to the jnp path otherwise.
    """
    B, H, W, C = img.shape
    _, Ho, Wo, _ = grid.shape
    if C != 1:
        raise NotImplementedError("pallas grid_sample kernel supports C=1")
    if B % _B_BLK != 0:
        return grid_sample(img, grid)
    N = Ho * Wo

    gx = grid[..., 0].reshape(B, N)
    gy = grid[..., 1].reshape(B, N)
    img2 = img[..., 0]  # [B, H, W]

    kernel = functools.partial(_grid_sample_kernel, H=H, W=W, N=N)
    out = pl.pallas_call(
        kernel,
        grid=(B // _B_BLK,),
        in_specs=[
            pl.BlockSpec((_B_BLK, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B_BLK, N), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B_BLK, N), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_B_BLK, N), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * H * W // 16,  # sparse-in-effect matmul
            bytes_accessed=B * (H * W + 3 * N) * 4,
            transcendentals=0,
        ),
    )(img2, gx, gy)
    return out.reshape(B, Ho, Wo, 1).astype(img.dtype)


@jax.custom_vjp
def grid_sample_hybrid(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Pallas forward + XLA-derived backward.

    On non-TPU backends or multi-channel inputs, falls back to the jnp path.
    """
    return grid_sample(img, grid)


def _gsh_fwd(img, grid):
    use_pallas = img.shape[-1] == 1 and jax.default_backend() == "tpu"
    out = grid_sample_pallas(img, grid) if use_pallas else grid_sample(img, grid)
    return out, (img, grid)


def _gsh_bwd(res, g):
    img, grid = res
    _, vjp = jax.vjp(grid_sample, img, grid)
    return vjp(g)


grid_sample_hybrid.defvjp(_gsh_fwd, _gsh_bwd)
