"""Thin-plate-spline grid generation as precomputed constants + einsums.

Rebuilds the RARE GridGenerator math (reference: modules/transformation.py:
85-163).  All of `inv_delta_C` [F+3, F+3] and `P_hat` [n, F+3] are pure
functions of static shapes, so they are baked at trace time as numpy
constants; the per-batch work is two einsums that XLA maps onto the MXU
(replacing the reference's torch.bmm pair at transformation.py:161-162).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def build_fiducial_grid(F: int) -> np.ndarray:
    """Canonical fiducial points C on the top/bottom edges of I_r
    (reference: transformation.py:103-111).  Returns [F, 2] float64."""
    half = F // 2
    x = np.linspace(-1.0, 1.0, half)
    top = np.stack([x, -np.ones(half)], axis=1)
    bottom = np.stack([x, np.ones(half)], axis=1)
    return np.concatenate([top, bottom], axis=0)


def build_identity_bias(F: int) -> np.ndarray:
    """Localization-net output bias producing the identity warp
    (reference: transformation.py:66-72).  Returns [F*2] float32."""
    half = F // 2
    x = np.linspace(-1.0, 1.0, half)
    y_top = np.linspace(0.0, -1.0, half)
    y_bottom = np.linspace(1.0, 0.0, half)
    top = np.stack([x, y_top], axis=1)
    bottom = np.stack([x, y_bottom], axis=1)
    return np.concatenate([top, bottom], axis=0).reshape(-1).astype(np.float32)


@functools.lru_cache(maxsize=None)
def tps_constants(F: int, I_r_height: int, I_r_width: int) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute (inv_delta_C [F+3, F+3], P_hat [n, F+3]) as float32.

    Mirrors the reference's init-time numpy (transformation.py:113-152):
      * delta_C: TPS system matrix over fiducials C with U(r) = r^2 log r,
        diagonal seeded to 1 before the log (reference:121).
      * P: output-pixel grid at cell centres, normalised to (-1, 1)
        (reference:135-142).
      * P_hat: [1, x, y, U(|P - C|)] with eps=1e-6 inside the log
        (reference:144-152).
    """
    C = build_fiducial_grid(F)

    # --- inv_delta_C ---
    hat_C = np.linalg.norm(C[:, None, :] - C[None, :, :], axis=2)
    np.fill_diagonal(hat_C, 1.0)
    hat_C = (hat_C**2) * np.log(hat_C)
    delta_C = np.concatenate(
        [
            np.concatenate([np.ones((F, 1)), C, hat_C], axis=1),
            np.concatenate([np.zeros((2, 3)), C.T], axis=1),
            np.concatenate([np.zeros((1, 3)), np.ones((1, F))], axis=1),
        ],
        axis=0,
    )
    inv_delta_C = np.linalg.inv(delta_C)

    # --- P_hat ---
    gx = (np.arange(-I_r_width, I_r_width, 2) + 1.0) / I_r_width
    gy = (np.arange(-I_r_height, I_r_height, 2) + 1.0) / I_r_height
    P = np.stack(np.meshgrid(gx, gy), axis=2).reshape(-1, 2)  # [n, 2]
    n = P.shape[0]
    diff = P[:, None, :] - C[None, :, :]                      # [n, F, 2]
    rbf_norm = np.linalg.norm(diff, axis=2)
    rbf = (rbf_norm**2) * np.log(rbf_norm + 1e-6)
    P_hat = np.concatenate([np.ones((n, 1)), P, rbf], axis=1)  # [n, F+3]

    return inv_delta_C.astype(np.float32), P_hat.astype(np.float32)


def build_sampling_grid(
    batch_C_prime: jnp.ndarray, I_r_height: int, I_r_width: int
) -> jnp.ndarray:
    """Solve the TPS system and evaluate the warp grid.

    Args:
      batch_C_prime: [B, F, 2] predicted fiducial points in the input image.
    Returns:
      [B, I_r_height, I_r_width, 2] normalised (x, y) sample grid.

    Two MXU einsums replace the reference's repeat+bmm
    (transformation.py:154-163).
    """
    B, F, _ = batch_C_prime.shape
    inv_delta_C, P_hat = tps_constants(F, I_r_height, I_r_width)
    inv_delta_C = jnp.asarray(inv_delta_C)
    P_hat = jnp.asarray(P_hat)

    C_padded = jnp.concatenate(
        [batch_C_prime.astype(jnp.float32), jnp.zeros((B, 3, 2), jnp.float32)], axis=1
    )  # [B, F+3, 2]
    # HIGHEST precision: these produce sample *coordinates* — a bf16 MXU pass
    # would cost ~1e-2 absolute coordinate error (~half a pixel).
    T = jnp.einsum("ij,bjk->bik", inv_delta_C, C_padded,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)          # [B, F+3, 2]
    P_prime = jnp.einsum("nj,bjk->bnk", P_hat, T,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)    # [B, n, 2]
    return P_prime.reshape(B, I_r_height, I_r_width, 2)
