"""Small image utilities.

Capability parity with reference dataset.py:329-339 (tensor2im / save_image):
convert a model-input array back to a displayable uint8 image and save it —
used for inspecting pipeline output.
"""

from __future__ import annotations

import numpy as np


def array_to_image(arr: np.ndarray) -> np.ndarray:
    """[H, W, C] or [H, W] float array (either [0,1] or [-1,1] normalised)
    -> uint8 [H, W] / [H, W, C] image (reference: dataset.py:329-334)."""
    arr = np.asarray(arr)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    if arr.min() < 0:  # [-1, 1] normalisation (reference ResizeNormalize)
        arr = (arr + 1.0) / 2.0
    return np.clip(arr * 255.0, 0, 255).astype(np.uint8)


def save_image(arr: np.ndarray, path: str) -> None:
    """Save a model-input array as an image file (reference: dataset.py:337-339)."""
    from PIL import Image

    Image.fromarray(array_to_image(arr)).save(path)
