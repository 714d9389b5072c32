"""ctypes bindings for the native image-preprocessing library.

Loads ``native/libimgproc.so`` (building it with ``make`` on first use if
the toolchain is present) and exposes:
  * :func:`crop_resize_gray_batch` — batched multithreaded crop + bilinear
    resize + [0,1] normalise, the host hot loop of the input pipeline.
Falls back to an equivalent vectorised numpy implementation when the
library is unavailable, so the pipeline never hard-depends on the build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libimgproc.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_SO_PATH)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.crop_resize_gray_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),                  # srcs
            ctypes.POINTER(ctypes.c_int),                     # hs
            ctypes.POINTER(ctypes.c_int),                     # ws
            ctypes.POINTER(ctypes.c_float),                   # boxes
            ctypes.c_int,                                     # n
            ctypes.POINTER(ctypes.c_float),                   # out
            ctypes.c_int, ctypes.c_int, ctypes.c_int,         # oh, ow, threads
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def crop_resize_gray_batch(
    images: Sequence[np.ndarray],
    boxes: np.ndarray,
    out_h: int = 32,
    out_w: int = 100,
    threads: int = 8,
    force_numpy: bool = False,
) -> np.ndarray:
    """Crop each grayscale page to its xywh box and resize to (out_h, out_w).

    Args:
      images: list of uint8 [H_i, W_i] grayscale arrays (C-contiguous).
      boxes:  float32 [N, 4] xywh crop boxes.
    Returns float32 [N, out_h, out_w, 1] in [0, 1].
    """
    n = len(images)
    boxes = np.ascontiguousarray(boxes, np.float32)
    assert boxes.shape == (n, 4)
    lib = None if force_numpy else _load()
    if lib is None:
        return _numpy_impl(images, boxes, out_h, out_w)

    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    srcs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in images]
    )
    hs = (ctypes.c_int * n)(*[im.shape[0] for im in images])
    ws = (ctypes.c_int * n)(*[im.shape[1] for im in images])
    out = np.empty((n, out_h, out_w), np.float32)
    lib.crop_resize_gray_batch(
        srcs, hs, ws,
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_h, out_w, threads,
    )
    return out[..., None]


def _numpy_impl(images, boxes, out_h, out_w):
    """Vectorised numpy mirror of the C++ kernel (same half-pixel-centre,
    clamped bilinear sampling)."""
    n = len(images)
    out = np.empty((n, out_h, out_w), np.float32)
    oy = np.arange(out_h, dtype=np.float32)
    ox = np.arange(out_w, dtype=np.float32)
    for i in range(n):
        img = images[i].astype(np.float32)
        h, w = img.shape
        bx, by, bw, bh = boxes[i]
        bw = max(bw, 1.0)
        bh = max(bh, 1.0)
        fy = by + (oy + 0.5) * (bh / out_h) - 0.5
        fy = np.clip(fy, max(by, 0.0), min(by + bh - 1.0, h - 1))
        fy = np.clip(fy, 0.0, h - 1)
        fx = bx + (ox + 0.5) * (bw / out_w) - 0.5
        fx = np.clip(fx, max(bx, 0.0), min(bx + bw - 1.0, w - 1))
        fx = np.clip(fx, 0.0, w - 1)
        y0 = fy.astype(np.int32)
        y1 = np.minimum(y0 + 1, h - 1)
        x0 = fx.astype(np.int32)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = (fy - y0)[:, None]
        wx = (fx - x0)[None, :]
        top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
        bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
        out[i] = (top * (1 - wy) + bot * wy) / 255.0
    return out[..., None]
