"""Folder-of-images dataset for ad-hoc inference.

Capability parity with reference dataset.py:219-253 (RawDataset): walk a
directory tree for image files (natural-sorted), grayscale + resize each to
the model input; labels default to the empty string (the reference yields
the image path as its "label").
"""

from __future__ import annotations

import os
import re
from typing import List

import numpy as np

from .synthetic import SyntheticSample

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".ppm", ".webp")


def natural_key(s: str):
    """Natural sort key (reference uses natsort, dataset.py:251)."""
    return [int(t) if t.isdigit() else t.lower() for t in re.split(r"(\d+)", s)]


def list_images(root: str) -> List[str]:
    paths = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.lower().endswith(IMAGE_EXTS):
                paths.append(os.path.join(dirpath, f))
    return sorted(paths, key=natural_key)


class RawImageFolder:
    """Sequence of samples over a directory of crop images."""

    def __init__(self, root: str, img_h: int = 32, img_w: int = 100):
        self.paths = list_images(root)
        self.img_h, self.img_w = img_h, img_w

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, i: int) -> SyntheticSample:
        from PIL import Image

        path = self.paths[i]
        img = Image.open(path).convert("L").resize(
            (self.img_w, self.img_h), Image.BILINEAR
        )
        return SyntheticSample(
            anno_id=i,
            image=(np.asarray(img, np.float32) / 255.0)[..., None],
            label=os.path.basename(path),
            overlap=np.zeros(15, np.int32),
            scene=np.zeros(52, np.int32),
            ious=np.full(52, -1000.0, np.float32),
        )
