"""TextOCR annotation parsing + dataset.

Capability parity with reference coco_dataset.py:23-57,195-237: load the
split's TextOCR json, drop illegible annotations (utf8_string == '.'),
attach per-image vinvl object tags from open_images_vinvl_features.json,
compute overlap/scene vectors, charset/length-filter train annotations.
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

from ..core.charset import check_text
from ..core.config import Config
from . import geometry
from .cocotext import CocoTextAnnotation, CocoTextSamples


def build_textocr_annotations(cfg: Config, split: str) -> List[CocoTextAnnotation]:
    """Startup path (reference: coco_dataset.py:195-237)."""
    mcfg = cfg.model
    anno_path = os.path.join(cfg.data.textocr_anno_path, f"TextOCR_{split}.json")
    with open(anno_path) as f:
        data = json.load(f)
    with open(cfg.data.textocr_object_tags_path) as f:
        object_tags = json.load(f)

    out: List[CocoTextAnnotation] = []
    for anno_id, anno in data["anns"].items():
        label = anno.get("utf8_string", "")
        if label == ".":  # TextOCR illegibility marker (reference:215)
            continue
        img = data["imgs"][anno["image_id"]]
        if img.get("set") != split:
            continue
        # reference:224 skips annotations without object features entirely
        if str(anno["image_id"]) not in object_tags:
            continue
        if split == "train" and not check_text(label, mcfg.chars, mcfg.max_text_length):
            continue

        objs = object_tags[str(anno["image_id"])].get("vinvl", [])
        overlap: List[int] = []
        scene: List[int] = []
        if objs:
            classes = np.asarray([o["class"] for o in objs])
            boxes = np.asarray([o["bbox"] for o in objs], np.float64)
            overlap = geometry.overlap_vector(
                anno["bbox"], anno.get("area", 0.0), classes, boxes,
                mcfg.semantic_assignment,
            )
            scene, _ = geometry.scene_vector(classes)

        out.append(
            CocoTextAnnotation(
                anno_id=_to_int_id(anno_id),
                image_path=os.path.join(
                    cfg.data.textocr_image_path, img["file_name"]
                ),
                bbox=tuple(anno["bbox"]),
                label=label,
                overlap=overlap,
                scene=scene,
            )
        )
    return out


def _to_int_id(anno_id) -> int:
    """TextOCR ids can be strings; hash the non-numeric ones stably."""
    try:
        return int(anno_id)
    except (TypeError, ValueError):
        import zlib

        return zlib.crc32(str(anno_id).encode())


def get_textocr_datasets(cfg: Config):
    """Loader factory (reference: coco_dataset.py:45-57)."""
    train = CocoTextSamples(build_textocr_annotations(cfg, "train"), cfg)
    val = CocoTextSamples(build_textocr_annotations(cfg, "val"), cfg)
    print(f"  - textocr: {len(train)} train / {len(val)} val word crops")
    return train, val
