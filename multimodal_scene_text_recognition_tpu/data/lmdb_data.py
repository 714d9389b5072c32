"""LMDB synthetic-corpus readers (MJSynth/SynthText) + legacy capabilities.

Capability parity with:
  * reference coco_dataset.py:386-470 (LmdbDataset: charset/length filter at
    open, per-sample jpeg decode + grayscale + resize, corrupted-image dummy
    substitution) and :128-145 (get_synth_datasets: MJ train/test/valid + ST
    concatenated for training, the benchmark LMDB for validation);
  * reference dataset.py:17-100 (Batch_Balanced_Dataset: per-source batch
    ratios) via :class:`BalancedMixture`;
  * reference dataset.py:270-326 (keep-ratio pad collate) via
    :func:`keep_ratio_resize`.

lmdb is an optional dependency — importing this module without it only
fails when an LMDB reader is actually constructed.
"""

from __future__ import annotations

import io
import os
import re
from typing import List, Sequence

import numpy as np

from ..core.config import Config
from .synthetic import SyntheticSample


class LmdbReader:
    """Filtered reader over a clovaai-layout LMDB (keys image-%09d /
    label-%09d, 1-based; 'num-samples' count)."""

    def __init__(
        self,
        root: str,
        chars: str,
        max_len: int = 25,
        img_h: int = 32,
        img_w: int = 100,
        filter_charset: bool = True,
        keep_ratio: bool = False,
    ):
        import lmdb

        self.root = root
        self.img_h, self.img_w = img_h, img_w
        self.chars = chars
        self.keep_ratio = keep_ratio
        self.env = lmdb.open(
            root, max_readers=32, readonly=True, lock=False,
            readahead=False, meminit=False,
        )
        with self.env.begin(write=False) as txn:
            n = int(txn.get(b"num-samples"))
            if not filter_charset:
                self.index = list(range(1, n + 1))
            else:
                # filter over-length / out-of-charset labels at open
                # (reference: coco_dataset.py:403-434; lowercased match like
                # the reference's re.search on label.lower(), :429)
                self.index = []
                bad = re.compile(f"[^{re.escape(chars)}]")
                for i in range(1, n + 1):
                    label = txn.get(b"label-%09d" % i).decode("utf-8")
                    if len(label) > max_len + 1:
                        continue
                    if bad.search(label.lower()):
                        continue
                    self.index.append(i)

    def __len__(self) -> int:
        return len(self.index)

    def __getitem__(self, i: int) -> SyntheticSample:
        from PIL import Image

        idx = self.index[i]
        with self.env.begin(write=False) as txn:
            label = txn.get(b"label-%09d" % idx).decode("utf-8")
            buf = txn.get(b"image-%09d" % idx)
        try:
            img = Image.open(io.BytesIO(buf)).convert("L")
            if self.keep_ratio:
                # aspect-preserving resize + border right-pad
                # (reference dataset.py:270-326 AlignCollate keep_ratio)
                raw = (np.asarray(img, np.float32) / 255.0)[..., None]
                arr = keep_ratio_resize(raw, self.img_h, self.img_w)
            else:
                img = img.resize((self.img_w, self.img_h), Image.BILINEAR)
                arr = (np.asarray(img, np.float32) / 255.0)[..., None]
        except OSError:
            # corrupted-image dummy substitution (reference: 457-461)
            arr = np.zeros((self.img_h, self.img_w, 1), np.float32)
            label = "[dummy_label]"
        label = re.sub(f"[^{re.escape(self.chars)}]", "", label)
        return SyntheticSample(
            anno_id=idx,
            image=arr,
            label=label[:25],
            overlap=np.zeros(15, np.int32),
            scene=np.zeros(52, np.int32),
            ious=np.full(52, -1000.0, np.float32),
        )


class ConcatSamples:
    """Concatenation of sample sequences (torch ConcatDataset capability,
    reference: coco_dataset.py:136)."""

    def __init__(self, parts: Sequence):
        self.parts = list(parts)
        self.offsets = np.cumsum([0] + [len(p) for p in self.parts])

    def __len__(self) -> int:
        return int(self.offsets[-1])

    def __getitem__(self, i: int):
        j = int(np.searchsorted(self.offsets, i, side="right")) - 1
        return self.parts[j][i - int(self.offsets[j])]


class BalancedMixture:
    """Batch-balanced multi-source sampling (reference: dataset.py:17-100):
    each batch draws a fixed quota from every source per its ratio; sources
    rewind independently, so small sources oversample."""

    def __init__(self, sources: Sequence, ratios: Sequence[float],
                 batch_size: int, seed: int = 0):
        assert len(sources) == len(ratios)
        total = sum(ratios)
        self.sources = list(sources)
        self.quotas = [max(1, round(batch_size * r / total)) for r in ratios]
        # give the remainder to the largest-ratio source
        drift = batch_size - sum(self.quotas)
        self.quotas[int(np.argmax(ratios))] += drift
        self.rng = np.random.default_rng(seed)
        self._perm = [self.rng.permutation(len(s)) for s in self.sources]
        self._pos = [0] * len(self.sources)

    def next_batch(self) -> List:
        out = []
        for si, (src, quota) in enumerate(zip(self.sources, self.quotas)):
            for _ in range(quota):
                if self._pos[si] >= len(src):
                    self._perm[si] = self.rng.permutation(len(src))
                    self._pos[si] = 0
                out.append(src[int(self._perm[si][self._pos[si]])])
                self._pos[si] += 1
        return out


def keep_ratio_resize(
    img: np.ndarray, out_h: int = 32, out_w: int = 100
) -> np.ndarray:
    """Keep-ratio resize + right-pad with the border column (reference:
    dataset.py:270-326 NormalizePAD/AlignCollate capability)."""
    from PIL import Image

    h, w = img.shape[:2]
    ratio = w / max(h, 1)
    new_w = min(out_w, max(1, int(np.ceil(out_h * ratio))))
    pil = Image.fromarray((img[..., 0] * 255).astype(np.uint8))
    pil = pil.resize((new_w, out_h), Image.BICUBIC)
    arr = np.asarray(pil, np.float32) / 255.0
    out = np.zeros((out_h, out_w), np.float32)
    out[:, :new_w] = arr
    if new_w < out_w:  # replicate border column (reference: dataset.py:283)
        out[:, new_w:] = arr[:, -1:]
    return out[..., None]


def get_synth_datasets(cfg: Config):
    """MJ + ST training corpus and the benchmark validation LMDB
    (reference: coco_dataset.py:128-145).

    With ``data.mixture_ratios`` (e.g. "0.5,0.5") the train side is a
    :class:`BalancedMixture` over [MJ, ST] — each batch draws the
    configured quota from each source, sources rewind independently
    (reference dataset.py:17-100); otherwise plain concatenation.
    ``data.keep_ratio`` routes every crop through the aspect-preserving
    pad collate (reference dataset.py:270-326)."""
    base = cfg.data.deep_text_dataset_path
    chars = cfg.model.chars

    def reader(rel):
        return LmdbReader(os.path.join(base, rel), chars,
                          cfg.model.max_text_length,
                          cfg.model.img_h, cfg.model.img_w,
                          keep_ratio=cfg.data.keep_ratio)

    mj = ConcatSamples([
        reader("training/MJ/MJ_train/"),
        reader("training/MJ/MJ_test/"),
        reader("training/MJ/MJ_valid/"),
    ])
    st = reader("training/ST/")
    if cfg.data.mixture_ratios:
        ratios = [float(r) for r in cfg.data.mixture_ratios.split(",")]
        if len(ratios) != 2:
            raise ValueError(
                "data.mixture_ratios must be two comma floats (MJ,ST), got "
                f"{cfg.data.mixture_ratios!r}")
        train = BalancedMixture([mj, st], ratios, cfg.train.batch_size,
                                seed=cfg.train.seed)
        n_train = len(mj) + len(st)
    else:
        train = ConcatSamples([mj, st])
        n_train = len(train)
    val = reader("validation/")
    print(f"  - synth: {n_train} train / {len(val)} val samples"
          + (f" (balanced mixture {cfg.data.mixture_ratios})"
             if cfg.data.mixture_ratios else ""))
    return train, val
