"""Host input pipeline: collation, shuffling, prefetch.

Replaces the reference's single-process DataLoader with num_workers=0
(reference: coco_dataset.py:51-52 — every crop decoded in the training
process, between steps).  Here sample -> fixed-shape batch collation is
vectorised numpy, an optional thread pool overlaps decode with device
compute, and batches are device_put ahead of use (double buffering) so the
TPU never waits on the host.

Fixed-shape contract (XLA-friendly, SURVEY.md §7.2):
  image  f32 [B, 32, 100, 1]
  text   i32 [B, max_len+2]   (GO + chars + EOS + PAD)
  overlap i32 [B, 15]; scene i32 [B, 52]; ious f32 [B, 52]
The final short batch is dropped in training (shuffle loop) and padded +
masked in evaluation.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..core.charset import AttnCodec


def quantize_images(image: np.ndarray) -> np.ndarray:
    """f32 [0,1] -> uint8 for the wire.

    Crops come from uint8 sources (PIL / JPEG), so the round trip is
    lossless for real data; shipping uint8 is 4x less host->device traffic
    than f32 — the training loop's actual bottleneck on a tunneled or
    PCIe-attached chip.  The device side converts back in the jitted step
    (train.steps.prep_image).
    """
    if image.dtype == np.uint8:
        return image
    return np.clip(np.rint(image * 255.0), 0, 255).astype(np.uint8)


class PackedSamples:
    """Whole dataset pre-collated into contiguous arrays.

    Replaces per-batch Python collation (list-of-samples -> np.stack x5 +
    codec.encode, ~ms of single-core host time per batch) with one upfront
    pack; a batch is then five C-level fancy-index gathers.  Images are
    stored uint8 (4x smaller than f32 — matters both for host RAM on large
    corpora and for host->device transfer).
    """

    def __init__(self, image, text, overlap, scene, ious, anno_id,
                 labels: List[str]):
        self.image = image
        self.text = text
        self.overlap = overlap
        self.scene = scene
        self.ious = ious
        self.anno_id = anno_id
        self.labels = labels

    @classmethod
    def from_samples(cls, samples: Sequence, codec: AttnCodec) -> "PackedSamples":
        if isinstance(samples, cls):
            return samples
        labels = [s.label for s in samples]
        text, _ = codec.encode(labels)
        # quantize per-sample straight into the preallocated uint8 pack —
        # never materialize the corpus as float32 (a 500k-crop set would be
        # a ~6.4 GB transient; peak extra memory here is one crop)
        n = len(samples)
        first = np.asarray(samples[0].image)
        image = np.empty((n,) + first.shape, np.uint8)
        for i, s in enumerate(samples):
            image[i] = quantize_images(np.asarray(s.image))
        return cls(
            image=image,
            text=np.asarray(text, np.int32),
            overlap=np.stack([s.overlap for s in samples]).astype(np.int32),
            scene=np.stack([s.scene for s in samples]).astype(np.int32),
            ious=np.stack([s.ious for s in samples]).astype(np.float32),
            anno_id=np.asarray([s.anno_id for s in samples], np.int64),
            labels=labels,
        )

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i: int):
        """Sample-like view (``.image .label .overlap .scene .ious
        .anno_id``) so packed corpora satisfy the Sequence-of-samples
        protocol used by head-batch construction and spot checks."""
        from types import SimpleNamespace

        return SimpleNamespace(
            image=self.image[i], label=self.labels[i],
            overlap=self.overlap[i], scene=self.scene[i],
            ious=self.ious[i], anno_id=self.anno_id[i],
        )

    def take(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        return {
            "image": self.image[idx],
            "text": self.text[idx],
            "overlap": self.overlap[idx],
            "scene": self.scene[idx],
            "ious": self.ious[idx],
            "anno_id": self.anno_id[idx],
            "labels": [self.labels[j] for j in idx],
        }


def packed_batches(
    packed: PackedSamples,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epochs: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Batch iterator over a :class:`PackedSamples`; short final batches are
    zero-padded to ``batch_size`` with a 'valid' mask (eval path)."""
    rng = np.random.default_rng(seed)
    B = batch_size
    n = len(packed)
    for _ in range(epochs):
        order = np.arange(n)
        if shuffle:
            rng.shuffle(order)
        for i in range(0, n, B):
            idx = order[i : i + B]
            if len(idx) < B:
                if drop_last:
                    continue
                short = len(idx)
                batch = packed.take(np.concatenate(
                    [idx, np.zeros(B - short, np.int64)]))
                batch["labels"] = batch["labels"][:short] + [""] * (B - short)
                batch["valid"] = np.arange(B) < short
                yield batch
            else:
                yield packed.take(idx)


class Batcher:
    """Collate SyntheticSample-like objects (``.image .label .overlap .scene
    .ious .anno_id``) into fixed-shape numpy batches."""

    def __init__(self, codec: AttnCodec, batch_size: int):
        self.codec = codec
        self.batch_size = batch_size

    def collate(self, samples: Sequence) -> Dict[str, np.ndarray]:
        B = len(samples)
        text, _ = self.codec.encode([s.label for s in samples])
        imgs = np.stack([s.image for s in samples])
        if imgs.dtype != np.uint8:
            # uint8 stays uint8 on the wire (prep_image normalizes on
            # device); a float cast here would skip that normalization
            imgs = imgs.astype(np.float32)
        return {
            "image": imgs,
            "text": text,
            "overlap": np.stack([s.overlap for s in samples]).astype(np.int32),
            "scene": np.stack([s.scene for s in samples]).astype(np.int32),
            "ious": np.stack([s.ious for s in samples]).astype(np.float32),
            "anno_id": np.asarray([s.anno_id for s in samples], np.int64),
            "labels": [s.label for s in samples],
        }

    def pad_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Pad a short batch up to batch_size (eval path); adds 'valid'."""
        n = len(batch["labels"])
        if n == self.batch_size:
            return dict(batch, valid=np.ones(n, bool))
        pad = self.batch_size - n
        out = {}
        for k, v in batch.items():
            if k == "labels":
                out[k] = list(v) + [""] * pad
            else:
                out[k] = np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)]
                )
        out["valid"] = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        return out


def batches(
    samples: Sequence,
    batcher: Batcher,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epochs: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    rng = np.random.default_rng(seed)
    B = batcher.batch_size
    for _ in range(epochs):
        order = np.arange(len(samples))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order), B):
            idx = order[i : i + B]
            if len(idx) < B and drop_last:
                continue
            batch = batcher.collate([samples[j] for j in idx])
            if len(idx) < B:
                batch = batcher.pad_batch(batch)
            yield batch


class Prefetcher:
    """Background-thread prefetch: decouples host collation from the step
    loop (replacement capability for torch DataLoader workers)."""

    _DONE = object()

    def __init__(self, it: Iterator, depth: int = 4):
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.err: Optional[BaseException] = None

        def run():
            try:
                for item in it:
                    self.q.put(item)
            except BaseException as e:  # propagate into consumer
                self.err = e
            finally:
                self.q.put(self._DONE)

        self.thread = threading.Thread(target=run, daemon=True)
        self.thread.start()

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is self._DONE:
                if self.err is not None:
                    raise self.err
                return
            yield item


def device_batch(batch: Dict[str, np.ndarray], device_put=None) -> Dict:
    """Strip host-only fields and put arrays on device."""
    import jax

    arrays = {
        k: v
        for k, v in batch.items()
        if k in ("image", "text", "overlap", "scene", "ious")
    }
    if device_put is None:
        return jax.device_put(arrays)
    return device_put(arrays)
