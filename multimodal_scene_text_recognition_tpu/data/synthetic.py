"""Synthetic rendered-text dataset.

Self-contained stand-in for the external corpora (COCO-Text / TextOCR /
MJ-ST live behind paths the reference hardcodes, reference: config.py:60-70,
and their blobs are not shipped).  Renders random strings onto 32x100
grayscale crops with PIL, with random distractor geometry, and fabricates
overlap/scene id vectors — shape-compatible with the real loaders
(coco_dataset.py:239-262): ``(anno_id, img[B,32,100,1], label, overlap[B,15],
scene[B,52], ious[B,52])``.

Used by the integration tests (SURVEY.md §4: "tiny synthetic dataset ->
one train step decreases loss") and the benchmark harness.
"""

from __future__ import annotations

import string
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

try:
    from PIL import Image, ImageDraw, ImageFont

    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False

_CHARS_EASY = string.ascii_letters + string.digits


def _font(size: int):
    """Font objects cached by size — load_default(size=..) re-parses the
    font file every call and dominates render time otherwise."""
    if size not in _FONT_CACHE:
        try:
            _FONT_CACHE[size] = ImageFont.load_default(size=size)
        except TypeError:  # older PIL: fixed-size bitmap font
            _FONT_CACHE[size] = ImageFont.load_default()
    return _FONT_CACHE[size]


_FONT_CACHE: dict = {}

# bump when _render output changes — part of the cache key so stale renders
# are never silently reused
_RENDER_VERSION = 1


def _cache_names(size, seed, max_len, chars, vocab_words, num_obj_classes):
    """Cache basenames: current key first, then legacy fallbacks whose
    content is identical (pre-round-2 files omitted num_obj_classes and the
    render version from the key; their default-parameter content matches)."""
    import hashlib

    vocab_key = "open" if vocab_words is None else hashlib.sha1(
        "\n".join(vocab_words).encode()).hexdigest()[:10]
    chars_key = hashlib.sha1(chars.encode()).hexdigest()[:6]
    current = (f"synth_{size}_{seed}_{max_len}_{chars_key}_{vocab_key}"
               f"_o{num_obj_classes}_v{_RENDER_VERSION}.npz")
    names = [current]
    if num_obj_classes == 2000:
        names.append(f"synth_{size}_{seed}_{max_len}_{chars_key}_{vocab_key}.npz")
    return names


@dataclass
class SyntheticSample:
    anno_id: int
    image: np.ndarray  # [32, 100, 1] float32 in [0, 1]
    label: str
    overlap: np.ndarray  # [15] int32
    scene: np.ndarray  # [52] int32
    ious: np.ndarray  # [52] float32


def _render(text: str, rng: np.random.Generator, h: int = 32, w: int = 100) -> np.ndarray:
    """Render a word crop: light background, dark text, mild jitter."""
    if not HAS_PIL:
        # fallback: encode chars as vertical bars (still learnable)
        img = np.zeros((h, w), np.float32)
        for i, c in enumerate(text[:20]):
            x = 2 + i * 5
            img[4 : h - 4, x : x + 3] = (ord(c) % 64) / 64.0
        return img[..., None]

    big_w, big_h = 200, 64
    bg = int(rng.integers(160, 255))
    fg = int(rng.integers(0, 90))
    img = Image.new("L", (big_w, big_h), color=bg)
    draw = ImageDraw.Draw(img)
    font = _font(int(rng.integers(28, 40)))
    x = int(rng.integers(0, 12))
    y = int(rng.integers(0, 10))
    draw.text((x, y), text, fill=fg, font=font)
    img = img.resize((w, h), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    noise = rng.normal(0, 0.02, arr.shape).astype(np.float32)
    return np.clip(arr + noise, 0, 1)[..., None]


def random_vocab(size: int, seed: int = 0, max_len: int = 10,
                 chars: str = _CHARS_EASY) -> List[str]:
    """Seeded closed vocabulary of random words."""
    rng = np.random.default_rng(seed + 777)
    out = []
    seen = set()
    while len(out) < size:
        n = int(rng.integers(2, max_len + 1))
        w = "".join(rng.choice(list(chars), n))
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def make_dataset(
    size: int,
    seed: int = 0,
    max_len: int = 10,
    chars: str = _CHARS_EASY,
    vocab_words: Optional[Sequence[str]] = None,
    num_obj_classes: int = 2000,
    workers: int = 8,
    cache_dir: Optional[str] = None,
) -> List[SyntheticSample]:
    """Deterministic synthetic set; rendering is thread-parallel (PIL
    releases the GIL in draw/resize) with one child RNG per sample so the
    output is independent of worker count."""
    rng = np.random.default_rng(seed)

    cache_path = None
    if cache_dir:
        import os

        names = _cache_names(size, seed, max_len, chars, vocab_words,
                             num_obj_classes)
        cache_path = os.path.join(cache_dir, names[0])
        for name in names:
            p = os.path.join(cache_dir, name)
            if os.path.exists(p):
                z = np.load(p, allow_pickle=False)
                labels = [l for l in z["labels"]]
                img = z["image"].astype(np.float32) / 255.0
                return [
                    SyntheticSample(
                        anno_id=int(z["anno_id"][i]), image=img[i],
                        label=str(labels[i]), overlap=z["overlap"][i],
                        scene=z["scene"][i], ious=z["ious"][i],
                    )
                    for i in range(len(labels))
                ]

    metas = []
    for i in range(size):
        if vocab_words is not None:
            label = vocab_words[int(rng.integers(0, len(vocab_words)))]
        else:
            n = int(rng.integers(1, max_len + 1))
            label = "".join(rng.choice(list(chars), n))
        overlap = np.zeros(15, np.int32)
        n_ov = int(rng.integers(0, 5))
        overlap[:n_ov] = rng.integers(1, num_obj_classes, n_ov)
        scene = np.zeros(52, np.int32)
        n_sc = int(rng.integers(1, 20))
        scene[:n_sc] = rng.integers(1, num_obj_classes, n_sc)
        metas.append((i, label, overlap, scene))

    render_rngs = rng.spawn(size)

    def build(args):
        (i, label, overlap, scene), r = args
        # quantize fresh renders through the same uint8 roundtrip the cache
        # applies, so first-run and cached-rerun datasets are bit-identical
        img = _render(label, r)
        img = np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
        return SyntheticSample(
            anno_id=i,
            image=img.astype(np.float32) / 255.0,
            label=label,
            overlap=overlap,
            scene=scene,
            ious=np.full(52, -1000.0, np.float32),
        )

    work = list(zip(metas, render_rngs))
    if workers > 1 and size >= 64:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            out = list(pool.map(build, work))
    else:
        out = [build(w) for w in work]

    if cache_path is not None:
        import os

        os.makedirs(cache_dir, exist_ok=True)
        np.savez(
            cache_path,
            image=np.stack([
                np.clip(np.rint(s.image * 255.0), 0, 255).astype(np.uint8)
                for s in out
            ]),
            labels=np.asarray([s.label for s in out]),
            overlap=np.stack([s.overlap for s in out]),
            scene=np.stack([s.scene for s in out]),
            ious=np.stack([s.ious for s in out]),
            anno_id=np.asarray([s.anno_id for s in out], np.int64),
        )
    return out


def make_packed_dataset(
    codec,
    size: int,
    seed: int = 0,
    max_len: int = 10,
    chars: str = _CHARS_EASY,
    vocab_words: Optional[Sequence[str]] = None,
    num_obj_classes: int = 2000,
    workers: int = 8,
    cache_dir: Optional[str] = None,
):
    """Render (or load from cache) straight into a ``PackedSamples``.

    For large corpora this is the only sane path: the per-sample object
    list costs ~15x the packed uint8 arrays in host RAM and minutes of
    reconstruction (a 500k-crop set is 1.6 GB packed vs tens of GB as
    float32 sample objects).
    """
    import os

    from .pipeline import PackedSamples

    if cache_dir:
        # probe the same cache keys make_dataset uses
        cache_path = None
        for name in _cache_names(size, seed, max_len, chars, vocab_words,
                                 num_obj_classes):
            p = os.path.join(cache_dir, name)
            if os.path.exists(p):
                cache_path = p
                break
        if cache_path is not None:
            z = np.load(cache_path, allow_pickle=False)
            labels = [str(l) for l in z["labels"]]
            text, _ = codec.encode(labels)
            return PackedSamples(
                image=z["image"],  # stays uint8 end-to-end
                text=np.asarray(text, np.int32),
                overlap=z["overlap"].astype(np.int32),
                scene=z["scene"].astype(np.int32),
                ious=z["ious"].astype(np.float32),
                anno_id=z["anno_id"].astype(np.int64),
                labels=labels,
            )

    samples = make_dataset(
        size, seed=seed, max_len=max_len, chars=chars,
        vocab_words=vocab_words, num_obj_classes=num_obj_classes,
        workers=workers, cache_dir=cache_dir,
    )
    return PackedSamples.from_samples(samples, codec)
