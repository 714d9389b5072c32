"""Serving-oriented recognizer: fixed-shape jitted decode behind a simple API.

Production counterpart to the eval harness: one compiled program per batch
bucket, host-side padding/truncation to the bucket, strings out.  The
reference has no serving story (evaluate.py runs one crop at a time through
a B=192-shaped zero tensor, evaluate.py:232).

Usage:
    rec = Recognizer.from_bundle(api.get_model(...), batch_sizes=(1, 8, 64))
    texts = rec.recognize(crops)              # list of np [H, W] grayscale
    texts, scores = rec.recognize(crops, beam_size=5, return_scores=True)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..core.charset import AttnCodec


class Recognizer:
    def __init__(self, model, variables, cfg,
                 batch_sizes: Sequence[int] = (1, 8, 64),
                 int8_backbone: bool = False,
                 int8_scales_path: Optional[str] = None):
        """``int8_backbone=True`` serves through the PTQ-quantized ResNet
        (models/resnet_int8.py; ~1.4x throughput at large batches, -0.05%
        accuracy on the trained flagship).

        Activation scales resolve in priority order: (1)
        ``int8_scales_path`` — a npz persisted next to the checkpoint
        (models/resnet_int8.save_activation_scales); (2) an explicit
        :meth:`calibrate_int8` call with representative crops; (3) lazy
        fallback on the first recognize() call, using only that call's REAL
        crops (pad rows excluded — a zero-padded bucket would push the
        static scales far below real activation ranges and silently clip
        later traffic)."""
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.codec = AttnCodec(cfg.model.chars, cfg.model.max_text_length)
        self.batch_sizes = tuple(sorted(batch_sizes))
        self.int8_backbone = int8_backbone
        self.int8_scales_path = int8_scales_path
        self._int8_steps = {}  # {None: greedy, k: beam-k} int8 decode steps
        self._qsites = None
        self._int8_absmax = None
        self._drift_checked = False
        if int8_scales_path is not None:
            import os

            if os.path.exists(int8_scales_path):
                from ..models.resnet_int8 import load_activation_scales

                self._int8_absmax = load_activation_scales(int8_scales_path)

        def greedy(variables, image, overlap, scene, ious):
            logits = model.apply(
                variables, image, None, overlap, scene, ious, train=False
            )
            return jnp.argmax(logits, axis=-1)

        def beam(variables, image, overlap, scene, ious, beam_size):
            from ..models.model import SceneTextModel

            return model.apply(
                variables, image, overlap, scene, ious, beam_size,
                method=SceneTextModel.beam_decode,
            )

        # Params ride as ONE packed buffer per dtype instead of a ~500-leaf
        # pytree: per-call dispatch cost is per argument buffer (over an
        # RPC tunnel ~10-15 ms each — seconds per call for the raw
        # pytree), so packing makes small-batch serving latency track
        # device time (utils/packing.py; VERDICT r4 #5 root cause).
        from ..utils.packing import PackedTree

        self._ptree = PackedTree(variables)
        self._packed = self._ptree.pack(variables)
        unpack = self._ptree.unpack
        self._greedy = jax.jit(
            lambda pk, *a: greedy(unpack(pk), *a))
        self._beam = jax.jit(
            lambda pk, *a: beam(unpack(pk), *a), static_argnums=(5,))

    @classmethod
    def from_bundle(cls, bundle, **kw) -> "Recognizer":
        """Build from an api.get_model bundle.  When serving int8 from an
        Orbax checkpoint, a calibration npz persisted next to it
        (``<ckpt>.scales.npz`` — scripts/persist_int8_scales.py) is picked
        up automatically unless ``int8_scales_path`` is given."""
        if kw.get("int8_backbone") and "int8_scales_path" not in kw:
            import os

            saved = getattr(bundle.cfg, "saved_model", None)
            if saved and not saved.endswith((".pt", ".pth")):
                cand = (saved.replace(".params.npz", ".scales.npz")
                        if saved.endswith(".params.npz")
                        else saved + ".scales.npz")
                if os.path.exists(cand):
                    kw["int8_scales_path"] = cand
        return cls(bundle.model, bundle.variables, bundle.cfg, **kw)

    def _observe_absmax(self, crops: Sequence[np.ndarray]):
        """Per-conv-site activation abs-max over real crops (pad rows are
        filled by cycling the real crops, never zeros)."""
        from ..models.resnet_int8 import calibrate_resnet
        from ..train.steps import prep_image

        B = self._bucket(min(len(crops), self.batch_sizes[-1]))
        batch = self._prepare(list(crops)[: self.batch_sizes[-1]], B,
                              tile_real=True)
        observed = calibrate_resnet(
            self.variables, self.model.apply(
                self.variables, prep_image(batch["image"]),
                method=type(self.model).rectify,
            ),
            output_channels=self.cfg.model.hidden_dim,
        )
        if (getattr(self.cfg.model, "tps_int8", False)
                and getattr(self.cfg.model, "use_tps", True)):
            from ..models.resnet_int8 import calibrate_tps

            observed.update({
                f"tps/{k}": v
                for k, v in calibrate_tps(
                    self.variables, prep_image(batch["image"])).items()
            })
        return observed

    def calibrate_int8(self, crops: Sequence[np.ndarray]) -> None:
        """Calibrate the int8 backbone's activation scales on representative
        crops and (if ``int8_scales_path`` is set) persist them.

        If scales were already loaded/calibrated, the new observation is
        checked for drift (>2x range growth at any conv site warns —
        models/resnet_int8.check_scale_drift)."""
        from ..models.resnet_int8 import check_scale_drift, save_activation_scales

        observed = self._observe_absmax(crops)
        if self._int8_absmax is not None:
            check_scale_drift(self._int8_absmax, observed)
        self._drift_checked = True
        self._int8_absmax = observed
        self._int8_steps = {}  # rebuild with the new scales
        self._qsites = None
        if self.int8_scales_path is not None:
            save_activation_scales(self.int8_scales_path, observed)

    def _ensure_int8(self, chunk, beam_size=None):
        """Build (once) and return the int8-spliced decode step — greedy, or
        beam when ``beam_size`` is set (beam rides the same PTQ backbone via
        model.beam_from_columns).  Calibrates lazily on this call's REAL
        crops if no scales were persisted/loaded, and runs the one-time
        drift check against the first traffic seen."""
        from ..models.resnet_int8 import make_int8_eval_step

        key = int(beam_size) if beam_size else None
        if self._int8_absmax is None:
            # lazy fallback: calibrate on this call's REAL crops
            # (tiled to fill the bucket — never on pad rows)
            self.calibrate_int8(chunk)
        if key not in self._int8_steps:
            step, qsites = make_int8_eval_step(
                self.model, self.variables,
                x_absmax=self._int8_absmax, beam_size=key,
            )
            self._int8_steps[key] = step
            self._qsites = qsites
        if not self._drift_checked:
            # persisted/loaded scales: validate once against the ranges
            # this process actually sees (warn-only —
            # models/resnet_int8.check_scale_drift)
            from ..models.resnet_int8 import check_scale_drift

            check_scale_drift(self._int8_absmax,
                              self._observe_absmax(chunk))
            self._drift_checked = True
        return self._int8_steps[key]

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if n <= b:
                return b
        return self.batch_sizes[-1]

    def _prepare(self, crops: Sequence[np.ndarray], B: int,
                 tile_real: bool = False):
        """Pad/truncate ``crops`` to bucket size B.  ``tile_real`` fills the
        pad rows by cycling the real crops instead of zeros (calibration
        batches must not see pad statistics)."""
        m = self.cfg.model
        img = np.zeros((B, m.img_h, m.img_w, 1), np.float32)
        for i, c in enumerate(crops):
            c = np.asarray(c)
            was_uint8 = c.dtype == np.uint8
            c = c.astype(np.float32)
            if c.max() > 1.5:  # uint8-range input
                c = c / 255.0
            if c.ndim == 2:
                c = c[..., None]
            if c.shape[:2] != (m.img_h, m.img_w):
                if was_uint8:
                    # exact roundtrip for byte inputs; native batch kernel
                    from ..utils.native import crop_resize_gray_batch

                    c = crop_resize_gray_batch(
                        [np.ascontiguousarray(
                            (c[..., 0] * 255).astype(np.uint8))],
                        np.asarray([[0, 0, c.shape[1], c.shape[0]]],
                                   np.float32),
                        m.img_h, m.img_w,
                    )[0]
                else:
                    # float input: precision-preserving PIL mode-F bicubic,
                    # the reference's interpolation (dataset.py:256-266)
                    from PIL import Image

                    im = Image.fromarray(c[..., 0], mode="F")
                    c = np.asarray(
                        im.resize((m.img_w, m.img_h), Image.BICUBIC),
                        np.float32,
                    )[..., None]
            img[i] = c
        if tile_real and len(crops) > 0:
            for i in range(len(crops), B):
                img[i] = img[i % len(crops)]
        return {
            "image": jnp.asarray(img),
            "overlap": jnp.zeros((B, m.max_overlap_objs), jnp.int32),
            "scene": jnp.zeros((B, m.max_scene_objs), jnp.int32),
            "ious": jnp.full((B, m.max_scene_objs), -1000.0, jnp.float32),
        }

    def recognize(
        self,
        crops: Sequence[np.ndarray],
        semantics: Optional[Dict[str, np.ndarray]] = None,
        beam_size: int = 0,
        return_scores: bool = False,
    ):
        """Recognise a list of grayscale crops; returns decoded strings.

        ``semantics``: optional dict with 'overlap'/'scene'/'ious' arrays
        aligned to ``crops`` for the multimodal path.
        """
        out_texts: List[str] = []
        out_scores: List[float] = []
        i = 0
        while i < len(crops):
            chunk = crops[i : i + self.batch_sizes[-1]]
            B = self._bucket(len(chunk))
            batch = self._prepare(chunk, B)
            if semantics is not None:
                for k in ("overlap", "scene", "ious"):
                    if k in semantics:
                        arr = np.zeros_like(np.asarray(batch[k]))
                        arr[: len(chunk)] = semantics[k][i : i + len(chunk)]
                        batch[k] = jnp.asarray(arr)
            if beam_size and self.cfg.model.decoder == "transformer":
                if self.int8_backbone:
                    step = self._ensure_int8(chunk, beam_size=int(beam_size))
                    ids, scores = step(self.variables, self._qsites, batch)
                else:
                    ids, scores = self._beam(
                        self._packed, batch["image"], batch["overlap"],
                        batch["scene"], batch["ious"], int(beam_size),
                    )
                out_scores.extend(np.asarray(scores)[: len(chunk)].tolist())
            elif self.int8_backbone:
                ids = self._ensure_int8(chunk)(
                    self.variables, self._qsites, batch)
                out_scores.extend([0.0] * len(chunk))
            else:
                ids = self._greedy(
                    self._packed, batch["image"], batch["overlap"],
                    batch["scene"], batch["ious"],
                )
                out_scores.extend([0.0] * len(chunk))
            out_texts.extend(self.codec.decode(np.asarray(ids))[: len(chunk)])
            i += len(chunk)
        if return_scores:
            return out_texts, out_scores
        return out_texts
