"""Typed experiment configuration.

TPU-native replacement for the reference's module-level constants file
(reference: config.py:1-70).  Every switch the reference exposes is preserved
as a named, typed field; experiments are values, not edits to a module.

Design differences from the reference (deliberate, TPU-first):
  * dataclass + CLI overrides instead of a global mutable module
    (reference: run.py:5-7 has abandoned argv parsing).
  * device selection is a mesh spec (``parallel``) instead of CUDA ids
    (reference: config.py:4-5).
  * train/eval are separate jitted programs, so there is no ``is_train``
    runtime flag in the model config.
"""

from __future__ import annotations

import dataclasses
import string
from dataclasses import dataclass, field
from typing import Any, Optional

# 94 printable characters: string.printable minus the 6 trailing whitespace
# controls (reference: config.py:20).
DEFAULT_CHARS: str = string.printable[:-6]


@dataclass(frozen=True)
class ModelConfig:
    """Architecture switches (reference: config.py:27-53, model.py:20-32)."""

    # --- component selectors (reference: config.py:27-28) ---
    encoder: str = "transformer"  # lstm | transformer | oscar
    decoder: str = "transformer"  # lstm | transformer | linear
    # No-TPS ablation (BASELINE.json config #2): skip the rectification
    # stage and feed raw crops to the backbone.  The reference hardwires
    # TPS (model.py:39-40,87-88); this switch makes the ablation runnable.
    use_tps: bool = True

    # --- dimensions (reference: config.py:31-32, model.py:21-30) ---
    embed_dim: int = 256
    hidden_dim: int = 512
    img_h: int = 32
    img_w: int = 100
    input_channels: int = 1
    num_fiducial: int = 20          # TPS control points (reference: model.py:23)
    lstm_hidden: int = 256          # LSTM path hidden size (reference: model.py:30)

    # --- encoder/decoder transformer dims (reference: encoders.py:78, decoders.py:111) ---
    enc_layers: int = 6
    dec_layers: int = 6
    num_heads: int = 8
    ff_dim: int = 2048
    dropout: float = 0.1

    # The reference's custom TransformerEncoderLayer normalises the residual
    # *input* before the add (encoders.py:191-195) — a deviation from standard
    # post-LN.  "reference" replicates it; "standard" uses textbook post-LN.
    encoder_norm_style: str = "reference"

    # --- semantic-vector pipeline (reference: config.py:35-38) ---
    semantic_vector: str = "overlap"      # overlap | scene | combined
    semantic_source: str = "vinvl"        # coco | vg | vinvl | zero | rand
    semantic_assignment: str = "resize"   # resize | 0.25 | 0.50 | 0.75
    semantic_embedding: str = "linear"    # linear | bert
    num_obj_classes: int = 2000           # (reference: semantic_vectors.py:19)
    max_overlap_objs: int = 15            # (reference: coco_dataset.py:245)
    max_scene_objs: int = 52              # (reference: coco_dataset.py:246)

    # --- fusion strategy flags (reference: config.py:43-53) ---
    pre_encoder_mlp: bool = False
    oscar_encoder: bool = False
    pre_decoder_mlp: bool = False
    cls_decoder_init: bool = False
    multihead_pre_target: bool = False
    multihead_pre_memory: bool = False
    multihead_post_memory: bool = False
    post_decoder_mlp: bool = False

    # greedy decode exits once every sequence has emitted [s] (see
    # models.decoders.TransformerDecoder.early_stop) — ~3x fewer
    # autoregressive steps on trained models; identical [s]-pruned strings.
    decode_early_stop: bool = False

    # run the greedy decode as ONE fused Pallas kernel (weights, cross K/V
    # and KV caches all resident in VMEM for the whole loop) — see
    # ops/fused_decode.py.  Falls back to the XLA scan for configs the
    # kernel doesn't cover (per-layer fusion sites).
    decode_fused: bool = False

    # int8-quantize the fused decode kernel's six projection matmuls
    # (per-channel int8 weights, dynamic per-row activation quant, f32
    # accumulation — ops/fused_decode.quantize_fused_weights).  Only takes
    # effect together with ``decode_fused``; PTQ, no retraining.
    decode_int8: bool = False

    # run beam search as ONE fused Pallas kernel (VMEM-resident caches,
    # in-kernel top-k/ancestry/early-stop — ops/fused_beam.py).  Opt-in
    # separate from decode_fused: the beam kernel's Mosaic compile is
    # ~15 min at flagship scale (once per process/shape).
    decode_beam_fused: bool = False

    # int8-quantize the TF encoder's attention projections + FF matmuls at
    # inference (ops/int8.py, same PTQ recipe); training stays float.
    encoder_int8: bool = False

    # int8-quantize the TPS localization-network convs at inference
    # (models/resnet_int8.quantize_tps — BN-folded, per-channel weights,
    # static per-tensor activation scales); the fiducial FC head and the
    # grid solve/warp stay float.  Used by the int8 serving path
    # (models/resnet_int8.make_int8_eval_step).
    tps_int8: bool = False

    # --- text geometry (reference: config.py:19-20) ---
    max_text_length: int = 25
    chars: str = DEFAULT_CHARS

    # label/class space: "attn" = [GO]/[s]/[PAD] + chars (AttnCodec, the
    # attention-decoder recipe); "ctc" = blank + chars (CTCCodec — pair
    # with ``decoder=linear`` and ``train.loss=ctc``; reference utils.py:5-52
    # ships the converter but never wires the criterion).
    label_codec: str = "attn"

    # --- numerics ---
    # bfloat16 compute with float32 params/accumulation is the TPU-native
    # default; float32 matches the reference bit-for-bit for parity tests.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # rematerialise the conv backbone in backward (trade FLOPs for HBM) —
    # lets batch scale well beyond the reference's 192
    remat: bool = False
    # train-mode BatchNorm with the fused Pallas backward reduction
    # (ops/batchnorm.py) — identical values, removes the VPU-bound
    # convert_reduce fusions the round-4 profiler trace attributed ~21 ms
    # of the 67.6 ms train step to.  The Pallas kernel engages only on a
    # single-device TPU backend (under a >1-device mesh the custom call
    # can't be SPMD-partitioned, so mesh paths construct with False).
    fused_bn: bool = True

    @property
    def num_classes(self) -> int:
        if self.label_codec == "ctc":
            # [CTCblank] + charset (reference: utils.py:9-16)
            return 1 + len(self.chars)
        # [GO], [s], [PAD] + charset (reference: utils.py:108-111)
        return 3 + len(self.chars)

    @property
    def num_cols(self) -> int:
        # encoder column count: backbone width for a 100-wide crop
        # (reference: encoders.py:149 hardcodes max_len=26)
        return self.img_w // 4 + 1

    @property
    def decode_steps(self) -> int:
        return self.max_text_length + 1  # +1 for [s]


@dataclass(frozen=True)
class TrainConfig:
    """Optimisation settings (reference: training_functions.py:36-69, config.py:16-21)."""

    batch_size: int = 192
    epochs: int = 8
    lr: float = 1e-4
    weight_decay: float = 0.01          # torch AdamW default
    grad_clip_norm: float = 2.0         # (reference: training_functions.py:94)
    # StepLR(step=10, gamma=0.1) exists only in the legacy loop
    # (reference: train.py:154); exposed here as an optional schedule.
    lr_step_size: Optional[int] = None
    lr_gamma: float = 0.1
    # linear LR warmup steps (0 = reference behaviour).  Needed for stable
    # from-scratch training of the post-LN transformer stacks — the
    # reference always fine-tunes from a pretrained checkpoint.
    warmup_steps: int = 0
    seed: int = 999                     # (reference: config.py:16)
    validation_steps: int = 2000        # (reference: run.py:33)
    iteration_limit: Optional[int] = None
    model_save_threshold: float = 0.0   # (reference: config.py:21)
    # training criterion: "ce" = the reference's CrossEntropy recipe over
    # teacher-forced targets; "ctc" = CTC over per-column logits (requires
    # model.decoder=linear + model.label_codec=ctc — the path the reference
    # ships converters for, utils.py:5-99, but never wires).
    loss: str = "ce"
    # The reference's CrossEntropyLoss(ignore_index=0) ignores [GO] but *counts
    # [PAD]* in the loss (training_functions.py:36).  True replicates that
    # quirk; False additionally masks [PAD].
    loss_counts_pad: bool = True
    label_smoothing: float = 0.0
    # keep the whole packed (uint8) dataset in device HBM and gather batches
    # by index INSIDE the jitted train step — per-step host->device traffic
    # drops from the full batch (~0.7 MB at B=192) to a [B] int32 index
    # vector.  This is what closes the in-loop vs pure-step throughput gap
    # on tunneled/PCIe-attached chips.  Falls back to the host prefetcher
    # when the packed data exceeds ``device_data_max_mb``.
    device_data: bool = True
    device_data_max_mb: int = 4096
    # with device-resident data, run this many optimizer steps inside ONE
    # jitted call (lax.scan over index blocks) — amortizes per-call dispatch
    # latency, which dominates on tunneled chips.  1 = step-per-call.
    steps_per_call: int = 8


@dataclass(frozen=True)
class DataConfig:
    """Dataset locations and selection (reference: config.py:60-70)."""

    dataset: str = "synthetic"  # cocotext | textocr | synth | synthetic
    cocotext_api_path: str = "./annotations/COCO_Text_2014.json"
    cocotext_image_path: str = "./data/coco/train2014/"
    cocotext_object_tags_path: str = "./annotations/features/coco_object_tags.json"
    textocr_anno_path: str = "./data/textocr/"
    textocr_image_path: str = "./data/textocr/"
    textocr_object_tags_path: str = "./annotations/features/open_images_vinvl_features.json"
    deep_text_dataset_path: str = "./data/deep_text_datasets/"
    class_labels_dir: str = "./assets/features/"
    # batch-balanced multi-source sampling for data.dataset=synth
    # (reference dataset.py:17-100 Batch_Balanced_Dataset): "MJ,ST" ratios
    # as comma floats, e.g. "0.5,0.5".  Empty = plain concatenation.
    mixture_ratios: str = ""
    # keep-ratio resize + border right-pad instead of squash-resize
    # (reference dataset.py:270-326 NormalizePAD/AlignCollate).
    keep_ratio: bool = False
    num_workers: int = 8
    prefetch_batches: int = 4
    # synthetic-set sizes for the self-contained train/bench path
    synthetic_train_size: int = 4096
    synthetic_val_size: int = 512
    # 0 = open vocabulary (random strings); >0 = closed vocab of that many
    # seeded random words (easier demo/benchmark task)
    synthetic_vocab_size: int = 0
    # directory for cached rendered corpora (npz, uint8 images) — rendering
    # 500k crops takes ~an hour on a single host core; the cache makes big
    # training runs restartable.  Empty = no cache.
    synthetic_cache_dir: str = ""


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout (replaces reference nn.DataParallel, model.py:115).

    The mesh has two axes: ``data`` (batch sharding — the DP equivalent of the
    reference's DataParallel scatter/gather) and ``model`` (optional tensor
    parallelism over attention heads / FF columns — capability the reference
    lacks, exposed because ICI makes it nearly free on TPU).
    """

    data_axis: int = -1   # -1: all remaining devices
    model_axis: int = 1   # 1 disables tensor parallelism
    # remat the backbone to trade FLOPs for HBM when scaling batch
    remat: bool = False


@dataclass(frozen=True)
class Config:
    experiment: str = "tpu_rebuild"
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    results_dir: str = "./results"
    saved_model: Optional[str] = None


def _coerce(current: Any, raw: str) -> Any:
    if isinstance(current, bool):
        return raw.lower() in ("1", "true", "yes", "on")
    if current is None:
        if raw.lower() in ("none", "null"):
            return None
        try:
            return int(raw)
        except ValueError:
            try:
                return float(raw)
            except ValueError:
                return raw
    if isinstance(current, int) and not isinstance(current, bool):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    return raw


def apply_overrides(cfg: Config, overrides: dict[str, str] | list[str]) -> Config:
    """Apply dotted-path overrides, e.g. ``model.encoder=lstm``."""
    if isinstance(overrides, list):
        pairs = {}
        for item in overrides:
            if "=" not in item:
                raise ValueError(f"override must be key=value, got {item!r}")
            k, v = item.split("=", 1)
            pairs[k.strip()] = v.strip()
        overrides = pairs

    for path, raw in overrides.items():
        parts = path.split(".")
        objs = [cfg]
        for p in parts[:-1]:
            objs.append(getattr(objs[-1], p))
        leaf_name = parts[-1]
        current = getattr(objs[-1], leaf_name)
        new_leaf = _coerce(current, raw) if isinstance(raw, str) else raw
        updated = dataclasses.replace(objs[-1], **{leaf_name: new_leaf})
        for obj, name in zip(reversed(objs[:-1]), reversed(parts[:-1])):
            updated = dataclasses.replace(obj, **{name: updated})
        cfg = updated
    return cfg
