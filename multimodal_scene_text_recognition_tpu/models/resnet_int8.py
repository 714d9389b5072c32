"""Int8 post-training-quantized ResNet-31 inference backbone.

The backbone is where the recognizer's FLOPs live (~10 ms of the ~22 ms
B=192 batch on one v5e); the chip's int8 path runs these convs 2-2.9x
faster than bf16 (scripts/probe_int8_conv.py).  This module provides a
pure-function int8 forward for serving:

  * BatchNorm is an affine at eval time — folded into the conv weights
    (per-output-channel scale) and a bias;
  * weights: symmetric per-output-channel int8 (max-abs / 127);
  * activations: symmetric per-tensor int8 with STATIC scales taken from a
    calibration batch (abs-max of each conv input);
  * convs run int8 x int8 -> int32 on the MXU; dequant + bias + residual +
    ReLU happen in float32 on the VPU; inter-site activations are stored
    bf16 (halves the glue's HBM traffic; they are re-quantized to int8 at
    the next site, so bf16's mantissa is far below the int8 step anyway).

The graph mirrors models/resnet.ResNet31 exactly (stage widths/counts and
the asymmetric (2,1) reductions of reference feature_extraction.py:78-87).
Quantization is a pure transform of the trained checkpoint — no retraining.
Typical cost on the trained flagship model: <0.2% word accuracy.

This is a deployment capability beyond the reference (which has no
quantized inference path).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class QConv(NamedTuple):
    """One BN-folded, weight-quantized conv site."""

    kernel_q: jnp.ndarray   # int8 [kh, kw, ci, co]
    w_scale: jnp.ndarray    # f32 [co]   (kernel = kernel_q * w_scale)
    bias: jnp.ndarray       # f32 [co]   (folded BN shift)
    x_scale: jnp.ndarray    # f32 scalar (activation quant step / 127)


def _fold_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """conv(x, W) -> BN  ==  conv(x, W * a) + c with a,c per out-channel."""
    a = bn_scale / np.sqrt(bn_var + eps)
    return kernel * a[None, None, None, :], bn_bias - bn_mean * a


def _plan(oc: int, layers: Sequence[int]):
    """Execution plan mirroring ResNet31.__call__ (kept in lockstep)."""
    plan = [
        ("conv", "stem0", (3, 3), (1, 1), 1),
        ("conv", "stem1", (3, 3), (1, 1), 1),
        ("pool", (2, 2), (2, 2), None),
        *[("block", f"block1_{i}") for i in range(layers[0])],
        ("conv", "trans1", (3, 3), (1, 1), 1),
        ("pool", (2, 2), (2, 2), None),
        *[("block", f"block2_{i}") for i in range(layers[1])],
        ("conv", "trans2", (3, 3), (1, 1), 1),
        ("pool", (2, 2), (2, 1), ((0, 0), (1, 1))),
        *[("block", f"block3_{i}") for i in range(layers[2])],
        ("conv", "trans3", (3, 3), (1, 1), 1),
        *[("block", f"block4_{i}") for i in range(layers[3])],
        ("conv", "trans4a", (2, 2), (2, 1), ((0, 0), (1, 1))),
        ("conv", "trans4b", (2, 2), (1, 1), ((0, 0), (0, 0))),
    ]
    return plan


def _conv_sites(params, stats):
    """(site-name -> folded f32 kernel + bias) for every conv in the plan."""
    sites = {}

    def fold(conv_name, bn_name):
        k = np.asarray(params[conv_name]["kernel"], np.float32)
        bn_p, bn_s = params[bn_name], stats[bn_name]
        return _fold_bn(
            k, np.asarray(bn_p["scale"], np.float32),
            np.asarray(bn_p["bias"], np.float32),
            np.asarray(bn_s["mean"], np.float32),
            np.asarray(bn_s["var"], np.float32),
        )

    for name in params:
        if name.endswith("_conv"):
            sites[name[: -len("_conv")]] = fold(name, name[: -len("_conv")] + "_bn")
        elif name.startswith("block"):
            blk_p, blk_s = params[name], stats[name]
            for c, b in (("conv1", "bn1"), ("conv2", "bn2"),
                         ("downsample_conv", "downsample_bn")):
                if c in blk_p:
                    k = np.asarray(blk_p[c]["kernel"], np.float32)
                    kf, bias = _fold_bn(
                        k, np.asarray(blk_p[b]["scale"], np.float32),
                        np.asarray(blk_p[b]["bias"], np.float32),
                        np.asarray(blk_s[b]["mean"], np.float32),
                        np.asarray(blk_s[b]["var"], np.float32),
                    )
                    sites[f"{name}/{c}"] = (kf, bias)
    return sites


def _conv(x, kernel, strides, padding, acc_dtype):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype,
    )


def _forward(
    sites: Dict,
    x: jnp.ndarray,
    oc: int,
    layers: Sequence[int],
    record: Optional[Dict] = None,
    act_dtype=jnp.float32,
):
    """Mirror of ResNet31.__call__.

    ``sites`` maps site name -> (f32 kernel, bias) for calibration mode
    (record is a dict collecting per-site input abs-max) or -> QConv for
    int8 mode.

    ``act_dtype``: storage dtype of inter-site activations in int8 mode.
    bf16 halves the HBM traffic of the dequant->requant glue between convs
    (the epilogue math stays f32; the tensor is re-quantized to int8 at the
    next site anyway, so bf16's mantissa costs ~nothing next to the int8
    step size).
    """

    def site_conv(h, name, strides=(1, 1), padding=1, relu=True, kernel=None):
        del kernel
        s = sites[name]
        if record is not None:
            record[name] = jnp.maximum(
                record.get(name, 0.0), jnp.max(jnp.abs(h)).astype(jnp.float32)
            )
            kf, bias = s
            out = _conv(h, jnp.asarray(kf), strides, padding, jnp.float32)
            out = out + bias[None, None, None, :]
        else:
            q: QConv = s
            inv = 1.0 / q.x_scale
            hq = jnp.clip(jnp.round(h.astype(jnp.float32) * inv),
                          -127, 127).astype(jnp.int8)
            out32 = _conv(hq, q.kernel_q, strides, padding, jnp.int32)
            deq = q.x_scale * q.w_scale  # [co]
            out = out32.astype(jnp.float32) * deq[None, None, None, :]
            out = out + q.bias[None, None, None, :]
            out = out.astype(act_dtype)
        return jax.nn.relu(out) if relu else out

    def block(h, name, planes):
        residual = h
        out = site_conv(h, f"{name}/conv1")
        out = site_conv(out, f"{name}/conv2", relu=False)
        if h.shape[-1] != planes:
            residual = site_conv(h, f"{name}/downsample_conv",
                                 padding=0, relu=False)
        return jax.nn.relu(out.astype(jnp.float32) +
                           residual.astype(jnp.float32)).astype(act_dtype)

    stage_ch = (oc // 4, oc // 2, oc, oc)
    x = x.astype(jnp.float32)
    for op in _plan(oc, layers):
        if op[0] == "conv":
            _, name, kern, strides, padding = op
            x = site_conv(x, name, strides=strides, padding=padding)
        elif op[0] == "pool":
            _, window, strides, padding = op
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1,) + window + (1,),
                (1,) + strides + (1,),
                "VALID" if padding is None else
                ((0, 0),) + padding + ((0, 0),),
            )
        else:
            _, name = op
            stage = int(name[5])  # block<N>_<i>
            x = block(x, name, stage_ch[stage - 1])
    return x


def calibrate_resnet(
    variables: Dict,
    calib_images: jnp.ndarray,
    output_channels: int = 512,
    layers: Sequence[int] = (1, 2, 5, 3),
    backbone_scope: str = "feature_extractor",
) -> Dict[str, float]:
    """Record per-conv-site activation abs-max over a calibration batch.

    ``calib_images`` are backbone INPUTS — pass TPS-rectified crops (use
    SceneTextModel.rectify).  Returns site-name -> abs-max (float).  The
    scales are checkpoint-independent data: persist them next to the Orbax
    checkpoint with :func:`save_activation_scales` so serving never depends
    on whatever batch arrives first.
    """
    params = variables["params"][backbone_scope]
    stats = variables["batch_stats"][backbone_scope]
    folded = _conv_sites(params, stats)
    record: Dict = {}
    _forward(folded, jnp.asarray(calib_images, jnp.float32),
             output_channels, layers, record=record)
    return {name: float(np.asarray(v)) for name, v in record.items()}


def save_activation_scales(path: str, scales: Dict[str, float]) -> None:
    """Persist calibration abs-max values (a tiny npz next to the ckpt)."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, names=np.asarray(sorted(scales)),
             values=np.asarray([scales[k] for k in sorted(scales)],
                               np.float32))


def load_activation_scales(path: str) -> Dict[str, float]:
    z = np.load(path, allow_pickle=False)
    return {str(n): float(v) for n, v in zip(z["names"], z["values"])}


def check_scale_drift(
    saved: Dict[str, float], observed: Dict[str, float], threshold: float = 2.0
):
    """Warn when observed activation ranges drift past the calibrated ones.

    A saved abs-max much smaller than what serving traffic produces means
    int8 clipping (silent accuracy loss); much larger means wasted
    resolution.  Returns the offending site names (and warns)."""
    import warnings

    bad = [
        name
        for name in saved
        if name in observed
        and max(observed[name], 1e-12) / max(saved[name], 1e-12) > threshold
    ]
    if bad:
        warnings.warn(
            f"int8 activation ranges drifted >{threshold}x past calibration "
            f"at {len(bad)} conv sites (e.g. {bad[:3]}); recalibrate on "
            "representative data (eval/serve.Recognizer.calibrate_int8)"
        )
    return bad


def quantize_resnet(
    variables: Dict,
    calib_images: Optional[jnp.ndarray] = None,
    output_channels: int = 512,
    layers: Sequence[int] = (1, 2, 5, 3),
    backbone_scope: str = "feature_extractor",
    x_absmax: Optional[Dict[str, float]] = None,
) -> Dict[str, QConv]:
    """PTQ of the trained backbone.

    variables: the model's {'params', 'batch_stats'} tree.  Activation
    scales come from ``x_absmax`` (a persisted :func:`calibrate_resnet`
    result) or are calibrated on ``calib_images`` (TPS-rectified crops) —
    exactly one must be given.  Returns site-name -> QConv.
    """
    params = variables["params"][backbone_scope]
    stats = variables["batch_stats"][backbone_scope]
    folded = _conv_sites(params, stats)

    if x_absmax is None:
        if calib_images is None:
            raise ValueError("need calib_images or x_absmax")
        record: Dict = {}
        _forward(folded, jnp.asarray(calib_images, jnp.float32),
                 output_channels, layers, record=record)
        x_absmax = {name: float(np.asarray(v)) for name, v in record.items()}

    return _quantize_folded(folded, x_absmax)


def _quantize_folded(
    folded: Dict[str, Tuple[np.ndarray, np.ndarray]],
    x_absmax: Dict[str, float],
) -> Dict[str, QConv]:
    """Per-channel weight quant + static activation scale for each site."""
    qsites = {}
    for name, (kf, bias) in folded.items():
        absmax = np.abs(kf).max(axis=(0, 1, 2))
        w_scale = np.maximum(absmax, 1e-12) / 127.0
        kq = np.clip(np.round(kf / w_scale[None, None, None, :]),
                     -127, 127).astype(np.int8)
        x_scale = x_absmax[name] / 127.0
        qsites[name] = QConv(
            kernel_q=jnp.asarray(kq),
            w_scale=jnp.asarray(w_scale, jnp.float32),
            bias=jnp.asarray(bias, jnp.float32),
            x_scale=jnp.float32(max(x_scale, 1e-12)),
        )
    return qsites


# ---------------------------------------------------------------------------
# TPS localization-network PTQ (same recipe, applied to the rectifier's
# conv stack — models/transformation.LocalizationNetwork; the fiducial FC
# head and the TPS solve/warp stay float, they are tiny and precision-
# critical).  Replaces the reference's float loc-net convs
# (/root/reference/modules/transformation.py:48-58) for int8 serving.
# ---------------------------------------------------------------------------

TPS_CONV_CHANNELS = (64, 128, 256, 512)


def _tps_sites(variables, scope: str = "transformation"):
    """BN-folded f32 kernels for the four loc-net convs."""
    p = variables["params"][scope]["loc_net"]
    s = variables["batch_stats"][scope]["loc_net"]
    sites = {}
    for ch in TPS_CONV_CHANNELS:
        k = np.asarray(p[f"conv{ch}"]["kernel"], np.float32)
        sites[f"conv{ch}"] = _fold_bn(
            k,
            np.asarray(p[f"bn{ch}"]["scale"], np.float32),
            np.asarray(p[f"bn{ch}"]["bias"], np.float32),
            np.asarray(s[f"bn{ch}"]["mean"], np.float32),
            np.asarray(s[f"bn{ch}"]["var"], np.float32),
        )
    return sites


def _tps_locnet_forward(
    sites: Dict,
    x: jnp.ndarray,
    record: Optional[Dict] = None,
    act_dtype=jnp.bfloat16,
):
    """Conv stack of LocalizationNetwork (conv-BN-ReLU x4 with 2x2 pools
    after the first three); calibration vs int8 mode as in _forward."""
    x = x.astype(jnp.float32)
    for ch in TPS_CONV_CHANNELS:
        name = f"conv{ch}"
        s = sites[name]
        if record is not None:
            record[name] = jnp.maximum(
                record.get(name, 0.0), jnp.max(jnp.abs(x)).astype(jnp.float32)
            )
            kf, bias = s
            out = _conv(x, jnp.asarray(kf), (1, 1), 1, jnp.float32)
            out = out + bias[None, None, None, :]
        else:
            q: QConv = s
            hq = jnp.clip(jnp.round(x.astype(jnp.float32) / q.x_scale),
                          -127, 127).astype(jnp.int8)
            out32 = _conv(hq, q.kernel_q, (1, 1), 1, jnp.int32)
            deq = q.x_scale * q.w_scale
            out = out32.astype(jnp.float32) * deq[None, None, None, :]
            out = (out + q.bias[None, None, None, :]).astype(act_dtype)
        x = jax.nn.relu(out)
        if ch != TPS_CONV_CHANNELS[-1]:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return x


def calibrate_tps(
    variables: Dict,
    calib_images: jnp.ndarray,
    scope: str = "transformation",
) -> Dict[str, float]:
    """Record loc-net per-site activation abs-max; calib_images are RAW
    input crops (the loc-net sees the unrectified image)."""
    folded = _tps_sites(variables, scope)
    record: Dict = {}
    _tps_locnet_forward(folded, jnp.asarray(calib_images, jnp.float32),
                        record=record)
    return {name: float(np.asarray(v)) for name, v in record.items()}


def quantize_tps(
    variables: Dict,
    calib_images: Optional[jnp.ndarray] = None,
    x_absmax: Optional[Dict[str, float]] = None,
    scope: str = "transformation",
) -> Dict[str, QConv]:
    """PTQ of the TPS localization convs (see :func:`calibrate_tps`)."""
    folded = _tps_sites(variables, scope)
    if x_absmax is None:
        if calib_images is None:
            raise ValueError("need calib_images or x_absmax")
        x_absmax = calibrate_tps(variables, calib_images, scope)
    return _quantize_folded(folded, x_absmax)


def tps_int8_rectify(
    variables: Dict,
    qsites: Dict[str, QConv],
    images: jnp.ndarray,
    num_fiducial: int = 20,
    out_h: int = 32,
    out_w: int = 100,
    scope: str = "transformation",
) -> jnp.ndarray:
    """Rectify with int8 loc-net convs: predict fiducials, solve TPS, warp.

    Mirrors models/transformation.TPSTransform.__call__ (bf16 flagship
    path: DEFAULT-precision matmul-form bilinear sampling)."""
    from ..ops import tps as tps_ops
    from ..ops.grid_sample import grid_sample

    feats = _tps_locnet_forward(qsites, images)
    x = jnp.mean(feats.astype(jnp.float32), axis=(1, 2))
    p = variables["params"][scope]["loc_net"]
    x = jax.nn.relu(x @ p["fc1"]["kernel"].astype(jnp.float32)
                    + p["fc1"]["bias"].astype(jnp.float32))
    x = (x @ p["fc2"]["kernel"].astype(jnp.float32)
         + p["fc2"]["bias"].astype(jnp.float32))
    c_prime = x.reshape(-1, num_fiducial, 2)
    grid = tps_ops.build_sampling_grid(c_prime, out_h, out_w)
    return grid_sample(images, grid, precision=jax.lax.Precision.DEFAULT)


def resnet31_int8_forward(
    qsites: Dict[str, QConv],
    x: jnp.ndarray,
    output_channels: int = 512,
    layers: Sequence[int] = (1, 2, 5, 3),
    act_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Int8 inference forward: [B, 32, 100, 1] -> [B, 1, W/4+1, oc].

    Inter-site activations are stored bf16 by default (see :func:`_forward`
    — halves dequant/requant HBM traffic; pass ``act_dtype=jnp.float32``
    for the f32-glue variant)."""
    return _forward(qsites, x, output_channels, layers, record=None,
                    act_dtype=act_dtype)


def make_int8_eval_step(model, variables, calib_batch=None, x_absmax=None,
                        beam_size=None):
    """Build a jitted greedy-decode step whose backbone runs int8.

    Activation scales come from ``x_absmax`` (persisted calibration, see
    :func:`calibrate_resnet`; TPS loc-net sites carry a ``tps/`` key
    prefix) or are calibrated on ``calib_batch`` (a device batch dict with
    normalized or uint8 images).  Returns ``(eval_step, qsites)`` where
    ``eval_step(variables, qsites, batch) -> predicted ids [B, T]`` —
    or, when ``beam_size`` is set, ``-> (ids [B, T], scores [B])`` via
    batched beam search over the same int8-spliced pipeline.
    Splices: TPS (int8 loc-net when ``model.cfg.tps_int8``, else bf16) ->
    int8 ResNet -> columns -> encoder/decoder (the model's own modules) —
    everything else identical to the float path.
    """
    from ..train.steps import prep_image
    from .model import to_column_sequence

    cfg = model.cfg
    # tps_int8 is meaningless under the no-TPS ablation (identity rectify)
    tps8 = getattr(cfg, "tps_int8", False) and getattr(cfg, "use_tps", True)
    images = rectified = None
    rn_absmax = tps_absmax = None
    if x_absmax is not None:
        rn_absmax = {k: v for k, v in x_absmax.items()
                     if not k.startswith("tps/")}
        tps_absmax = {k[len("tps/"):]: v for k, v in x_absmax.items()
                      if k.startswith("tps/")}
    else:
        if calib_batch is None:
            raise ValueError("need calib_batch or x_absmax")
        images = prep_image(calib_batch["image"])
        rectified = model.apply(variables, images,
                                method=type(model).rectify)
    qsites = quantize_resnet(
        variables, rectified, output_channels=cfg.hidden_dim,
        x_absmax=rn_absmax,
    )
    if tps8:
        if images is None and not tps_absmax:
            raise ValueError(
                "tps_int8 needs TPS activation scales: the persisted npz "
                "has no tps/ keys (regenerate with "
                "scripts/persist_int8_scales.py, which writes them when "
                "model.tps_int8 is set) or pass calib_batch"
            )
        tq = quantize_tps(variables, calib_images=images,
                          x_absmax=tps_absmax or None)
        qsites.update({f"tps/{k}": v for k, v in tq.items()})

    def eval_step(variables, qsites, batch):
        img = prep_image(batch["image"])
        if tps8:
            tq = {k[len("tps/"):]: v for k, v in qsites.items()
                  if k.startswith("tps/")}
            x = tps_int8_rectify(
                variables, tq, img, num_fiducial=cfg.num_fiducial,
                out_h=cfg.img_h, out_w=cfg.img_w)
        else:
            x = model.apply(variables, img, method=type(model).rectify)
        feats = resnet31_int8_forward(
            {k: v for k, v in qsites.items() if not k.startswith("tps/")},
            x, output_channels=cfg.hidden_dim)
        cols = to_column_sequence(feats).astype(jnp.float32)
        if beam_size is not None:
            return model.apply(
                variables, cols, batch["overlap"], batch["scene"],
                batch["ious"], beam_size,
                method=type(model).beam_from_columns,
            )
        logits = model.apply(
            variables, cols, batch["overlap"], batch["scene"], batch["ious"],
            method=type(model).decode_from_columns,
        )
        return jnp.argmax(logits, axis=-1)

    return jax.jit(eval_step), qsites
