"""Persist int8 activation-calibration scales next to an Orbax checkpoint.

Computes per-conv-site activation abs-max over a representative batch of
real held-out crops (the trained checkpoint's val distribution) and writes
``<ckpt>.scales.npz`` via models/resnet_int8.save_activation_scales, so
serving (eval/serve.Recognizer(int8_scales_path=...)) never depends on
whatever batch arrives first (VERDICT r2 #9).

Device-agnostic (one forward pass) — runs fine on CPU:
    JAX_PLATFORMS=cpu python scripts/persist_int8_scales.py [ckpt_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# this image registers the axon TPU plugin from sitecustomize, so the
# JAX_PLATFORMS env var alone is not honored — mirror tests/conftest.py
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from multimodal_scene_text_recognition_tpu.core.charset import AttnCodec
from multimodal_scene_text_recognition_tpu.core.config import Config
from multimodal_scene_text_recognition_tpu.data.pipeline import (
    device_batch,
    packed_batches,
)
from multimodal_scene_text_recognition_tpu.data.synthetic import (
    make_packed_dataset,
)
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
    calibrate_resnet,
    load_activation_scales,
    save_activation_scales,
)
from multimodal_scene_text_recognition_tpu.train.checkpoint import (
    restore_checkpoint,
)
from multimodal_scene_text_recognition_tpu.train.state import (
    create_train_state,
    make_optimizer,
)
from multimodal_scene_text_recognition_tpu.train.steps import prep_image

CKPT = os.path.abspath(
    sys.argv[1] if len(sys.argv) > 1 else "results/models/synth_openvocab_xxl"
)
OUT = CKPT + ".scales.npz"
B = int(os.environ.get("CALIB_B", "192"))

cfg = Config()
codec = AttnCodec(cfg.model.chars, cfg.model.max_text_length)
val = make_packed_dataset(codec, 2048, seed=cfg.train.seed + 1,
                          cache_dir="results/synth_cache")
batch = device_batch(next(iter(packed_batches(val, B, shuffle=False))))

model = build_model(cfg.model)
state = create_train_state(model, make_optimizer(cfg.train), batch,
                           jax.random.PRNGKey(0))
state = restore_checkpoint(CKPT, state)
variables = state.variables()
print(f"restored step={int(state.step)}", flush=True)

rectified = model.apply(variables, prep_image(batch["image"]),
                        method=type(model).rectify)
scales = calibrate_resnet(variables, rectified,
                          output_channels=cfg.model.hidden_dim)
if cfg.model.use_tps:
    # always include TPS loc-net scales (tps/ prefix) so the npz also
    # serves tps_int8 configs, whatever the serving config chooses
    from multimodal_scene_text_recognition_tpu.models.resnet_int8 import (
        calibrate_tps,
    )

    scales.update({
        f"tps/{k}": v
        for k, v in calibrate_tps(variables,
                                  prep_image(batch["image"])).items()
    })
save_activation_scales(OUT, scales)
back = load_activation_scales(OUT)
assert back == {k: np.float32(v) for k, v in scales.items()} or all(
    abs(back[k] - scales[k]) < 1e-6 * max(1.0, abs(scales[k])) for k in scales
)
print(f"wrote {len(scales)} conv-site scales -> {OUT}")
