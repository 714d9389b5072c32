"""Measure greedy scan with different unroll factors."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from bench import build
from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
import multimodal_scene_text_recognition_tpu.models.decoders as dec_mod

cfg = ModelConfig()
model, variables, batch = build(cfg)
args_base = (batch["image"], batch["overlap"], batch["scene"], batch["ious"])

orig_scan = jax.lax.scan
for unroll in (1, 5):
    def scan_u(f, init, xs, length=None, reverse=False, unroll_=unroll, **kw):
        kw.pop("unroll", None)
        return orig_scan(f, init, xs, length=length, reverse=reverse, unroll=unroll_)
    dec_mod.jax.lax.scan = scan_u if unroll > 1 else orig_scan

    @jax.jit
    def decode(variables, image, overlap, scene, ious):
        logits = model.apply(variables, image, None, overlap, scene, ious, train=False)
        return jnp.argmax(logits, axis=-1)

    np.asarray(decode(variables, *args_base))
    t0 = time.perf_counter()
    for _ in range(15): out = decode(variables, *args_base)
    np.asarray(out)
    print(f"unroll={unroll}: {(time.perf_counter()-t0)/15*1e3:.2f} ms/batch", flush=True)
dec_mod.jax.lax.scan = orig_scan
