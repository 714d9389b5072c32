"""Decode throughput across batch sizes (headroom check)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from bench import build, example_batch, bench_decode
from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
cfg = ModelConfig()
model, variables, _ = build(cfg)
for B in (192, 384, 768):
    batch = example_batch(cfg, batch=B)
    res = bench_decode(model, variables, batch, iters=10)
    print(f"B={B}: {res['crops_per_sec']:.0f} crops/s "
          f"({B/res['crops_per_sec']*1e3:.1f} ms/batch)", flush=True)
