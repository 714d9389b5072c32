"""Component-level TPU timing: TPS, ResNet, encoder, decoder scan, train."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.models.resnet import to_column_sequence
from bench import example_batch

cfg = ModelConfig()
model = build_model(cfg)
batch = example_batch(cfg)
rng = jax.random.PRNGKey(0)
variables = model.init({"params": rng, "dropout": rng},
    batch["image"], batch["text"][:, :-1], batch["overlap"], batch["scene"],
    batch["ious"], train=True)

def timeit(fn, *args, iters=10):
    out = fn(*args); jax.tree.map(lambda x: 0, jax.device_get(out))
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3

m = model.bind(variables)

@jax.jit
def tps_only(v, img):
    return jnp.sum(model.apply(v, img, train=False,
                       method=lambda m, img, train: m.transformation(img, train=train)))

@jax.jit
def thru_resnet(v, img):
    def f(m, img, train):
        r = m.transformation(img, train=train)
        return to_column_sequence(m.feature_extractor(r, train=train))
    return jnp.sum(model.apply(v, img, train=False, method=f))

@jax.jit
def thru_encoder(v, img, overlap, scene, ious):
    def f(m, img, overlap, scene, ious, train):
        r = m.transformation(img, train=train)
        cols = to_column_sequence(m.feature_extractor(r, train=train)).astype(jnp.float32)
        sem = m.semantic(overlap, scene, ious)
        return m.encoder(cols, semantics=sem, train=train)
    return jnp.sum(model.apply(v, img, overlap, scene, ious, train=False, method=f))

@jax.jit
def full_decode(v, img, overlap, scene, ious):
    return jnp.argmax(model.apply(v, img, None, overlap, scene, ious, train=False), -1)

a = (variables, batch["image"])
b = (variables, batch["image"], batch["overlap"], batch["scene"], batch["ious"])
print(f"tps:          {timeit(tps_only, *a):8.2f} ms")
print(f"+resnet:      {timeit(thru_resnet, *a):8.2f} ms")
print(f"+encoder:     {timeit(thru_encoder, *b):8.2f} ms")
print(f"+decode scan: {timeit(full_decode, *b):8.2f} ms")
