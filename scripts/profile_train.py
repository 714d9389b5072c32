"""Split train-step cost: fwd-only loss vs fwd+bwd vs full step (B=192)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp, optax
from bench import build
from multimodal_scene_text_recognition_tpu.core.config import ModelConfig, TrainConfig
from multimodal_scene_text_recognition_tpu.train.state import create_train_state, make_optimizer
from multimodal_scene_text_recognition_tpu.train.steps import cross_entropy, make_train_step

cfg = ModelConfig()
model, variables, batch = build(cfg)
rng = jax.random.PRNGKey(0)
text_in, targets = batch["text"][:, :-1], batch["text"][:, 1:]

def loss_fn(params, batch_stats):
    logits, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["image"], text_in, batch["overlap"], batch["scene"], batch["ious"],
        train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
    return cross_entropy(logits, targets)

fwd = jax.jit(loss_fn)
grad = jax.jit(jax.grad(loss_fn))

def timeit(f, *a, iters=10):
    out = f(*a); np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*a)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter()-t0)/iters*1e3

p, bs = variables["params"], variables["batch_stats"]
print(f"fwd loss:   {timeit(fwd, p, bs):7.2f} ms", flush=True)
print(f"fwd+bwd:    {timeit(grad, p, bs):7.2f} ms", flush=True)

tx = make_optimizer(TrainConfig())
state = create_train_state(model, tx, batch, rng)
step = make_train_step(model, tx, donate=False)
def full(state): return step(state, batch, rng)[1]["loss"]
print(f"full step:  {timeit(full, state):7.2f} ms", flush=True)
