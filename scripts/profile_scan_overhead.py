"""What is the ~66us/step non-layer overhead in the decode scan?

Micro-scans with progressively more of the decode-step machinery.
"""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

B, T, E, C, L = 192, 25, 256, 97, 6
dt = jnp.bfloat16


def timeit(fn, *args, iters=30):
    np.asarray(jax.tree.leaves(fn(*args))[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


rng = jax.random.PRNGKey(0)
emb = jax.random.normal(rng, (C, E), dt)
head = jax.random.normal(rng, (E, C), dt)
pe = jax.random.normal(rng, (T + 1, E), dt)


@jax.jit
def scan_argmax_only(emb, head):
    def body(carry, t):
        prev = carry
        x = jnp.take(emb, prev, axis=0)
        x = x + jax.lax.dynamic_slice_in_dim(pe, t, 1, 0)[0]
        logits = (x @ head).astype(jnp.float32)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return nxt, logits

    init = jnp.zeros((B,), jnp.int32)
    _, out = jax.lax.scan(body, init, jnp.arange(T))
    return out


@jax.jit
def scan_with_caches(emb, head):
    """+ 6 layers x 2 cache dynamic_update_slices + cache reads, no matmuls."""
    def body(carry, t):
        prev, k, v = carry
        x = jnp.take(emb, prev, axis=0)
        x = x + jax.lax.dynamic_slice_in_dim(pe, t, 1, 0)[0]
        for i in range(L):
            k = jax.lax.dynamic_update_slice(k, x[None, :, None, :], (i, 0, t, 0))
            v = jax.lax.dynamic_update_slice(v, x[None, :, None, :], (i, 0, t, 0))
            x = x + jnp.sum(k[i], axis=1) * 1e-6 + jnp.sum(v[i], axis=1) * 1e-6
        logits = (x @ head).astype(jnp.float32)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return (nxt, k, v), logits

    init = (jnp.zeros((B,), jnp.int32),
            jnp.zeros((L, B, T, E), dt), jnp.zeros((L, B, T, E), dt))
    _, out = jax.lax.scan(body, init, jnp.arange(T))
    return out


@jax.jit
def scan_cache_update_only(emb, head):
    """caches carried + updated but never read."""
    def body(carry, t):
        prev, k, v = carry
        x = jnp.take(emb, prev, axis=0)
        for i in range(L):
            k = jax.lax.dynamic_update_slice(k, x[None, :, None, :], (i, 0, t, 0))
            v = jax.lax.dynamic_update_slice(v, x[None, :, None, :], (i, 0, t, 0))
        logits = (x @ head).astype(jnp.float32)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return (nxt, k, v), logits

    init = (jnp.zeros((B,), jnp.int32),
            jnp.zeros((L, B, T, E), dt), jnp.zeros((L, B, T, E), dt))
    _, out = jax.lax.scan(body, init, jnp.arange(T))
    return out


@jax.jit
def scan_matmuls_only(emb, head, ws):
    """6 x (qkv + out + 2 ff) matmuls per step, no caches/attention."""
    def body(carry, t):
        prev = carry
        x = jnp.take(emb, prev, axis=0)
        for (wqkv, wo, w1, w2) in ws:
            q = x @ wqkv
            x = x + q[:, :E] @ wo
            x = x + jax.nn.relu(x @ w1) @ w2
        logits = (x @ head).astype(jnp.float32)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return nxt, logits

    _, out = jax.lax.scan(body, jnp.zeros((B,), jnp.int32), jnp.arange(T))
    return out


ws = tuple(
    (jax.random.normal(rng, (E, 3 * E), dt) * 0.02,
     jax.random.normal(rng, (E, E), dt) * 0.02,
     jax.random.normal(rng, (E, 2048), dt) * 0.02,
     jax.random.normal(rng, (2048, E), dt) * 0.02)
    for _ in range(L)
)

print(f"backend: {jax.default_backend()}")
a = timeit(scan_argmax_only, emb, head)
print(f"embed+head+argmax scan:        {a:6.2f} ms ({a/T*1000:5.0f} us/step)")
b = timeit(scan_cache_update_only, emb, head)
print(f"+ 12 cache updates (no read):  {b:6.2f} ms ({b/T*1000:5.0f} us/step)")
c = timeit(scan_with_caches, emb, head)
print(f"+ cache reads:                 {c:6.2f} ms ({c/T*1000:5.0f} us/step)")
d = timeit(scan_matmuls_only, emb, head, ws)
print(f"matmuls-only (6 layers):       {d:6.2f} ms ({d/T*1000:5.0f} us/step)")
