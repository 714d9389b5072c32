"""PackedTree: params-pytree <-> per-dtype flat buffers (utils/packing.py).

Serving-latency infrastructure: dispatch cost over an RPC tunnel is per
argument buffer, so the ~500-leaf variables pytree is collapsed to one
buffer per dtype and rebuilt inside the jitted program (see the module
docstring; VERDICT r4 #5 root cause).
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_scene_text_recognition_tpu.utils.packing import (
    PackedTree,
    pack_apply,
)


def _tree():
    rng = np.random.default_rng(0)
    return {
        "params": {
            "dense": {"kernel": jnp.asarray(rng.random((8, 16), np.float32)),
                      "bias": jnp.asarray(rng.random(16, np.float32))},
            "embed": jnp.asarray(rng.random((32, 4)).astype(jnp.bfloat16)),
            "step": jnp.asarray(7, jnp.int32),
        },
        "batch_stats": {"mean": jnp.asarray(rng.random(16, np.float32))},
    }


def test_roundtrip_exact():
    tree = _tree()
    pt = PackedTree(tree)
    packed = pt.pack(tree)
    # a handful of buffers, one per dtype
    assert set(packed) == {"float32", "bfloat16", "int32"}
    assert all(b.ndim == 1 for b in packed.values())
    out = pt.unpack(packed)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        tree, out)
    # dtypes survive exactly (bf16 not upcast)
    assert out["params"]["embed"].dtype == jnp.bfloat16
    assert out["params"]["step"].dtype == jnp.int32


def test_pack_apply_jitted_equivalence():
    tree = _tree()

    def fn(variables, x):
        p = variables["params"]["dense"]
        return x @ p["kernel"] + p["bias"]

    x = jnp.asarray(np.random.default_rng(1).random((3, 8), np.float32))
    g, packed = pack_apply(fn, tree)
    got = jax.jit(g)(packed, x)
    want = fn(tree, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    # the jitted dispatch sees one buffer per dtype, not one per leaf
    assert len(jax.tree_util.tree_leaves(packed)) == 3
