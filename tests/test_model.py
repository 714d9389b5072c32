"""Model assembly + decode-path equivalence tests (SURVEY.md §4 Integration)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
from multimodal_scene_text_recognition_tpu.models.model import build_model

RNG = np.random.default_rng(1)

SMALL = dict(
    enc_layers=2,
    dec_layers=2,
    ff_dim=64,
    hidden_dim=64,
    embed_dim=32,
    lstm_hidden=32,
    num_heads=4,
    compute_dtype="float32",
)


def make_inputs(B=2):
    img = jnp.asarray(RNG.random((B, 32, 100, 1), dtype=np.float32))
    text = jnp.asarray(RNG.integers(0, 97, (B, 26)).astype(np.int32))
    overlap = jnp.asarray(RNG.integers(0, 100, (B, 15)).astype(np.int32))
    scene = jnp.asarray(RNG.integers(0, 100, (B, 52)).astype(np.int32))
    ious = jnp.full((B, 52), -1000.0)
    return img, text, overlap, scene, ious


def init_and_run(cfg, train=True):
    model = build_model(cfg)
    img, text, overlap, scene, ious = make_inputs()
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "dropout": rng, "semantics": rng}
    variables = model.init(rngs, img, text, overlap, scene, ious, train=True)
    if train:
        out, _ = model.apply(
            variables, img, text, overlap, scene, ious, train=True,
            rngs={"dropout": rng, "semantics": rng}, mutable=["batch_stats"],
        )
    else:
        out = model.apply(
            variables, img, None, overlap, scene, ious, train=False,
            rngs={"semantics": rng},
        )
    return out


@pytest.mark.parametrize(
    "kw,train_shape,eval_shape",
    [
        (dict(), (2, 26, 97), (2, 25, 97)),
        (dict(encoder="lstm", decoder="lstm"), (2, 26, 97), (2, 26, 97)),
        (dict(decoder="linear"), (2, 26, 97), (2, 26, 97)),
        (dict(encoder="oscar"), (2, 26, 97), (2, 25, 97)),
        (dict(encoder="oscar", oscar_encoder=True), (2, 26, 97), (2, 25, 97)),
        (
            dict(
                pre_encoder_mlp=True,
                pre_decoder_mlp=True,
                cls_decoder_init=True,
                multihead_pre_target=True,
                multihead_pre_memory=True,
                multihead_post_memory=True,
                post_decoder_mlp=True,
            ),
            (2, 26, 97),
            (2, 25, 97),
        ),
        (dict(semantic_vector="scene"), (2, 26, 97), (2, 25, 97)),
        (dict(semantic_vector="combined"), (2, 26, 97), (2, 25, 97)),
        (dict(semantic_source="zero"), (2, 26, 97), (2, 25, 97)),
        (dict(semantic_source="rand"), (2, 26, 97), (2, 25, 97)),
        (dict(use_tps=False), (2, 26, 97), (2, 25, 97)),
    ],
)
def test_config_combo_shapes(kw, train_shape, eval_shape):
    cfg = ModelConfig(**SMALL, **kw)
    assert init_and_run(cfg, train=True).shape == train_shape
    assert init_and_run(cfg, train=False).shape == eval_shape


def test_no_tps_ablation_skips_rectification():
    """use_tps=False (BASELINE.json ablation config): no TPS params exist
    and rectify is the identity."""
    cfg = ModelConfig(**SMALL, use_tps=False)
    model = build_model(cfg)
    img, text, overlap, scene, ious = make_inputs()
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           img, text, overlap, scene, ious, train=True)
    assert "transformation" not in variables["params"]
    rect = model.apply(variables, img, method=type(model).rectify)
    np.testing.assert_array_equal(np.asarray(rect), np.asarray(img))


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(cls_decoder_init=True),
        # post_decoder_mlp is excluded here: its logit fusion runs after the
        # decode loop in both implementations (reference: decoders.py:263-273)
        # but the teacher-forced rerun below cannot expose pre-fusion logits,
        # so it is covered by the shape tests only.
        dict(
            pre_decoder_mlp=True,
            multihead_pre_target=True,
            multihead_pre_memory=True,
            multihead_post_memory=True,
        ),
    ],
)
def test_greedy_decode_equals_stepwise_rerun(kw):
    """The fused scan+KV-cache decode must reproduce the reference's
    decode-by-rerun algorithm (decoders.py:226-263) exactly: at each step,
    re-run the full teacher-forced pass on the prefix and take the last
    position's argmax as the next input.

    Tested on the decoder in isolation (the model-level train flag would
    also flip BatchNorm statistics, which is orthogonal to decode parity).
    """
    from multimodal_scene_text_recognition_tpu.models.decoders import (
        TransformerDecoder,
    )

    B, H, E, T = 2, 64, 32, 25
    dec = TransformerDecoder(
        num_classes=97, d_model=E, memory_dim=H, num_heads=4, ff_dim=64,
        num_layers=2, dropout=0.0, max_text_length=T, **kw,
    )
    enc_out = jnp.asarray(RNG.standard_normal((B, 26, H)).astype(np.float32))
    semantics = jnp.asarray(RNG.standard_normal((B, 15, E)).astype(np.float32))
    rng = jax.random.PRNGKey(0)
    variables = dec.init(
        {"params": rng, "dropout": rng},
        enc_out, jnp.zeros((B, 26), jnp.int32), semantics, train=True,
    )

    fused = dec.apply(variables, enc_out, None, semantics, train=False)

    targets = np.zeros((B, T + 1), np.int32)  # slot 0 = GO
    logits_steps = []
    for t in range(T):
        full = dec.apply(
            variables, enc_out, jnp.asarray(targets[:, : t + 1]), semantics,
            train=True, rngs={"dropout": rng},
        )
        step_logits = np.asarray(full)[:, t]
        logits_steps.append(step_logits)
        targets[:, t + 1] = step_logits.argmax(-1)

    rerun = np.stack(logits_steps, axis=1)
    np.testing.assert_allclose(np.asarray(fused), rerun, atol=1e-4)


def test_early_stop_decode_matches_full_scan():
    """early_stop (while_loop, exits when all rows emitted [s]) produces the
    same [s]-pruned strings as the fixed-length scan, and identical logits
    for every position up to and including each row's first [s]."""
    from multimodal_scene_text_recognition_tpu.core.charset import AttnCodec, EOS_ID
    from multimodal_scene_text_recognition_tpu.models.decoders import (
        TransformerDecoder,
    )

    B, H, E, T = 4, 64, 32, 25
    common = dict(num_classes=97, d_model=E, memory_dim=H, num_heads=4,
                  ff_dim=64, num_layers=2, dropout=0.0, max_text_length=T)
    dec_full = TransformerDecoder(**common, early_stop=False)
    dec_es = TransformerDecoder(**common, early_stop=True)
    enc_out = jnp.asarray(RNG.standard_normal((B, 26, H)).astype(np.float32))
    rng = jax.random.PRNGKey(0)
    variables = dec_full.init(
        {"params": rng, "dropout": rng},
        enc_out, jnp.zeros((B, 26), jnp.int32), None, train=True,
    )
    # bias the logit head toward [s] so sequences actually stop early
    variables = jax.tree_util.tree_map_with_path(
        lambda path, v: v + 2.0 * jax.nn.one_hot(EOS_ID, 97)
        if any(getattr(p, "key", None) == "emb_to_classes" for p in path)
        and v.ndim == 1 else v,
        variables,
    )

    full = np.asarray(dec_full.apply(variables, enc_out, None, None, train=False))
    es = np.asarray(dec_es.apply(variables, enc_out, None, None, train=False))

    codec = AttnCodec("".join(chr(33 + i) for i in range(94)), T)
    s_full = codec.decode(full.argmax(-1))
    s_es = codec.decode(es.argmax(-1))
    assert s_full == s_es
    # logits identical through each row's first [s]
    ids = full.argmax(-1)
    for b in range(B):
        eos_pos = np.argmax(ids[b] == EOS_ID) if (ids[b] == EOS_ID).any() else T - 1
        np.testing.assert_allclose(
            es[b, : eos_pos + 1], full[b, : eos_pos + 1], atol=1e-5)
    # the early path must actually have stopped for this biased head
    assert (ids == EOS_ID).any()


def test_train_loss_decreases_one_step():
    """A single SGD step on one batch reduces the CE loss (sanity that the
    whole graph is differentiable end to end)."""
    import optax

    cfg = ModelConfig(**SMALL, dropout=0.0)
    model = build_model(cfg)
    img, text, overlap, scene, ious = make_inputs()
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, img, text, overlap, scene, ious,
        train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    inputs = text[:, :-1]
    targets = text[:, 1:]

    def loss_fn(p):
        logits, new_vars = model.apply(
            {"params": p, "batch_stats": batch_stats},
            img, inputs, overlap, scene, ious, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, targets
        ).mean()
        return loss

    l0, grads = jax.value_and_grad(loss_fn)(params)
    params2 = jax.tree.map(lambda p, g: p - 0.01 * g, params, grads)
    l1 = loss_fn(params2)
    assert float(l1) < float(l0)


def test_standard_norm_style_and_remat():
    cfg = ModelConfig(**SMALL, encoder_norm_style="standard", remat=True)
    out = init_and_run(cfg, train=True)
    assert out.shape == (2, 26, 97)
    assert init_and_run(cfg, train=False).shape == (2, 25, 97)


def test_fused_decode_matches_scan():
    """The whole-decode Pallas kernel (ops/fused_decode.py, interpret mode on
    CPU) produces the same logits/argmax as the XLA scan greedy decode, with
    and without the out-of-loop fusion hooks it supports."""
    from multimodal_scene_text_recognition_tpu.models.decoders import (
        TransformerDecoder,
    )

    B, H, E, T = 3, 64, 32, 25
    for hooks in (dict(), dict(pre_decoder_mlp=True, post_decoder_mlp=True),
                  dict(cls_decoder_init=True)):
        common = dict(num_classes=97, d_model=E, memory_dim=H, num_heads=4,
                      ff_dim=64, num_layers=2, dropout=0.0,
                      max_text_length=T, **hooks)
        dec_scan = TransformerDecoder(**common)
        dec_fused = TransformerDecoder(**common, fused=True)
        enc_out = jnp.asarray(
            RNG.standard_normal((B, 26, H)).astype(np.float32))
        sem = jnp.asarray(RNG.standard_normal((B, 5, E)).astype(np.float32))
        rng = jax.random.PRNGKey(0)
        variables = dec_scan.init(
            {"params": rng, "dropout": rng},
            enc_out, jnp.zeros((B, 26), jnp.int32), sem, train=True,
        )
        ref = np.asarray(
            dec_scan.apply(variables, enc_out, None, sem, train=False))
        fus = np.asarray(
            dec_fused.apply(variables, enc_out, None, sem, train=False))
        np.testing.assert_allclose(ref, fus, atol=1e-4)
        assert (ref.argmax(-1) == fus.argmax(-1)).all()


def test_fused_decode_int8_close_to_float():
    """The int8-quantized fused kernel (decode_int8: per-channel int8
    projection weights + dynamic per-row activation quant) stays close to
    the float fused path — PTQ error small relative to logit scale, high
    argmax agreement."""
    from multimodal_scene_text_recognition_tpu.models.decoders import (
        TransformerDecoder,
    )

    B, H, E, T = 3, 64, 32, 25
    common = dict(num_classes=97, d_model=E, memory_dim=H, num_heads=4,
                  ff_dim=64, num_layers=2, dropout=0.0, max_text_length=T)
    dec_float = TransformerDecoder(**common, fused=True)
    dec_int8 = TransformerDecoder(**common, fused=True, int8=True)
    enc_out = jnp.asarray(RNG.standard_normal((B, 26, H)).astype(np.float32))
    rng = jax.random.PRNGKey(0)
    variables = dec_float.init(
        {"params": rng, "dropout": rng},
        enc_out, jnp.zeros((B, 26), jnp.int32), None, train=True,
    )
    f = np.asarray(
        dec_float.apply(variables, enc_out, None, None, train=False))
    q = np.asarray(
        dec_int8.apply(variables, enc_out, None, None, train=False))
    assert q.shape == f.shape
    rel = np.abs(f - q).mean() / (np.abs(f).mean() + 1e-9)
    assert rel < 0.08, rel
    agree = (f.argmax(-1) == q.argmax(-1)).mean()
    assert agree > 0.8, agree


def test_fused_decode_falls_back_for_unsupported_configs():
    """Per-layer fusion sites aren't covered by the kernel — fused=True must
    still produce correct output via the XLA scan fallback."""
    from multimodal_scene_text_recognition_tpu.models.decoders import (
        TransformerDecoder,
    )

    B, H, E, T = 2, 64, 32, 25
    common = dict(num_classes=97, d_model=E, memory_dim=H, num_heads=4,
                  ff_dim=64, num_layers=2, dropout=0.0, max_text_length=T,
                  multihead_pre_target=True)
    dec_scan = TransformerDecoder(**common)
    dec_fused = TransformerDecoder(**common, fused=True)
    enc_out = jnp.asarray(RNG.standard_normal((B, 26, H)).astype(np.float32))
    sem = jnp.asarray(RNG.standard_normal((B, 5, E)).astype(np.float32))
    rng = jax.random.PRNGKey(0)
    variables = dec_scan.init(
        {"params": rng, "dropout": rng},
        enc_out, jnp.zeros((B, 26), jnp.int32), sem, train=True,
    )
    ref = np.asarray(
        dec_scan.apply(variables, enc_out, None, sem, train=False))
    fus = np.asarray(
        dec_fused.apply(variables, enc_out, None, sem, train=False))
    np.testing.assert_allclose(ref, fus, atol=1e-5)


def test_fused_early_stop_decode_matches_scan_early_stop():
    """The in-kernel while_loop early stop (fused=True, early_stop=True)
    produces the same [s]-pruned strings as the XLA while_loop path."""
    from multimodal_scene_text_recognition_tpu.core.charset import (
        AttnCodec,
        EOS_ID,
    )
    from multimodal_scene_text_recognition_tpu.models.decoders import (
        TransformerDecoder,
    )

    B, H, E, T = 4, 64, 32, 25
    common = dict(num_classes=97, d_model=E, memory_dim=H, num_heads=4,
                  ff_dim=64, num_layers=2, dropout=0.0, max_text_length=T,
                  early_stop=True)
    dec_scan = TransformerDecoder(**common)
    dec_fused = TransformerDecoder(**common, fused=True)
    enc_out = jnp.asarray(RNG.standard_normal((B, 26, H)).astype(np.float32))
    rng = jax.random.PRNGKey(0)
    variables = dec_scan.init(
        {"params": rng, "dropout": rng},
        enc_out, jnp.zeros((B, 26), jnp.int32), None, train=True,
    )
    variables = jax.tree_util.tree_map_with_path(
        lambda path, v: v + 2.0 * jax.nn.one_hot(EOS_ID, 97)
        if any(getattr(p, "key", None) == "emb_to_classes" for p in path)
        and v.ndim == 1 else v,
        variables,
    )
    a = np.asarray(dec_scan.apply(variables, enc_out, None, None, train=False))
    b = np.asarray(dec_fused.apply(variables, enc_out, None, None, train=False))
    codec = AttnCodec("".join(chr(33 + i) for i in range(94)), T)
    assert codec.decode(a.argmax(-1)) == codec.decode(b.argmax(-1))
