"""Beam-search decode tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_scene_text_recognition_tpu.core.charset import EOS_ID
from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
from multimodal_scene_text_recognition_tpu.models.decoders import TransformerDecoder
from multimodal_scene_text_recognition_tpu.models.model import (
    SceneTextModel,
    build_model,
)

RNG = np.random.default_rng(3)


def make_decoder(B=3, H=64, E=32, T=8):
    dec = TransformerDecoder(
        num_classes=13, d_model=E, memory_dim=H, num_heads=4, ff_dim=64,
        num_layers=2, dropout=0.0, max_text_length=T,
    )
    enc_out = jnp.asarray(RNG.standard_normal((B, 10, H)).astype(np.float32))
    sem = jnp.asarray(RNG.standard_normal((B, 5, E)).astype(np.float32))
    rng = jax.random.PRNGKey(0)
    variables = dec.init(
        {"params": rng, "dropout": rng},
        enc_out, jnp.zeros((B, T + 1), jnp.int32), sem, train=True,
    )
    return dec, variables, enc_out, sem


def test_beam1_equals_greedy():
    dec, variables, enc_out, sem = make_decoder()
    greedy_logits = dec.apply(variables, enc_out, None, sem, train=False)
    greedy_ids = np.asarray(jnp.argmax(greedy_logits, axis=-1))

    tokens, scores = dec.apply(
        variables, enc_out, sem, 1, method=TransformerDecoder.beam_decode
    )
    np.testing.assert_array_equal(np.asarray(tokens), greedy_ids)
    assert scores.shape == (3,)


def test_beam_early_stop_matches_full_scan():
    """Beam with early_stop=True (while_loop exit once all beams emit [s])
    returns identical tokens/scores to the fixed-length scan; biasing the
    head towards [s] makes beams actually finish early."""
    B, H, E, T = 3, 64, 32, 8
    common = dict(num_classes=13, d_model=E, memory_dim=H, num_heads=4,
                  ff_dim=64, num_layers=2, dropout=0.0, max_text_length=T)
    dec = TransformerDecoder(**common)
    dec_es = TransformerDecoder(**common, early_stop=True)
    enc_out = jnp.asarray(RNG.standard_normal((B, 10, H)).astype(np.float32))
    rng = jax.random.PRNGKey(0)
    variables = dec.init(
        {"params": rng, "dropout": rng},
        enc_out, jnp.zeros((B, T + 1), jnp.int32), None, train=True,
    )
    # bias towards emitting [s] so the early exit actually triggers
    variables = jax.tree_util.tree_map_with_path(
        lambda path, v: v + 2.0 * jax.nn.one_hot(EOS_ID, 13)
        if any(getattr(p, "key", None) == "emb_to_classes" for p in path)
        and v.ndim == 1 else v,
        variables,
    )
    tok_a, sc_a = dec.apply(variables, enc_out, None, beam_size=4,
                            method=TransformerDecoder.beam_decode)
    tok_b, sc_b = dec_es.apply(variables, enc_out, None, beam_size=4,
                               method=TransformerDecoder.beam_decode)
    # prune at first [s]: positions after it are never read
    a, b = np.asarray(tok_a), np.asarray(tok_b)
    for ra, rb in zip(a, b):
        ea = np.argmax(ra == EOS_ID) if (ra == EOS_ID).any() else len(ra)
        np.testing.assert_array_equal(ra[: ea + 1], rb[: ea + 1])
    np.testing.assert_allclose(np.asarray(sc_a), np.asarray(sc_b), atol=1e-5)


def test_beam5_no_worse_than_greedy():
    """The best beam's sequence log-prob must be >= the greedy sequence's."""
    dec, variables, enc_out, sem = make_decoder()

    def seq_logprob(tokens):
        """Teacher-forced log-prob of a token sequence under the decoder."""
        B, T = tokens.shape
        go = jnp.full((B, 1), 0, jnp.int32)
        text_in = jnp.concatenate([go, tokens[:, :-1]], axis=1)
        logits = dec.apply(variables, enc_out, text_in, sem, train=True,
                           rngs={"dropout": jax.random.PRNGKey(0)})
        logp = jax.nn.log_softmax(logits)
        picked = jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
        # score accumulates only up to and including the first [s]
        before_eos = jnp.cumprod(
            jnp.concatenate(
                [jnp.ones((B, 1), jnp.int32), (tokens[:, :-1] != EOS_ID)],
                axis=1,
            ),
            axis=1,
        )
        return jnp.sum(picked * before_eos, axis=1)

    greedy_logits = dec.apply(variables, enc_out, None, sem, train=False)
    greedy_ids = jnp.argmax(greedy_logits, axis=-1).astype(jnp.int32)
    g_scores = np.asarray(seq_logprob(greedy_ids))

    tokens, b_scores = dec.apply(
        variables, enc_out, sem, 5, method=TransformerDecoder.beam_decode
    )
    b_check = np.asarray(seq_logprob(tokens))
    # reported scores match independently computed sequence log-probs
    np.testing.assert_allclose(np.asarray(b_scores), b_check, atol=1e-4)
    assert (b_check >= g_scores - 1e-5).all()


def test_beam_ancestry_matches_reorder():
    """The default ancestry bookkeeping (unreordered caches + attention
    through an ancestry one-hot — ops/attention.attend_ancestry) produces
    identical tokens and scores to the physically-reordered-cache form,
    across beam widths and fusion-site configs (fusion sites add extra
    cached-attention sites that must see the same ancestry)."""
    for kwargs in ({}, {"multihead_pre_target": True,
                        "multihead_post_memory": True}):
        B, H, E, T = 3, 64, 32, 8
        dec = TransformerDecoder(
            num_classes=13, d_model=E, memory_dim=H, num_heads=4, ff_dim=64,
            num_layers=2, dropout=0.0, max_text_length=T, **kwargs,
        )
        enc_out = jnp.asarray(
            RNG.standard_normal((B, 10, H)).astype(np.float32))
        sem = jnp.asarray(RNG.standard_normal((B, 5, E)).astype(np.float32))
        rng = jax.random.PRNGKey(1)
        variables = dec.init(
            {"params": rng, "dropout": rng},
            enc_out, jnp.zeros((B, T + 1), jnp.int32), sem, train=True,
        )
        for k in (1, 4):
            tok_a, sc_a = dec.apply(
                variables, enc_out, sem, k,
                method=TransformerDecoder.beam_decode)
            tok_b, sc_b = dec.apply(
                variables, enc_out, sem, k, reorder_caches=True,
                method=TransformerDecoder.beam_decode)
            np.testing.assert_array_equal(np.asarray(tok_a),
                                          np.asarray(tok_b))
            np.testing.assert_allclose(np.asarray(sc_a), np.asarray(sc_b),
                                       atol=1e-5)


def test_fused_beam_matches_xla():
    """The whole-beam Pallas kernel (ops/fused_beam.py, interpret mode on
    CPU) produces identical tokens — and scores to f32 tolerance — as the
    XLA ancestry beam, across beam widths and the configs the kernel
    covers (plain, cls_decoder_init, early_stop)."""
    B, H, E, T = 3, 64, 32, 10
    for hooks in (dict(), dict(cls_decoder_init=True),
                  dict(early_stop=True)):
        common = dict(num_classes=13, d_model=E, memory_dim=H, num_heads=4,
                      ff_dim=64, num_layers=2, dropout=0.0,
                      max_text_length=T, **hooks)
        dec = TransformerDecoder(**common)
        dec_f = TransformerDecoder(**common, beam_fused=True)
        enc_out = jnp.asarray(
            RNG.standard_normal((B, 10, H)).astype(np.float32))
        sem = jnp.asarray(RNG.standard_normal((B, 5, E)).astype(np.float32))
        rng = jax.random.PRNGKey(0)
        variables = dec.init(
            {"params": rng, "dropout": rng},
            enc_out, jnp.zeros((B, T + 1), jnp.int32), sem, train=True,
        )
        for k in (1, 4):
            ta, sa = dec.apply(variables, enc_out, sem, k,
                               method=TransformerDecoder.beam_decode)
            tb, sb = dec_f.apply(variables, enc_out, sem, k,
                                 method=TransformerDecoder.beam_decode)
            np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
            np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                       atol=1e-5)


def test_ancestry_flat_matches_select():
    """The two attend_ancestry formulations (flat masked MHA over the J*T
    axis vs select-then-softmax contractions) agree numerically: exp(-inf)
    is exactly 0, so masking non-ancestor (slot, position) pairs before
    the softmax equals contracting them away first."""
    from multimodal_scene_text_recognition_tpu.ops.attention import (
        attend_ancestry,
        attend_ancestry_flat,
    )

    B, K, T, E, H = 2, 3, 6, 16, 4
    t_cur = 4  # positions 0..4 visible
    q = jnp.asarray(RNG.standard_normal((B * K, 1, E)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((B * K, T, E)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((B * K, T, E)).astype(np.float32))
    anc = jnp.asarray(RNG.integers(0, K, (B, K, T)).astype(np.int32))
    anc_oh = jax.nn.one_hot(anc, K)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T), 3)
    mask = jnp.where(pos <= t_cur, 0.0, -jnp.inf)
    a = attend_ancestry(q, k, v, 4, anc_oh, mask)
    b = attend_ancestry_flat(q, k, v, 4, anc_oh, mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_model_level_beam():
    cfg = ModelConfig(
        enc_layers=1, dec_layers=1, ff_dim=64, hidden_dim=64, embed_dim=32,
        lstm_hidden=32, num_heads=4, compute_dtype="float32", dropout=0.0,
    )
    model = build_model(cfg)
    B = 2
    img = jnp.asarray(RNG.random((B, 32, 100, 1), dtype=np.float32))
    overlap = jnp.zeros((B, 15), jnp.int32)
    scene = jnp.zeros((B, 52), jnp.int32)
    ious = jnp.full((B, 52), -1000.0)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        img, jnp.zeros((B, 26), jnp.int32), overlap, scene, ious, train=True,
    )
    tokens, scores = model.apply(
        variables, img, overlap, scene, ious, 5,
        method=SceneTextModel.beam_decode,
    )
    assert tokens.shape == (B, 25)
    assert scores.shape == (B,)
