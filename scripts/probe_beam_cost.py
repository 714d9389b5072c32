"""Decompose the beam-decode step cost on the chip (perf triage only).

Variants of the fixed-length k=5 beam body, slope-timed (random-init
weights are fine: fixed-length cost is data-independent):
  * full        — the real body (stepper + top_k + cache reorder)
  * no_reorder  — skip the KV-cache gather_beams (results wrong, perf only)
  * no_topk     — replace lax.top_k with a static slice (results wrong)
  * stepper     — stepper-only loop at B*K rows (the matmul floor)

Each runs from a precomputed encoder memory so upstream (TPS/ResNet/
encoder) is excluded.  Usage: python scripts/probe_beam_cost.py
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_scene_text_recognition_tpu.core.charset import EOS_ID
from multimodal_scene_text_recognition_tpu.core.config import Config
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.models.decoders import (
    GO_ID,
    sinusoidal_table,
)
from multimodal_scene_text_recognition_tpu.utils.timing import slope_ms

B = int(os.environ.get("PB_B", "192"))
K = 5
K1, K2 = int(os.environ.get("PB_K1", "3")), int(os.environ.get("PB_K2", "9"))

cfg = Config().model
model = build_model(cfg)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((B, cfg.img_h, cfg.img_w, 1), dtype=np.float32))
text = jnp.zeros((B, cfg.max_text_length + 2), jnp.int32)
overlap = jnp.zeros((B, cfg.max_overlap_objs), jnp.int32)
scene = jnp.zeros((B, cfg.max_scene_objs), jnp.int32)
ious = jnp.full((B, cfg.max_scene_objs), -1000.0, jnp.float32)
variables = model.init(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
    img, text[:, :-1], overlap, scene, ious, train=True)


def enc_fn(m, image, ov, sc, io):
    from multimodal_scene_text_recognition_tpu.models.model import (
        to_column_sequence,
    )

    rect = m.transformation(image, train=False)
    feats = m.feature_extractor(rect, False)
    cols = to_column_sequence(feats).astype(jnp.float32)
    sem = m.semantic(ov, sc, io)
    return m.encoder(cols, semantics=sem, train=False), sem


enc_out, sem = jax.jit(
    lambda v, i, o, s, u: model.apply(v, i, o, s, u, method=enc_fn)
)(variables, img, overlap, scene, ious)
print(f"enc_out {enc_out.shape}", flush=True)


def beam_variant(m, enc_out, sem, variant: str):
    """Replica of TransformerDecoder.beam_decode's fixed-length scan with
    perf knobs (models/decoders.py:571); any drift only affects this
    triage probe, not shipped code."""
    dec = m.decoder
    memory = dec._memory(enc_out, sem, lambda x, site: x)
    Bv, E, T, C = memory.shape[0], dec.d_model, dec.max_text_length, \
        dec.num_classes
    expand = lambda x: None if x is None else jnp.repeat(x, K, axis=0)
    mem_x, sem_x = expand(memory), expand(sem)
    emb_table = dec.emb.embedding
    pe = jnp.asarray(sinusoidal_table(T + 1, E))
    step_all, make_caches = dec._make_stepper(mem_x, sem_x)
    neg_inf = jnp.float32(-1e9)

    if variant == "stepper":
        def sbody(carry, t):
            prev_id, caches = carry
            x = jnp.take(emb_table, prev_id, axis=0)[:, None, :]
            x = x + jax.lax.dynamic_slice_in_dim(pe, t, 1, axis=0)[None, 0:1]
            logits_t, caches = step_all(x, t, caches)
            return (jnp.argmax(logits_t, -1).astype(jnp.int32), caches), ()

        (tok, _), _ = jax.lax.scan(
            sbody, (jnp.full((Bv * K,), GO_ID, jnp.int32), make_caches()),
            jnp.arange(T, dtype=jnp.int32))
        return tok.reshape(Bv, K)

    def gather_beams(x, beam_idx):
        shaped = x.reshape(x.shape[0], Bv, K, *x.shape[2:])
        idx = beam_idx.reshape(1, Bv, K, *([1] * (x.ndim - 2)))
        return jnp.take_along_axis(shaped, idx, axis=2).reshape(x.shape)

    def body(carry, t):
        prev_tok, scores, finished, seqs, caches = carry
        x = jnp.take(emb_table, prev_tok.reshape(-1), axis=0)[:, None, :]
        x = x + jax.lax.dynamic_slice_in_dim(pe, t, 1, axis=0)[None, 0:1]
        logits_t, caches = step_all(x, t, caches)
        logp = jax.nn.log_softmax(logits_t).reshape(Bv, K, C)
        frozen = jnp.full((C,), neg_inf).at[EOS_ID].set(0.0)
        logp = jnp.where(finished[:, :, None], frozen[None, None, :], logp)
        combined = scores[:, :, None] + logp
        flat = combined.reshape(Bv, K * C)
        if variant == "no_topk":
            new_scores = jax.lax.dynamic_slice_in_dim(flat, 0, K, axis=1)
            flat_idx = jnp.broadcast_to(
                jnp.arange(K, dtype=jnp.int32)[None], (Bv, K)) + \
                prev_tok  # data dep so nothing folds
        else:
            new_scores, flat_idx = jax.lax.top_k(flat, K)
        beam_idx = flat_idx // C
        token = (flat_idx % C).astype(jnp.int32)
        if variant != "no_reorder":
            caches = {k: gather_beams(v, beam_idx) for k, v in caches.items()}
        gather2 = lambda a: jnp.take_along_axis(a, beam_idx, axis=1)
        finished = gather2(finished) | (token == EOS_ID)
        seqs = jnp.take_along_axis(seqs, beam_idx[:, :, None], axis=1)
        seqs = seqs.at[:, :, t].set(token)
        return (token, new_scores, finished, seqs, caches), None

    init = (
        jnp.full((Bv, K), GO_ID, jnp.int32),
        jnp.tile(jnp.asarray([0.0] + [float(-1e9)] * (K - 1)), (Bv, 1)),
        jnp.zeros((Bv, K), bool),
        jnp.zeros((Bv, K, T), jnp.int32),
        make_caches(),
    )
    (tok, scores, *_), _ = jax.lax.scan(
        body, init, jnp.arange(T, dtype=jnp.int32))
    return scores


for variant in ("full", "no_reorder", "no_topk", "stepper"):
    def run(v, e, s, _var=variant):
        return model.apply(v, e, s, _var, method=beam_variant)

    def make_fn(k, _run=run):
        @jax.jit
        def loop(variables, enc_out, sem):
            def lbody(i, acc):
                out = _run(variables, enc_out + acc * 1e-20, sem)
                return acc + jnp.sum(out.astype(jnp.float32)) * 1e-20

            return jax.lax.fori_loop(0, k, lbody, jnp.float32(0))

        return lambda: loop(variables, enc_out, sem)

    ms = slope_ms(make_fn, K1, K2)
    print(f"{variant:>10}: {ms:7.2f} ms / 25-step fixed beam body", flush=True)
