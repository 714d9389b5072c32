"""Decoders: transformer (with KV-cached scan decode), LSTM-attention, linear.

Capability parity with reference modules/decoders.py:
  * TransformerDecoder — 6-layer, d_model=embed_dim decoder over the encoder
    memory with all five semantic-fusion hooks (reference: decoders.py:103-275,
    320-467).  Training is one causal-masked pass (reference:198-224).
    Inference is a single ``lax.scan`` greedy loop with per-layer KV caches —
    replacing the reference's O(T^2·layers) re-run of the whole prefix each
    step (reference:226-263).
  * LSTMAttentionDecoder — additive-attention LSTM decoder, teacher-forced
    scan in training and argmax-feedback scan in inference
    (reference: decoders.py:10-101).
  * LinearDecoder — per-column linear head (reference: decoders.py:278-296).

Implementation note: all weights live in param-container submodules whose
arrays are collected *before* any ``lax.scan`` so the scan bodies are pure
closures — the linen-idiomatic way to keep the whole greedy decode one XLA
program.

Reference bugs handled:
  * The in-layer fusion sites pass a batch-first tensor to a seq-first
    torch MHA (reference: decoders.py:437-438) which cannot run unless
    B == T; here the fused attention is query=tgt, key/value=relevance-
    weighted semantics, position-aligned — the evident intent.  Two further
    sanity deviations from that broken path: the fused attention is causal
    (so cached decode == teacher-forced pass), and each site reads the
    *original* object semantics rather than the previous site's per-position
    output (the reference's reassignment at decoders.py:437,448,459 would
    make later sites softmax over target positions, which is non-causal).
  * ``semantic_to_emb`` (reference: decoders.py:359) is declared per layer
    but never used; not replicated.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import (
    MHAWeights,
    attend,
    attend_ancestry,
    causal_mask,
    multihead_attention,
    qkv_projections,
)
from ..ops.lstm import lstm_cell
from .layers import (
    LayerNormP,
    LinearP,
    MLPP,
    MultiHeadAttention,
    layer_norm_apply,
    linear_apply,
    mlp_apply,
    sinusoidal_table,
    torch_linear_init,
)

GO_ID = 0


class FusionSiteWeights(NamedTuple):
    mha: MHAWeights
    mlp: Any  # relevance-MLP layer weights


class DecLayerWeights(NamedTuple):
    self_attn: MHAWeights
    cross_attn: MHAWeights
    ff1: Any
    ff2: Any
    norm1: Any
    norm2: Any
    norm3: Any
    pre_target: Optional[FusionSiteWeights]
    pre_memory: Optional[FusionSiteWeights]
    post_memory: Optional[FusionSiteWeights]


def _relevance(feats, sem, mlp_ws, return_scores: bool = False):
    """Pure-fn relevance fusion (see layers.relevance_fusion)."""
    B, T, _ = feats.shape
    O = sem.shape[1]
    pair = jnp.concatenate(
        [
            jnp.broadcast_to(feats[:, :, None, :], (B, T, O, feats.shape[-1])),
            jnp.broadcast_to(sem[:, None, :, :], (B, T, O, sem.shape[-1])),
        ],
        axis=-1,
    )
    scores = jax.nn.softmax(mlp_apply(pair, mlp_ws), axis=2)
    fused = jnp.sum(sem[:, None, :, :] * scores, axis=2)
    if return_scores:
        return fused, scores[..., 0]
    return fused


class TransformerDecoderLayer(nn.Module):
    """Param container for one decoder layer (reference: decoders.py:346-467)."""

    d_model: int
    num_heads: int
    ff_dim: int
    dropout: float
    multihead_pre_target: bool = False
    multihead_pre_memory: bool = False
    multihead_post_memory: bool = False

    def setup(self):
        E = self.d_model
        self.self_attn = MultiHeadAttention(E, self.num_heads, name="self_attn")
        self.cross_attn = MultiHeadAttention(E, self.num_heads, name="cross_attn")
        self.linear1 = LinearP(E, self.ff_dim, name="linear1")
        self.linear2 = LinearP(self.ff_dim, E, name="linear2")
        self.norm1 = LayerNormP(E, name="norm1")
        self.norm2 = LayerNormP(E, name="norm2")
        self.norm3 = LayerNormP(E, name="norm3")
        for flag, site in (
            (self.multihead_pre_target, "pre_target"),
            (self.multihead_pre_memory, "pre_memory"),
            (self.multihead_post_memory, "post_memory"),
        ):
            if flag:
                setattr(
                    self, f"mha_{site}",
                    MultiHeadAttention(E, self.num_heads, name=f"mha_{site}"),
                )
                setattr(
                    self, f"mlp_{site}",
                    MLPP(2 * E, E, 1, 3, name=f"mlp_{site}"),
                )

    def weights(self) -> DecLayerWeights:
        def site(name, flag):
            if not flag:
                return None
            return FusionSiteWeights(
                getattr(self, f"mha_{name}").weights(),
                getattr(self, f"mlp_{name}").weights(),
            )

        return DecLayerWeights(
            self_attn=self.self_attn.weights(),
            cross_attn=self.cross_attn.weights(),
            ff1=self.linear1.weights(),
            ff2=self.linear2.weights(),
            norm1=self.norm1.weights(),
            norm2=self.norm2.weights(),
            norm3=self.norm3.weights(),
            pre_target=site("pre_target", self.multihead_pre_target),
            pre_memory=site("pre_memory", self.multihead_pre_memory),
            post_memory=site("post_memory", self.multihead_post_memory),
        )


def dec_layer_full(
    tgt: jnp.ndarray,
    memory: jnp.ndarray,
    sem: Optional[jnp.ndarray],
    w: DecLayerWeights,
    num_heads: int,
    tgt_mask: jnp.ndarray,
    drop,
) -> jnp.ndarray:
    """Full-sequence decoder layer (training path; reference: decoders.py:433-467).

    ``drop`` is a callable (x, site) -> x implementing dropout (identity at
    eval).  Every fusion site reads the original object semantics (see the
    module docstring for why this deviates from reference decoders.py:437).
    """

    def fusion(tgt, sem, fw: FusionSiteWeights, site: str):
        rel = _relevance(tgt, sem, fw.mlp)
        # Deviation from the reference (whose unmasked site cannot run, see
        # module docstring): the fused attention is causal so that training
        # matches the KV-cached greedy decode exactly.
        a = multihead_attention(tgt, rel, rel, fw.mha, num_heads, mask=tgt_mask)
        tgt = tgt + drop(a, f"{site}_a")
        # the reference applies its site dropout twice (decoders.py:439-440)
        return drop(tgt, f"{site}_b")

    if w.pre_target is not None:
        tgt = fusion(tgt, sem, w.pre_target, "pre_target")

    a = multihead_attention(tgt, tgt, tgt, w.self_attn, num_heads, mask=tgt_mask)
    tgt = layer_norm_apply(tgt + drop(a, "self"), w.norm1)

    if w.pre_memory is not None:
        tgt = fusion(tgt, sem, w.pre_memory, "pre_memory")

    a = multihead_attention(tgt, memory, memory, w.cross_attn, num_heads)
    tgt = layer_norm_apply(tgt + drop(a, "cross"), w.norm2)

    if w.post_memory is not None:
        tgt = fusion(tgt, sem, w.post_memory, "post_memory")

    f = linear_apply(drop(jax.nn.relu(linear_apply(tgt, w.ff1)), "ff_mid"), w.ff2)
    tgt = layer_norm_apply(tgt + drop(f, "ff"), w.norm3)
    return tgt


class TransformerDecoder(nn.Module):
    """TF decoder with masked-pass training and scan+KV-cache greedy decode
    (reference: decoders.py:103-275)."""

    num_classes: int
    d_model: int = 256          # embed_dim (reference: decoders.py:111)
    memory_dim: int = 512       # encoder hidden (reference: decoders.py:117)
    num_heads: int = 8
    ff_dim: int = 2048
    num_layers: int = 6
    dropout: float = 0.1
    max_text_length: int = 25
    pre_decoder_mlp: bool = False
    cls_decoder_init: bool = False
    multihead_pre_target: bool = False
    multihead_pre_memory: bool = False
    multihead_post_memory: bool = False
    post_decoder_mlp: bool = False
    # compute dtype for the decode scan (params stay f32; bf16 roughly
    # halves per-step matmul time on the MXU). Training stays f32.
    dtype: str = "float32"
    # greedy decode exits once every sequence has emitted [s] (lax.while_loop
    # instead of a fixed 25-step lax.scan).  On a trained model words average
    # ~5-7 chars, so this cuts the autoregressive steps ~3x; [s]-pruned
    # decoded strings are identical to the full scan (positions after the
    # stop token are never read by the codec).  Off by default: the fixed
    # scan is the parity path and faster for random-init benchmarking.
    early_stop: bool = False
    # run the whole greedy loop inside one Pallas kernel (weights + KV caches
    # resident in VMEM, zero per-step dispatch overhead — see
    # ops/fused_decode.py).  Covers every config except the three per-layer
    # fusion sites (which fall back to the XLA scan); cls_decoder_init rides
    # the kernel as the step-0 input row.
    fused: bool = False
    # int8-quantize the fused kernel's projection matmuls (PTQ, in-graph —
    # ops/fused_decode.quantize_fused_weights).  Ignored unless ``fused``
    # is active for this config.
    int8: bool = False
    # run beam_decode as ONE fused Pallas kernel (ops/fused_beam.py).
    # Separate opt-in from ``fused``: the beam kernel's Mosaic compile is
    # ~15 min at the flagship scale (one-time per process/shape), which
    # callers must choose deliberately — see docs/RESULTS.md round 3.
    beam_fused: bool = False

    def setup(self):
        E = self.d_model
        self.hid_to_emb = LinearP(self.memory_dim, E, name="hid_to_emb")
        self.emb = nn.Embed(self.num_classes, E, name="emb")
        self.emb_to_classes = LinearP(E, self.num_classes, name="emb_to_classes")
        self.final_norm = LayerNormP(E, name="final_norm")
        self.decoder_layers = [
            TransformerDecoderLayer(
                E, self.num_heads, self.ff_dim, self.dropout,
                self.multihead_pre_target, self.multihead_pre_memory,
                self.multihead_post_memory, name=f"layer{i}",
            )
            for i in range(self.num_layers)
        ]
        if self.pre_decoder_mlp:
            self.relevant_mlp = MLPP(2 * E, E, 1, 3, name="relevant_mlp")
            self.combine_mlp = MLPP(2 * E, E, E, 2, name="combine_mlp")
        if self.cls_decoder_init:
            self.sem_cls_mlp = MLPP(2 * E, E, 1, 3, name="sem_cls_mlp")
        if self.post_decoder_mlp:
            C = self.num_classes
            self.post_mlp = MLPP(2 * C, C, 1, 3, name="post_mlp")
            self.post_combine_mlp = MLPP(2 * C, C, C, 3, name="post_combine_mlp")
            self.sem_to_classes = LinearP(E, C, name="sem_to_classes")

    # -- shared pre-processing -------------------------------------------

    def _memory(self, enc_out, semantics, drop):
        """hid_to_emb projection + optional pre-decoder fusion
        (reference: decoders.py:188-193)."""
        memory = self.hid_to_emb(enc_out)
        if self.pre_decoder_mlp:
            rel, scores = _relevance(
                memory, semantics, self.relevant_mlp.weights(),
                return_scores=True,
            )
            # introspection (reference PRINT_ATTENTION_SCORES,
            # decoders.py:160-174): collect with mutable=['intermediates']
            self.sow("intermediates", "pre_decoder_scores", scores)
            combined = jnp.concatenate([memory, rel], axis=-1)
            memory = memory + mlp_apply(combined, self.combine_mlp.weights())
        return memory

    def _sem_cls(self, memory, semantics):
        """Semantic CLS vector (reference: decoders.py:176-182): relevance-
        weighted semantics per memory position, softmaxed over positions,
        summed -> [B, E]."""
        rel = _relevance(memory, semantics, self.sem_cls_mlp.weights())
        weighted = jax.nn.softmax(rel, axis=1)
        return jnp.sum(weighted, axis=1)

    def _post_decoder(self, logits, semantics):
        """Logit-space semantic fusion (reference: decoders.py:267-273)."""
        sem_c = linear_apply(semantics, self.sem_to_classes.weights())
        rel = _relevance(logits, sem_c, self.post_mlp.weights())
        combined = jnp.concatenate([logits, rel], axis=-1)
        return logits + mlp_apply(combined, self.post_combine_mlp.weights())

    # -- training: one causal-masked pass --------------------------------

    def __call__(self, enc_out, text, semantics=None, train: bool = False):
        if not train:
            return self.greedy_decode(enc_out, semantics)

        rng = self.make_rng("dropout")

        def drop(x, site):
            import zlib

            key = jax.random.fold_in(rng, zlib.crc32(site.encode()))
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(key, keep, x.shape)
            return jnp.where(mask, x / keep, 0.0)

        memory = self._memory(enc_out, semantics, drop)
        T = text.shape[1]
        x = self.emb(text)
        if self.cls_decoder_init:
            cls = self._sem_cls(memory, semantics)
            x = x.at[:, 0, :].set(cls)
        pe = jnp.asarray(sinusoidal_table(self.max_text_length + 1, self.d_model))
        x = drop(x + pe[None, :T], "pe")

        mask = causal_mask(T)
        for i, layer in enumerate(self.decoder_layers):
            def ldrop(x, site, _i=i):
                return drop(x, f"l{_i}_{site}")

            x = dec_layer_full(x, memory, semantics, layer.weights(),
                               self.num_heads, mask, ldrop)
        x = self.final_norm(x)
        logits = self.emb_to_classes(x)
        if self.post_decoder_mlp:
            logits = self._post_decoder(logits, semantics)
        return logits

    # -- inference: fused scan greedy decode with KV caches ---------------

    def _make_stepper(self, memory, sem):
        """Shared single-position decode machinery over ``memory`` [B', Tm, E].

        Returns (step_all, make_caches): ``step_all(x[B',1,E], t, caches)``
        runs every layer + final norm + logit head for one position with
        KV caches; used by both greedy and beam decode.  Runs in
        ``self.dtype`` (norm statistics and logits stay float32).
        """
        dt = jnp.dtype(self.dtype)

        def cast(tree):
            return jax.tree.map(
                lambda x: x.astype(dt)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                tree,
            )

        memory = memory.astype(dt)
        if sem is not None:
            sem = sem.astype(dt)
        Bp = memory.shape[0]
        E = self.d_model
        T = self.max_text_length
        layer_ws: List[DecLayerWeights] = [
            cast(l.weights()) for l in self.decoder_layers
        ]

        # cross-attention K/V once per layer
        cross_kv = []
        for w in layer_ws:
            _, k, v = qkv_projections(memory, memory, w.cross_attn)
            cross_kv.append((k, v))

        final_norm_w = cast(self.final_norm.weights())
        emb_to_classes_w = cast(self.emb_to_classes.weights())

        def make_caches():
            caches = {
                "k": jnp.zeros((self.num_layers, Bp, T, E), dt),
                "v": jnp.zeros((self.num_layers, Bp, T, E), dt),
            }
            for site, enabled in (
                ("pre_target", self.multihead_pre_target),
                ("pre_memory", self.multihead_pre_memory),
                ("post_memory", self.multihead_post_memory),
            ):
                if enabled:
                    caches[f"{site}_k"] = jnp.zeros((self.num_layers, Bp, T, E), dt)
                    caches[f"{site}_v"] = jnp.zeros((self.num_layers, Bp, T, E), dt)
            return caches

        def cached_attend(x, kv_src, mha_w, cache_key, i, t, caches,
                          anc_oh=None):
            """Causal attention of x [B',1,E] over cached projections of
            kv_src, writing position t into the named cache.

            One dynamic_update_slice into the stacked [L,B',T,E] cache (no
            slice-out/set-back round trip) so XLA keeps the update in place
            across scan iterations.

            ``anc_oh`` [B, K, T, K] switches to beam-ancestry attention
            over unreordered caches (ops/attention.attend_ancestry) —
            B' = B*K rows and slot j of each row group holds what the
            beam occupying row j wrote.
            """
            q, k_t, v_t = qkv_projections(x, kv_src, mha_w)
            k_all = jax.lax.dynamic_update_slice(
                caches[f"{cache_key}k"], k_t[None], (i, 0, t, 0)
            )
            v_all = jax.lax.dynamic_update_slice(
                caches[f"{cache_key}v"], v_t[None], (i, 0, t, 0)
            )
            caches = dict(
                caches, **{f"{cache_key}k": k_all, f"{cache_key}v": v_all}
            )
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T), 3)
            mask = jnp.where(pos <= t, 0.0, -jnp.inf)
            if anc_oh is None:
                a = attend(q, k_all[i], v_all[i], self.num_heads, mask)
            else:
                a = attend_ancestry(q, k_all[i], v_all[i], self.num_heads,
                                    anc_oh, mask)
            return a @ mha_w.w_out + mha_w.b_out, caches

        def step_layer(i, x, t, caches, anc_oh=None):
            """One decoder layer for the single position t. x: [B', 1, E]."""
            w = layer_ws[i]

            def fusion_site(x, fw, site, caches):
                rel = _relevance(x, sem, fw.mlp)  # [B', 1, E]
                a, caches = cached_attend(
                    x, rel, fw.mha, f"{site}_", i, t, caches, anc_oh
                )
                return x + a, caches

            if w.pre_target is not None:
                x, caches = fusion_site(x, w.pre_target, "pre_target", caches)

            a, caches = cached_attend(x, x, w.self_attn, "", i, t, caches,
                                      anc_oh)
            x = layer_norm_apply(x + a, w.norm1)

            if w.pre_memory is not None:
                x, caches = fusion_site(x, w.pre_memory, "pre_memory", caches)

            k_mem, v_mem = cross_kv[i]
            q = x @ w.cross_attn.w_qkv[:, :E] + w.cross_attn.b_qkv[:E]
            a = attend(q, k_mem, v_mem, self.num_heads)
            a = a @ w.cross_attn.w_out + w.cross_attn.b_out
            x = layer_norm_apply(x + a, w.norm2)

            if w.post_memory is not None:
                x, caches = fusion_site(x, w.post_memory, "post_memory", caches)

            f = linear_apply(jax.nn.relu(linear_apply(x, w.ff1)), w.ff2)
            x = layer_norm_apply(x + f, w.norm3)
            return x, caches

        def step_all(x, t, caches, anc_oh=None):
            x = x.astype(dt)
            for i in range(self.num_layers):
                x, caches = step_layer(i, x, t, caches, anc_oh)
            x = layer_norm_apply(x, final_norm_w)
            logits_t = linear_apply(x, emb_to_classes_w)[:, 0]  # [B', C]
            return logits_t.astype(jnp.float32), caches

        return step_all, make_caches

    def greedy_decode(self, enc_out, semantics=None):
        """[B, T_mem, H] -> logits [B, max_text_length, C].

        One jitted ``lax.scan``: per-layer self-attention KV caches, cross-
        attention K/V precomputed once per layer, argmax feedback.  Replaces
        the reference's per-step full-prefix re-run (decoders.py:226-263).
        """
        no_drop = lambda x, site: x
        memory = self._memory(enc_out, semantics, no_drop)
        B = memory.shape[0]
        E = self.d_model
        T = self.max_text_length
        sem = semantics

        emb_table = self.emb.embedding
        pe = jnp.asarray(sinusoidal_table(T + 1, E))
        cls0 = self._sem_cls(memory, sem) if self.cls_decoder_init else None

        fused_ok = self.fused and not (
            self.multihead_pre_target or self.multihead_pre_memory
            or self.multihead_post_memory
        )
        if fused_ok:
            from ..core.charset import EOS_ID
            from ..ops.fused_decode import (
                fused_greedy_decode,
                quantize_fused_weights,
                stack_decoder_weights,
            )

            layer_ws = [l.weights() for l in self.decoder_layers]
            ck, cv = [], []
            for w in layer_ws:
                _, k, v = qkv_projections(memory, memory, w.cross_attn)
                ck.append(k)
                cv.append(v)
            fw = stack_decoder_weights(
                layer_ws, self.final_norm.weights(),
                self.emb_to_classes.weights(), emb_table, pe[:T],
            )
            fw = jax.tree.map(jax.lax.stop_gradient, fw)
            scales = None
            if self.int8:
                # in-graph PTQ: a pure function of the params, so serving
                # needs no separate quantized-weight cache (~0.2 ms of XLA
                # elementwise work per call on the ~34 MB of projections)
                fw, scales = quantize_fused_weights(fw)
            logits = fused_greedy_decode(
                fw, jnp.stack(ck), jnp.stack(cv), scales, cls0,
                num_heads=self.num_heads, steps=T,
                dtype=jnp.dtype(self.dtype), go_id=GO_ID,
                eos_id=EOS_ID if self.early_stop else None,
                interpret=jax.default_backend() != "tpu",
            )
            if self.post_decoder_mlp:
                logits = self._post_decoder(logits, sem)
            return logits

        step_all, make_caches = self._make_stepper(memory, sem)

        def step(prev_id, t, caches):
            x = jnp.take(emb_table, prev_id, axis=0)[:, None, :]  # [B, 1, E]
            if cls0 is not None:
                # position 0 uses the semantic CLS embedding (reference:241-243)
                x = jnp.where(t == 0, cls0[:, None, :], x)
            x = x + jax.lax.dynamic_slice_in_dim(pe, t, 1, axis=0)[None, 0:1]
            logits_t, caches = step_all(x, t, caches)
            next_id = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
            return next_id, logits_t, caches

        init_id = jnp.full((B,), GO_ID, jnp.int32)

        if self.early_stop:
            from ..core.charset import EOS_ID

            C = self.emb.num_embeddings

            def cond(carry):
                t, _, done, _, _ = carry
                return (t < T) & ~jnp.all(done)

            def wbody(carry):
                t, prev_id, done, buf, caches = carry
                next_id, logits_t, caches = step(prev_id, t, caches)
                buf = jax.lax.dynamic_update_slice(
                    buf, logits_t[None], (t, 0, 0))
                done = done | (next_id == EOS_ID)
                return (t + 1, next_id, done, buf, caches)

            # unwritten tail positions stay argmax=[s]; the codec prunes at
            # the first [s] so decoded strings match the full scan exactly
            buf0 = jnp.zeros((T, B, C), jnp.float32).at[:, :, EOS_ID].set(1.0)
            _, _, _, logits, _ = jax.lax.while_loop(
                cond,
                wbody,
                (jnp.int32(0), init_id, jnp.zeros((B,), bool), buf0,
                 make_caches()),
            )
        else:
            def body(carry, t):
                prev_id, caches = carry
                next_id, logits_t, caches = step(prev_id, t, caches)
                return (next_id, caches), logits_t

            (_, _), logits = jax.lax.scan(
                body, (init_id, make_caches()), jnp.arange(T, dtype=jnp.int32)
            )
        logits = jnp.swapaxes(logits, 0, 1)  # [B, T, C]
        if self.post_decoder_mlp:
            logits = self._post_decoder(logits, sem)
        return logits

    def beam_decode(self, enc_out, semantics=None, beam_size: int = 5,
                    length_penalty: float = 0.0,
                    reorder_caches: bool = False):
        """Batched beam search -> (tokens [B, T], log-prob scores [B]).

        Capability beyond the reference (greedy only); BASELINE.json lists
        batched beam (k=5) as a benchmark config.  Single ``lax.scan``:
        every beam hypothesis shares the KV-cache machinery via a flattened
        [B*K] batch.  Finished beams ([s] emitted) are frozen by forcing a
        zero-cost [s] continuation.  ``post_decoder_mlp`` logit fusion is a
        sequence-level transform incompatible with per-step beam scoring —
        raises rather than silently decoding without it.

        Beam bookkeeping: by default the KV caches are NEVER physically
        reordered — each step tracks an ancestry map (which cache slot
        holds each beam's position-t entry) and attention selects through
        it (ops/attention.attend_ancestry).  Physically gathering the
        [L, B*K, T, E] caches by beam origin each step was 84 of 105 ms
        of the fixed-length decode at B=192, K=5 (scripts/
        probe_beam_cost.py).  ``reorder_caches=True`` keeps the gather
        form as a parity/debug reference; both produce identical tokens.
        """
        from ..core.charset import EOS_ID

        if self.post_decoder_mlp:
            raise NotImplementedError(
                "beam_decode does not support post_decoder_mlp (its logit "
                "fusion is a whole-sequence transform applied after decoding"
                " — reference decoders.py:267-273); use greedy decode for "
                "this config"
            )

        no_drop = lambda x, site: x
        memory = self._memory(enc_out, semantics, no_drop)
        B = memory.shape[0]
        K = beam_size
        E = self.d_model
        T = self.max_text_length
        C = self.num_classes

        fused_ok = self.beam_fused and not reorder_caches and not (
            self.multihead_pre_target or self.multihead_pre_memory
            or self.multihead_post_memory
        )
        if fused_ok:
            # whole-beam Pallas kernel (ops/fused_beam.py): the full search
            # loop in one program, VMEM-resident caches, in-kernel top-k +
            # ancestry bookkeeping + per-chunk early stop
            from ..ops.fused_beam import fused_beam_decode, stack_decoder_weights

            layer_ws = [l.weights() for l in self.decoder_layers]
            ck, cv = [], []
            for w in layer_ws:
                _, k, v = qkv_projections(memory, memory, w.cross_attn)
                ck.append(k)
                cv.append(v)
            fw = stack_decoder_weights(
                layer_ws, self.final_norm.weights(),
                self.emb_to_classes.weights(), self.emb.embedding,
                jnp.asarray(sinusoidal_table(T + 1, E))[:T],
            )
            fw = jax.tree.map(jax.lax.stop_gradient, fw)
            cls0 = (self._sem_cls(memory, semantics)
                    if self.cls_decoder_init else None)
            tokens, scores = fused_beam_decode(
                fw, jnp.stack(ck), jnp.stack(cv), cls0,
                beam_size=K, num_heads=self.num_heads, steps=T,
                dtype=jnp.dtype(self.dtype), go_id=GO_ID, eos_id=EOS_ID,
                early_stop=self.early_stop,
                interpret=jax.default_backend() != "tpu",
            )
            return self._rank_beams(tokens, scores, length_penalty)

        def expand(x):
            return (
                None if x is None
                else jnp.repeat(x, K, axis=0)  # [B*K, ...]
            )

        mem_x = expand(memory)
        sem_x = expand(semantics)
        emb_table = self.emb.embedding
        pe = jnp.asarray(sinusoidal_table(T + 1, E))
        cls0 = (
            expand(self._sem_cls(memory, semantics))
            if self.cls_decoder_init else None
        )
        step_all, make_caches = self._make_stepper(mem_x, sem_x)

        neg_inf = jnp.float32(-1e9)

        def gather_beams(x, beam_idx):
            """Reindex a [.., B*K, ..] cache/state leaf along the beam dim."""
            if x.ndim >= 2 and x.shape[1] == B * K:  # cache leaves [L, B*K, ...]
                shaped = x.reshape(x.shape[0], B, K, *x.shape[2:])
                idx = beam_idx.reshape(1, B, K, *([1] * (x.ndim - 2)))
                out = jnp.take_along_axis(shaped, idx, axis=2)
                return out.reshape(x.shape)
            raise ValueError(f"unexpected leaf shape {x.shape}")

        def body(carry, t):
            prev_tok, scores, finished, seqs, anc, caches = carry
            # prev_tok [B, K] -> x [B*K, 1, E]
            x = jnp.take(emb_table, prev_tok.reshape(-1), axis=0)[:, None, :]
            if cls0 is not None:
                x = jnp.where(t == 0, cls0[:, None, :], x)
            x = x + jax.lax.dynamic_slice_in_dim(pe, t, 1, axis=0)[None, 0:1]
            if reorder_caches:
                logits_t, caches = step_all(x, t, caches)      # [B*K, C]
            else:
                # position t's k/v is computed by (and written to the slot
                # of) the beam currently occupying row k
                anc = anc.at[:, :, t].set(
                    jnp.arange(K, dtype=jnp.int32)[None, :])
                anc_oh = jax.nn.one_hot(anc, K)                # [B, K, T, K]
                logits_t, caches = step_all(x, t, caches, anc_oh)
            logp = jax.nn.log_softmax(logits_t).reshape(B, K, C)

            # frozen beams: only [s] continues, at zero cost
            frozen = jnp.full((C,), neg_inf).at[EOS_ID].set(0.0)
            logp = jnp.where(finished[:, :, None], frozen[None, None, :], logp)

            combined = scores[:, :, None] + logp               # [B, K, C]
            flat = combined.reshape(B, K * C)
            new_scores, flat_idx = jax.lax.top_k(flat, K)      # [B, K]
            beam_idx = flat_idx // C
            token = (flat_idx % C).astype(jnp.int32)

            if reorder_caches:
                caches = {k: gather_beams(v, beam_idx)
                          for k, v in caches.items()}
            gather2 = lambda a: jnp.take_along_axis(a, beam_idx, axis=1)
            if not reorder_caches:
                # descendants inherit the parent's ancestry row; the caches
                # themselves never move
                anc = jnp.take_along_axis(anc, beam_idx[:, :, None], axis=1)
            finished = gather2(finished) | (token == EOS_ID)
            seqs = jnp.take_along_axis(
                seqs, beam_idx[:, :, None], axis=1
            )
            seqs = seqs.at[:, :, t].set(token)
            return (token, new_scores, finished, seqs, anc, caches), None

        init = (
            jnp.full((B, K), GO_ID, jnp.int32),
            # only beam 0 live at t=0 so identical-prefix beams don't tie
            jnp.tile(jnp.asarray([0.0] + [float(-1e9)] * (K - 1)), (B, 1)),
            jnp.zeros((B, K), bool),
            jnp.zeros((B, K, T), jnp.int32),
            jnp.zeros((B, K, T), jnp.int32),   # ancestry: cache slot per pos
            make_caches(),
        )
        if self.early_stop:
            # exit once every beam of every row has emitted [s]; frozen
            # beams continue with a zero-cost [s], so scores/sequences are
            # identical to the full scan (~3x fewer steps on trained models)
            def wcond(carry):
                t, _tok, _scores, finished = carry[:4]
                return (t < T) & ~jnp.all(finished)

            def wbody(carry):
                t, *rest = carry
                new, _ = body(tuple(rest), t)
                return (t + 1, *new)

            _, tok, scores, finished, seqs, _, _ = jax.lax.while_loop(
                wcond, wbody, (jnp.int32(0), *init)
            )
        else:
            (tok, scores, finished, seqs, _, _), _ = jax.lax.scan(
                body, init, jnp.arange(T, dtype=jnp.int32)
            )

        return self._rank_beams(seqs, scores, length_penalty)

    @staticmethod
    def _rank_beams(seqs, scores, length_penalty: float):
        """Pick the best of K finished beams per row: seqs [B, K, T] +
        raw cumulative log-probs [B, K] -> (tokens [B, T], scores [B])."""
        from ..core.charset import EOS_ID

        if length_penalty > 0.0:
            # GNMT-style normalisation by effective length
            lengths = jnp.sum(
                jnp.cumprod(seqs != EOS_ID, axis=-1), axis=-1
            ) + 1.0
            norm = ((5.0 + lengths) / 6.0) ** length_penalty
            ranked = scores / norm
        else:
            ranked = scores
        best = jnp.argmax(ranked, axis=1)
        best_seqs = jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0]
        best_scores = jnp.take_along_axis(ranked, best[:, None], axis=1)[:, 0]
        return best_seqs, best_scores


class LSTMAttentionDecoder(nn.Module):
    """Additive-attention LSTM decoder (reference: decoders.py:10-101).

    num_steps = max_text_length + 1 in both modes (reference:34); training is
    teacher-forced over ``text``, inference feeds back the argmax.
    """

    num_classes: int
    input_dim: int = 256   # encoder output dim (reference: model.py:76)
    hidden_dim: int = 256
    max_text_length: int = 25

    def setup(self):
        I, H = self.input_dim, self.hidden_dim
        self.i2h = LinearP(I, H, use_bias=False, name="i2h")
        self.h2h = LinearP(H, H, name="h2h")
        self.score = LinearP(H, 1, use_bias=False, name="score")
        # LSTMCell over [context ; onehot(prev char)] (reference:74)
        cell_in = I + self.num_classes
        init = torch_linear_init(H)
        self.w_ih = self.param("w_ih", init, (cell_in, 4 * H))
        self.w_hh = self.param("w_hh", init, (H, 4 * H))
        self.b_ih = self.param("b_ih", init, (4 * H,))
        self.b_hh = self.param("b_hh", init, (4 * H,))
        self.generator = LinearP(H, self.num_classes, name="generator")

    def __call__(self, enc_out, text, semantics=None, train: bool = False):
        B, T_mem, I = enc_out.shape
        H = self.hidden_dim
        C = self.num_classes

        proj_mem = self.i2h(enc_out)  # [B, T_mem, H] — hoisted out of the loop
        h2h_w = self.h2h.weights()
        score_w = self.score.weights()
        gen_w = self.generator.weights()
        w_ih, w_hh, b_ih, b_hh = self.w_ih, self.w_hh, self.b_ih, self.b_hh

        def attention_step(h, c, onehot):
            e = linear_apply(
                jnp.tanh(proj_mem + linear_apply(h, h2h_w)[:, None, :]), score_w
            )  # [B, T_mem, 1]
            alpha = jax.nn.softmax(e, axis=1)
            context = jnp.sum(alpha * enc_out, axis=1)  # [B, I]
            x = jnp.concatenate([context, onehot], axis=-1)
            x_proj = x @ w_ih + b_ih
            return lstm_cell(x_proj, h, c, w_hh, b_hh)

        init = (jnp.zeros((B, H)), jnp.zeros((B, H)))

        if train:
            onehots = jax.nn.one_hot(text, C)  # [B, T, C]

            def body(carry, onehot_t):
                h, c = carry
                h, c = attention_step(h, c, onehot_t)
                return (h, c), h

            _, hiddens = jax.lax.scan(body, init, jnp.swapaxes(onehots, 0, 1))
            hiddens = jnp.swapaxes(hiddens, 0, 1)  # [B, T, H]
            return linear_apply(hiddens, gen_w)

        # num_steps in eval = max_len + 1 for [s] (reference: decoders.py:34)
        steps = self.max_text_length + 1

        def body(carry, _):
            h, c, prev_id = carry
            onehot = jax.nn.one_hot(prev_id, C)
            h, c = attention_step(h, c, onehot)
            logits_t = linear_apply(h, gen_w)
            next_id = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
            return (h, c, next_id), logits_t

        init_id = jnp.full((B,), GO_ID, jnp.int32)
        _, logits = jax.lax.scan(body, (*init, init_id), None, length=steps)
        return jnp.swapaxes(logits, 0, 1)  # [B, steps, C]


class LinearDecoder(nn.Module):
    """Per-column linear head (reference: decoders.py:278-296)."""

    num_classes: int
    in_dim: int = 512

    @nn.compact
    def __call__(self, enc_out, text=None, semantics=None, train: bool = False):
        # reference init: weight ~ U(-0.1, 0.1), bias 0 (decoders.py:289-292)
        def init_w(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -0.1, 0.1)

        return nn.Dense(
            self.num_classes,
            kernel_init=init_w,
            bias_init=nn.initializers.zeros,
            name="head",
        )(enc_out)
