"""Multi-head attention as fused XLA einsums.

TPU-native replacement for `nn.MultiheadAttention` (reference:
modules/encoders.py:170, modules/decoders.py:352-353).  Sequence lengths in
this workload are tiny (<= 52 memory tokens, <= 26 targets), so a flash /
blockwise kernel buys nothing — a plain softmax(QK^T)V with everything
resident in VMEM after XLA fusion is already at the HBM roofline.  The win
over the reference comes from batched einsums + the KV-cached decode path
(:func:`mha_with_kv_cache`), which the reference lacks (it re-runs the whole
prefix per step, decoders.py:226-263).

Parameter layout matches torch (packed in_proj [E, 3E] transposed at import)
so `.pth` checkpoints convert directly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class MHAWeights(NamedTuple):
    """Packed projections, stored input-major: w_qkv [E, 3E], w_out [E, E]."""

    w_qkv: jnp.ndarray
    b_qkv: jnp.ndarray
    w_out: jnp.ndarray
    b_out: jnp.ndarray


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    B, T, E = x.shape
    return x.reshape(B, T, num_heads, E // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, H, T, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * D)


def qkv_projections(
    q_in: jnp.ndarray, kv_in: jnp.ndarray, w: MHAWeights,
    int8: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project query and key/value inputs with the packed weights.

    ``int8`` routes the projections through the PTQ int8 matmul
    (ops/int8.py — inference-only)."""
    E = q_in.shape[-1]
    if int8:
        from .int8 import int8_linear

        dt = q_in.dtype
        q = int8_linear(q_in, w.w_qkv[:, :E], w.b_qkv[:E]).astype(dt)
        k = int8_linear(kv_in, w.w_qkv[:, E : 2 * E],
                        w.b_qkv[E : 2 * E]).astype(dt)
        v = int8_linear(kv_in, w.w_qkv[:, 2 * E :],
                        w.b_qkv[2 * E :]).astype(dt)
        return q, k, v
    q = q_in @ w.w_qkv[:, :E] + w.b_qkv[:E]
    k = kv_in @ w.w_qkv[:, E : 2 * E] + w.b_qkv[E : 2 * E]
    v = kv_in @ w.w_qkv[:, 2 * E :] + w.b_qkv[2 * E :]
    return q, k, v


def attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Core softmax attention over already-projected q/k/v [B, T, E].

    ``mask`` is an additive float mask broadcastable to [B, H, Tq, Tk]
    (0 = attend, -inf = blocked), matching torch attn_mask semantics.
    """
    E = q.shape[-1]
    head_dim = E // num_heads
    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)

    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(head_dim))
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return _merge_heads(out)


def attend_ancestry_flat(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    anc_onehot: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Flat-mask variant of :func:`attend_ancestry` (same signature and
    result) — a measured NEGATIVE result, kept as the cross-check for the
    parity test and the A/B probe.

    Formulation: plain MHA einsums over the flattened (slot j, position t)
    axis of length K*T, with non-ancestor pairs masked to -inf before the
    softmax (exp(-inf) = 0 exactly, so this equals select-then-softmax
    mathematically).  The hypothesis was that standard attention shapes
    would lower better than 5-axis select contractions; on the chip the
    opposite holds — K× longer softmax rows and K× the value-sum FLOPs
    cost more than the select form's extra contractions (trained model,
    B=192, K=5, scripts/probe_anc_forms.py: 101.2 vs 77.7 ms/batch fixed
    length, 55.7 vs 44.9 early-stop — select wins by ~1.25x).
    """
    BK, T, E = k.shape
    B, K = anc_onehot.shape[0], anc_onehot.shape[1]
    H = num_heads
    D = E // H
    qh = q.reshape(B, K, H, D)
    kh = k.reshape(B, K * T, H, D)   # m = j*T + t
    vh = v.reshape(B, K * T, H, D)
    s = jnp.einsum("bkhd,bmhd->bkhm", qh, kh,
                   preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(jnp.float32(D))
    # allowed iff this beam's ancestry maps position t to slot j, AND the
    # causal mask admits position t ([b,k,t,j] -> [b,k,1,j*T+t])
    allow = jnp.swapaxes(anc_onehot, 2, 3).reshape(B, K, 1, K * T)
    causal = jnp.tile(jnp.broadcast_to(mask, mask.shape[:-1] + (T,)),
                      (1,) * (mask.ndim - 1) + (K,))
    s = jnp.where(allow > 0, s, -jnp.inf) + causal
    probs = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bkhm,bmhd->bkhd", probs, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(BK, 1, E)


def attend_ancestry(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    anc_onehot: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Beam-search attention over UNREORDERED per-beam KV caches.

    Physically reordering the [L, B*K, T, E] caches by beam origin every
    step is the dominant cost of a batched beam decode on TPU (measured
    84 of 105 ms at B=192, K=5: scripts/probe_beam_cost.py).  Instead the
    caches stay in write order — slot j permanently holds what the beam
    occupying row j wrote at each step — and each query scores ALL K
    slots, contracts the slot axis with its ancestry one-hot *before*
    the softmax, then routes each position's probability back to its
    ancestor slot for the value sum.  The extra score/value work is K× a
    part of attention that is ~0.3% of the step's FLOPs; the reorder's
    ~300 MB/step of HBM traffic disappears.  (The alternative "flat"
    formulation — standard MHA over the flattened K*T axis with an
    additive ancestry mask — measured ~1.25x SLOWER; see
    :func:`attend_ancestry_flat`.)

    Args:
      q: [B*K, 1, E] current-step queries, in current beam order.
      k, v: [B*K, T, E] caches in write order (never reordered).
      anc_onehot: [B, K, T, K_src] float; [b, k, t, j] = 1 iff current
        beam k's position-t entry lives in cache slot j.
      mask: additive mask broadcastable to [B, K, H, T] over the last
        (position) axis — 0 = attend, -inf = blocked.

    Returns [B*K, 1, E], bit-comparable to ``attend`` over physically
    reordered caches (selection sums exactly one product per position).
    """
    BK, T, E = k.shape
    B, K = anc_onehot.shape[0], anc_onehot.shape[1]
    H = num_heads
    D = E // H
    qh = q.reshape(B, K, H, D)
    kh = k.reshape(B, K, T, H, D)
    vh = v.reshape(B, K, T, H, D)
    s_all = jnp.einsum("bkhd,bjthd->bkhjt", qh, kh,
                       preferred_element_type=jnp.float32)
    s_all = s_all / jnp.sqrt(jnp.float32(D))
    sel = anc_onehot.astype(jnp.float32)
    s = jnp.einsum("bkhjt,bktj->bkht", s_all, sel)
    s = s + mask
    probs = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bkht,bktj,bjthd->bkhd", probs,
                     sel.astype(vh.dtype), vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(BK, 1, E)


def multihead_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    w: MHAWeights,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    int8: bool = False,
) -> jnp.ndarray:
    """Full MHA matching torch `nn.MultiheadAttention` (batch-first I/O).

    ``key is value`` is assumed (true for every site in the reference).
    ``int8`` runs the four projection matmuls through the PTQ int8 path
    (attention core stays bf16/f32).
    """
    del value  # packed projection computes k and v from the same tensor
    q, k, v = qkv_projections(query, key, w, int8=int8)
    out = attend(q, k, v, num_heads, mask)
    if int8:
        from .int8 import int8_linear

        return int8_linear(out, w.w_out, w.b_out).astype(query.dtype)
    return out @ w.w_out + w.b_out


def causal_mask(T: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask [T, T] (reference: decoders.py:138-141)."""
    return jnp.where(
        jnp.tril(jnp.ones((T, T), bool)), jnp.zeros((), dtype), jnp.full((), -jnp.inf, dtype)
    )


def mha_with_kv_cache(
    query_t: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    step: jnp.ndarray,
    w: MHAWeights,
    num_heads: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-step self-attention with a KV cache.

    Args:
      query_t: [B, 1, E] current-step input.
      k_cache/v_cache: [B, T_max, E] caches (valid through ``step``).
      step: scalar int — index of the current step.

    Returns (output [B, 1, E], updated k_cache, updated v_cache).

    This is the decode loop the reference lacks: its eval path re-embeds and
    re-runs all layers over the whole prefix each step (decoders.py:234-263,
    O(T^2 * layers)); with the cache each step is O(T).
    """
    B, _, E = query_t.shape
    q, k_t, v_t = qkv_projections(query_t, query_t, w)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_t, (0, step, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_t, (0, step, 0))

    T_max = k_cache.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T_max), 3)
    mask = jnp.where(pos <= step, 0.0, -jnp.inf)
    out = attend(q, k_cache, v_cache, num_heads, mask)
    return out @ w.w_out + w.b_out, k_cache, v_cache
