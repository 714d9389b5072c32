"""Whole-beam-search fused Pallas kernel: the entire k-beam loop in ONE kernel.

The XLA ancestry beam (models/decoders.py beam_decode) already removed the
per-step KV-cache reorder (RESULTS round 3), but at B=192, K=5 its decode
loop still costs ~32 ms of the 44.9 ms batch: 25 sequential steps x ~90
dispatched ops, plus ancestry einsums XLA lowers conservatively.  This
kernel runs the full beam search inside one Pallas program, extending
ops/fused_decode.py (the greedy whole-decode kernel) with beam bookkeeping:

  * the grid splits the batch into chunks of ``block_b`` rows (default 64
    -> 320 beam rows/chunk); per chunk the 6 layers' weights, cross K/V and
    the per-beam KV caches all stay resident in VMEM for the whole search;
  * caches are NEVER physically reordered (same ancestry design as the XLA
    path): slot j of each batch row's K-group permanently holds what the
    beam occupying row j wrote; ancestry lives as a 0/1 mask A [K, K*T, Bc]
    and attention selects through it with multiplies + fold-sums (the
    select form — measured faster than flat masked MHA,
    scripts/probe_anc_forms.py);
  * top-k over the K*C continuations is k iterations of max-extraction
    with first-index tie-breaking — bit-matching jax.lax.top_k's ordering;
  * beam reorders of sequences / scores / finished flags / ancestry are
    one-hot folds over the tiny K axis (K=5), never gathers;
  * early stop exits the while_loop once every beam of the CHUNK has
    emitted [s] — finer-grained than the XLA path's whole-batch stop.

Row layout inside a chunk is k-major ([K*Bc, E] rows, r = k*Bc + b) so
per-slot slices are contiguous; time is the leading (non-tiled) axis of
every cached tensor, as in fused_decode.py.  Numerics follow the XLA beam:
matmuls in ``dtype`` with f32 accumulation, log-softmax/scores in f32.

Measured (trained checkpoint, B=192, K=5, slope-timed over varied real
batches): 23.84 ms/batch = 8,052 crops/s with early stop vs the XLA
ancestry beam's 44.9 ms / 4,281 — with 1.0000 token agreement.  The
Mosaic compile is ~13 min at this scale (once per process/shape), which
is why ``model.decode_beam_fused`` is a separate opt-in from
``decode_fused``.

Capability beyond the reference (greedy-only eval,
/root/reference/modules/decoders.py:226-263); BASELINE.json lists batched
beam (k=5) as a benchmark config.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_decode import (
    FusedDecodeWeights,
    head_select_matrix,
    stack_decoder_weights,  # re-export for callers  # noqa: F401
)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _beam_kernel(
    # weight refs, in FusedDecodeWeights field order
    w_qkv, b_qkv, w_out, b_out, cw_q, cb_q, cw_o, cb_o,
    ff1_w, ff1_b, ff2_w, ff2_b,
    n1_s, n1_b, n2_s, n2_b, n3_s, n3_b, fn_s, fn_b,
    head_w, head_b, emb, pe,
    cls0,                  # [Bc, E] semantic CLS step-0 input (dummy unless use_cls)
    ck, cv,                # cross K/V [L, Tm, Bc, E]
    sel, sel_t,            # head-select S [E, H] / S^T [H, E]
    seqs_out,              # out: [1, K, T, Bc] f32 tokens (chunk-leading)
    scores_out,            # out: [1, K, Bc] f32 cumulative log-probs
    kc, vc,                # scratch: [L, K*T, Bc, E] self-attn caches
    anc,                   # scratch: [K, K*T, Bc] f32 ancestry 0/1 mask
    seqs,                  # scratch: [K, T, Bc] f32
    scores,                # scratch: [K, Bc, 1] f32 (b in sublanes)
    *, L: int, K: int, num_heads: int, go_id: int, eos_id: int,
    eps: float, early_stop: bool,
):
    E = w_qkv.shape[1]
    KT = kc.shape[1]
    T = KT // K
    Bc = kc.shape[2]
    C = head_w.shape[1]
    Tm = ck.shape[1]
    dt = kc.dtype
    inv_sqrt_hd = 1.0 / math.sqrt(E // num_heads)
    NEG = jnp.float32(-1e9)

    # masked cache positions must be exactly zero (the ancestry mask gives
    # them exactly zero weight, and 0 * 0 = 0; garbage could be NaN)
    kc[...] = jnp.zeros(kc.shape, dt)
    vc[...] = jnp.zeros(vc.shape, dt)
    anc[...] = jnp.zeros(anc.shape, jnp.float32)
    seqs[...] = jnp.zeros(seqs.shape, jnp.float32)
    # only beam 0 live at t=0 so identical-prefix beams don't tie
    kcol = jax.lax.broadcasted_iota(jnp.int32, (K, Bc, 1), 0)
    scores[...] = jnp.where(kcol == 0, 0.0, NEG)

    S = sel[...].astype(dt)           # [E, H]
    St = sel_t[...].astype(dt)        # [H, E]

    def lin(x32, w_ref, b_ref, l):
        return _dot(x32.astype(dt), w_ref[l]) + b_ref[l]

    def ln(x32, s_ref, b_ref, l=None):
        s = (s_ref[l] if l is not None else s_ref[...]).astype(jnp.float32)
        b = (b_ref[l] if l is not None else b_ref[...]).astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
        return (x32 - mean) * jax.lax.rsqrt(var + eps) * s + b

    def heads_of(p3):
        """[T', Bc, E] q*k products -> per-head scores [T', Bc, H]."""
        Tp = p3.shape[0]
        return _dot(p3.reshape(Tp * Bc, E), S).reshape(Tp, Bc, num_heads)

    def probs_to_e(p3):
        """[T', Bc, H] probabilities -> per-feature weights [T', Bc, E]."""
        Tp = p3.shape[0]
        return _dot(p3.astype(dt).reshape(Tp * Bc, num_heads),
                    St).reshape(Tp, Bc, E)

    def self_attend(q_k, l, k, t):
        """Ancestry attention of beam k's query [Bc, E] over the layer-l
        caches (all K slots, write order).  anc[k] selects, per position,
        the one slot holding this beam's history."""
        kall = kc[l]                                   # [K*T, Bc, E]
        P = q_k[None, :, :].astype(dt) * kall
        s_all = heads_of(P) * inv_sqrt_hd              # [K*T, Bc, H] f32
        a_k = anc[k][:, :, None]                       # [K*T, Bc, 1]
        s = jnp.sum((s_all * a_k).reshape(K, T, Bc, num_heads), axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0)
        s = jnp.where(pos <= t, s, -jnp.inf)           # causal over positions
        m = jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s - m)
        probs = e / jnp.sum(e, axis=0, keepdims=True)  # [T, Bc, H] f32
        probsE = probs_to_e(probs)                     # [T, Bc, E]
        v_sel = jnp.sum((vc[l].astype(jnp.float32)
                         * a_k).reshape(K, T, Bc, E), axis=0)
        return jnp.sum(probsE.astype(jnp.float32) * v_sel, axis=0)  # [Bc, E]

    def cross_attend(q_k, l):
        """Beam k's cross-attention over the shared memory K/V [Tm, Bc, E]
        (memory is beam-independent — no ancestry needed)."""
        P = q_k[None, :, :].astype(dt) * ck[l]
        s = heads_of(P) * inv_sqrt_hd                  # [Tm, Bc, H]
        m = jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s - m)
        probs = e / jnp.sum(e, axis=0, keepdims=True)
        probsE = probs_to_e(probs)
        return jnp.sum(probsE.astype(dt) * cv[l], axis=0,
                       dtype=jnp.float32)              # [Bc, E]

    def step(t, carry):
        onehot, fin = carry  # [K*Bc, C] f32, [K, Bc] f32
        # ancestry: position t's k/v is written by the beam occupying slot
        # k right now -> A[k][k*T + t] = 1
        for k in range(K):
            anc[k, pl.ds(k * T + t, 1)] = jnp.ones((1, Bc), jnp.float32)

        x = _dot(onehot.astype(dt), emb[...])          # [K*Bc, E] f32
        if cls0 is not None:
            c0 = jnp.concatenate([cls0[...].astype(jnp.float32)] * K, axis=0)
            x = jnp.where(t == 0, c0, x)
        x = x + pe[pl.ds(t, 1), 0, :]

        for l in range(L):
            qkv = lin(x, w_qkv, b_qkv, l)              # [K*Bc, 3E] f32
            ctx_rows = []
            for k in range(K):
                q_k = jax.lax.slice(qkv, (k * Bc, 0), ((k + 1) * Bc, E))
                k_k = jax.lax.slice(qkv, (k * Bc, E), ((k + 1) * Bc, 2 * E))
                v_k = jax.lax.slice(qkv, (k * Bc, 2 * E),
                                    ((k + 1) * Bc, 3 * E))
                kc[l, pl.ds(k * T + t, 1)] = k_k[None].astype(dt)
                vc[l, pl.ds(k * T + t, 1)] = v_k[None].astype(dt)
                ctx_rows.append(self_attend(q_k.astype(dt), l, k, t))
            ctx = jnp.concatenate(ctx_rows, axis=0)    # [K*Bc, E]
            a = lin(ctx, w_out, b_out, l)
            x = ln(x + a, n1_s, n1_b, l)

            q2 = lin(x, cw_q, cb_q, l)
            ctx2 = jnp.concatenate(
                [cross_attend(
                    jax.lax.slice(q2, (k * Bc, 0), ((k + 1) * Bc, E)
                                  ).astype(dt), l)
                 for k in range(K)], axis=0)
            a2 = lin(ctx2, cw_o, cb_o, l)
            x = ln(x + a2, n2_s, n2_b, l)

            h = jnp.maximum(lin(x, ff1_w, ff1_b, l), 0.0)
            f = lin(h, ff2_w, ff2_b, l)
            x = ln(x + f, n3_s, n3_b, l)

        x = ln(x, fn_s, fn_b)
        logits = _dot(x.astype(dt), head_w[...]) + head_b[...].astype(
            jnp.float32)                               # [K*Bc, C]
        # log-softmax per row, f32
        mx = jnp.max(logits, axis=-1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(logits - mx), axis=-1, keepdims=True))
        logp = (logits - mx - lse).reshape(K, Bc, C)

        # Layout discipline: Mosaic cannot shape-cast lanes into sublanes
        # ([K, Bc] -> [K*Bc, 1] is unlowerable), so per-(slot, batch-row)
        # state lives in TWO forms — b-in-sublanes [Bc, 1] where it meets
        # the [K, Bc, C] score arrays, b-in-lanes [1, Bc] where it meets
        # the [*, Bc]-shaped caches/sequences — bridged by tiny 2D
        # transposes (which ARE lowerable).
        fin_s = jnp.stack([
            jnp.transpose(jax.lax.slice_in_dim(fin, k, k + 1, axis=0))
            for k in range(K)])                        # [K, Bc, 1]
        cidx3 = jax.lax.broadcasted_iota(jnp.int32, (K, Bc, C), 2)
        # frozen beams: only [s] continues, at zero cost
        frozen = jnp.where(cidx3 == eos_id, 0.0, NEG)
        logp = jnp.where(fin_s > 0, frozen, logp)

        comb3 = logp + scores[...]                     # [K, Bc, C]

        # top-K over the (slot, class) axis pair: K extractions of
        # (max, first flat index), masking each taken entry — ordering and
        # tie-breaks match jax.lax.top_k over reshape(B, K*C).  Flat
        # indices ride f32 (exact: K*C << 2^24) so every intermediate
        # stays in well-supported float layouts.
        kidx = jax.lax.broadcasted_iota(jnp.int32, (K, Bc, C), 0)
        flat = (kidx * C + cidx3).astype(jnp.float32)
        BIG = jnp.float32(K * C)
        vals_s, tok_s, par_l, tok_l = [], [], [], []
        for _ in range(K):
            m = jnp.max(jnp.max(comb3, axis=0), axis=1,
                        keepdims=True)                 # [Bc, 1]
            cand = jnp.where(comb3 == m[None], flat, BIG)
            idx = jnp.min(jnp.min(cand, axis=0), axis=1,
                          keepdims=True)               # [Bc, 1] (as f32)
            comb3 = jnp.where(flat == idx[None], NEG, comb3)
            par = jnp.floor(idx * (1.0 / C))
            par = jnp.where(idx - par * C >= C, par + 1.0, par)  # guard fp
            tok = idx - par * C
            vals_s.append(m)
            tok_s.append(tok)
            par_l.append(jnp.transpose(par))           # [1, Bc] lanes
            tok_l.append(jnp.transpose(tok))           # [1, Bc]

        # one-hot parent folds: reorder ancestry / sequences / finished,
        # then record position t's token; the caches themselves never move
        anc_old = [anc[j] for j in range(K)]
        seq_old = [seqs[j] for j in range(K)]
        fin_old = [jax.lax.slice_in_dim(fin, j, j + 1, axis=0)
                   for j in range(K)]                  # K x [1, Bc]
        fin_new_rows = []
        for k in range(K):
            p = [(par_l[k] == j).astype(jnp.float32) for j in range(K)]
            a_new = anc_old[0] * p[0]
            s_new = seq_old[0] * p[0]
            f_new = fin_old[0] * p[0]
            for j in range(1, K):
                a_new += anc_old[j] * p[j]
                s_new += seq_old[j] * p[j]
                f_new += fin_old[j] * p[j]
            anc[k] = a_new
            seqs[k] = s_new
            seqs[k, pl.ds(t, 1)] = tok_l[k]
            scores[k] = vals_s[k]
            fin_new_rows.append(
                jnp.maximum(f_new,
                            (tok_l[k] == eos_id).astype(jnp.float32)))
        fin_new = jnp.concatenate(fin_new_rows, axis=0)  # [K, Bc]

        cidx2 = jax.lax.broadcasted_iota(jnp.int32, (Bc, C), 1
                                         ).astype(jnp.float32)
        onehot_new = jnp.concatenate(
            [(cidx2 == tok_s[k]).astype(jnp.float32) for k in range(K)],
            axis=0)                                    # [K*Bc, C]
        return onehot_new, fin_new

    col0 = jax.lax.broadcasted_iota(jnp.int32, (K * Bc, C), 1)
    onehot0 = (col0 == go_id).astype(jnp.float32)
    fin0 = jnp.zeros((K, Bc), jnp.float32)

    if not early_stop:
        jax.lax.fori_loop(0, T, step, (onehot0, fin0))
    else:
        def cond(carry):
            t, _, fin = carry
            return jnp.logical_and(t < T, jnp.sum(fin) < K * Bc)

        def wbody(carry):
            t, onehot, fin = carry
            onehot, fin = step(t, (onehot, fin))
            return (t + 1, onehot, fin)

        jax.lax.while_loop(cond, wbody, (jnp.int32(0), onehot0, fin0))

    seqs_out[0] = seqs[...]
    scores_out[0] = scores[...]


@functools.partial(
    jax.jit,
    static_argnames=("beam_size", "num_heads", "steps", "dtype", "go_id",
                     "eos_id", "eps", "early_stop", "block_b", "interpret"),
)
def fused_beam_decode(
    weights: FusedDecodeWeights,
    cross_k: jnp.ndarray,
    cross_v: jnp.ndarray,
    cls0: Optional[jnp.ndarray] = None,
    *,
    beam_size: int,
    num_heads: int,
    steps: int,
    dtype=jnp.bfloat16,
    go_id: int = 0,
    eos_id: int = 1,
    eps: float = 1e-5,
    early_stop: bool = False,
    block_b: int = 64,
    interpret: bool = False,
):
    """Run the fused beam search.  Returns (tokens [B, K, T] int32,
    scores [B, K] f32), beams sorted best-first per row — the caller picks
    beam 0 (or re-ranks under a length penalty; scores are raw cumulative
    log-probs, as in the XLA path before normalisation).

    cross_k/cross_v: [L, B, Tm, E] UNEXPANDED memory projections (one per
    batch row — the kernel broadcasts across beams internally, 5x less
    VMEM than the XLA path's repeated rows).  The batch axis is processed
    in grid chunks of ``block_b`` rows (960 beam rows of KV cache do not
    fit VMEM at once); rows are zero-padded up to a multiple internally.
    Each chunk early-stops independently when ``early_stop``.
    """
    dt = jnp.dtype(dtype)
    L, B, Tm, E = cross_k.shape
    C = weights.head_w.shape[1]
    T = steps
    K = beam_size

    Bc = min(block_b, B)
    pad = (-B) % Bc
    if pad:
        zk = jnp.zeros((L, pad, Tm, E), cross_k.dtype)
        cross_k = jnp.concatenate([cross_k, zk], axis=1)
        cross_v = jnp.concatenate([cross_v, zk], axis=1)
        if cls0 is not None:
            cls0 = jnp.concatenate(
                [cls0, jnp.zeros((pad, E), cls0.dtype)], axis=0)
    Bp = B + pad
    grid = Bp // Bc

    def cast(x):
        return x.astype(dt) if x.dtype in (jnp.float32, jnp.bfloat16) else x

    w = FusedDecodeWeights(*[cast(x) for x in weights])
    w = w._replace(pe=weights.pe.astype(jnp.float32)[:, None, :])
    use_cls = cls0 is not None
    if cls0 is None:
        cls0 = jnp.zeros((Bp, E), jnp.float32)

    sel = jnp.asarray(head_select_matrix(E, num_heads))

    kernel = functools.partial(
        _beam_kernel, L=L, K=K, num_heads=num_heads, go_id=go_id,
        eos_id=eos_id, eps=eps, early_stop=early_stop,
    )
    if not use_cls:
        # drop the dead cls0 branch from the traced kernel
        kernel = functools.partial(_drop_cls, kernel)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole array, every step

    def whole(x):
        return pl.BlockSpec(x.shape, lambda i: (0,) * x.ndim)

    w_specs = [whole(x) for x in w]
    in_specs = w_specs + [
        pl.BlockSpec((Bc, E), lambda i: (i, 0)),              # cls0
        pl.BlockSpec((L, Tm, Bc, E), lambda i: (0, 0, i, 0)),  # ck
        pl.BlockSpec((L, Tm, Bc, E), lambda i: (0, 0, i, 0)),  # cv
        whole(sel),
        whole(sel.T),
    ]
    # outputs carry the grid chunk as an explicit leading axis so the
    # last-two block dims equal the array dims (Mosaic's (8, 128)
    # divisibility rule does not apply then)
    seqs, scores = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((grid, K, T, Bc), jnp.float32),
            jax.ShapeDtypeStruct((grid, K, Bc, 1), jnp.float32),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, K, T, Bc), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, K, Bc, 1), lambda i: (i, 0, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, K * T, Bc, E), dt),      # kc
            pltpu.VMEM((L, K * T, Bc, E), dt),      # vc
            pltpu.VMEM((K, K * T, Bc), jnp.float32),  # ancestry mask
            pltpu.VMEM((K, T, Bc), jnp.float32),      # sequences
            pltpu.VMEM((K, Bc, 1), jnp.float32),      # scores
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        *w,
        cls0.astype(jnp.float32),
        # time-major cross K/V to match the cache layout
        jnp.swapaxes(cross_k, 1, 2).astype(dt),
        jnp.swapaxes(cross_v, 1, 2).astype(dt),
        sel,
        sel.T,
    )
    # [grid, K, T, Bc] -> [B, K, T]; batch row = chunk * Bc + lane
    tokens = jnp.transpose(seqs, (0, 3, 1, 2)).reshape(Bp, K, T)
    scores = jnp.transpose(scores[..., 0], (0, 2, 1)).reshape(Bp, K)
    return tokens[:B].astype(jnp.int32), scores[:B]


def _drop_cls(kernel, *refs, **kw):
    """Adapter: replace the cls0 ref with None so the traced kernel has no
    dead step-0 branch (refs order matches _beam_kernel's signature)."""
    n_w = len(FusedDecodeWeights._fields)
    kernel(*refs[:n_w], None, *refs[n_w + 1:], **kw)
