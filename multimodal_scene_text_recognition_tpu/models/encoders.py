"""Sequence encoders over the 26 visual columns.

Capability parity with reference modules/encoders.py:
  * BiLSTMEncoder — two stacked (BiLSTM + Linear) blocks
    (reference: encoders.py:10-30, model.py:63-66).
  * TransformerEncoder — 6-layer, 8-head, ff 2048 encoder with sinusoidal PE
    and optional pre-encoder semantic-relevance fusion
    (reference: encoders.py:69-143).  The reference's custom layer norms the
    residual *input* before the add (encoders.py:188-196) — replicated when
    ``norm_style='reference'``.
  * OscarEncoder — concat(visual, semantic) through a BERT-shaped encoder
    with segment embeddings (reference: encoders.py:34-66); built from
    scratch (no hub weights in a zero-egress build; reference config.py:46
    notes "No pretrained models yet" for this path anyway).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    LSTM,
    MLP,
    Int8Dense,
    MultiHeadAttention,
    PositionalEncoding,
    relevance_fusion,
)


class BiLSTMBlock(nn.Module):
    """Bidirectional LSTM + output projection (reference: encoders.py:10-30)."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        from ..ops.lstm import bilstm

        fwd = LSTM(x.shape[-1], self.hidden_dim, name="fwd")
        bwd = LSTM(x.shape[-1], self.hidden_dim, name="bwd")
        h = bilstm(x, fwd.weights(), bwd.weights())
        return nn.Dense(self.out_dim, name="proj")(h)


class BiLSTMEncoder(nn.Module):
    """Two stacked BiLSTM blocks: 512 -> 256 -> 256
    (reference: model.py:63-66)."""

    hidden_dim: int = 256
    out_dim: int = 256

    @nn.compact
    def __call__(self, col_feats, semantics=None, train: bool = False):
        x = BiLSTMBlock(self.hidden_dim, self.out_dim, name="l0")(col_feats)
        x = BiLSTMBlock(self.hidden_dim, self.out_dim, name="l1")(x)
        return x


class EncoderLayer(nn.Module):
    """Post-LN transformer encoder layer with the reference's norm-order
    quirk preserved (reference: encoders.py:166-196).

    ``int8`` (inference-only) runs the attention projections and FF matmuls
    through the PTQ int8 path (ops/int8.py) — same recipe as the int8
    backbone and fused decode kernel."""

    d_model: int
    num_heads: int
    ff_dim: int
    dropout: float
    norm_style: str = "reference"  # reference | standard
    int8: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        use_int8 = self.int8 and deterministic
        attn_mod = MultiHeadAttention(self.d_model, self.num_heads,
                                      name="self_attn")
        attn = lambda q, k, v: attn_mod(q, k, v, int8=use_int8)
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        drop = lambda h, name: nn.Dropout(self.dropout, deterministic=deterministic,
                                          name=name)(h)

        DenseCls = Int8Dense if use_int8 else nn.Dense

        def ff(h):
            h = DenseCls(self.ff_dim, name="linear1")(h)
            h = drop(nn.relu(h), "drop_ff")
            return DenseCls(self.d_model, name="linear2")(h)

        if self.norm_style == "reference":
            # reference encoders.py:189-195: attention reads the unnormed
            # input; the residual stream is normed *before* each add.
            a = attn(x, x, x)
            x = norm1(x)
            x = x + drop(a, "drop1")
            f = ff(x)
            x = norm2(x)
            x = x + drop(f, "drop2")
        else:
            x = norm1(x + drop(attn(x, x, x), "drop1"))
            x = norm2(x + drop(ff(x), "drop2"))
        return x


class TransformerEncoder(nn.Module):
    """6-layer encoder over columns with optional semantic pre-fusion
    (reference: encoders.py:69-143)."""

    d_model: int = 512
    embed_dim: int = 256
    num_heads: int = 8
    ff_dim: int = 2048
    num_layers: int = 6
    dropout: float = 0.1
    max_len: int = 26
    norm_style: str = "reference"
    pre_encoder_mlp: bool = False
    # PTQ int8 matmuls at inference (ops/int8.py); training stays float
    int8: bool = False

    @nn.compact
    def __call__(self, col_feats, semantics=None, train: bool = False):
        deterministic = not train
        x = col_feats

        if self.pre_encoder_mlp:
            # relevance-weighted semantic sum per column, combined back into
            # the stream (reference: encoders.py:83-113, 126-133)
            score_mlp = MLP(self.d_model, 1, num_layers=3, name="sem_relevance_mlp")
            rel, scores = relevance_fusion(
                x, semantics,
                lambda p: score_mlp(p, deterministic=deterministic),
                return_scores=True,
            )
            # introspection capability (reference PRINT_ATTENTION_SCORES,
            # encoders.py:110-123): collect with mutable=['intermediates']
            self.sow("intermediates", "pre_encoder_scores", scores)
            combined = jnp.concatenate([x, rel], axis=-1)
            x = x + MLP(self.d_model, self.d_model, num_layers=3,
                        name="combine_mlp")(combined, deterministic=deterministic)

        x = PositionalEncoding(self.d_model, self.max_len, self.dropout,
                               name="pos")(x, deterministic=deterministic)
        for i in range(self.num_layers):
            x = EncoderLayer(self.d_model, self.num_heads, self.ff_dim,
                             self.dropout, self.norm_style, int8=self.int8,
                             name=f"layer{i}")(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="final_norm")(x)


class OscarEncoder(nn.Module):
    """Oscar-style unified visual+semantic sequence through a BERT-shaped
    encoder (reference: encoders.py:34-66).

    ``fuse_semantics=False`` reproduces the reference's OSCAR_ENCODER=False
    path (visual-only, no segment ids, reference:58-60); the semantic tokens
    are appended with segment id 1 when True (reference:52-56).
    """

    d_model: int = 512
    bert_dim: int = 768
    num_heads: int = 12
    ff_dim: int = 3072
    num_layers: int = 12
    dropout: float = 0.1
    # BertConfig().max_position_embeddings — kept at the BERT default so a
    # reference Oscar checkpoint's position table imports without slicing
    # (only the first seq_len rows are ever read; seq <= 26+52)
    max_positions: int = 512
    fuse_semantics: bool = False

    @nn.compact
    def __call__(self, col_feats, semantics=None, train: bool = False):
        deterministic = not train
        T = col_feats.shape[1]
        x = nn.Dense(self.bert_dim, name="hid_to_bert")(col_feats)

        if self.fuse_semantics:
            sem = nn.Dense(self.bert_dim, name="sem_to_bert")(semantics)
            x = jnp.concatenate([x, sem], axis=1)
            seg = jnp.concatenate(
                [jnp.zeros((T,), jnp.int32),
                 jnp.ones((semantics.shape[1],), jnp.int32)]
            )
        else:
            seg = jnp.zeros((T,), jnp.int32)

        pos = jnp.arange(x.shape[1])[None, :]
        x = x + nn.Embed(self.max_positions, self.bert_dim, name="pos_embed")(pos)
        x = x + nn.Embed(2, self.bert_dim, name="seg_embed")(seg)[None]
        x = nn.LayerNorm(epsilon=1e-12, name="embed_ln")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)

        for i in range(self.num_layers):
            a = MultiHeadAttention(self.bert_dim, self.num_heads,
                                   name=f"attn{i}")(x, x, x)
            x = nn.LayerNorm(epsilon=1e-12, name=f"ln1_{i}")(x + a)
            h = nn.Dense(self.ff_dim, name=f"ff1_{i}")(x)
            # exact (erf) gelu — BertModel's "gelu" activation, not the
            # tanh approximation, so imported checkpoints match numerically
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.bert_dim, name=f"ff2_{i}")(h)
            x = nn.LayerNorm(epsilon=1e-12, name=f"ln2_{i}")(x + h)

        return nn.Dense(self.d_model, name="bert_to_hid")(x[:, :T, :])
