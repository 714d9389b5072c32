"""Semantic-vector embedders: object-class ids -> [B, n_obj, embed_dim].

Capability parity with reference modules/semantic_vectors.py:1-100:
  * LinearEmbedding — learned 2000 x embed_dim table; modes 'overlap',
    'scene' (ious-softmax weighted), 'combined' (reference:11-49).
  * BertEmbedding — class-tag token embeddings through a small transformer
    text encoder (reference:55-70 uses DistilBERT; see class docstring).
  * ZeroEmbedding / RandomEmbedding — ablations (reference:73-100).

Reference bugs fixed deliberately (the reference paths crash if enabled):
  * 'combined' mode reads the undefined ``self.embed`` (reference:45-46);
    here it uses the two declared tables + combiner.
  * Zero/Random declare 2-arg forwards but are called with 3 args and their
    tuple return doesn't match the single-tensor consumer
    (reference:80,95 vs model.py:96); here they take the full input set and
    return one [B, n, E] tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LinearEmbedding(nn.Module):
    """Learned embedding table over detector class ids
    (reference: semantic_vectors.py:11-49).  Id 0 is the pad slot (class ids
    are shifted +1 at dataset build, reference: coco_dataset.py:278,298)."""

    num_obj_classes: int = 2000
    embed_dim: int = 256
    mode: str = "overlap"  # overlap | scene | combined

    @nn.compact
    def __call__(self, overlap, scene, ious, rngs=None):
        if self.mode == "overlap":
            table = nn.Embed(self.num_obj_classes, self.embed_dim, name="embed")
            return table(overlap)
        if self.mode == "scene":
            table = nn.Embed(self.num_obj_classes, self.embed_dim, name="embed")
            weights = jax.nn.softmax(ious, axis=1)[..., None]
            return table(scene) * weights
        if self.mode == "combined":
            ov = nn.Embed(self.num_obj_classes, self.embed_dim,
                          name="overlap_embed")(overlap)
            # overlap is padded to 15, scene to 52 (reference:
            # coco_dataset.py:245-246); align by truncating scene to the
            # overlap width before the channel concat, as the reference's
            # dim=2 cat requires equal object counts.
            sc = nn.Embed(self.num_obj_classes, self.embed_dim,
                          name="scene_embed")(scene[:, : overlap.shape[1]])
            return nn.Dense(self.embed_dim, name="combine")(
                jnp.concatenate([ov, sc], axis=-1)
            )
        raise ValueError(f"unknown semantic mode {self.mode!r}")


class ZeroEmbedding(nn.Module):
    """All-zero semantics ablation (reference: semantic_vectors.py:88-100)."""

    embed_dim: int = 256

    @nn.compact
    def __call__(self, overlap, scene, ious, rngs=None):
        return jnp.zeros((overlap.shape[0], overlap.shape[1], self.embed_dim))


class RandomEmbedding(nn.Module):
    """Random semantics ablation (reference: semantic_vectors.py:73-85).
    Uses the 'semantics' RNG stream for fresh noise per call."""

    embed_dim: int = 256

    @nn.compact
    def __call__(self, overlap, scene, ious, rngs=None):
        rng = self.make_rng("semantics")
        return jax.random.uniform(
            rng, (overlap.shape[0], overlap.shape[1], self.embed_dim)
        )


class BertEmbedding(nn.Module):
    """Class-tag embeddings through a DistilBERT-shaped text encoder.

    The reference's Bert_Embedding (semantic_vectors.py:55-70) runs
    pretrained DistilBERT over bert-tokenized tag sequences (and is broken
    as written: undefined ``self.config`` at :63).  A zero-egress build
    cannot download hub weights, so this is a from-scratch encoder with the
    EXACT DistilBERT architecture — post-LN layers, separate q/k/v/out
    projections, erf-exact GELU, eps-1e-12 norms — so that a locally
    available DistilBERT state dict imports via
    ``train.torch_import.import_distilbert`` and reproduces the torch
    hidden states (tested in tests/test_reference_parity.py).

    The final ``proj`` (768 -> embed_dim) is ours alone: the reference's
    Bert path has no dimension adapter because it never ran.
    """

    vocab_size: int = 30522          # bert-base-uncased vocab
    embed_dim: int = 256
    model_dim: int = 768
    num_layers: int = 6              # DistilBertConfig.n_layers
    num_heads: int = 12
    ff_dim: int = 3072
    max_positions: int = 512         # DistilBertConfig.max_position_embeddings

    @nn.compact
    def __call__(self, overlap, scene, ious, rngs=None):
        tokens = overlap  # bert-token ids [B, T]
        B, T = tokens.shape
        H = self.num_heads
        hd = self.model_dim // H

        x = nn.Embed(self.vocab_size, self.model_dim, name="tok")(tokens)
        pos = jnp.arange(T)[None, :]
        x = x + nn.Embed(self.max_positions, self.model_dim, name="pos")(pos)
        x = nn.LayerNorm(epsilon=1e-12, name="embed_ln")(x)

        def heads(t):  # [B, T, D] -> [B, H, T, hd]
            return t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        for i in range(self.num_layers):
            q = heads(nn.Dense(self.model_dim, name=f"q_lin{i}")(x))
            k = heads(nn.Dense(self.model_dim, name=f"k_lin{i}")(x))
            v = heads(nn.Dense(self.model_dim, name=f"v_lin{i}")(x))
            a = jax.nn.softmax(
                (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(float(hd)), axis=-1
            )
            o = (a @ v).transpose(0, 2, 1, 3).reshape(B, T, self.model_dim)
            o = nn.Dense(self.model_dim, name=f"out_lin{i}")(o)
            x = nn.LayerNorm(epsilon=1e-12, name=f"sa_ln{i}")(x + o)
            h = nn.Dense(self.ff_dim, name=f"ff1_{i}")(x)
            h = nn.gelu(h, approximate=False)  # transformers' erf-exact gelu
            h = nn.Dense(self.model_dim, name=f"ff2_{i}")(h)
            x = nn.LayerNorm(epsilon=1e-12, name=f"out_ln{i}")(x + h)
        return nn.Dense(self.embed_dim, name="proj")(x)


def build_semantic_embedder(cfg) -> nn.Module:
    """Component selection mirroring reference model.py:50-59."""
    if cfg.semantic_source == "zero":
        return ZeroEmbedding(cfg.embed_dim)
    if cfg.semantic_source == "rand":
        return RandomEmbedding(cfg.embed_dim)
    if cfg.semantic_embedding == "bert":
        return BertEmbedding(embed_dim=cfg.embed_dim)
    if cfg.semantic_embedding == "linear":
        return LinearEmbedding(
            cfg.num_obj_classes, cfg.embed_dim, mode=cfg.semantic_vector
        )
    raise ValueError(
        f"bad semantic config: source={cfg.semantic_source} "
        f"embedding={cfg.semantic_embedding}"
    )
