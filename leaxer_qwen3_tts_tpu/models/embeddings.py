"""Embedding tables: text_project, codec_embed, code_predictor_embed.

The reference runs these as three separate ONNX graphs (tts_onnx.cpp:545-613);
here they are plain gather tables living in the same pytree as the talker — a
lookup never crosses a serialization boundary.

  * text_project:  text token id -> talker-space embedding.  Modeled as
    Embed(text_vocab, text_embed_dim) followed by a Dense to hidden_size
    (the "project" half of the reference's text_project.onnx contract,
    tts_onnx.cpp:545-559).  When text_embed_dim == hidden_size the Dense is a
    learned square projection.
  * codec_embed:   codebook-0 / codec-control token id -> embedding
    (reference codec_embed.onnx, tts_onnx.cpp:561-590).
  * code_predictor_embed: per-step tables [num_steps, subcode_vocab, hidden]
    (reference code_predictor_embed.onnx with its ``generation_step`` input,
    tts_onnx.cpp:592-613).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CodePredictorConfig, TalkerConfig


def init_embedding_params(cfg: TalkerConfig, pred_cfg: CodePredictorConfig, key: jax.Array) -> dict:
    dt = cfg.transformer.jnp_dtype
    h = cfg.hidden_size
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale_text = 1.0 / jnp.sqrt(cfg.text_embed_dim)
    return {
        "text_embed": (
            jax.random.normal(k1, (cfg.text_vocab_size, cfg.text_embed_dim), jnp.float32) * 0.02
        ).astype(dt),
        "text_proj": (
            jax.random.normal(k2, (cfg.text_embed_dim, h), jnp.float32) * scale_text
        ).astype(dt),
        "codec_embed": (
            jax.random.normal(k3, (cfg.codec_vocab_size, h), jnp.float32) * 0.02
        ).astype(dt),
        "pred_embed": (
            jax.random.normal(
                k4, (pred_cfg.num_steps, pred_cfg.subcode_vocab_size, h), jnp.float32
            )
            * 0.02
        ).astype(dt),
    }


def text_project(params: dict, token_ids: jax.Array) -> jax.Array:
    """[...] int32 -> [..., hidden] — embed + project (text_project.onnx contract)."""
    e = jnp.take(params["text_embed"], token_ids, axis=0)
    return jnp.dot(e, params["text_proj"], preferred_element_type=jnp.float32).astype(
        params["text_proj"].dtype
    )


def codec_embed(params: dict, token_ids: jax.Array) -> jax.Array:
    """[...] int32 -> [..., hidden] codec-token embedding."""
    return jnp.take(params["codec_embed"], token_ids, axis=0)


def code_predictor_embed(params: dict, subcode: jax.Array, step: jax.Array) -> jax.Array:
    """Step-indexed sub-codebook embedding: table[step][subcode]."""
    table = jax.lax.dynamic_index_in_dim(params["pred_embed"], step, axis=0, keepdims=False)
    return jnp.take(table, subcode, axis=0)
