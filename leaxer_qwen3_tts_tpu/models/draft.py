"""Trained draft head for frame-level speculative decoding (EAGLE-style).

Predicts the NEXT frame's 16 codec codes from the current frame's talker
hidden state and input-embed sum — the two exact quantities
runtime/speculative.py already carries between iterations
(`SpecState.pending_hidden`, `SpecState.pending_nodrip`).  Architecture
(deliberately tiny — the draft must cost << one talker layer):

    x_0     = gelu(LN([hidden ; embed]) @ W_in)                 # [B, D]
    codes_j = argmax(x_j @ head0), argmax(x_j @ heads_sub[i])   # 16 heads
    x_{j+1} = gelu(LN([x_j ; frame_embed(codes_j)]) @ W_rec)    # unroll

`frame_embed` reuses the MAIN model's codec/MTP embedding tables, so the
recurrence sees the same representation the talker will consume.  Training
is teacher-forced on (hidden_f, embed_f) -> codes_{f+1} pairs harvested from
a talker forward pass (training/draft_loss.py); both the input transition
(W_in) and the continuation transition (W_rec) train on ground-truth inputs.

The draft does not affect correctness anywhere: speculative decoding commits
only codes produced by the exact model (see runtime/speculative.py), so a
bad draft costs speed, never quality.  The reference has no analog — its
decode loop is strictly sequential (tts_onnx.cpp:801-846).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import DraftConfig


def init_draft_params(cfg: DraftConfig, key: jax.Array) -> dict:
    H, D = cfg.hidden_size, cfg.d_model
    dt = cfg.jnp_dtype
    ks = jax.random.split(key, 4)

    def dense_init(k, fan_in, shape):
        return (
            jax.random.normal(k, shape, jnp.float32) / jnp.sqrt(fan_in)
        ).astype(dt)

    return {
        "w_in": dense_init(ks[0], 2 * H, (2 * H, D)),
        "w_rec": dense_init(ks[1], D + H, (D + H, D)),
        "head0": dense_init(ks[2], D, (D, cfg.codec_vocab_size)),
        "heads_sub": dense_init(
            ks[3], D, (cfg.num_codebooks - 1, D, cfg.subcode_vocab_size)
        ),
        "ln_in": jnp.ones((2 * H,), dt),
        "ln_rec": jnp.ones((D + H,), dt),
    }


def _norm(x, w):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + 1e-6) * w.astype(jnp.float32)).astype(x.dtype)


def _state_in(cfg: DraftConfig, p: dict, hidden, embed):
    z = jnp.concatenate(
        [hidden.astype(cfg.jnp_dtype), embed.astype(cfg.jnp_dtype)], axis=-1
    )
    return jax.nn.gelu(
        jnp.dot(_norm(z, p["ln_in"]), p["w_in"], preferred_element_type=jnp.float32)
    ).astype(cfg.jnp_dtype)


def _state_rec(cfg: DraftConfig, p: dict, x, frame_embed):
    z = jnp.concatenate([x, frame_embed.astype(cfg.jnp_dtype)], axis=-1)
    return jax.nn.gelu(
        jnp.dot(_norm(z, p["ln_rec"]), p["w_rec"], preferred_element_type=jnp.float32)
    ).astype(cfg.jnp_dtype)


def _head_logits(p: dict, x) -> Tuple[jax.Array, jax.Array]:
    """(logits0 [..., Vc] f32, logits_sub [..., 15, Vs] f32)."""
    l0 = jnp.dot(x, p["head0"], preferred_element_type=jnp.float32)
    ls = jnp.einsum(
        "...d,idv->...iv", x, p["heads_sub"], preferred_element_type=jnp.float32
    )
    return l0, ls


def _frame_embed_sum(embeddings: dict, codes: jax.Array) -> jax.Array:
    """code0_embed + sum_j table_j[subcode_j] — the talker-input term, using
    the MAIN model's tables (codes [..., 16] -> [..., H])."""
    from .embeddings import codec_embed

    c0e = codec_embed(embeddings, codes[..., 0])
    tables = embeddings["pred_embed"]  # [15, Vs, H]
    embs = jax.vmap(
        lambda tab, c: jnp.take(tab, c, axis=0), in_axes=(0, -1), out_axes=-2
    )(tables, codes[..., 1:])  # [..., 15, H]
    return c0e + jnp.sum(embs, axis=-2)


def draft_predict(
    cfg: DraftConfig,
    params: dict,
    embeddings: dict,
    hidden: jax.Array,  # [B, H]
    embed: jax.Array,  # [B, H]
    n_frames: int,
) -> jax.Array:
    """Greedy autoregressive draft of the next `n_frames` frames.
    Returns codes [B, n_frames, 16] int32."""
    x = _state_in(cfg, params, hidden, embed)
    out = []
    for _ in range(n_frames):
        l0, ls = _head_logits(params, x)
        code0 = jnp.argmax(l0, axis=-1).astype(jnp.int32)  # [B]
        subs = jnp.argmax(ls, axis=-1).astype(jnp.int32)  # [B, 15]
        codes = jnp.concatenate([code0[:, None], subs], axis=-1)  # [B, 16]
        out.append(codes)
        fe = _frame_embed_sum(embeddings, codes)
        x = _state_rec(cfg, params, x, fe)
    return jnp.stack(out, axis=1)


def draft_forward_teacher(
    cfg: DraftConfig,
    params: dict,
    embeddings: dict,
    hiddens: jax.Array,  # [B, F, H] — talker hidden at each frame
    embeds: jax.Array,  # [B, F, H] — frame-embed sums at each frame
) -> Tuple[Tuple[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Teacher-forced logits for training.

    step-1: x from (hidden_f, embed_f)           -> predicts codes_{f+1}
    step-2: x' from (x, embed_{f+1})             -> predicts codes_{f+2}
    Returns ((l0_s1, lsub_s1), (l0_s2, lsub_s2)); s1 spans frames [0, F),
    s2 spans [0, F-1) (offset by one extra frame).
    """
    x1 = _state_in(cfg, params, hiddens, embeds)  # [B, F, D]
    s1 = _head_logits(params, x1)
    x2 = _state_rec(cfg, params, x1[:, :-1], embeds[:, 1:])  # [B, F-1, D]
    s2 = _head_logits(params, x2)
    return s1, s2


def model_draft_fn(cfg: DraftConfig, params: dict, embeddings: dict):
    """Builds a `draft_fn(state, k)` for runtime/speculative.py."""

    def draft_fn(state, k):
        codes = draft_predict(
            cfg, params, embeddings, state.pending_hidden,
            state.pending_nodrip, k - 1,
        )  # [B, k-1, 16]
        return codes, None

    return draft_fn
