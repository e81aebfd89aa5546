"""Speaker encoder for voice cloning: log-mel frames -> 1024-dim embedding.

I/O contract per the reference's speaker_encoder.onnx (tts_onnx.cpp:367-403):
mel f32 [B, num_frames, 128] -> speaker embedding [B, 1024].

Architecture: linear mel projection -> bidirectional (non-causal, full-context)
transformer encoder -> attentive statistics pooling -> output projection.
This is an utterance-level encoder (whole 3 s reference clip available), so no
causality constraint; attention uses a padding mask for batched variable-length
references.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import SpeakerEncoderConfig
from ..ops.attention import attend_xla


def _dense(key, fan_in, shape, dtype):
    scale = 1.0 / jnp.sqrt(fan_in)
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_speaker_encoder_params(cfg: SpeakerEncoderConfig, key: jax.Array) -> dict:
    dt = cfg.jnp_dtype
    d = cfg.d_model
    hd = d // cfg.num_heads
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    params = {
        "in_proj": _dense(next(keys), cfg.num_mels, (cfg.num_mels, d), dt),
        "in_bias": jnp.zeros((d,), dt),
        "layers": [],
        "pool_w": _dense(next(keys), d, (d, d), dt),
        "pool_v": _dense(next(keys), d, (d, 1), dt),
        "out_proj": _dense(next(keys), 2 * d, (2 * d, cfg.output_dim), dt),
        "out_bias": jnp.zeros((cfg.output_dim,), dt),
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "ln1_s": jnp.ones((d,), jnp.float32),
                "ln1_b": jnp.zeros((d,), jnp.float32),
                "wq": _dense(next(keys), d, (d, d), dt),
                "wk": _dense(next(keys), d, (d, d), dt),
                "wv": _dense(next(keys), d, (d, d), dt),
                "wo": _dense(next(keys), d, (d, d), dt),
                "ln2_s": jnp.ones((d,), jnp.float32),
                "ln2_b": jnp.zeros((d,), jnp.float32),
                "w1": _dense(next(keys), d, (d, cfg.intermediate_size), dt),
                "b1": jnp.zeros((cfg.intermediate_size,), dt),
                "w2": _dense(next(keys), cfg.intermediate_size, (cfg.intermediate_size, d), dt),
                "b2": jnp.zeros((d,), dt),
            }
        )
    return params


def _ln(x, s, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * s + b).astype(x.dtype)


def speaker_encoder_forward(
    cfg: SpeakerEncoderConfig,
    params: dict,
    mel: jax.Array,  # [B, T, num_mels] f32
    mel_len: Optional[jax.Array] = None,  # [B] int32
) -> jax.Array:
    """Returns speaker embeddings [B, output_dim] (float32)."""
    B, T, _ = mel.shape
    if mel_len is None:
        mel_len = jnp.full((B,), T, jnp.int32)
    valid = jnp.arange(T)[None, :] < mel_len[:, None]  # [B, T]

    x = jnp.dot(mel.astype(params["in_proj"].dtype), params["in_proj"]) + params["in_bias"]
    h = cfg.num_heads
    hd = cfg.d_model // h
    full_mask = jnp.broadcast_to(valid[:, None, :], (B, T, T))  # non-causal

    for lp in params["layers"]:
        y = _ln(x, lp["ln1_s"], lp["ln1_b"])
        q = jnp.dot(y, lp["wq"]).reshape(B, T, h, hd)
        k = jnp.dot(y, lp["wk"]).reshape(B, T, h, hd)
        v = jnp.dot(y, lp["wv"]).reshape(B, T, h, hd)
        o = attend_xla(
            q, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), full_mask
        ).reshape(B, T, cfg.d_model)
        x = x + jnp.dot(o, lp["wo"])
        y = _ln(x, lp["ln2_s"], lp["ln2_b"])
        y = jax.nn.gelu(jnp.dot(y, lp["w1"]) + lp["b1"])
        x = x + jnp.dot(y, lp["w2"]) + lp["b2"]

    # attentive statistics pooling (masked)
    xf = x.astype(jnp.float32)
    att = jnp.tanh(jnp.dot(xf, params["pool_w"].astype(jnp.float32)))
    att = jnp.dot(att, params["pool_v"].astype(jnp.float32))[..., 0]  # [B, T]
    att = jnp.where(valid, att, -1e30)
    w = jax.nn.softmax(att, axis=-1)[..., None]  # [B, T, 1]
    mean = jnp.sum(w * xf, axis=1)
    var = jnp.sum(w * jnp.square(xf - mean[:, None, :]), axis=1)
    std = jnp.sqrt(jnp.clip(var, 1e-9))
    stats = jnp.concatenate([mean, std], axis=-1)  # [B, 2D]

    emb = jnp.dot(stats, params["out_proj"].astype(jnp.float32)) + params["out_bias"].astype(
        jnp.float32
    )
    return emb
