"""12 Hz neural codec decoder (vocoder): 16 codebooks/frame -> 24 kHz waveform.

I/O contract per the reference's tokenizer12hz_decode.onnx (tts_onnx.cpp:759-776):
codes i64 [B, frames, 16] -> audio f32 [B, frames * 2000] (+ valid lengths).

Architecture (TPU-first, weights-compatible via the converter's name mapping):
  * 16 codebook embedding tables, summed per frame -> [B, F, D]
  * prenet: ConvNeXt-style causal blocks at frame rate (depthwise causal conv +
    pointwise MLP) — all matmul-shaped for the MXU
  * upsampling stages: causal conv (k=3) producing rate*channels, reshaped
    (sub-pixel / "pixel-shuffle") to rate x length — an exactly-causal
    transposed conv that lowers to one large matmul per stage
  * per-stage causal residual dilated conv blocks; final causal conv -> tanh

Every op is causal, so chunked decoding with ``left_context_frames`` of context
is exact — the streaming path the reference lacks (it vocodes once at the end,
tts_onnx.cpp:430).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import VocoderConfig


# ---------------------------------------------------------------------------
# Causal conv primitives (channels-last [B, T, C]; pad left only)
# ---------------------------------------------------------------------------


def causal_conv1d(x: jax.Array, w: jax.Array, dilation: int = 1) -> jax.Array:
    """x [B, T, Cin], w [K, Cin, Cout] -> [B, T, Cout]; left-padded (causal)."""
    k = w.shape[0]
    pad = (k - 1) * dilation
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def causal_dwconv1d(x: jax.Array, w: jax.Array) -> jax.Array:
    """Depthwise causal conv: x [B, T, C], w [K, C] -> [B, T, C]."""
    k, c = w.shape
    pad = k - 1
    out = jax.lax.conv_general_dilated(
        x,
        w[:, None, :],  # [K, 1, C] with feature_group_count=C
        window_strides=(1,),
        padding=[(pad, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _conv_init(key, k, cin, cout, dtype):
    scale = 1.0 / jnp.sqrt(k * cin)
    return (jax.random.normal(key, (k, cin, cout), jnp.float32) * scale).astype(dtype)


def init_vocoder_params(cfg: VocoderConfig, key: jax.Array) -> dict:
    dt = cfg.jnp_dtype
    d = cfg.d_model
    keys = iter(jax.random.split(key, 256))

    params = {
        "codebooks": (
            jax.random.normal(next(keys), (cfg.num_codebooks, cfg.codebook_size, d), jnp.float32)
            * 0.02
        ).astype(dt),
        "prenet": [],
        "stages": [],
    }
    for _ in range(cfg.num_prenet_blocks):
        params["prenet"].append(
            {
                "dw": (jax.random.normal(next(keys), (cfg.prenet_kernel_size, d), jnp.float32)
                       * (1.0 / cfg.prenet_kernel_size)).astype(dt),
                "ln_scale": jnp.ones((d,), jnp.float32),
                "ln_bias": jnp.zeros((d,), jnp.float32),
                "w1": _conv_init(next(keys), 1, d, 3 * d, dt)[0],
                "b1": jnp.zeros((3 * d,), dt),
                "w2": _conv_init(next(keys), 1, 3 * d, d, dt)[0],
                "b2": jnp.zeros((d,), dt),
            }
        )

    cin = d
    for rate, cout in zip(cfg.upsample_rates, cfg.upsample_channels):
        stage = {
            "up_w": _conv_init(next(keys), 3, cin, cout * rate, dt),
            "up_b": jnp.zeros((cout * rate,), dt),
            "res": [],
        }
        for dil in cfg.resblock_dilations:
            stage["res"].append(
                {
                    "w1": _conv_init(next(keys), cfg.resblock_kernel_size, cout, cout, dt),
                    "b1": jnp.zeros((cout,), dt),
                    "w2": _conv_init(next(keys), cfg.resblock_kernel_size, cout, cout, dt),
                    "b2": jnp.zeros((cout,), dt),
                }
            )
        params["stages"].append(stage)
        cin = cout

    params["final_w"] = _conv_init(next(keys), cfg.final_kernel_size, cin, 1, dt)
    params["final_b"] = jnp.zeros((1,), dt)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def embed_codes(cfg: VocoderConfig, params: dict, codes: jax.Array) -> jax.Array:
    """codes [B, F, 16] int32 -> summed codebook embeddings [B, F, D]."""
    # one_hot-free gather per codebook, summed; codebook axis vectorized
    def gather(table, ids):
        return jnp.take(table, ids, axis=0)

    per_book = jax.vmap(gather, in_axes=(0, 2), out_axes=0)(params["codebooks"], codes)
    return jnp.sum(per_book, axis=0)  # [B, F, D]


def vocoder_forward(cfg: VocoderConfig, params: dict, codes: jax.Array) -> jax.Array:
    """codes [B, F, 16] int32 -> audio f32 [B, F * samples_per_frame]."""
    x = embed_codes(cfg, params, codes)  # [B, F, D]

    for blk in params["prenet"]:
        h = causal_dwconv1d(x, blk["dw"])
        h = layer_norm(h, blk["ln_scale"], blk["ln_bias"])
        h = jnp.dot(h, blk["w1"], preferred_element_type=jnp.float32).astype(x.dtype) + blk["b1"]
        h = jax.nn.gelu(h)
        h = jnp.dot(h, blk["w2"], preferred_element_type=jnp.float32).astype(x.dtype) + blk["b2"]
        x = x + h

    for rate, stage in zip(cfg.upsample_rates, params["stages"]):
        B, T, _ = x.shape
        h = causal_conv1d(x, stage["up_w"]) + stage["up_b"]
        cout = h.shape[-1] // rate
        x = h.reshape(B, T * rate, cout)  # sub-pixel upsample (exactly causal)
        x = jax.nn.silu(x)
        for blk, dil in zip(stage["res"], cfg.resblock_dilations):
            r = causal_conv1d(jax.nn.silu(x), blk["w1"], dilation=dil) + blk["b1"]
            r = causal_conv1d(jax.nn.silu(r), blk["w2"]) + blk["b2"]
            x = x + r

    audio = causal_conv1d(x, params["final_w"]) + params["final_b"]
    audio = jnp.tanh(audio.astype(jnp.float32))
    return audio[..., 0]  # [B, F * samples_per_frame]


def vocode_chunk(
    cfg: VocoderConfig,
    params: dict,
    codes_with_context: jax.Array,  # [B, ctx + F, 16]
    context_frames: int,
) -> jax.Array:
    """Streaming vocode: decode [ctx+F] frames, return only the last F frames of
    audio.  Exact (== full decode) when context_frames >= cfg.left_context_frames
    because every conv is causal."""
    audio = vocoder_forward(cfg, params, codes_with_context)
    return audio[:, context_frames * cfg.samples_per_frame :]
