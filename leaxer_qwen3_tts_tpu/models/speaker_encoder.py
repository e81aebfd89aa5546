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


def _bn_init(c: int) -> dict:
    """Inference-mode BatchNorm1d as its four torch leaves (1:1 converter
    mapping; folding gamma/beta/mean/var into an affine would need a 4->1
    rule the converter machinery doesn't have)."""
    return {
        "g": jnp.ones((c,), jnp.float32),
        "b": jnp.zeros((c,), jnp.float32),
        "m": jnp.zeros((c,), jnp.float32),
        "v": jnp.ones((c,), jnp.float32),
    }


def _bn(x: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    return (x - p["m"]) * jax.lax.rsqrt(p["v"] + eps) * p["g"] + p["b"]


def init_ecapa_params(cfg: SpeakerEncoderConfig, key: jax.Array) -> dict:
    """ECAPA-TDNN fallback topology (docs/FALSIFIABILITY.md §3)."""
    C = cfg.ecapa_channels
    s = cfg.ecapa_scale
    w = C // s
    mfa = cfg.ecapa_mfa_dim
    att = cfg.ecapa_att_dim
    keys = iter(jax.random.split(key, 64))

    def conv(k, cin, cout):
        scale = 1.0 / jnp.sqrt(k * cin)
        return (
            jax.random.normal(next(keys), (k, cin, cout), jnp.float32) * scale
        )

    params = {
        "frontend": {
            "w": conv(5, cfg.num_mels, C),
            "b": jnp.zeros((C,), jnp.float32),
            "bn": _bn_init(C),
        },
        "blocks": [],
    }
    for _dil in (2, 3, 4):
        params["blocks"].append(
            {
                "in_w": conv(1, C, C),
                "in_b": jnp.zeros((C,), jnp.float32),
                "in_bn": _bn_init(C),
                # Res2Net: s-1 dilated k=3 convs over C/s-wide splits
                "res_w": jnp.stack([conv(3, w, w) for _ in range(s - 1)]),
                "res_b": jnp.zeros((s - 1, w), jnp.float32),
                "res_bn": _bn_init(C),
                "out_w": conv(1, C, C),
                "out_b": jnp.zeros((C,), jnp.float32),
                "out_bn": _bn_init(C),
                # squeeze-excitation bottleneck (C -> C//8 -> C)
                "se_w1": conv(1, C, C // 8)[0],
                "se_b1": jnp.zeros((C // 8,), jnp.float32),
                "se_w2": conv(1, C // 8, C)[0],
                "se_b2": jnp.zeros((C,), jnp.float32),
            }
        )
    params["mfa_w"] = conv(1, 3 * C, mfa)[0]
    params["mfa_b"] = jnp.zeros((mfa,), jnp.float32)
    # context-aware attentive stats pooling: att input [x, mean, std]
    params["asp_w1"] = conv(1, 3 * mfa, att)[0]
    params["asp_b1"] = jnp.zeros((att,), jnp.float32)
    params["asp_w2"] = conv(1, att, mfa)[0]
    params["asp_b2"] = jnp.zeros((mfa,), jnp.float32)
    params["post_bn"] = _bn_init(2 * mfa)
    params["out_w"] = conv(1, 2 * mfa, cfg.output_dim)[0]
    params["out_b"] = jnp.zeros((cfg.output_dim,), jnp.float32)
    return params


def init_speaker_encoder_params(cfg: SpeakerEncoderConfig, key: jax.Array) -> dict:
    if cfg.topology == "ecapa":
        return init_ecapa_params(cfg, key)
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


def _conv1d_same(x: jax.Array, w: jax.Array, dilation: int = 1) -> jax.Array:
    """SAME-padded 1-D conv, channels-last: x [B, T, Cin], w [K, Cin, Cout].

    ECAPA-TDNN uses symmetric (non-causal) padding — the whole reference
    clip is available, so there is no causality constraint (contrast the
    vocoder's strictly-causal convs)."""
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding="SAME",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _masked_mean_std(x: jax.Array, valid: jax.Array):
    """Masked per-utterance mean/std over time: x [B, T, C], valid [B, T]."""
    m = valid[..., None].astype(x.dtype)
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    mean = jnp.sum(x * m, axis=1) / n
    var = jnp.sum(jnp.square(x - mean[:, None, :]) * m, axis=1) / n
    return mean, jnp.sqrt(jnp.clip(var, 1e-9))


def ecapa_forward(
    cfg: SpeakerEncoderConfig,
    params: dict,
    mel: jax.Array,  # [B, T, num_mels] f32
    mel_len: Optional[jax.Array] = None,
) -> jax.Array:
    """ECAPA-TDNN fallback topology (docs/FALSIFIABILITY.md §3): conv
    frontend -> 3 SE-Res2Net blocks (dilations 2/3/4) -> multi-layer
    feature aggregation -> context-aware attentive stats pooling ->
    linear.  Same [B, T, mels] -> [B, output_dim] contract as the primary
    transformer guess (reference tts_onnx.cpp:367-403)."""
    B, T, _ = mel.shape
    if mel_len is None:
        mel_len = jnp.full((B,), T, jnp.int32)
    valid = jnp.arange(T)[None, :] < mel_len[:, None]  # [B, T]
    mask = valid[..., None].astype(jnp.float32)

    fe = params["frontend"]
    # mask the input first: every conv then reads zeros past mel_len, making
    # the embedding exactly invariant to padding content (masked again after
    # each block so BN offsets in the padded region don't accumulate)
    x = mel.astype(jnp.float32) * mask
    x = jax.nn.relu(_bn(_conv1d_same(x, fe["w"]) + fe["b"], fe["bn"]))
    x = x * mask

    s = cfg.ecapa_scale
    w_split = cfg.ecapa_channels // s
    feats = []
    for blk, dil in zip(params["blocks"], (2, 3, 4)):
        res = x
        h = jax.nn.relu(_bn(_conv1d_same(x, blk["in_w"]) + blk["in_b"], blk["in_bn"]))
        # Res2Net: split channels into s groups; group 0 passes through,
        # group i (i>=1) goes through a dilated k=3 conv after adding the
        # previous group's output (hierarchical receptive field)
        groups = [h[..., i * w_split:(i + 1) * w_split] for i in range(s)]
        outs = [groups[0]]
        prev = None
        for i in range(1, s):
            g = groups[i] if prev is None else groups[i] + prev
            prev = jax.nn.relu(
                _conv1d_same(g, blk["res_w"][i - 1], dilation=dil)
                + blk["res_b"][i - 1]
            )
            outs.append(prev)
        h = _bn(jnp.concatenate(outs, axis=-1), blk["res_bn"])
        h = jax.nn.relu(_bn(_conv1d_same(h, blk["out_w"]) + blk["out_b"], blk["out_bn"]))
        # squeeze-excitation: masked global average -> bottleneck -> sigmoid gate
        n = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        se = jnp.sum(h * mask, axis=1) / n  # [B, C]
        se = jax.nn.relu(jnp.dot(se, blk["se_w1"]) + blk["se_b1"])
        se = jax.nn.sigmoid(jnp.dot(se, blk["se_w2"]) + blk["se_b2"])
        x = (res + h * se[:, None, :]) * mask
        feats.append(x)

    # multi-layer feature aggregation over the three block outputs
    h = jnp.concatenate(feats, axis=-1)  # [B, T, 3C]
    h = jax.nn.relu(jnp.dot(h, params["mfa_w"]) + params["mfa_b"])  # [B, T, mfa]

    # context-aware attentive stats pooling: attention input [x, mean, std]
    mean, std = _masked_mean_std(h, valid)
    ctx = jnp.concatenate(
        [h,
         jnp.broadcast_to(mean[:, None, :], h.shape),
         jnp.broadcast_to(std[:, None, :], h.shape)],
        axis=-1,
    )  # [B, T, 3*mfa]
    a = jnp.tanh(jnp.dot(ctx, params["asp_w1"]) + params["asp_b1"])
    a = jnp.dot(a, params["asp_w2"]) + params["asp_b2"]  # [B, T, mfa]
    a = jnp.where(valid[..., None], a, -1e30)
    a = jax.nn.softmax(a, axis=1)
    amean = jnp.sum(a * h, axis=1)
    avar = jnp.sum(a * jnp.square(h - amean[:, None, :]), axis=1)
    stats = jnp.concatenate([amean, jnp.sqrt(jnp.clip(avar, 1e-9))], axis=-1)

    stats = _bn(stats, params["post_bn"])
    return jnp.dot(stats, params["out_w"]) + params["out_b"]


def speaker_encoder_forward(
    cfg: SpeakerEncoderConfig,
    params: dict,
    mel: jax.Array,  # [B, T, num_mels] f32
    mel_len: Optional[jax.Array] = None,  # [B] int32
) -> jax.Array:
    """Returns speaker embeddings [B, output_dim] (float32)."""
    if cfg.topology == "ecapa":
        return ecapa_forward(cfg, params, mel, mel_len)
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
