"""The talker: 28-layer GQA codec-token LM (prefill + single-step decode).

Replaces the reference's talker_prefill.onnx / talker_decode.onnx pair
(tts_onnx.cpp:615-732) with one JAX transformer sharing a device-resident KV
cache.  ``last_hidden`` (post-final-norm hidden of the last real position) feeds
the code predictor, matching the reference's last_hidden output contract.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import TalkerConfig
from ..ops.quant import dense
from .layers import KVCache, init_kv_cache, init_transformer_params, transformer_forward


def init_talker_params(cfg: TalkerConfig, key: jax.Array) -> dict:
    k1, k2 = jax.random.split(key)
    h = cfg.hidden_size
    dt = cfg.transformer.jnp_dtype
    scale = 1.0 / jnp.sqrt(h)
    return {
        "transformer": init_transformer_params(cfg.transformer, k1),
        "lm_head": (jax.random.normal(k2, (h, cfg.codec_vocab_size), jnp.float32) * scale).astype(
            dt
        ),
    }


def talker_init_cache(cfg: TalkerConfig, batch: int, max_len: int) -> KVCache:
    return init_kv_cache(cfg.transformer, batch, max_len)


def prepare_fused_talker(
    cfg: TalkerConfig, talker_params: dict, bits: int = 8
) -> dict:
    """Attach pre-packed fused-step weights when the architecture qualifies."""
    from ..ops.fused_step import pack_fused_weights, supports

    if not supports(cfg.transformer):
        return talker_params
    out = dict(talker_params)
    out["fused_step"] = pack_fused_weights(
        cfg.transformer, talker_params["transformer"]["layers"], bits=bits
    )
    return out


def talker_prefill(
    cfg: TalkerConfig,
    params: dict,
    prompt_embeds: jax.Array,  # [B, P, H] (right-padded)
    prompt_len: jax.Array,  # [B] int32 true lengths
    cache: KVCache,
) -> Tuple[jax.Array, jax.Array, KVCache, jax.Array]:
    """Prompt pass.

    Returns (last_logits [B, V] f32, last_hidden [B, H], cache, valid_mask [B, T]).
    """
    B, P, H = prompt_embeds.shape
    positions = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (B, P))
    query_valid = positions < prompt_len[:, None]
    valid_mask = jnp.zeros((B, cache.max_len), bool)

    hidden, cache, valid_mask = transformer_forward(
        cfg.transformer,
        params["transformer"],
        prompt_embeds,
        positions,
        cache,
        valid_mask,
        query_valid=query_valid,
    )
    # Gather hidden at the last real position per sequence, project only that row
    # (the reference computes logits for every prompt position and uses only the
    # last, tts_onnx.cpp:796-798 — projecting one row is strictly cheaper).
    idx = jnp.clip(prompt_len - 1, 0, P - 1)
    last_hidden = jnp.take_along_axis(hidden, idx[:, None, None].repeat(H, axis=2), axis=1)[:, 0]
    last_logits = dense(last_hidden, params["lm_head"])
    return last_logits, last_hidden, cache, valid_mask


def talker_prefill_all_logits(
    cfg: TalkerConfig,
    params: dict,
    prompt_embeds: jax.Array,
    prompt_len: jax.Array,
    cache: KVCache,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Like talker_prefill but returns logits for every prompt position
    ([B, P, V] f32) — parity-testing / scoring path."""
    B, P, H = prompt_embeds.shape
    positions = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (B, P))
    query_valid = positions < prompt_len[:, None]
    valid_mask = jnp.zeros((B, cache.max_len), bool)
    hidden, cache, valid_mask = transformer_forward(
        cfg.transformer,
        params["transformer"],
        prompt_embeds,
        positions,
        cache,
        valid_mask,
        query_valid=query_valid,
    )
    logits = dense(hidden, params["lm_head"])
    return logits, hidden, cache, valid_mask


def talker_decode_step(
    cfg: TalkerConfig,
    params: dict,
    embed: jax.Array,  # [B, H] — the summed next-input embedding
    position: jax.Array,  # [B] int32 RoPE position of this token
    cache: KVCache,
    valid_mask: jax.Array,  # [B, T] bool
    uniform_fill: bool = True,
    mesh=None,
) -> Tuple[jax.Array, jax.Array, KVCache, jax.Array]:
    """One decode step.  Returns (logits [B, V] f32, hidden [B, H], cache, valid_mask).

    ``uniform_fill=False`` (continuous serving pool) switches the cache write
    to per-sequence offsets; the default keeps the cheap lockstep path.
    ``mesh``: when given and a TP pack is attached (engine mesh path), the
    B=1 step runs the shard_map'd per-layer fused kernels
    (ops/fused_tp.py)."""
    B, H = embed.shape
    t = cfg.transformer
    if (
        cfg.decode_impl == "fused"
        and "fused_tp" in params
        and B == 1
        and mesh is not None
        and uniform_fill
        and not cache.quantized
    ):
        import jax as _jax

        from ..models.layers import rms_norm
        from ..ops.fused_tp import fused_decode_step_tp

        x_out, kc, vc = fused_decode_step_tp(
            t, params["fused_tp"], embed, position[0], cache.k, cache.v,
            mesh, interpret=_jax.default_backend() != "tpu",
        )
        hidden = rms_norm(
            x_out, params["transformer"]["final_norm"], t.rms_norm_eps
        ).astype(embed.dtype)
        logits = dense(hidden, params["lm_head"])
        new_valid = jax.lax.dynamic_update_slice(
            valid_mask, jnp.ones((1, 1), bool), (0, position[0])
        )
        new_cache = KVCache(k=kc, v=vc, length=cache.length + 1)
        return logits, hidden, new_cache, new_valid
    # fused eligibility: small buckets always; big buckets via the windowed
    # (online-softmax) kernel, which needs the bucket to be WINDOW-aligned
    # (the engine rounds its ladder top accordingly)
    fused_ok = cache.max_len <= cfg.fused_max_cache or cache.max_len % 512 == 0
    kv_q = cache.quantized  # int8 KV: fused kernels take the scale arrays
    if cfg.decode_impl == "fused" and "fused_step" in params and 2 <= B <= 32:
        # batched fused step: per-stream positions, weights read ONCE for the
        # whole serving batch (ops/fused_step.fused_decode_step_batched)
        from ..ops.fused_step import batched_window, fused_decode_step_batched

        bwin_ok = (
            cache.max_len > 64
            and cache.max_len % batched_window(B) == 0
            and cache.max_len % 128 == 0
        )
        if (cache.max_len <= 64 or cache.max_len % batched_window(B) == 0) if not kv_q else bwin_ok:
            import jax as _jax

            from ..models.layers import rms_norm

            interpret = _jax.default_backend() != "tpu"
            if kv_q:
                x_out, kc, vc, ksc, vsc = fused_decode_step_batched(
                    t, params["fused_step"], embed, position, cache.k,
                    cache.v, cache.k_scale, cache.v_scale,
                    interpret=interpret,
                )
                new_cache = KVCache(k=kc, v=vc, length=cache.length + 1,
                                    k_scale=ksc, v_scale=vsc)
            else:
                x_out, kc, vc = fused_decode_step_batched(
                    t, params["fused_step"], embed, position, cache.k,
                    cache.v, interpret=interpret,
                )
                new_cache = KVCache(k=kc, v=vc, length=cache.length + 1)
            hidden = rms_norm(
                x_out, params["transformer"]["final_norm"], t.rms_norm_eps
            ).astype(embed.dtype)
            logits = dense(hidden, params["lm_head"])
            new_valid = valid_mask | (
                jnp.arange(cache.max_len)[None, :] == position[:, None]
            )
            return logits, hidden, new_cache, new_valid
    if (
        cfg.decode_impl == "fused"
        and "fused_step" in params
        and B == 1
        and fused_ok
        and (not kv_q or cache.max_len % 128 == 0)
    ):
        # ONE Pallas kernel for all 28 layers (ops/fused_step.py); final norm,
        # logit head, and bookkeeping stay outside the kernel
        import jax as _jax

        from ..models.layers import rms_norm
        from ..ops.fused_step import fused_decode_step

        interpret = _jax.default_backend() != "tpu"
        pos = position[0]
        if kv_q:
            x_out, kc, vc, ksc, vsc = fused_decode_step(
                t, params["fused_step"], embed, pos, cache.k, cache.v,
                cache.k_scale, cache.v_scale, interpret=interpret,
            )
            new_cache = KVCache(k=kc, v=vc, length=cache.length + 1,
                                k_scale=ksc, v_scale=vsc)
        else:
            x_out, kc, vc = fused_decode_step(
                t, params["fused_step"], embed, pos, cache.k, cache.v,
                interpret=interpret,
            )
            new_cache = KVCache(k=kc, v=vc, length=cache.length + 1)
        hidden = rms_norm(
            x_out, params["transformer"]["final_norm"], t.rms_norm_eps
        ).astype(embed.dtype)
        logits = dense(hidden, params["lm_head"])
        new_valid = jax.lax.dynamic_update_slice(
            valid_mask, jnp.ones((1, 1), bool), (0, pos)
        )
        return logits, hidden, new_cache, new_valid

    if (
        cfg.decode_impl == "fused"
        and "fused_step" in params
        and os.environ.get("QTTS_ASSERT_FUSED") == "1"
    ):
        # loud-failure mode for benches/deployments: a fused-packed model
        # falling back to the XLA step is ~+25% per frame and historically
        # SILENT (e.g. a kvq bucket not 128-aligned).  Trace-time raise —
        # all gate inputs are static shapes/flags.
        raise RuntimeError(
            "QTTS_ASSERT_FUSED: fused decode step ineligible here "
            f"(B={B}, max_len={cache.max_len}, kv_quant={kv_q}, "
            f"uniform_fill={uniform_fill}, fused_ok={fused_ok}) — "
            "check bucket alignment (kvq needs max_len % 128 == 0; "
            "windowed needs % 512) and batch <= 32"
        )
    hidden, cache, valid_mask = transformer_forward(
        t,
        params["transformer"],
        embed[:, None, :],
        position[:, None],
        cache,
        valid_mask,
        uniform_fill=uniform_fill,
    )
    hidden = hidden[:, 0]
    logits = dense(hidden, params["lm_head"])
    return logits, hidden, cache, valid_mask
