"""Pallas flash-attention parity vs the XLA einsum path (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.ops.attention import attend_xla
from leaxer_qwen3_tts_tpu.ops.flash_attention import flash_attend


def make_qkv(rng, B, S, T, nq, nk, d, dtype=jnp.float32):
    # head-major K/V (the KV-cache layout, ops/attention.py)
    q = jnp.asarray(rng.standard_normal((B, S, nq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((B, nk, T, d)), dtype)
    v = jnp.asarray(rng.standard_normal((B, nk, T, d)), dtype)
    return q, k, v


def causal_mask(B, S, T):
    # queries at positions T-S..T-1 over a T-long key history
    qpos = jnp.arange(S) + (T - S)
    return jnp.broadcast_to(
        jnp.arange(T)[None, None, :] <= qpos[None, :, None], (B, S, T)
    )


@pytest.mark.parametrize(
    "B,S,T,nq,nk,d",
    [
        (1, 16, 16, 4, 2, 16),   # GQA 2:1
        (2, 8, 32, 4, 4, 16),    # MHA, longer keys
        (1, 5, 23, 8, 2, 16),    # non-multiple-of-block sizes (padding path)
        (2, 1, 17, 4, 2, 16),    # decode shape
    ],
)
def test_flash_matches_xla(B, S, T, nq, nk, d):
    rng = np.random.default_rng(0)
    q, k, v = make_qkv(rng, B, S, T, nq, nk, d)
    mask = causal_mask(B, S, T)
    ref = attend_xla(q, k, v, mask)
    out = flash_attend(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_with_invalid_keys():
    # right-padded prompt: some cache slots are invalid for every query
    rng = np.random.default_rng(1)
    B, S, T, nq, nk, d = 2, 8, 24, 4, 2, 16
    q, k, v = make_qkv(rng, B, S, T, nq, nk, d)
    mask = causal_mask(B, S, T)
    valid = jnp.arange(T)[None, :] < jnp.asarray([20, 13])[:, None]
    mask = mask & valid[:, None, :]
    ref = attend_xla(q, k, v, mask)
    out = flash_attend(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_fully_masked_rows_are_finite():
    rng = np.random.default_rng(2)
    B, S, T, nq, nk, d = 1, 4, 16, 2, 2, 16
    q, k, v = make_qkv(rng, B, S, T, nq, nk, d)
    mask = jnp.zeros((B, S, T), bool).at[:, :2].set(True)  # rows 2,3 all-masked
    out = flash_attend(q, k, v, mask, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_transformer_pallas_impl_matches_xla(tiny_model):
    """End-to-end: whole talker forward with attn_impl=pallas == xla."""
    import dataclasses

    from leaxer_qwen3_tts_tpu.models.layers import transformer_forward_nocache

    cfg, params = tiny_model
    t_xla = cfg.talker.transformer
    t_pal = dataclasses.replace(t_xla, attn_impl="pallas")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 12, t_xla.hidden_size)) * 0.1, jnp.float32)
    h_xla = transformer_forward_nocache(t_xla, params["talker"]["transformer"], x)
    h_pal = transformer_forward_nocache(t_pal, params["talker"]["transformer"], x)
    np.testing.assert_allclose(
        np.asarray(h_pal), np.asarray(h_xla), atol=2e-4, rtol=2e-4
    )
