"""Streamed-trunk MTP chain (ops/fused_mtp_stream.py): interpret-mode
numerics on CPU.

The streamed chain runs the EXACT op sequence of the resident chain
(fused_mtp._chain_core) — same in-kernel sampler, same noise chain, same
f32 accumulation order — with the trunk units ring-DMA'd instead of
VMEM-resident.  DMA transport does not change values, so streamed ==
resident EXACTLY (sub-codes equal, sums bit-close); that transitively
inherits the resident chain's greedy-equals-per-step guarantee
(tests/test_fused_mtp.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.config import CodePredictorConfig, TransformerConfig
from leaxer_qwen3_tts_tpu.models.code_predictor import (
    init_code_predictor_params,
    predict_subcodes,
    predict_subcodes_resident,
    prepare_fused_step,
)
from leaxer_qwen3_tts_tpu.ops.fused_mtp_stream import (
    fused_mtp_chain_streamed,
    supports_stream,
)
from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams


@pytest.fixture(scope="module")
def stream_setup():
    # smallest fused-eligible dims (N_UNIT=1024): H=1024, A=2048 -> U=12
    # units/layer, L=2 -> 24-unit stream per chain position; n=3 gives 5
    # trunk positions, so the ring (4) wraps positions multiple times
    t = TransformerConfig(
        hidden_size=1024,
        num_layers=2,
        num_heads=8,
        num_kv_heads=4,
        head_dim=128,
        intermediate_size=3072,
        dtype="float32",
    )
    cfg = CodePredictorConfig(
        transformer=t, num_steps=3, subcode_vocab_size=256, max_seq_len=5,
        impl="fused",
    )
    params = init_code_predictor_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tables = jnp.asarray(
        rng.standard_normal(
            (cfg.num_steps, cfg.subcode_vocab_size, t.hidden_size)
        )
        * 0.02,
        jnp.float32,
    )
    lh = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((1, 1024)) * 0.02, jnp.float32)
    return cfg, params, tables, lh, c0


@pytest.mark.parametrize("bits", [8, 4])
def test_streamed_matches_resident(stream_setup, bits):
    cfg, params, tables, lh, c0 = stream_setup
    t = cfg.transformer
    n, V = cfg.num_steps, cfg.subcode_vocab_size
    p = prepare_fused_step(cfg, params, bits=bits)
    fw = p["fused_step"]
    assert supports_stream(fw, n, V)
    final_norm = params["transformer"]["final_norm"]
    heads = params["heads"]

    gkeys = jax.random.split(jax.random.PRNGKey(11), n)
    gumbel = jax.vmap(
        lambda kk: jax.random.gumbel(kk, (1, V), jnp.float32)
    )(gkeys)
    temp, top_k, top_p = jnp.float32(0.8), jnp.int32(50), jnp.float32(0.9)

    from leaxer_qwen3_tts_tpu.ops.fused_mtp import fused_mtp_chain

    subs_r, sum_r = fused_mtp_chain(
        t, fw, final_norm, heads, tables, lh, c0, gumbel,
        temp, top_k, top_p, interpret=True,
    )
    subs_s, sum_s = fused_mtp_chain_streamed(
        t, fw, final_norm, heads, tables, lh, c0, gumbel,
        temp, top_k, top_p, ring=4, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(subs_s), np.asarray(subs_r))
    np.testing.assert_allclose(
        np.asarray(sum_s), np.asarray(sum_r), atol=1e-6, rtol=1e-6
    )


def test_streamed_ring_depths_bit_identical(stream_setup):
    """Ring depth is transport-only: results identical at ring 2/3/6."""
    cfg, params, tables, lh, c0 = stream_setup
    t = cfg.transformer
    n, V = cfg.num_steps, cfg.subcode_vocab_size
    p = prepare_fused_step(cfg, params, bits=8)
    fw = p["fused_step"]
    final_norm = params["transformer"]["final_norm"]
    gkeys = jax.random.split(jax.random.PRNGKey(3), n)
    gumbel = jax.vmap(
        lambda kk: jax.random.gumbel(kk, (1, V), jnp.float32)
    )(gkeys)
    outs = []
    for ring in (2, 3, 6):
        subs, ssum = fused_mtp_chain_streamed(
            t, fw, final_norm, params["heads"], tables, lh, c0, gumbel,
            jnp.float32(1.1), jnp.int32(0), jnp.float32(1.0),
            ring=ring, interpret=True,
        )
        outs.append((np.asarray(subs), np.asarray(ssum)))
    for subs, ssum in outs[1:]:
        np.testing.assert_array_equal(subs, outs[0][0])
        np.testing.assert_array_equal(ssum, outs[0][1])


def test_predict_subcodes_routes_to_streamed(stream_setup, monkeypatch):
    """Product-path routing: when the trunk fails the residency gate (the
    1.7B case, simulated by forcing resident_pack -> None) and
    QTTS_MTP_STREAM=1, predict_subcodes runs the streamed chain — output
    identical to the resident-path result on the same key."""
    import leaxer_qwen3_tts_tpu.models.code_predictor as cp

    cfg, params, tables, lh, c0 = stream_setup
    cfg = dataclasses.replace(cfg, resident=True)
    p = prepare_fused_step(cfg, params, bits=8)
    key = jax.random.PRNGKey(21)
    sp = SamplingParams.create(temperature=0.8, top_k=50, top_p=0.9)

    # reference: the resident chain on the same key (identical noise chain)
    subs_r, sum_r = predict_subcodes_resident(
        cfg, p, tables, lh, c0, key, sp
    )

    monkeypatch.setenv("QTTS_MTP_STREAM", "1")
    monkeypatch.setattr(cp, "resident_pack", lambda params, batch: None)
    subs_s, sum_s = predict_subcodes(
        cfg, p, tables, lh, c0, key, sample_fn=None, sp=sp
    )
    np.testing.assert_array_equal(np.asarray(subs_s), np.asarray(subs_r))
    np.testing.assert_allclose(
        np.asarray(sum_s), np.asarray(sum_r), atol=1e-6, rtol=1e-6
    )


def test_resident_jit_options_covers_streamed_path(stream_setup, monkeypatch):
    """A jit whose program can ONLY embed the streamed chain (trunk too
    large for residency) must still get a raised scoped-vmem cap — the
    kernel's VMEM blocks exceed XLA's 16 MiB default (observed 25.22M on
    v5e).  Pin the routing: resident pack available -> resident cap; pack
    unavailable + stream enabled -> the (smaller) stream cap; stream
    disabled -> None."""
    import leaxer_qwen3_tts_tpu.models.code_predictor as cp_mod
    from leaxer_qwen3_tts_tpu.config import TTSModelConfig, TalkerConfig
    from leaxer_qwen3_tts_tpu.ops.fused_mtp import _SCOPED_VMEM_KIB
    from leaxer_qwen3_tts_tpu.ops.fused_mtp_stream import _STREAM_VMEM_KIB
    from leaxer_qwen3_tts_tpu.runtime.generate import resident_jit_options

    cfg, params, tables, lh, c0 = stream_setup
    cfg = dataclasses.replace(cfg, resident=True)
    p = prepare_fused_step(cfg, params, bits=8)
    model_cfg = TTSModelConfig(code_predictor=cfg, frame_fused=False)
    full_params = {"code_predictor": p}
    # both option helpers gate on the backend; pretend we're on TPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # trunk resident (the tiny fixture passes the gate) -> resident cap
    opts = resident_jit_options(model_cfg, batch=1, params=full_params)
    assert opts == {"xla_tpu_scoped_vmem_limit_kib": str(_SCOPED_VMEM_KIB)}

    # residency fails (1.7B case) + stream enabled -> stream cap
    monkeypatch.setattr(cp_mod, "resident_pack", lambda params, batch: None)
    monkeypatch.setenv("QTTS_MTP_STREAM", "1")
    opts = resident_jit_options(model_cfg, batch=1, params=full_params)
    assert opts == {"xla_tpu_scoped_vmem_limit_kib": str(_STREAM_VMEM_KIB)}
    assert _STREAM_VMEM_KIB < _SCOPED_VMEM_KIB

    # stream disabled -> no cap (the raised cap perturbs XLA elsewhere)
    monkeypatch.setenv("QTTS_MTP_STREAM", "0")
    assert resident_jit_options(model_cfg, batch=1, params=full_params) is None

    # batched programs never embed the (B=1-only) streamed chain
    monkeypatch.setenv("QTTS_MTP_STREAM", "1")
    assert resident_jit_options(model_cfg, batch=8, params=full_params) is None
