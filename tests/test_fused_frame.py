"""Whole-frame fused kernel (ops/fused_frame.py): interpret-mode exactness
vs a twin composed of the already-verified pieces (in-kernel sampler,
resident chain, manual talker step), plus generate-loop integration and
the eligibility gates."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.config import (
    CodePredictorConfig,
    TalkerConfig,
    TransformerConfig,
    TTSModelConfig,
)
from leaxer_qwen3_tts_tpu.models.code_predictor import (
    init_code_predictor_params,
    prepare_fused_step,
)
from leaxer_qwen3_tts_tpu.models.layers import rms_norm
from leaxer_qwen3_tts_tpu.models.talker import (
    init_talker_params,
    prepare_fused_talker,
)
from leaxer_qwen3_tts_tpu.ops.fused_frame import (
    fused_frame_step,
    supports_frame,
)
from leaxer_qwen3_tts_tpu.ops.fused_mtp import (
    fused_mtp_chain,
    gumbel_topk_topp_sample,
)
from leaxer_qwen3_tts_tpu.ops.fused_step import fused_decode_step
from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params
from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams


@pytest.fixture(scope="module")
def frame_setup():
    # 2 talker layers: exercises the grid walk + the persistence of the
    # prologue-written outputs across grid steps
    tt = TransformerConfig(
        hidden_size=1024, num_layers=2, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=1024, dtype="float32",
    )
    mt = TransformerConfig(
        hidden_size=1024, num_layers=2, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=1024, dtype="float32",
    )
    tcfg = TalkerConfig(transformer=tt, codec_vocab_size=256,
                        text_vocab_size=152000, decode_impl="fused")
    mcfg = CodePredictorConfig(
        transformer=mt, num_steps=4, subcode_vocab_size=256, max_seq_len=6,
        impl="fused",
    )
    tparams = init_talker_params(tcfg, jax.random.PRNGKey(0))
    tq = quantize_params(fuse_params({"talker": tparams}))["talker"]
    tq = prepare_fused_talker(tcfg, tq)
    mparams = init_code_predictor_params(mcfg, jax.random.PRNGKey(1))
    mq = quantize_params(fuse_params({"code_predictor": mparams}))[
        "code_predictor"
    ]
    mq = prepare_fused_step(mcfg, mq)
    rng = np.random.default_rng(0)
    codec = jnp.asarray(
        rng.standard_normal((256, 1024)) * 0.02, jnp.float32
    )
    tables = jnp.asarray(
        rng.standard_normal((mcfg.num_steps, 256, 1024)) * 0.02, jnp.float32
    )
    return tcfg, mcfg, tq, mq, codec, tables


def _noise(key, Vc, n, V):
    k0, kp = jax.random.split(key)
    g0 = jax.random.gumbel(k0, (1, Vc), jnp.float32)
    gk = jax.random.split(kp, n)
    gm = jax.vmap(lambda kk: jax.random.gumbel(kk, (1, V), jnp.float32))(gk)
    return g0, gm


def _twin(tcfg, mcfg, tq, mq, codec, tables, ll, lh, sup, drip, pos,
          kc, vc, g0, gm, temp, top_k, top_p, ks=None, vs=None):
    """The same frame composed from the individually-verified pieces."""
    Vc = ll.shape[-1]
    logits0 = ll + sup[None, :]
    c0 = int(gumbel_topk_topp_sample(logits0, g0, temp, top_k, top_p)[0])
    c0e = codec[c0][None, :].astype(jnp.float32)
    subs, ssum = fused_mtp_chain(
        mcfg.transformer, mq["fused_step"],
        mq["transformer"]["final_norm"], mq["heads"], tables,
        lh, c0e, gm, temp, top_k, top_p, interpret=True,
    )
    x = c0e + ssum + drip
    outs = fused_decode_step(
        tcfg.transformer, tq["fused_step"], x, jnp.int32(pos), kc, vc,
        ks, vs, interpret=True,
    )
    x_out = outs[0]
    hid = rms_norm(x_out, tq["transformer"]["final_norm"],
                   tcfg.transformer.rms_norm_eps)
    lm = tq["lm_head"]
    if hasattr(lm, "q"):  # QuantizedLinear
        lw, lsc = lm.q, lm.scale.reshape(1, Vc)
    else:  # raw head (quantize=None config)
        lw, lsc = lm, jnp.ones((1, Vc), jnp.float32)
    logits = (
        jnp.dot(hid.astype(jnp.bfloat16), lw.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        * lsc
    )
    return c0, subs, logits, hid, outs[1:]


def test_frame_kernel_matches_composed_twin(frame_setup):
    tcfg, mcfg, tq, mq, codec, tables = frame_setup
    L, nk, d = 2, 4, 128
    T = 64
    n, V, Vc = mcfg.num_steps, mcfg.subcode_vocab_size, 256
    rng = np.random.default_rng(3)
    ll = jnp.asarray(rng.standard_normal((1, Vc)) * 2.0, jnp.float32)
    lh = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)
    sup = jnp.asarray(rng.standard_normal(Vc) * 0.1, jnp.float32)
    drip = jnp.asarray(rng.standard_normal((1, 1024)) * 0.02, jnp.float32)
    kc = jnp.zeros((L, 1, nk, T, d), jnp.float32)
    vc = jnp.zeros((L, 1, nk, T, d), jnp.float32)
    g0, gm = _noise(jax.random.PRNGKey(7), Vc, n, V)
    temp, top_k, top_p = jnp.float32(0.8), jnp.int32(50), jnp.float32(0.9)
    pos = 7

    code0, subs, logits, hid, kc_o, vc_o = fused_frame_step(
        tcfg.transformer, mcfg.transformer, tq["fused_step"],
        tq["transformer"]["final_norm"], tq["lm_head"], codec,
        mq["fused_step"], mq["transformer"]["final_norm"], mq["heads"],
        tables, ll, lh, sup, drip, jnp.int32(pos), kc, vc, g0, gm,
        temp, top_k, top_p, jnp.bool_(True), interpret=True,
    )
    c0_t, subs_t, logits_t, hid_t, caches_t = _twin(
        tcfg, mcfg, tq, mq, codec, tables, ll, lh, sup, drip, pos,
        kc, vc, g0, gm, temp, top_k, top_p,
    )
    assert int(code0[0]) == c0_t
    np.testing.assert_array_equal(np.asarray(subs), np.asarray(subs_t))
    np.testing.assert_allclose(
        np.asarray(hid), np.asarray(hid_t), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_t), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(kc_o), np.asarray(caches_t[0]), atol=5e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(vc_o), np.asarray(caches_t[1]), atol=5e-5, rtol=1e-5
    )


def test_frame_kernel_kvq_matches_composed_twin(frame_setup):
    """int8 talker KV through the frame kernel == the composed twin."""
    tcfg, mcfg, tq, mq, codec, tables = frame_setup
    L, nk, d = 2, 4, 128
    T = 128  # kvq needs 128-aligned buckets
    n, V, Vc = mcfg.num_steps, mcfg.subcode_vocab_size, 256
    rng = np.random.default_rng(4)
    ll = jnp.asarray(rng.standard_normal((1, Vc)) * 2.0, jnp.float32)
    lh = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)
    sup = jnp.zeros(Vc, jnp.float32)
    drip = jnp.asarray(rng.standard_normal((1, 1024)) * 0.02, jnp.float32)
    kc = jnp.zeros((L, 1, nk, T, d), jnp.int8)
    vc = jnp.zeros((L, 1, nk, T, d), jnp.int8)
    ks = jnp.ones((L, 1, nk, T), jnp.float32)
    vs = jnp.ones((L, 1, nk, T), jnp.float32)
    g0, gm = _noise(jax.random.PRNGKey(9), Vc, n, V)
    temp, top_k, top_p = jnp.float32(0.7), jnp.int32(40), jnp.float32(0.95)
    pos = 3

    outs = fused_frame_step(
        tcfg.transformer, mcfg.transformer, tq["fused_step"],
        tq["transformer"]["final_norm"], tq["lm_head"], codec,
        mq["fused_step"], mq["transformer"]["final_norm"], mq["heads"],
        tables, ll, lh, sup, drip, jnp.int32(pos), kc, vc, g0, gm,
        temp, top_k, top_p, jnp.bool_(False), k_scale=ks, v_scale=vs,
        interpret=True,
    )
    code0, subs, logits, hid = outs[:4]
    c0_t, subs_t, logits_t, hid_t, caches_t = _twin(
        tcfg, mcfg, tq, mq, codec, tables, ll, lh, sup, drip, pos,
        kc, vc, g0, gm, temp, top_k, top_p, ks=ks, vs=vs,
    )
    assert int(code0[0]) == c0_t
    np.testing.assert_array_equal(np.asarray(subs), np.asarray(subs_t))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_t), atol=1e-4, rtol=1e-4
    )
    for got, want in zip(outs[4:], caches_t):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-5
        )


def _loop_cfg_params():
    cfg0 = TTSModelConfig()
    tt = dataclasses.replace(
        cfg0.talker.transformer, num_layers=1, hidden_size=1024,
        intermediate_size=1024, dtype="float32",
    )
    mt = dataclasses.replace(
        cfg0.code_predictor.transformer, num_layers=1, hidden_size=1024,
        intermediate_size=1024, dtype="float32",
    )
    cfg = dataclasses.replace(
        cfg0,
        talker=dataclasses.replace(cfg0.talker, transformer=tt,
                                   decode_impl="fused"),
        code_predictor=dataclasses.replace(
            cfg0.code_predictor, transformer=mt, num_steps=4, max_seq_len=6,
            impl="fused", resident=True,
        ),
    )
    from leaxer_qwen3_tts_tpu.runtime.weights import init_params

    params = init_params(cfg, jax.random.PRNGKey(0))
    params = quantize_params(fuse_params(params))
    params["talker"] = prepare_fused_talker(cfg.talker, params["talker"])
    params["code_predictor"] = prepare_fused_step(
        cfg.code_predictor, params["code_predictor"]
    )
    return cfg, params


def test_frame_fused_generate_loop_deterministic_and_agrees():
    """The whole-frame kernel drives the REAL decode loop (inside the jitted
    lax.scan): per-seed deterministic, and greedy codes agree with the
    multi-dispatch resident path (identical argmaxes up to the documented
    bf16-lhs lm_head difference)."""
    from leaxer_qwen3_tts_tpu.runtime.generate import make_generate_fns

    cfg, params = _loop_cfg_params()
    cfg_on = dataclasses.replace(cfg, frame_fused=True)
    cfg_off = dataclasses.replace(cfg, frame_fused=False)
    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)
    sp_s = SamplingParams.create(
        temperature=0.8, top_k=50, top_p=0.95, forbid_eos=True
    )
    sp_g = SamplingParams.create(temperature=0.0, forbid_eos=True)

    outs = []
    fns_on = make_generate_fns(cfg_on, batch=1, max_len=96, chunk_len=2)
    for _ in range(2):
        st, bd = fns_on.prefill(params, ids, lens, jax.random.PRNGKey(1))
        st, fr, vd = fns_on.decode(
            params, st, bd.trailing, bd.trailing_len, bd.tts_pad_embed, sp_s
        )
        outs.append(np.asarray(fr))
        assert np.asarray(vd).all()
    np.testing.assert_array_equal(outs[0], outs[1])

    # different seed -> different sampled frames
    st, bd = fns_on.prefill(params, ids, lens, jax.random.PRNGKey(2))
    st, fr2, _ = fns_on.decode(
        params, st, bd.trailing, bd.trailing_len, bd.tts_pad_embed, sp_s
    )
    assert not np.array_equal(outs[0], np.asarray(fr2))

    # greedy agreement vs the multi-dispatch path
    fns_off = make_generate_fns(cfg_off, batch=1, max_len=96, chunk_len=2)
    st, bd = fns_on.prefill(params, ids, lens, jax.random.PRNGKey(1))
    st, fr_on, _ = fns_on.decode(
        params, st, bd.trailing, bd.trailing_len, bd.tts_pad_embed, sp_g
    )
    st, bd = fns_off.prefill(params, ids, lens, jax.random.PRNGKey(1))
    st, fr_off, _ = fns_off.decode(
        params, st, bd.trailing, bd.trailing_len, bd.tts_pad_embed, sp_g
    )
    agree = float((np.asarray(fr_on) == np.asarray(fr_off)).mean())
    assert agree >= 0.75, (fr_on, fr_off)


def test_frame_fused_gates(monkeypatch):
    """Config pin beats env; default env is OFF; spec engines refuse it."""
    import leaxer_qwen3_tts_tpu.ops.fused_frame as ff
    from leaxer_qwen3_tts_tpu.runtime.generate import make_generate_fns

    cfg, params = _loop_cfg_params()
    calls = []
    real = ff.fused_frame_step
    monkeypatch.setattr(
        ff, "fused_frame_step",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1],
    )
    ids = jnp.asarray([[5, 6]], jnp.int32)
    lens = jnp.asarray([2], jnp.int32)
    sp = SamplingParams.create(temperature=0.0, forbid_eos=True)

    # default (env unset) -> off
    monkeypatch.delenv("QTTS_FRAME_FUSED", raising=False)
    fns = make_generate_fns(cfg, batch=1, max_len=96, chunk_len=1)
    st, bd = fns.prefill(params, ids, lens, jax.random.PRNGKey(0))
    fns.decode(params, st, bd.trailing, bd.trailing_len, bd.tts_pad_embed, sp)
    assert not calls

    # env on -> fused
    monkeypatch.setenv("QTTS_FRAME_FUSED", "1")
    fns = make_generate_fns(cfg, batch=1, max_len=96, chunk_len=1)
    st, bd = fns.prefill(params, ids, lens, jax.random.PRNGKey(0))
    fns.decode(params, st, bd.trailing, bd.trailing_len, bd.tts_pad_embed, sp)
    assert calls

    # config pin off beats env on
    calls.clear()
    cfg_off = dataclasses.replace(cfg, frame_fused=False)
    fns = make_generate_fns(cfg_off, batch=1, max_len=96, chunk_len=1)
    st, bd = fns.prefill(params, ids, lens, jax.random.PRNGKey(0))
    fns.decode(params, st, bd.trailing, bd.trailing_len, bd.tts_pad_embed, sp)
    assert not calls
    monkeypatch.delenv("QTTS_FRAME_FUSED")

    # engine: frame_fused + spec_k is an error
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine

    eng = TTSEngine(config=cfg, params=params, frame_fused=True, spec_k=4)
    assert not eng.is_ready()
    assert "sequential-only" in eng.get_error()


def test_supports_frame_gates(frame_setup):
    tcfg, mcfg, tq, mq, codec, tables = frame_setup
    mfw = mq["fused_step"]
    assert supports_frame(mfw, 512, tcfg.transformer, kvq=False)
    assert supports_frame(mfw, 1024, tcfg.transformer, kvq=False)  # win
    assert not supports_frame(mfw, 1000, tcfg.transformer, kvq=False)
    assert not supports_frame(mfw, 96, tcfg.transformer, kvq=True)
    assert supports_frame(mfw, 128, tcfg.transformer, kvq=True)
    bf = mfw._replace(units=mfw.units.astype(jnp.bfloat16))
    assert not supports_frame(bf, 512, tcfg.transformer, kvq=False)


def test_frame_kernel_bf16_talker_int8_mtp(frame_setup):
    """The quality-exact mixed config through the frame kernel: bf16
    (bits=16) talker units + int8 MTP trunk — the engine's
    quantize=None + mtp_quantize=int8 pairing (only the 15-step MTP
    trunk is quantized; the talker stays full-precision)."""
    from leaxer_qwen3_tts_tpu.models.talker import init_talker_params
    from leaxer_qwen3_tts_tpu.ops.fused_step import pack_fused_weights

    tcfg, mcfg, _, mq, codec, tables = frame_setup
    raw = init_talker_params(tcfg, jax.random.PRNGKey(5))
    tfw16 = pack_fused_weights(
        tcfg.transformer, raw["transformer"]["layers"], bits=16
    )
    assert tfw16.units.dtype == jnp.bfloat16
    lm16 = raw["lm_head"]  # raw bf16/f32 head (no quantization)
    tq16 = {
        "fused_step": tfw16,
        "transformer": {"final_norm": raw["transformer"]["final_norm"]},
        "lm_head": lm16,
    }

    L, nk, d = 2, 4, 128
    T = 64
    n, V, Vc = mcfg.num_steps, mcfg.subcode_vocab_size, 256
    rng = np.random.default_rng(8)
    ll = jnp.asarray(rng.standard_normal((1, Vc)) * 2.0, jnp.float32)
    lh = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)
    sup = jnp.zeros(Vc, jnp.float32)
    drip = jnp.asarray(rng.standard_normal((1, 1024)) * 0.02, jnp.float32)
    kc = jnp.zeros((L, 1, nk, T, d), jnp.float32)
    vc = jnp.zeros((L, 1, nk, T, d), jnp.float32)
    g0, gm = _noise(jax.random.PRNGKey(11), Vc, n, V)
    temp, top_k, top_p = jnp.float32(0.7), jnp.int32(40), jnp.float32(0.9)

    code0, subs, logits, hid, kc_o, vc_o = fused_frame_step(
        tcfg.transformer, mcfg.transformer, tfw16,
        raw["transformer"]["final_norm"], lm16, codec,
        mq["fused_step"], mq["transformer"]["final_norm"], mq["heads"],
        tables, ll, lh, sup, drip, jnp.int32(5), kc, vc, g0, gm,
        temp, top_k, top_p, jnp.bool_(False), interpret=True,
    )
    c0_t, subs_t, logits_t, hid_t, caches_t = _twin(
        tcfg, mcfg, {"fused_step": tfw16,
                     "transformer": {"final_norm":
                                     raw["transformer"]["final_norm"]},
                     "lm_head": lm16},
        mq, codec, tables, ll, lh, sup, drip, 5,
        kc, vc, g0, gm, temp, top_k, top_p,
    )
    assert int(code0[0]) == c0_t
    np.testing.assert_array_equal(np.asarray(subs), np.asarray(subs_t))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_t), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("kvq", [False, True])
def test_frame_kernel_win_mode_matches_twin(frame_setup, kvq, monkeypatch):
    """Long-form (T > 512, win mode) whole-frame kernel == the composed
    twin (the manual win talker step is parity-pinned vs the auto win
    pipeline separately in test_fused_step)."""
    tcfg, mcfg, tq, mq, codec, tables = frame_setup
    L, nk, d = 2, 4, 128
    T = 1024
    n, V, Vc = mcfg.num_steps, mcfg.subcode_vocab_size, 256
    rng = np.random.default_rng(31)
    ll = jnp.asarray(rng.standard_normal((1, Vc)) * 2.0, jnp.float32)
    lh = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)
    sup = jnp.zeros(Vc, jnp.float32)
    drip = jnp.asarray(rng.standard_normal((1, 1024)) * 0.02, jnp.float32)
    pos = 700  # past the first window
    if kvq:
        kc = jnp.zeros((L, 1, nk, T, d), jnp.int8)
        vc = jnp.zeros((L, 1, nk, T, d), jnp.int8)
        ks = jnp.ones((L, 1, nk, T), jnp.float32)
        vs = jnp.ones((L, 1, nk, T), jnp.float32)
        extra = dict(k_scale=ks, v_scale=vs)
        twin_extra = dict(ks=ks, vs=vs)
    else:
        kc = jnp.zeros((L, 1, nk, T, d), jnp.float32)
        vc = jnp.zeros((L, 1, nk, T, d), jnp.float32)
        extra, twin_extra = {}, {}
    g0, gm = _noise(jax.random.PRNGKey(13), Vc, n, V)
    temp, top_k, top_p = jnp.float32(0.8), jnp.int32(50), jnp.float32(0.9)

    # the twin's fused_decode_step must take the SAME (manual win) path
    monkeypatch.setenv("QTTS_FUSED_WIN_MANUAL", "1")
    outs = fused_frame_step(
        tcfg.transformer, mcfg.transformer, tq["fused_step"],
        tq["transformer"]["final_norm"], tq["lm_head"], codec,
        mq["fused_step"], mq["transformer"]["final_norm"], mq["heads"],
        tables, ll, lh, sup, drip, jnp.int32(pos), kc, vc, g0, gm,
        temp, top_k, top_p, jnp.bool_(True), interpret=True, **extra,
    )
    code0, subs, logits, hid = outs[:4]
    c0_t, subs_t, logits_t, hid_t, caches_t = _twin(
        tcfg, mcfg, tq, mq, codec, tables, ll, lh, sup, drip, pos,
        kc, vc, g0, gm, temp, top_k, top_p, **twin_extra,
    )
    monkeypatch.delenv("QTTS_FUSED_WIN_MANUAL")
    assert int(code0[0]) == c0_t
    np.testing.assert_array_equal(np.asarray(subs), np.asarray(subs_t))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_t), atol=1e-4, rtol=1e-4
    )
    for got, want in zip(outs[4:], caches_t):
        # K rows carry rope(rms(x)) — f32 low-bit divergence in the chain
        # sum amplifies to ~1e-4 absolute here
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-4
        )
