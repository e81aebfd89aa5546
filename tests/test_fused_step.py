"""Fused decode-step Pallas kernel: interpret-mode parity vs the cached path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.config import CodePredictorConfig, TransformerConfig
from leaxer_qwen3_tts_tpu.models.code_predictor import (
    init_code_predictor_params,
    predict_subcodes,
    prepare_fused_step,
)
from leaxer_qwen3_tts_tpu.ops.fused_step import supports
from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams, sample_token


@pytest.fixture(scope="module")
def fused_cfg_params():
    # smallest architecture the kernel supports: H == 1024
    t = TransformerConfig(
        hidden_size=1024,
        num_layers=1,
        num_heads=8,
        num_kv_heads=4,
        head_dim=128,
        intermediate_size=3072,
        dtype="float32",
    )
    cfg = CodePredictorConfig(
        transformer=t, num_steps=3, subcode_vocab_size=256, max_seq_len=5
    )
    assert supports(t)
    params = init_code_predictor_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tables = jnp.asarray(
        rng.standard_normal((cfg.num_steps, cfg.subcode_vocab_size, 1024)) * 0.02,
        jnp.float32,
    )
    return cfg, params, tables


def test_fused_talker_step_matches_xla():
    """talker_decode_step with decode_impl='fused' == the XLA path, given the
    same int8 weights (interpret mode)."""
    from leaxer_qwen3_tts_tpu.config import TalkerConfig
    from leaxer_qwen3_tts_tpu.models.talker import (
        init_talker_params,
        prepare_fused_talker,
        talker_decode_step,
        talker_init_cache,
    )
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params

    t = TransformerConfig(
        hidden_size=1024, num_layers=1, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=3072, dtype="float32",
    )
    cfg_xla = TalkerConfig(transformer=t, codec_vocab_size=256,
                           text_vocab_size=152000, decode_impl="xla")
    cfg_fused = dataclasses.replace(cfg_xla, decode_impl="fused")

    params = init_talker_params(cfg_xla, jax.random.PRNGKey(0))
    qparams = quantize_params(fuse_params({"talker": params}))["talker"]
    fparams = prepare_fused_talker(cfg_fused, qparams)

    rng = np.random.default_rng(0)
    embed = jnp.asarray(rng.standard_normal((1, 1024)) * 0.3, jnp.float32)
    pos = jnp.asarray([3], jnp.int32)
    cache = talker_init_cache(cfg_xla, 1, 16)
    cache = cache._replace(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.2, jnp.float32),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.2, jnp.float32),
        length=jnp.full((1,), 3, jnp.int32),
    )
    valid = jnp.asarray(np.arange(16)[None, :] < 3)

    lg_x, h_x, c_x, v_x = talker_decode_step(cfg_xla, qparams, embed, pos, cache, valid)
    lg_f, h_f, c_f, v_f = talker_decode_step(cfg_fused, fparams, embed, pos, cache, valid)

    np.testing.assert_array_equal(np.asarray(v_x), np.asarray(v_f))
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_x), atol=0.03, rtol=0.03)
    corr = np.corrcoef(np.asarray(lg_x).ravel(), np.asarray(lg_f).ravel())[0, 1]
    assert corr > 0.999, corr
    np.testing.assert_allclose(
        np.asarray(c_f.k), np.asarray(c_x.k), atol=0.02
    )


def test_hbm_cache_variant_matches_vmem(fused_cfg_params):
    """T > 512 switches to the DMA/HBM-cache variant; same math as the VMEM
    variant on the shared slot range."""
    from leaxer_qwen3_tts_tpu.models.layers import init_transformer_params
    from leaxer_qwen3_tts_tpu.ops.fused_step import (
        fused_decode_step,
        pack_fused_weights,
    )

    t = TransformerConfig(
        hidden_size=1024, num_layers=2, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=3072, dtype="float32",
    )
    params = init_transformer_params(t, jax.random.PRNGKey(0))
    fw = pack_fused_weights(t, params["layers"])

    rng = np.random.default_rng(5)
    L, nk, d = 2, 4, 128
    x = jnp.asarray(rng.standard_normal((1, 1024)) * 0.3, jnp.float32)
    pos = jnp.asarray(17, jnp.int32)  # NOT 8-aligned: exercises the window RMW

    # small cache (VMEM variant) as the reference
    T_small = 512
    kc = jnp.asarray(rng.standard_normal((L, 1, nk, T_small, d)) * 0.2, jnp.float32)
    vc = jnp.asarray(rng.standard_normal((L, 1, nk, T_small, d)) * 0.2, jnp.float32)
    x_ref, kr, vr = fused_decode_step(t, fw, x, pos, kc, vc, interpret=True)

    # same prefix content in a 520-slot cache -> HBM variant
    T_big = 520
    pad = ((0, 0), (0, 0), (0, 0), (0, T_big - T_small), (0, 0))
    kc_b = jnp.pad(kc, pad)
    vc_b = jnp.pad(vc, pad)
    x_big, kb, vb = fused_decode_step(t, fw, x, pos, kc_b, vc_b, interpret=True)

    # NOTE: attention masks slot <= pos, so identical prefixes give identical
    # outputs up to bf16-matmul ulp flips seeded by reduction-order noise
    # across the two shapes (values ~1 -> bf16 ulp ~8e-3)
    np.testing.assert_allclose(np.asarray(x_big), np.asarray(x_ref), atol=2e-2)
    corr = np.corrcoef(np.asarray(x_big).ravel(), np.asarray(x_ref).ravel())[0, 1]
    assert corr > 0.99999, corr
    np.testing.assert_allclose(
        np.asarray(kb[:, :, :, :T_small]), np.asarray(kr), atol=1e-5
    )
    # the written slot landed in the right place
    assert not np.allclose(np.asarray(kb[0, 0, :, 17]), np.asarray(kc_b[0, 0, :, 17]))
    np.testing.assert_array_equal(
        np.asarray(kb[0, 0, :, 18]), np.asarray(kc_b[0, 0, :, 18])
    )


def test_supports_gate():
    small = TransformerConfig(hidden_size=64, num_heads=4, num_kv_heads=2, head_dim=16)
    assert not supports(small)
    h2048 = TransformerConfig(
        hidden_size=2048, num_heads=16, num_kv_heads=8, head_dim=128,
        intermediate_size=6144,
    )
    assert supports(h2048)  # the 1.7B talker shape


def test_fused_step_h2048_matches_reference():
    """1.7B-shaped layer (H=2048: dual-offset K-split units) vs jnp math."""
    from leaxer_qwen3_tts_tpu.models.layers import init_transformer_params
    from leaxer_qwen3_tts_tpu.ops.fused_step import (
        fused_decode_step,
        pack_fused_weights,
    )

    t = TransformerConfig(
        hidden_size=2048, num_layers=1, num_heads=16, num_kv_heads=8,
        head_dim=128, intermediate_size=6144, dtype="float32",
    )
    params = init_transformer_params(t, jax.random.PRNGKey(0))
    fw = pack_fused_weights(t, params["layers"])
    assert fw.units.shape == (1, 4 + 2 + 12 + 6, 2048, 1024)

    rng = np.random.default_rng(0)
    T, nk, d = 9, 8, 128
    x = jnp.asarray(rng.standard_normal((1, 2048)) * 0.3, jnp.float32)
    kc = jnp.asarray(rng.standard_normal((1, 1, nk, T, d)) * 0.2, jnp.float32)
    vc = jnp.asarray(rng.standard_normal((1, 1, nk, T, d)) * 0.2, jnp.float32)
    pos = jnp.asarray(4, jnp.int32)
    x_out, kc2, vc2 = fused_decode_step(t, fw, x, pos, kc, vc, interpret=True)

    # reference with the same dequantized units
    def deq(u):
        return fw.units[0, u].astype(jnp.float32) * fw.scales[0, u]

    def rms(v, w, eps=t.rms_norm_eps):
        return v * jax.lax.rsqrt(jnp.mean(v * v, -1, keepdims=True) + eps) * w

    def rope(v):
        half = d // 2
        freqs = 1.0 / (t.rope_theta ** (jnp.arange(half) / half))
        a = pos.astype(jnp.float32) * freqs
        c, s = jnp.cos(a)[None, :], jnp.sin(a)[None, :]
        v1, v2 = v[:, :half], v[:, half:]
        return jnp.concatenate([v1 * c - v2 * s, v2 * c + v1 * s], -1)

    H, qd, kvd, I = 2048, 2048, 1024, 6144
    nn = H // 1024
    h = rms(x, fw.attn_norm[0])
    qkv = jnp.concatenate([h @ deq(u) for u in range(4)], -1)[0]
    q = rope(rms(qkv[:qd].reshape(16, d), fw.q_norm[0, 0]))
    k = rope(rms(qkv[qd : qd + kvd].reshape(nk, d), fw.k_norm[0, 0]))
    v = qkv[qd + kvd :].reshape(nk, d)
    K = jnp.asarray(np.asarray(kc[0, 0]))
    V = jnp.asarray(np.asarray(vc[0, 0]))
    K = K.at[:, 4, :].set(k)
    V = V.at[:, 4, :].set(v)
    qg = q.reshape(nk, 2, d)
    sc = jnp.einsum("ngd,ntd->ngt", qg, K) / (d**0.5)
    sc = jnp.where(jnp.arange(T)[None, None, :] <= 4, sc, -1e30)
    out = jnp.einsum("ngt,ntd->ngd", jax.nn.softmax(sc, -1), V).reshape(1, qd)
    xr = x.copy()
    for i_ks in range(2):  # wo: k-major x n-minor over [H, N_UNIT] tiles
        k_off, n_off = (i_ks // nn) * H, (i_ks % nn) * 1024
        xr = xr.at[:, n_off : n_off + 1024].add(
            out[:, k_off : k_off + H] @ deq(4 + i_ks)
        )
    h2 = rms(xr, fw.mlp_norm[0])
    gu = jnp.concatenate([h2 @ deq(6 + u) for u in range(12)], -1)
    act = jax.nn.silu(gu[:, :I]) * gu[:, I:]
    for i_ks in range(6):
        k_off, n_off = (i_ks // nn) * H, (i_ks % nn) * 1024
        xr = xr.at[:, n_off : n_off + 1024].add(
            act[:, k_off : k_off + H] @ deq(18 + i_ks)
        )
    rel = float(jnp.abs(x_out - xr).max() / jnp.abs(xr).max())
    assert rel < 2e-2, rel
    np.testing.assert_allclose(np.asarray(kc2[0, 0, :, 4]), np.asarray(k), atol=2e-2)


def test_fused_matches_cached(fused_cfg_params):
    cfg, params, tables = fused_cfg_params
    rng = np.random.default_rng(1)
    hidden = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)
    c0e = jnp.asarray(rng.standard_normal((1, 1024)) * 0.02, jnp.float32)
    sp = SamplingParams.create(temperature=0.0)
    sample_fn = lambda k, lg: sample_token(k, lg, sp)
    key = jax.random.PRNGKey(0)

    # same int8 weights on both paths: differences are bf16 rounding only
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params

    qparams = quantize_params(fuse_params({"code_predictor": params}))[
        "code_predictor"
    ]

    cached = dataclasses.replace(cfg, impl="cached")
    subs_c, sum_c = predict_subcodes(
        cached, qparams, tables, hidden, c0e, key, sample_fn
    )

    fused_params = prepare_fused_step(cfg, qparams)
    assert "fused_step" in fused_params
    fused = dataclasses.replace(cfg, impl="fused")
    subs_f, sum_f = predict_subcodes(
        fused, fused_params, tables, hidden, c0e, key, sample_fn
    )

    agree = float((np.asarray(subs_c) == np.asarray(subs_f)).mean())
    assert agree >= 2 / 3, (subs_c, subs_f)
    np.testing.assert_allclose(
        np.asarray(sum_f), np.asarray(sum_c), atol=0.05, rtol=0.05
    )


def test_windowed_variant_matches_hbm(fused_cfg_params):
    """The online-softmax windowed variant (T > 1024 / batched-serving path)
    == the whole-cache HBM variant on a shared T=1024 cache, including a pos
    that spans two windows plus the in-register diagonal term."""
    from leaxer_qwen3_tts_tpu.models.layers import init_transformer_params
    from leaxer_qwen3_tts_tpu.ops.fused_step import (
        fused_decode_step,
        pack_fused_weights,
    )

    t = TransformerConfig(
        hidden_size=1024, num_layers=2, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=3072, dtype="float32",
    )
    params = init_transformer_params(t, jax.random.PRNGKey(0))
    fw = pack_fused_weights(t, params["layers"])

    rng = np.random.default_rng(7)
    L, nk, d, T = 2, 4, 128, 1024
    x = jnp.asarray(rng.standard_normal((1, 1024)) * 0.3, jnp.float32)
    kc = jnp.asarray(rng.standard_normal((L, 1, nk, T, d)) * 0.2, jnp.float32)
    vc = jnp.asarray(rng.standard_normal((L, 1, nk, T, d)) * 0.2, jnp.float32)

    for pos_val in (0, 511, 700):  # no window / window edge / two windows
        pos = jnp.asarray(pos_val, jnp.int32)
        x_h, kh, vh = fused_decode_step(
            t, fw, x, pos, kc, vc, interpret=True, mode="hbm"
        )
        x_w, kw, vw = fused_decode_step(
            t, fw, x, pos, kc, vc, interpret=True, mode="win"
        )
        np.testing.assert_allclose(
            np.asarray(x_w), np.asarray(x_h), atol=2e-2, err_msg=f"pos={pos_val}"
        )
        corr = np.corrcoef(np.asarray(x_w).ravel(), np.asarray(x_h).ravel())[0, 1]
        assert corr > 0.99999, (pos_val, corr)
        # untouched slots are preserved bit-exactly; the written slot in
        # layers > 0 carries the modes' bf16 reduction-order noise (its k/v
        # derive from the previous layer's attention output)
        kw_n, kh_n = np.asarray(kw), np.asarray(kh)
        mask = np.ones(T, bool)
        mask[pos_val] = False
        np.testing.assert_array_equal(kw_n[:, :, :, mask], kh_n[:, :, :, mask])
        np.testing.assert_allclose(
            kw_n[:, :, :, pos_val], kh_n[:, :, :, pos_val], atol=2e-2
        )
        np.testing.assert_allclose(np.asarray(vw), np.asarray(vh), atol=2e-2)


def test_windowed_rejects_misaligned_bucket(fused_cfg_params):
    from leaxer_qwen3_tts_tpu.models.layers import init_transformer_params
    from leaxer_qwen3_tts_tpu.ops.fused_step import (
        fused_decode_step,
        pack_fused_weights,
    )

    t = TransformerConfig(
        hidden_size=1024, num_layers=1, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=3072, dtype="float32",
    )
    params = init_transformer_params(t, jax.random.PRNGKey(0))
    fw = pack_fused_weights(t, params["layers"])
    kc = jnp.zeros((1, 1, 4, 520, 128), jnp.float32)
    with pytest.raises(ValueError, match="multiple of"):
        fused_decode_step(
            t, fw, jnp.zeros((1, 1024)), jnp.asarray(3, jnp.int32), kc, kc,
            interpret=True, mode="win",
        )


def test_batched_fused_matches_single_rows():
    """Batched fused step (per-stream positions) row b == the B=1 kernel run
    on that stream's cache row at its own position — both the small-cache
    (bvmem) and windowed (bwin) modes."""
    from leaxer_qwen3_tts_tpu.models.layers import init_transformer_params
    from leaxer_qwen3_tts_tpu.ops.fused_step import (
        batched_window,
        fused_decode_step,
        fused_decode_step_batched,
        pack_fused_weights,
    )

    t = TransformerConfig(
        hidden_size=1024, num_layers=2, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=3072, dtype="float32",
    )
    params = init_transformer_params(t, jax.random.PRNGKey(0))
    fw = pack_fused_weights(t, params["layers"])
    rng = np.random.default_rng(11)
    L, nk, d, B = 2, 4, 128, 4

    for T, positions in ((24, [3, 0, 17, 9]), (256, [5, 200, 130, 255])):
        assert T <= 64 or T % batched_window(B) == 0
        x = jnp.asarray(rng.standard_normal((B, 1024)) * 0.3, jnp.float32)
        kc = jnp.asarray(rng.standard_normal((L, B, nk, T, d)) * 0.2, jnp.float32)
        vc = jnp.asarray(rng.standard_normal((L, B, nk, T, d)) * 0.2, jnp.float32)
        pos = jnp.asarray(positions, jnp.int32)

        xb, kb, vb = fused_decode_step_batched(
            t, fw, x, pos, kc, vc, interpret=True
        )
        xb, kb = np.asarray(xb), np.asarray(kb)

        for b in range(B):
            x1, k1, v1 = fused_decode_step(
                t, fw, x[b : b + 1], jnp.asarray(positions[b], jnp.int32),
                kc[:, b : b + 1], vc[:, b : b + 1], interpret=True,
                mode="vmem" if T <= 512 else "win",
            )
            np.testing.assert_allclose(
                xb[b], np.asarray(x1)[0], atol=2e-2,
                err_msg=f"T={T} b={b} pos={positions[b]}",
            )
            corr = np.corrcoef(xb[b].ravel(), np.asarray(x1).ravel())[0, 1]
            assert corr > 0.9999, (T, b, corr)
            np.testing.assert_allclose(
                kb[:, b], np.asarray(k1)[:, 0], atol=2e-2,
                err_msg=f"cache T={T} b={b}",
            )


def test_batched_fused_talker_and_mtp_dispatch():
    """talker_decode_step and predict_subcodes route 2<=B<=8 through the
    batched fused kernels and match the XLA path."""
    import dataclasses

    from leaxer_qwen3_tts_tpu.config import TalkerConfig
    from leaxer_qwen3_tts_tpu.models.talker import (
        init_talker_params,
        prepare_fused_talker,
        talker_decode_step,
        talker_init_cache,
    )
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params

    t = TransformerConfig(
        hidden_size=1024, num_layers=1, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=3072, dtype="float32",
    )
    cfg_xla = TalkerConfig(transformer=t, codec_vocab_size=256,
                           text_vocab_size=152000, decode_impl="xla")
    cfg_fused = dataclasses.replace(cfg_xla, decode_impl="fused")
    params = init_talker_params(cfg_xla, jax.random.PRNGKey(0))
    qparams = quantize_params(fuse_params({"talker": params}))["talker"]
    fparams = prepare_fused_talker(cfg_fused, qparams)

    rng = np.random.default_rng(2)
    B, T = 4, 24
    embed = jnp.asarray(rng.standard_normal((B, 1024)) * 0.3, jnp.float32)
    pos = jnp.asarray([3, 5, 0, 7], jnp.int32)
    cache = talker_init_cache(cfg_xla, B, T)
    cache = cache._replace(
        k=jnp.asarray(rng.standard_normal(cache.k.shape) * 0.2, jnp.float32),
        v=jnp.asarray(rng.standard_normal(cache.v.shape) * 0.2, jnp.float32),
        length=pos,
    )
    valid = jnp.asarray(np.arange(T)[None, :] < np.asarray(pos)[:, None])

    lg_x, h_x, c_x, v_x = talker_decode_step(
        cfg_xla, qparams, embed, pos, cache, valid, uniform_fill=False
    )
    lg_f, h_f, c_f, v_f = talker_decode_step(
        cfg_fused, fparams, embed, pos, cache, valid, uniform_fill=False
    )
    np.testing.assert_array_equal(np.asarray(v_x), np.asarray(v_f))
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_x), atol=0.05, rtol=0.05)
    corr = np.corrcoef(np.asarray(lg_x).ravel(), np.asarray(lg_f).ravel())[0, 1]
    assert corr > 0.999, corr


@pytest.mark.parametrize("bits,kvq", [(8, False), (8, True), (4, False), (16, False)])
def test_manual_dma_matches_auto_pipeline(bits, kvq, monkeypatch):
    """The manual double-buffered-DMA kernel (grid (L,), explicit semaphores)
    == the auto (L, U)-grid Pallas pipeline: identical int8/int4 grids and
    unit math, so outputs agree to bf16 reduction noise and untouched cache
    slots bit-exactly."""
    from leaxer_qwen3_tts_tpu.models.layers import (
        init_transformer_params,
        quantize_kv,
    )
    from leaxer_qwen3_tts_tpu.ops.fused_step import (
        fused_decode_step,
        pack_fused_weights,
    )

    t = TransformerConfig(
        hidden_size=1024, num_layers=2, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=3072, dtype="float32",
        kv_cache_quant=kvq,
    )
    params = init_transformer_params(t, jax.random.PRNGKey(0))
    raw = params["layers"]
    fw = pack_fused_weights(t, raw, bits=bits)

    rng = np.random.default_rng(11)
    L, nk, d, T = 2, 4, 128, 256
    pos_i = 137
    x = jnp.asarray(rng.standard_normal((1, 1024)) * 0.3, jnp.float32)
    kc_f = rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    vc_f = rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    kc_f[:, :, :, pos_i:] = 0.0
    vc_f[:, :, :, pos_i:] = 0.0
    if kvq:
        qk, sk = quantize_kv(jnp.asarray(kc_f))
        qv, sv = quantize_kv(jnp.asarray(vc_f))
        args = (qk, qv, sk, sv)
    else:
        args = (jnp.asarray(kc_f), jnp.asarray(vc_f))
    pos = jnp.asarray(pos_i, jnp.int32)

    monkeypatch.setenv("QTTS_FUSED_MANUAL", "0")
    out_a = fused_decode_step(t, fw, x, pos, *args, interpret=True)
    monkeypatch.setenv("QTTS_FUSED_MANUAL", "1")
    out_m = fused_decode_step(t, fw, x, pos, *args, interpret=True)

    np.testing.assert_allclose(
        np.asarray(out_m[0]), np.asarray(out_a[0]), atol=2e-2
    )
    corr = np.corrcoef(
        np.asarray(out_m[0]).ravel(), np.asarray(out_a[0]).ravel()
    )[0, 1]
    assert corr > 0.99999, corr
    # untouched slots bit-exact, written slot within quantization/bf16 noise
    mask = np.ones(T, bool)
    mask[pos_i] = False
    for j in (1, 2):
        np.testing.assert_array_equal(
            np.asarray(out_m[j])[:, :, :, mask],
            np.asarray(out_a[j])[:, :, :, mask],
        )
        np.testing.assert_allclose(
            np.asarray(out_m[j][:, 0, :, pos_i], np.float64),
            np.asarray(out_a[j][:, 0, :, pos_i], np.float64),
            atol=2 if kvq else 2e-2,
        )
    if kvq:
        for j in (3, 4):
            np.testing.assert_allclose(
                np.asarray(out_m[j]), np.asarray(out_a[j]), rtol=0.05
            )


def test_bf16_pack_matches_xla_forward():
    """bits=16 pack (bf16 units, all-ones scales — the unquantized engine
    config's kernel path) == the raw XLA transformer_forward, to bf16-dot
    tolerance."""
    from leaxer_qwen3_tts_tpu.models.layers import (
        KVCache,
        init_transformer_params,
        rms_norm,
        transformer_forward,
    )
    from leaxer_qwen3_tts_tpu.ops.fused_step import (
        fused_decode_step,
        pack_fused_weights,
    )

    t = TransformerConfig(
        hidden_size=1024, num_layers=2, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=3072, dtype="float32",
    )
    params = init_transformer_params(t, jax.random.PRNGKey(0))
    fw = pack_fused_weights(t, params["layers"], bits=16)
    assert fw.units.dtype == jnp.bfloat16
    assert bool((np.asarray(fw.scales) == 1.0).all())

    rng = np.random.default_rng(3)
    L, nk, d, T = 2, 4, 128, 256
    pos_i = 137
    x = jnp.asarray(rng.standard_normal((1, 1024)) * 0.3, jnp.float32)
    kc = rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    vc = rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    kc[:, :, :, pos_i:] = 0.0
    vc[:, :, :, pos_i:] = 0.0
    kc, vc = jnp.asarray(kc), jnp.asarray(vc)
    pos = jnp.asarray(pos_i, jnp.int32)

    x_f, _, _ = fused_decode_step(t, fw, x, pos, kc, vc, interpret=True)

    cache = KVCache(k=kc, v=vc, length=jnp.full((1,), pos_i, jnp.int32))
    valid = jnp.asarray((np.arange(T) < pos_i)[None, :])
    h_x, _, _ = transformer_forward(
        t, params, x[:, None, :], jnp.asarray([[pos_i]], jnp.int32),
        cache, valid,
    )
    h_fused = np.asarray(rms_norm(x_f, params["final_norm"], t.rms_norm_eps))
    h_ref = np.asarray(h_x)[:, 0]
    corr = np.corrcoef(h_fused.ravel(), h_ref.ravel())[0, 1]
    assert corr > 0.999, corr
    np.testing.assert_allclose(h_fused, h_ref, atol=0.05, rtol=0.05)


def test_manual_ring_depth_bit_identical(monkeypatch):
    """QTTS_FUSED_RING only changes the weight-unit DMA schedule: any ring
    depth must be BIT-identical to the default double buffer."""
    from leaxer_qwen3_tts_tpu.models.layers import init_transformer_params
    from leaxer_qwen3_tts_tpu.ops.fused_step import (
        fused_decode_step,
        pack_fused_weights,
    )

    t = TransformerConfig(
        hidden_size=1024, num_layers=2, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=3072, dtype="float32",
    )
    params = init_transformer_params(t, jax.random.PRNGKey(0))
    fw = pack_fused_weights(t, params["layers"])

    rng = np.random.default_rng(17)
    L, nk, d, T = 2, 4, 128, 128
    x = jnp.asarray(rng.standard_normal((1, 1024)) * 0.3, jnp.float32)
    kc = jnp.asarray(
        rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    )
    vc = jnp.asarray(
        rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    )
    pos = jnp.asarray(7, jnp.int32)

    monkeypatch.setenv("QTTS_FUSED_MANUAL", "1")
    base = fused_decode_step(t, fw, x, pos, kc, vc, interpret=True)
    for ring in ("4", "8"):
        monkeypatch.setenv("QTTS_FUSED_RING", ring)
        out = fused_decode_step(t, fw, x, pos, kc, vc, interpret=True)
        for a, b in zip(out, base):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"ring={ring}"
            )
    monkeypatch.delenv("QTTS_FUSED_RING")


@pytest.mark.parametrize("kvq", [False, True])
def test_manual_win_matches_auto_win(kvq, monkeypatch):
    """The manual-schedule WINDOWED kernel (grid (L,), unit ring, streamed
    online-softmax attention) == the auto (L, U)-grid win pipeline on a
    long-form bucket: same math, different transport."""
    from leaxer_qwen3_tts_tpu.models.layers import (
        init_transformer_params,
        quantize_kv,
    )
    from leaxer_qwen3_tts_tpu.ops.fused_step import (
        fused_decode_step,
        pack_fused_weights,
    )

    t = TransformerConfig(
        hidden_size=1024, num_layers=2, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=3072, dtype="float32",
        kv_cache_quant=kvq,
    )
    params = init_transformer_params(t, jax.random.PRNGKey(0))
    fw = pack_fused_weights(t, params["layers"])

    rng = np.random.default_rng(23)
    L, nk, d, T = 2, 4, 128, 1024
    pos_i = 700  # past the first 512-window; exercises streaming + RMW
    x = jnp.asarray(rng.standard_normal((1, 1024)) * 0.3, jnp.float32)
    kc_f = rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    vc_f = rng.standard_normal((L, 1, nk, T, d)).astype(np.float32) * 0.2
    kc_f[:, :, :, pos_i:] = 0.0
    vc_f[:, :, :, pos_i:] = 0.0
    if kvq:
        qk, sk = quantize_kv(jnp.asarray(kc_f))
        qv, sv = quantize_kv(jnp.asarray(vc_f))
        args = (qk, qv, sk, sv)
    else:
        args = (jnp.asarray(kc_f), jnp.asarray(vc_f))
    pos = jnp.asarray(pos_i, jnp.int32)

    monkeypatch.delenv("QTTS_FUSED_WIN_MANUAL", raising=False)
    out_a = fused_decode_step(t, fw, x, pos, *args, interpret=True,
                              mode="win")
    monkeypatch.setenv("QTTS_FUSED_WIN_MANUAL", "1")
    out_m = fused_decode_step(t, fw, x, pos, *args, interpret=True,
                              mode="win")
    # ring depth stays transport-only in win mode too
    monkeypatch.setenv("QTTS_FUSED_RING", "4")
    out_r = fused_decode_step(t, fw, x, pos, *args, interpret=True,
                              mode="win")
    monkeypatch.delenv("QTTS_FUSED_RING")
    monkeypatch.delenv("QTTS_FUSED_WIN_MANUAL")

    np.testing.assert_allclose(
        np.asarray(out_m[0]), np.asarray(out_a[0]), atol=2e-2
    )
    corr = np.corrcoef(
        np.asarray(out_m[0]).ravel(), np.asarray(out_a[0]).ravel()
    )[0, 1]
    assert corr > 0.99999, corr
    for a, b in zip(out_r, out_m):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # untouched slots bit-exact; the written slot matches to store rounding
    mask = np.ones(T, bool)
    mask[pos_i] = False
    for j in (1, 2):
        np.testing.assert_array_equal(
            np.asarray(out_m[j])[:, :, :, mask],
            np.asarray(out_a[j])[:, :, :, mask],
        )
        np.testing.assert_allclose(
            np.asarray(out_m[j])[:, :, :, pos_i],
            np.asarray(out_a[j])[:, :, :, pos_i], atol=1e-2,
        )
