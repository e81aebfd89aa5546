"""TP-resident MTP chain (ops/fused_mtp_tp.py): interpret-mode numerics on
a virtual CPU mesh — the in-kernel ICI all-reduce runs with real
inter-device semantics under JAX's TPU interpret mode.

The XLA twin mirrors the kernel's per-shard tile math (same bf16 unit dots,
same f32 accumulation order, same hypercube add order, the SAME
gumbel_topk_topp_sample on the same replicated noise), so sub-codes compare
EXACTLY, like the single-chip chain's twin test.

Mesh sizes are capped at 4 devices: the TPU interpret machinery runs one
Python thread per mesh device synchronized by barriers, and on this 1-CPU
host >4 concurrent device threads starve the XLA CPU client's execution
pool — the in-kernel remote-copy waits then deadlock (measured 2026-08-19:
2/4-device meshes pass in 3-7 s, 8-device meshes hang).  Host limitation,
not a kernel property; coverage is preserved by pairing a tp=4 mesh
(2-round hypercube, exchange-slot parity) with a data=2 x tp=2 mesh
(multi-axis device-id linearization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.config import CodePredictorConfig, TransformerConfig
from leaxer_qwen3_tts_tpu.models.code_predictor import (
    init_code_predictor_params,
)
from leaxer_qwen3_tts_tpu.models.layers import rms_norm
from leaxer_qwen3_tts_tpu.ops.fused_mtp import gumbel_topk_topp_sample
from leaxer_qwen3_tts_tpu.ops.fused_mtp_tp import (
    fused_mtp_chain_tp,
    supports_tp_resident,
)
from leaxer_qwen3_tts_tpu.ops.fused_tp import _dims, pack_fused_tp
from leaxer_qwen3_tts_tpu.ops.quant import QuantizedLinear, quantize_weight
from leaxer_qwen3_tts_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def tp_chain_setup():
    # H=512 keeps interpret-mode wall clock CI-friendly on the 1-CPU host
    # (~4x less compute than H=1024) while still exercising every bug class
    # the kernel has: multi-layer KV reuse (L=2), the growing sample window
    # (n=3), Megatron tiling legal at BOTH tp=2 and tp=4 (NU/KCo/KCd >= 256
    # at H=512 with 8 heads), and the in-kernel logit all-reduce at V=256.
    t = TransformerConfig(
        hidden_size=512,
        num_layers=2,
        num_heads=8,
        num_kv_heads=4,
        head_dim=128,
        intermediate_size=1024,
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
    # int8 step heads like the engine's quantized pack
    heads_raw = params["heads"]  # [n, H, V] raw
    qs = [quantize_weight(heads_raw[j]) for j in range(cfg.num_steps)]
    heads = QuantizedLinear(
        q=jnp.stack([q.q for q in qs]),
        scale=jnp.stack([q.scale for q in qs]),
    )
    return cfg, params, heads, tables


def test_supports_tp_resident_math():
    t17_mtp = TransformerConfig(
        hidden_size=2048, num_layers=6, num_heads=16, num_kv_heads=8,
        head_dim=128, intermediate_size=6144, dtype="float32",
    )
    # 1.7B MTP trunk = ~302 MB int8: /4 = ~76 MB + head buffer fits the
    # 112 MB budget at TP=4; TP=2 (151 MB) does not (int8)
    assert supports_tp_resident(t17_mtp, 4, 15, 2048)
    assert not supports_tp_resident(t17_mtp, 2, 15, 2048)
    assert not supports_tp_resident(t17_mtp, 3, 15, 2048)  # not power of 2


def _twin(cfg, tp, fw, final_norm, heads, tables, lh, c0, gumbel,
          temp, top_k, top_p):
    """XLA mirror of the TP kernel's per-shard op sequence."""
    t = cfg
    H, d, nq_s, nk_s, qd_s, kvd_s, A_s, I_s, NU, KCo, KCd = _dims(t, tp)
    g = nq_s // nk_s
    eps = t.rms_norm_eps
    Hs = H // tp
    L = fw.attn_norm.shape[0]
    n, _, V = gumbel.shape
    T = n + 2
    nnH = H // NU
    Uq = A_s // NU
    Uo = (qd_s // KCo) * nnH
    Ug = 2 * I_s // NU
    Ud = (I_s // KCd) * nnH

    half = d // 2
    freqs = 1.0 / (
        t.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half)
    )
    angles = jnp.arange(n + 1, dtype=jnp.float32)[:, None] * freqs[None, :]
    cos_all = jnp.cos(angles)[:, None, :]
    sin_all = jnp.sin(angles)[:, None, :]

    def mm(w_u, s_u, lhs):
        return (
            jax.lax.dot_general(
                lhs.astype(jnp.bfloat16), w_u.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * s_u
        )

    def rope(x, cos, sin):
        # mirror ops.fused_step._rope
        x1, x2 = x[..., :half], x[..., half:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        )

    kc = [np.zeros((L, nk_s, T, d), np.float32) for _ in range(tp)]
    vc = [np.zeros((L, nk_s, T, d), np.float32) for _ in range(tp)]
    kc = [jnp.asarray(c) for c in kc]
    vc = [jnp.asarray(c) for c in vc]

    def trunk_step(x, pos):
        cos, sin = cos_all[pos], sin_all[pos]
        for l in range(L):
            h = rms_norm(x, fw.attn_norm[l, 0], eps)
            partials = []
            for s in range(tp):
                qkv_parts = [
                    mm(fw.qkv_u[s, l, u], fw.qkv_s[s, l, u], h)
                    for u in range(Uq)
                ]
                qkv = jnp.concatenate(qkv_parts, axis=-1)
                q = qkv[0, :qd_s].reshape(nq_s, d)
                k = qkv[0, qd_s : qd_s + kvd_s].reshape(nk_s, d)
                v = qkv[0, qd_s + kvd_s :].reshape(nk_s, d)
                q = rms_norm(q, fw.q_norm[l, 0], eps)
                k = rms_norm(k, fw.k_norm[l, 0], eps)
                q = rope(q, cos, sin)
                k = rope(k, cos, sin)
                slot = jax.lax.broadcasted_iota(jnp.int32, (nk_s, T, d), 1)
                K_new = jnp.where(slot == pos, k[:, None, :], kc[s][l])
                V_new = jnp.where(slot == pos, v[:, None, :], vc[s][l])
                kc[s] = kc[s].at[l].set(K_new)
                vc[s] = vc[s].at[l].set(V_new)
                qg = q.reshape(nk_s, g, d)
                scores = jax.lax.dot_general(
                    qg, K_new, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * (1.0 / (d**0.5))
                sl_i = jax.lax.broadcasted_iota(jnp.int32, (nk_s, g, T), 2)
                scores = jnp.where(sl_i <= pos, scores, -1e30)
                m = jnp.max(scores, axis=-1, keepdims=True)
                e = jnp.exp(scores - m)
                w = e / jnp.sum(e, axis=-1, keepdims=True)
                attn = jax.lax.dot_general(
                    w, V_new, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(1, qd_s)
                part = jnp.zeros((1, H), jnp.float32)
                for u in range(Uo):
                    i_ks, j_ns = divmod(u, nnH)
                    k_off, n_off = i_ks * KCo, j_ns * NU
                    part = part.at[:, n_off : n_off + NU].set(
                        part[:, n_off : n_off + NU]
                        + mm(fw.wo_u[s, l, u], fw.wo_s[s, l, u],
                             attn[:, k_off : k_off + KCo])
                    )
                partials.append(part)
            red = partials[0]
            for s in range(1, tp):
                red = red + partials[s]
            x = x + red

            h = rms_norm(x, fw.mlp_norm[l, 0], eps)
            partials = []
            for s in range(tp):
                gu_parts = [
                    mm(fw.gu_u[s, l, u], fw.gu_s[s, l, u], h)
                    for u in range(Ug)
                ]
                gu = jnp.concatenate(gu_parts, axis=-1)
                gate, up = gu[:, :I_s], gu[:, I_s:]
                act = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up
                part = jnp.zeros((1, H), jnp.float32)
                for u in range(Ud):
                    i_ks, j_ns = divmod(u, nnH)
                    k_off, n_off = i_ks * KCd, j_ns * NU
                    part = part.at[:, n_off : n_off + NU].set(
                        part[:, n_off : n_off + NU]
                        + mm(fw.wd_u[s, l, u], fw.wd_s[s, l, u],
                             act[:, k_off : k_off + KCd])
                    )
                partials.append(part)
            red = partials[0]
            for s in range(1, tp):
                red = red + partials[s]
            x = x + red
        return x

    hq, hsc = heads.q, heads.scale.astype(jnp.float32).reshape(n, 1, V)
    subs, ssum = [], jnp.zeros((1, H), jnp.float32)
    x = lh.astype(jnp.float32)
    hp = None
    for it in range(n + 2):
        if it == 1:
            x = c0.astype(jnp.float32)
        if it >= 2:
            j = it - 2
            parts = []
            for s in range(tp):
                parts.append(
                    jax.lax.dot_general(
                        hp[:, s * Hs : (s + 1) * Hs].astype(jnp.bfloat16),
                        hq[j, s * Hs : (s + 1) * Hs].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            logits = parts[0]
            for s in range(1, tp):
                logits = logits + parts[s]
            logits = logits * hsc[j]
            sub = int(
                gumbel_topk_topp_sample(
                    logits, gumbel[j], temp, top_k, top_p
                )[0]
            )
            subs.append(sub)
            emb = tables[j, sub][None, :].astype(jnp.float32)
            ssum = ssum + emb
            x = emb
        if it <= n:
            x2 = trunk_step(x, it)
            hp = rms_norm(x2, final_norm, eps).astype(jnp.float32)
            x = x2
    return subs, ssum


@pytest.mark.parametrize("data,tp", [(2, 2), (1, 4)])
def test_tp_chain_matches_xla_twin(tp_chain_setup, data, tp):
    cfg, params, heads, tables = tp_chain_setup
    t = cfg.transformer
    n, V = cfg.num_steps, cfg.subcode_vocab_size
    mesh = make_mesh(data, tp, devices=jax.devices()[: data * tp])
    fw = pack_fused_tp(t, params["transformer"]["layers"], tp, mesh=mesh)
    final_norm = params["transformer"]["final_norm"]

    rng = np.random.default_rng(5)
    H = t.hidden_size
    lh = jnp.asarray(rng.standard_normal((1, H)) * 0.5, jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((1, H)) * 0.02, jnp.float32)
    temp, top_k, top_p = jnp.float32(0.8), jnp.int32(50), jnp.float32(0.9)
    gkeys = jax.random.split(jax.random.PRNGKey(11), n)
    gumbel = jax.vmap(
        lambda kk: jax.random.gumbel(kk, (1, V), jnp.float32)
    )(gkeys)

    with jax.set_mesh(mesh):
        subs_k, sum_k = fused_mtp_chain_tp(
            t, tp, mesh, fw, final_norm, heads, tables, lh, c0, gumbel,
            temp, top_k, top_p, interpret=True,
        )
        subs_k = np.asarray(jax.device_get(subs_k))
        sum_k = np.asarray(jax.device_get(sum_k))

    subs_t, sum_t = _twin(
        t, tp, fw, final_norm, heads, tables, lh, c0, gumbel,
        temp, top_k, top_p,
    )
    assert list(subs_k[0]) == subs_t, (subs_k, subs_t)
    np.testing.assert_allclose(sum_k, np.asarray(sum_t), atol=2e-2,
                               rtol=2e-2)


def test_predict_subcodes_routes_to_tp_chain(tp_chain_setup):
    """Product-path routing (models/code_predictor.predict_subcodes):
    with a mesh + an attached ``fused_tp`` pack + resident enabled, the
    engine-facing entry point runs the TP-resident chain and matches the
    direct kernel call exactly (same key -> same Gumbel chain)."""
    import dataclasses

    from leaxer_qwen3_tts_tpu.models.code_predictor import predict_subcodes
    from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams

    cfg, params, heads, tables = tp_chain_setup
    cfg = dataclasses.replace(cfg, resident=True)  # CPU default is off
    t = cfg.transformer
    n, V = cfg.num_steps, cfg.subcode_vocab_size
    tp = 2
    mesh = make_mesh(2, tp, devices=jax.devices()[: 2 * tp])
    fw = pack_fused_tp(t, params["transformer"]["layers"], tp, mesh=mesh)
    cp_params = {
        "transformer": params["transformer"],
        "heads": params["heads"],
        "fused_tp": fw,
        # a fused_step pack must NOT shadow the TP route; presence of both
        # mirrors a real engine dict (single-chip pack + TP pack)
        "fused_step": params.get("fused_step", object()),
    }
    rng = np.random.default_rng(7)
    H = t.hidden_size
    lh = jnp.asarray(rng.standard_normal((1, H)) * 0.5, jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((1, H)) * 0.02, jnp.float32)
    key = jax.random.PRNGKey(21)
    sp = SamplingParams.create(temperature=0.8, top_k=50, top_p=0.9)

    with jax.set_mesh(mesh):
        subs_r, sum_r = predict_subcodes(
            cfg, cp_params, tables, lh, c0, key,
            sample_fn=None, sp=sp, mesh=mesh,
        )
        subs_r = np.asarray(jax.device_get(subs_r))
        sum_r = np.asarray(jax.device_get(sum_r))

        # direct kernel call with the identical noise derivation
        gkeys = jax.random.split(key, n)
        gumbel = jax.vmap(
            lambda kk: jax.random.gumbel(kk, (1, V), jnp.float32)
        )(gkeys)
        subs_d, sum_d = fused_mtp_chain_tp(
            t, tp, mesh, fw, params["transformer"]["final_norm"],
            cp_params["heads"], tables, lh, c0, gumbel,
            sp.temperature, sp.top_k, sp.top_p, interpret=True,
        )
        subs_d = np.asarray(jax.device_get(subs_d))
        sum_d = np.asarray(jax.device_get(sum_d))

    np.testing.assert_array_equal(subs_r, subs_d)
    np.testing.assert_allclose(sum_r, sum_d, atol=1e-6, rtol=1e-6)


def test_tp_chain_greedy_determinism():
    """Greedy (temp=0) twice -> identical sub-codes; different noise rows
    with temp>0 -> the chain actually samples.  Small config (the kernel
    runs 4x here) on a data=2 x tp=2 mesh — the multi-axis linearization
    arm."""
    from leaxer_qwen3_tts_tpu.models.layers import init_transformer_params

    t = TransformerConfig(
        hidden_size=512, num_layers=1, num_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=1024, dtype="float32",
    )
    n, V = 2, 128
    tp = 2
    mesh = make_mesh(2, tp, devices=jax.devices()[: 2 * tp])
    tparams = init_transformer_params(t, jax.random.PRNGKey(2))
    fw = pack_fused_tp(t, tparams["layers"], tp, mesh=mesh)
    final_norm = tparams["final_norm"]
    rng = np.random.default_rng(9)
    heads = jnp.asarray(
        rng.standard_normal((n, 512, V)) * 0.02, jnp.float32
    )
    tables = jnp.asarray(
        rng.standard_normal((n, V, 512)) * 0.02, jnp.float32
    )
    lh = jnp.asarray(rng.standard_normal((1, 512)) * 0.5, jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((1, 512)) * 0.02, jnp.float32)
    g1 = jax.vmap(
        lambda kk: jax.random.gumbel(kk, (1, V), jnp.float32)
    )(jax.random.split(jax.random.PRNGKey(1), n))
    g2 = jax.vmap(
        lambda kk: jax.random.gumbel(kk, (1, V), jnp.float32)
    )(jax.random.split(jax.random.PRNGKey(2), n))

    with jax.set_mesh(mesh):
        a, _ = fused_mtp_chain_tp(
            t, tp, mesh, fw, final_norm, heads, tables, lh, c0, g1,
            jnp.float32(0.0), jnp.int32(0), jnp.float32(1.0),
            interpret=True,
        )
        b, _ = fused_mtp_chain_tp(
            t, tp, mesh, fw, final_norm, heads, tables, lh, c0, g2,
            jnp.float32(0.0), jnp.int32(0), jnp.float32(1.0),
            interpret=True,
        )
        s1, _ = fused_mtp_chain_tp(
            t, tp, mesh, fw, final_norm, heads, tables, lh, c0, g1,
            jnp.float32(1.2), jnp.int32(0), jnp.float32(1.0),
            interpret=True,
        )
        s2, _ = fused_mtp_chain_tp(
            t, tp, mesh, fw, final_norm, heads, tables, lh, c0, g2,
            jnp.float32(1.2), jnp.int32(0), jnp.float32(1.0),
            interpret=True,
        )
        a, b = np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))
        s1 = np.asarray(jax.device_get(s1))
        s2 = np.asarray(jax.device_get(s2))
    # greedy ignores the noise entirely
    np.testing.assert_array_equal(a, b)
    # sampled mode is noise-sensitive (with overwhelming probability)
    assert not np.array_equal(s1, s2)
