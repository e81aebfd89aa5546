"""Resident-trunk MTP chain kernel (ops/fused_mtp.py): interpret-mode parity
vs the per-step fused path, plus the shared bisection sampler's equivalence
to the sort-based masks in runtime/sampling.py."""

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
from leaxer_qwen3_tts_tpu.ops import fused_mtp
from leaxer_qwen3_tts_tpu.ops.fused_mtp import (
    _bisect_topk_mask,
    _bisect_topp_mask,
    fused_mtp_chain,
    gumbel_topk_topp_sample,
    supports_resident,
)
from leaxer_qwen3_tts_tpu.runtime.sampling import (
    SamplingParams,
    _top_k_mask,
    _top_p_mask,
    sample_token,
)


@pytest.fixture(scope="module")
def chain_cfg_params():
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
        transformer=t, num_steps=4, subcode_vocab_size=256, max_seq_len=6,
        impl="fused",
    )
    params = init_code_predictor_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tables = jnp.asarray(
        rng.standard_normal((cfg.num_steps, cfg.subcode_vocab_size, 1024))
        * 0.02,
        jnp.float32,
    )
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params

    qparams = quantize_params(fuse_params({"code_predictor": params}))[
        "code_predictor"
    ]
    qparams = prepare_fused_step(cfg, qparams)
    assert "fused_step" in qparams
    return cfg, qparams, tables


# --- bisection masks == sort-based masks (no float ties in random data) ---


def test_bisect_topk_mask_matches_sort():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((1, 257)) * 4.0, jnp.float32)
    for k in (1, 2, 50, 256, 257, 0, -1, 400):
        ours = np.asarray(_bisect_topk_mask(logits, jnp.int32(k)))
        ref = np.asarray(_top_k_mask(logits, jnp.int32(k)))
        np.testing.assert_array_equal(ours, ref, err_msg=f"k={k}")


def test_bisect_topp_mask_matches_sort():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((1, 257)) * 3.0, jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    for p in (0.1, 0.5, 0.9, 0.99, 1.0, 1.5):
        ours = np.asarray(_bisect_topp_mask(probs, jnp.float32(p)))
        ref = np.asarray(_top_p_mask(logits, jnp.float32(p)))
        np.testing.assert_array_equal(ours, ref, err_msg=f"p={p}")


def test_gumbel_sample_greedy_and_topk1():
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.standard_normal((1, 128)) * 2.0, jnp.float32)
    gumbel = jnp.asarray(rng.gumbel(size=(1, 128)), jnp.float32)
    am = int(jnp.argmax(logits))
    # temperature <= 0 -> greedy argmax regardless of noise
    assert int(gumbel_topk_topp_sample(
        logits, gumbel, jnp.float32(0.0), jnp.int32(50), jnp.float32(0.9)
    )[0]) == am
    # top_k = 1 -> only the argmax survives the mask
    assert int(gumbel_topk_topp_sample(
        logits, gumbel, jnp.float32(1.0), jnp.int32(1), jnp.float32(1.0)
    )[0]) == am
    # per-row knobs: row 0 greedy, row 1 sampled with top_k=1 -> argmaxes
    l2 = jnp.concatenate([logits, logits])
    g2 = jnp.concatenate([gumbel, gumbel])
    out = gumbel_topk_topp_sample(
        l2, g2,
        jnp.asarray([[0.0], [1.0]], jnp.float32),
        jnp.asarray([[50], [1]], jnp.int32),
        jnp.asarray([[0.9], [1.0]], jnp.float32),
    )
    assert list(np.asarray(out)) == [am, am]


def test_gumbel_sample_distribution():
    """argmax(scaled + Gumbel) IS the categorical draw: empirical
    frequencies over fresh noise match softmax(logits/T) on a small vocab."""
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0, 0.5, 1.5, -0.5, 0.25]],
                         jnp.float32)
    temp = jnp.float32(0.8)
    want = np.asarray(jax.nn.softmax(logits / temp, axis=-1))[0]
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(9), n)
    gs = jax.vmap(lambda k: jax.random.gumbel(k, (1, 8), jnp.float32))(keys)
    draws = jax.vmap(
        lambda g: gumbel_topk_topp_sample(
            logits, g, temp, jnp.int32(0), jnp.float32(1.0)
        )
    )(gs)
    freq = np.bincount(np.asarray(draws).ravel(), minlength=8) / n
    np.testing.assert_allclose(freq, want, atol=0.035)


# --- resident chain vs the per-step fused path ---


def test_resident_matches_fused_greedy(chain_cfg_params):
    cfg, qparams, tables = chain_cfg_params
    rng = np.random.default_rng(1)
    hidden = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)
    c0e = jnp.asarray(rng.standard_normal((1, 1024)) * 0.02, jnp.float32)
    sp = SamplingParams.create(temperature=0.0)
    sample_fn = lambda k, lg: sample_token(k, lg, sp)
    key = jax.random.PRNGKey(0)

    subs_f, sum_f = predict_subcodes(
        cfg, qparams, tables, hidden, c0e, key, sample_fn
    )  # per-step fused (no sp -> resident not engaged)
    subs_r, sum_r = predict_subcodes_resident(
        cfg, qparams, tables, hidden, c0e, key, sp
    )
    agree = float((np.asarray(subs_f) == np.asarray(subs_r)).mean())
    assert agree >= 3 / 4, (subs_f, subs_r)
    np.testing.assert_allclose(
        np.asarray(sum_r), np.asarray(sum_f), atol=0.05, rtol=0.05
    )


def test_resident_chain_matches_xla_twin_sampled(chain_cfg_params):
    """Sampled-mode exactness: the kernel (interpret) vs a step-by-step XLA
    twin that mirrors its ops — same fused_decode_step trunk (prefix
    included, from a zero cache — the kernel builds its own prefix now),
    same bf16 head matmul, the SAME gumbel_topk_topp_sample on the same
    noise rows."""
    from leaxer_qwen3_tts_tpu.models.layers import rms_norm
    from leaxer_qwen3_tts_tpu.ops.fused_step import fused_decode_step
    from leaxer_qwen3_tts_tpu.ops.quant import index_weight

    cfg, qparams, tables = chain_cfg_params
    t = cfg.transformer
    n, V = cfg.num_steps, cfg.subcode_vocab_size
    L, nk, d = t.num_layers, t.num_kv_heads, t.head_dim
    T = n + 2
    rng = np.random.default_rng(2)
    hidden = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)
    c0e = jnp.asarray(rng.standard_normal((1, 1024)) * 0.02, jnp.float32)
    temp, top_k, top_p = jnp.float32(0.8), jnp.int32(50), jnp.float32(0.9)
    key = jax.random.PRNGKey(7)

    gkeys = jax.random.split(key, n)
    gumbel = jax.vmap(
        lambda kk: jax.random.gumbel(kk, (1, V), jnp.float32)
    )(gkeys)

    # kernel (interpret) — prefix runs in-kernel
    subs_k, sum_k = fused_mtp_chain(
        t, qparams["fused_step"], qparams["transformer"]["final_norm"],
        qparams["heads"], tables, hidden, c0e, gumbel,
        temp, top_k, top_p, interpret=True,
    )

    # XLA twin: same trunk op sequence, prefix from a zero cache
    heads = qparams["heads"]
    fw = qparams["fused_step"]
    fnorm = qparams["transformer"]["final_norm"]
    kc = jnp.zeros((L, 1, nk, T, d), jnp.float32)
    vc = jnp.zeros((L, 1, nk, T, d), jnp.float32)
    x_out, kc, vc = fused_decode_step(
        t, fw, hidden, jnp.int32(0), kc, vc, interpret=True
    )
    x_out, kc, vc = fused_decode_step(
        t, fw, c0e, jnp.int32(1), kc, vc, interpret=True
    )
    hp = rms_norm(x_out, fnorm, t.rms_norm_eps).astype(jnp.float32)
    subs, ssum = [], jnp.zeros((1, 1024), jnp.float32)
    for j in range(n):
        w = index_weight(heads, j)
        logits = (
            jnp.dot(
                hp.astype(jnp.bfloat16), w.q.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            * w.scale.reshape(1, V)
        )
        sub = int(gumbel_topk_topp_sample(
            logits, gumbel[j], temp, top_k, top_p
        )[0])
        subs.append(sub)
        emb = tables[j, sub][None, :]
        ssum = ssum + emb.astype(jnp.float32)
        if j < n - 1:
            x_out, kc, vc = fused_decode_step(
                t, fw, emb.astype(jnp.float32), jnp.int32(2 + j), kc, vc,
                interpret=True,
            )
            hp = rms_norm(x_out, fnorm, t.rms_norm_eps).astype(jnp.float32)

    assert list(np.asarray(subs_k)[0]) == subs, (subs_k, subs)
    np.testing.assert_allclose(
        np.asarray(sum_k), np.asarray(ssum), atol=0.02, rtol=0.02
    )


def test_resident_determinism_and_seed_sensitivity(chain_cfg_params):
    cfg, qparams, tables = chain_cfg_params
    rng = np.random.default_rng(6)
    hidden = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)
    c0e = jnp.asarray(rng.standard_normal((1, 1024)) * 0.02, jnp.float32)
    sp = SamplingParams.create(temperature=0.9, top_k=40, top_p=0.95)
    a1, _ = predict_subcodes_resident(
        cfg, qparams, tables, hidden, c0e, jax.random.PRNGKey(1), sp
    )
    a2, _ = predict_subcodes_resident(
        cfg, qparams, tables, hidden, c0e, jax.random.PRNGKey(1), sp
    )
    b, _ = predict_subcodes_resident(
        cfg, qparams, tables, hidden, c0e, jax.random.PRNGKey(2), sp
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(a1), np.asarray(b))
    # per-row [1, 2] key form (pool slots) accepted too
    rk = jax.random.PRNGKey(1)[None, :]
    a3, _ = predict_subcodes_resident(
        cfg, qparams, tables, hidden, c0e, rk, sp
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a3))


def test_dispatch_and_gates(chain_cfg_params, monkeypatch):
    cfg, qparams, tables = chain_cfg_params
    rng = np.random.default_rng(8)
    hidden = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)
    c0e = jnp.asarray(rng.standard_normal((1, 1024)) * 0.02, jnp.float32)
    sp = SamplingParams.create(temperature=0.0)
    sample_fn = lambda k, lg: sample_token(k, lg, sp)
    key = jax.random.PRNGKey(0)

    calls = []
    import leaxer_qwen3_tts_tpu.models.code_predictor as cp

    real = cp.predict_subcodes_resident
    monkeypatch.setattr(
        cp, "predict_subcodes_resident",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1],
    )
    monkeypatch.setenv("QTTS_MTP_RESIDENT", "1")
    predict_subcodes(cfg, qparams, tables, hidden, c0e, key, sample_fn, sp=sp)
    assert calls, "sp + fused_step + B=1 should route to the resident chain"

    calls.clear()
    monkeypatch.setenv("QTTS_MTP_RESIDENT", "0")
    predict_subcodes(cfg, qparams, tables, hidden, c0e, key, sample_fn, sp=sp)
    assert not calls, "QTTS_MTP_RESIDENT=0 must select the per-step kernels"
    monkeypatch.delenv("QTTS_MTP_RESIDENT")

    # no sp -> per-step path
    predict_subcodes(cfg, qparams, tables, hidden, c0e, key, sample_fn)
    assert not calls

    # config pin beats the env: resident=True under env=0, False under =1
    monkeypatch.setenv("QTTS_MTP_RESIDENT", "0")
    pinned_on = dataclasses.replace(cfg, resident=True)
    predict_subcodes(pinned_on, qparams, tables, hidden, c0e, key,
                     sample_fn, sp=sp)
    assert calls
    calls.clear()
    monkeypatch.setenv("QTTS_MTP_RESIDENT", "1")
    pinned_off = dataclasses.replace(cfg, resident=False)
    predict_subcodes(pinned_off, qparams, tables, hidden, c0e, key,
                     sample_fn, sp=sp)
    assert not calls
    monkeypatch.delenv("QTTS_MTP_RESIDENT")

    # batch > 1 -> batched fused path
    h2 = jnp.concatenate([hidden, hidden])
    c2 = jnp.concatenate([c0e, c0e])
    predict_subcodes(cfg, qparams, tables, h2, c2, key, sample_fn, sp=sp)
    assert not calls


def test_b1_onehot_escape_hatch_bit_equal(chain_cfg_params, monkeypatch):
    """QTTS_MTP_B1_ONEHOT=1 (batched kernel at B=1, one-hot gather) must be
    BIT-equal to the row-DMA B=1 kernel: identical noise chain, gathers are
    exact either way."""
    cfg, qparams, tables = chain_cfg_params
    rng = np.random.default_rng(21)
    hidden = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)
    c0e = jnp.asarray(rng.standard_normal((1, 1024)) * 0.02, jnp.float32)
    sp = SamplingParams.create(temperature=0.8, top_k=50, top_p=0.9)
    key = jax.random.PRNGKey(5)
    subs_a, sums_a = predict_subcodes_resident(
        cfg, qparams, tables, hidden, c0e, key, sp
    )
    monkeypatch.setenv("QTTS_MTP_B1_ONEHOT", "1")
    subs_b, sums_b = predict_subcodes_resident(
        cfg, qparams, tables, hidden, c0e, key, sp
    )
    np.testing.assert_array_equal(np.asarray(subs_a), np.asarray(subs_b))
    np.testing.assert_allclose(
        np.asarray(sums_a), np.asarray(sums_b), atol=1e-5, rtol=1e-5
    )


def test_batched_resident_matches_single_rows(chain_cfg_params):
    """Each row of the batched chain == a B=1 resident run with that row's
    key (per-row noise chains -> occupancy invariance by construction)."""
    from leaxer_qwen3_tts_tpu.models.code_predictor import (
        predict_subcodes_resident_batched,
    )

    cfg, qparams, tables = chain_cfg_params
    B = 3
    rng = np.random.default_rng(11)
    hidden = jnp.asarray(rng.standard_normal((B, 1024)) * 0.5, jnp.float32)
    c0e = jnp.asarray(rng.standard_normal((B, 1024)) * 0.02, jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(100, 100 + B))
    sp = SamplingParams.create(temperature=0.8, top_k=50, top_p=0.9)

    subs_b, sums_b = predict_subcodes_resident_batched(
        cfg, qparams, tables, hidden, c0e, keys, sp
    )
    for b in range(B):
        subs_1, sums_1 = predict_subcodes_resident(
            cfg, qparams, tables, hidden[b : b + 1], c0e[b : b + 1],
            keys[b], sp,
        )
        agree = float(
            (np.asarray(subs_b)[b] == np.asarray(subs_1)[0]).mean()
        )
        assert agree >= 3 / 4, (b, subs_b, subs_1)
        np.testing.assert_allclose(
            np.asarray(sums_b)[b], np.asarray(sums_1)[0], atol=0.05,
            rtol=0.05,
        )


def test_batched_resident_occupancy_invariance(chain_cfg_params):
    """A row's subcodes depend only on its (inputs, key) — not on
    batch-mates (the pool's per-request determinism contract)."""
    from leaxer_qwen3_tts_tpu.models.code_predictor import (
        predict_subcodes_resident_batched,
    )

    cfg, qparams, tables = chain_cfg_params
    rng = np.random.default_rng(12)
    h0 = rng.standard_normal((1, 1024)).astype(np.float32) * 0.5
    c0 = rng.standard_normal((1, 1024)).astype(np.float32) * 0.02
    k0 = jax.random.PRNGKey(42)
    sp = SamplingParams.create(temperature=0.9, top_k=30, top_p=0.95)

    results = []
    for B, pos in ((2, 0), (3, 2)):
        h = rng.standard_normal((B, 1024)).astype(np.float32) * 0.5
        c = rng.standard_normal((B, 1024)).astype(np.float32) * 0.02
        h[pos], c[pos] = h0[0], c0[0]
        keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(200, 200 + B))
        keys = keys.at[pos].set(k0)
        subs, _ = predict_subcodes_resident_batched(
            cfg, qparams, tables, jnp.asarray(h), jnp.asarray(c), keys, sp
        )
        results.append(np.asarray(subs)[pos])
    np.testing.assert_array_equal(results[0], results[1])


def test_batched_resident_greedy_vs_fused_batched(chain_cfg_params):
    from leaxer_qwen3_tts_tpu.models.code_predictor import (
        predict_subcodes_fused_batched,
        predict_subcodes_resident_batched,
    )

    cfg, qparams, tables = chain_cfg_params
    B = 2
    rng = np.random.default_rng(13)
    hidden = jnp.asarray(rng.standard_normal((B, 1024)) * 0.5, jnp.float32)
    c0e = jnp.asarray(rng.standard_normal((B, 1024)) * 0.02, jnp.float32)
    sp = SamplingParams.create(temperature=0.0)
    sample_fn = lambda k, lg: sample_token(k, lg, sp)
    key = jax.random.PRNGKey(0)

    subs_f, sums_f = predict_subcodes_fused_batched(
        cfg, qparams, tables, hidden, c0e, key, sample_fn
    )
    subs_r, sums_r = predict_subcodes_resident_batched(
        cfg, qparams, tables, hidden, c0e, key, sp
    )
    sf, sr = np.asarray(subs_f), np.asarray(subs_r)
    agree = float((sf == sr).mean())
    assert agree >= 3 / 4, (subs_f, subs_r)
    # a greedy near-tie flip swaps a whole embedding row in the sum —
    # compare sums only on rows whose subcodes fully agree
    same = (sf == sr).all(axis=1)
    assert same.any()
    np.testing.assert_allclose(
        np.asarray(sums_r)[same], np.asarray(sums_f)[same],
        atol=0.05, rtol=0.05,
    )


def test_resident_through_generate_loop(chain_cfg_params):
    """The resident chain drives the REAL decode loop (dispatch inside the
    jitted lax.scan, sp threaded by _frame_step) deterministically."""
    import dataclasses as dc

    from leaxer_qwen3_tts_tpu.config import TTSModelConfig
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params
    from leaxer_qwen3_tts_tpu.runtime.generate import make_generate_fns
    from leaxer_qwen3_tts_tpu.runtime.weights import init_params

    cp_cfg, _, _ = chain_cfg_params
    cfg0 = TTSModelConfig()
    cfg = dc.replace(
        cfg0,
        code_predictor=dc.replace(cp_cfg, resident=True),  # pin resident on
        talker=dc.replace(
            cfg0.talker,
            transformer=dc.replace(
                cfg0.talker.transformer, num_layers=1, hidden_size=1024,
                intermediate_size=1024, dtype="float32",
            ),
            decode_impl="xla",
        ),
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    params = quantize_params(fuse_params(params))
    params["code_predictor"] = prepare_fused_step(
        cfg.code_predictor, params["code_predictor"]
    )
    fns = make_generate_fns(cfg, batch=1, max_len=96, chunk_len=2)
    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)
    sp = SamplingParams.create(
        temperature=0.8, top_k=50, top_p=0.95, forbid_eos=True
    )
    outs = []
    for _ in range(2):
        st, bd = fns.prefill(params, ids, lens, jax.random.PRNGKey(1))
        st, fr, vd = fns.decode(
            params, st, bd.trailing, bd.trailing_len, bd.tts_pad_embed, sp
        )
        outs.append(np.asarray(fr))
        assert np.asarray(vd).all()
    np.testing.assert_array_equal(outs[0], outs[1])


def test_resident_through_spec_loop(chain_cfg_params, monkeypatch):
    """Speculative decoding with the resident chain active: the candidates
    call (B*k rows) routes through the batched resident kernel and the
    whole spec iteration still runs + stays deterministic."""
    import dataclasses as dc

    from leaxer_qwen3_tts_tpu.config import TTSModelConfig
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params
    from leaxer_qwen3_tts_tpu.runtime.speculative import (
        make_spec_generate_fns,
    )
    from leaxer_qwen3_tts_tpu.runtime.weights import init_params

    monkeypatch.setenv("QTTS_MTP_RESIDENT", "1")
    cp_cfg, _, _ = chain_cfg_params
    # spec frames are pinned to the reference's 16-code contract: the MTP
    # must run the full 15 steps (1 trunk layer keeps interpret fast)
    cp_cfg = dc.replace(
        chain_cfg_params[0],
        transformer=dc.replace(cp_cfg.transformer, num_layers=1),
        num_steps=15,
        max_seq_len=17,
    )
    cfg0 = TTSModelConfig()
    cfg = dc.replace(
        cfg0,
        code_predictor=cp_cfg,
        talker=dc.replace(
            cfg0.talker,
            transformer=dc.replace(
                cfg0.talker.transformer, num_layers=1, hidden_size=1024,
                intermediate_size=1024, dtype="float32",
            ),
            decode_impl="xla",
        ),
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    params = quantize_params(fuse_params(params))
    params["code_predictor"] = prepare_fused_step(
        cfg.code_predictor, params["code_predictor"]
    )
    fns = make_spec_generate_fns(cfg, max_len=64, k=2, num_iters=1)
    ids = jnp.asarray([[5, 6, 7]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)
    sp = SamplingParams.create(temperature=0.7, top_k=20, top_p=0.9,
                               forbid_eos=True)
    outs = []
    for _ in range(2):
        st, bd, f0, v0 = fns.prefill(
            params, ids, lens, jax.random.PRNGKey(2), sp
        )
        out = fns.decode(
            params, st, bd.trailing, bd.trailing_len, bd.tts_pad_embed, sp
        )
        outs.append(np.asarray(out[1]))
    np.testing.assert_array_equal(outs[0], outs[1])
    assert outs[0].shape[-1] == 16


def test_resident_int4_trunk(chain_cfg_params):
    """int4 nibble-packed trunk units (the B=32 serving pack) through both
    resident kernels, vs the per-step int4 fused path (greedy)."""
    from leaxer_qwen3_tts_tpu.models.code_predictor import (
        predict_subcodes_resident_batched,
    )

    cfg, _, tables = chain_cfg_params
    raw = init_code_predictor_params(cfg, jax.random.PRNGKey(3))
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params, quantize_params

    q4 = prepare_fused_step(
        cfg, dict(raw), bits=4
    )  # int4 pack from RAW weights (engine mtp_quantize order)
    q4 = {**quantize_params(fuse_params({"m": q4}))["m"],
          "fused_step": q4["fused_step"]}
    assert q4["fused_step"].units.shape[2] == 512  # H/2 nibble rows

    rng = np.random.default_rng(22)
    hidden = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)
    c0e = jnp.asarray(rng.standard_normal((1, 1024)) * 0.02, jnp.float32)
    sp = SamplingParams.create(temperature=0.0)
    sample_fn = lambda k, lg: sample_token(k, lg, sp)
    key = jax.random.PRNGKey(0)

    subs_f, sums_f = predict_subcodes(
        cfg, q4, tables, hidden, c0e, key, sample_fn
    )  # per-step fused (int4 units)
    subs_r, sums_r = predict_subcodes_resident(
        cfg, q4, tables, hidden, c0e, key, sp
    )
    agree = float((np.asarray(subs_f) == np.asarray(subs_r)).mean())
    assert agree >= 3 / 4, (subs_f, subs_r)

    # batched int4 rows == B=1 int4 rows
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(300, 302))
    h2 = jnp.concatenate([hidden, hidden])
    c2 = jnp.concatenate([c0e, c0e])
    sp_s = SamplingParams.create(temperature=0.8, top_k=50, top_p=0.9)
    subs_b, _ = predict_subcodes_resident_batched(
        cfg, q4, tables, h2, c2, keys, sp_s
    )
    subs_1, _ = predict_subcodes_resident(
        cfg, q4, tables, hidden, c0e, keys[0], sp_s
    )
    agree = float((np.asarray(subs_b)[0] == np.asarray(subs_1)[0]).mean())
    assert agree >= 3 / 4


def test_supports_resident_gates(chain_cfg_params, monkeypatch):
    cfg, qparams, _ = chain_cfg_params
    fw = qparams["fused_step"]
    assert supports_resident(fw)
    # bf16 packs excluded (2x bytes; the unquantized config keeps per-step)
    bf = fw._replace(units=fw.units.astype(jnp.bfloat16))
    assert not supports_resident(bf)
    # trunks over the VMEM budget excluded (1.7B MTP)
    monkeypatch.setattr(fused_mtp, "RESIDENT_MAX_BYTES", 1024)
    assert not supports_resident(fw)


def test_resident_pack_alt_fallback(chain_cfg_params):
    """mtp_quantize="auto" attaches a lower-precision fused_step_alt; the
    resident chain must prefer the primary pack while it fits and fall back
    to the alt at batches where the primary overflows the VMEM budget."""
    import types

    from leaxer_qwen3_tts_tpu.models.code_predictor import resident_pack

    mb = 1024 * 1024
    primary = types.SimpleNamespace(units=np.zeros(100 * mb, np.int8))
    alt = types.SimpleNamespace(units=np.zeros(50 * mb, np.int8))
    # jnp dtype check in supports_resident compares against jnp.int8
    primary.units = jnp.asarray(primary.units)
    alt.units = jnp.asarray(alt.units)

    # primary fits single-stream: stays primary even with an alt attached
    p = {"fused_step": primary, "fused_step_alt": alt}
    assert resident_pack(p, 1) is primary
    # at B=16 the primary overflows (100 + 13 fixed + 16*1.1 MB > 112 MB)
    # and the alt engages
    assert resident_pack(p, 16) is alt
    # without an alt the gate returns None (per-step batched fallback)
    assert resident_pack({"fused_step": primary}, 16) is None


def test_prepare_fused_step_alt(chain_cfg_params):
    cfg, _, _ = chain_cfg_params
    params = init_code_predictor_params(cfg, jax.random.PRNGKey(1))
    out = prepare_fused_step(cfg, params, bits=8)
    out = prepare_fused_step(cfg, out, bits=4, alt=True)
    assert "fused_step" in out and "fused_step_alt" in out
    # alt is the nibble-packed int4 trunk: half the primary's unit bytes
    assert out["fused_step_alt"].units.nbytes * 2 == out["fused_step"].units.nbytes
