"""Sampling tests: fast top-k-subset path vs exact full-vocab path, greedy
semantics, EOS suppression mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.config import CODEC_EOS
from leaxer_qwen3_tts_tpu.runtime.sampling import (
    K_CAP,
    NEG_INF,
    SamplingParams,
    _top_k_mask,
    _top_p_mask,
    make_codec_suppress_mask,
    sample_token,
)


def _exact_distribution(logits, temp, tk, tp):
    t = max(temp, 1e-6)
    scaled = logits / t
    s1 = jnp.where(_top_k_mask(scaled, jnp.asarray(tk)), scaled, NEG_INF)
    s2 = jnp.where(_top_p_mask(s1, jnp.asarray(tp)), s1, NEG_INF)
    return jax.nn.softmax(s2, -1)


def _fast_distribution(logits, temp, tk, tp):
    B, V = logits.shape
    t = max(temp, 1e-6)
    vals, idx = jax.lax.top_k(logits, K_CAP)
    pos = jnp.arange(K_CAP)[None, :]
    sv = jnp.where(pos < tk, vals / t, NEG_INF)
    pr = jax.nn.softmax(sv, -1)
    keep_p = ((jnp.cumsum(pr, -1) - pr) < tp) | (pos == 0)
    p_sub = jax.nn.softmax(jnp.where(keep_p, sv, NEG_INF), -1)
    out = jnp.zeros_like(logits)
    return out.at[jnp.arange(B)[:, None], idx].set(p_sub)


def test_fast_path_matches_exact_distribution():
    rng = np.random.default_rng(0)
    for _ in range(10):
        logits = jnp.asarray(rng.standard_normal((2, 3072)) * 3, jnp.float32)
        tk = int(rng.integers(1, K_CAP))
        tp = float(rng.uniform(0.5, 1.0))
        temp = float(rng.uniform(0.4, 1.5))
        p_full = _exact_distribution(logits, temp, tk, tp)
        p_fast = _fast_distribution(logits, temp, tk, tp)
        np.testing.assert_allclose(
            np.asarray(p_full), np.asarray(p_fast), atol=2e-6
        )


def test_greedy_and_topk1():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((4, 3072)) * 2, jnp.float32)
    g = sample_token(jax.random.PRNGKey(0), logits, SamplingParams.create(0.0))
    np.testing.assert_array_equal(
        np.asarray(g), np.asarray(jnp.argmax(logits, -1).astype(jnp.int32))
    )
    k1 = sample_token(
        jax.random.PRNGKey(0), logits, SamplingParams.create(1.0, top_k=1)
    )
    np.testing.assert_array_equal(np.asarray(g), np.asarray(k1))


def test_large_topk_uses_exact_path():
    # top_k > K_CAP must still honor the full top-k (lax.cond exact branch)
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((1, 3072)), jnp.float32)
    ids = [
        int(
            sample_token(
                jax.random.PRNGKey(i),
                logits,
                SamplingParams.create(5.0, top_k=3000, top_p=1.0),
            )[0]
        )
        for i in range(64)
    ]
    order = np.argsort(-np.asarray(logits[0]))
    ranks = [int(np.where(order == i)[0][0]) for i in ids]
    assert max(ranks) > K_CAP  # at high temp the tail beyond K_CAP is reachable


def test_suppress_mask():
    m = np.asarray(make_codec_suppress_mask(3072))
    assert (m[:2048] == 0).all()
    assert m[CODEC_EOS] == 0
    sup = np.ones(3072, bool)
    sup[:2048] = False
    sup[CODEC_EOS] = False
    assert (m[sup] < -1e29).all()


def test_forbid_eos():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((1, 3072)), jnp.float32)
    logits = logits.at[0, CODEC_EOS].set(100.0)  # EOS dominates
    sp = SamplingParams.create(0.0)
    assert int(sample_token(jax.random.PRNGKey(0), logits, sp)[0]) == CODEC_EOS
    # engine applies the forbid mask before sampling (generate._frame_step)
    masked = logits.at[:, CODEC_EOS].add(
        jnp.where(jnp.asarray(True), -1e30, 0.0)
    )
    assert int(sample_token(jax.random.PRNGKey(0), masked, sp)[0]) != CODEC_EOS


def test_topk_subset_keeps_threshold_ties():
    """The fast subset path must keep ALL tokens tied at the k-th value, like
    the full path and the reference filter (tts_onnx.cpp:917-927) — not cut
    positionally (round-1 advisor finding)."""
    import jax

    from leaxer_qwen3_tts_tpu.runtime.sampling import (
        _sample_full,
        _sample_topk_subset,
        SamplingParams,
    )

    V = 300  # > K_CAP so the subset path is the one exercised in production
    logits = np.full((V,), -10.0, np.float32)
    logits[3] = 2.0
    logits[[5, 17, 42]] = 1.0  # three-way tie at the k-th (k=2) value
    lg = jnp.asarray(logits)[None]
    sp = SamplingParams.create(temperature=1.0, top_k=2, top_p=1.0)

    def support(fn):
        out = set()
        for s in range(64):
            out.add(int(fn(jax.random.PRNGKey(s), lg, sp)[0]))
        return out

    sub, full = support(_sample_topk_subset), support(_sample_full)
    assert sub == full  # identical candidate sets
    assert {5, 17, 42} & sub  # ties survive
    assert sub <= {3, 5, 17, 42}
