"""int8 weight-only quantization tests (ops/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from leaxer_qwen3_tts_tpu.ops.quant import (
    QuantizedLinear,
    dense,
    index_weight,
    quantize_params,
    quantize_weight,
)


def test_quantize_dequantize_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.float32)
    qw = quantize_weight(w)
    assert qw.q.dtype == jnp.int8
    assert qw.scale.shape == (1, 128)
    deq = qw.q.astype(jnp.float32) * qw.scale
    # per-channel symmetric int8: max error is scale/2 = amax/254
    amax = np.abs(np.asarray(w)).max(axis=0)
    err = np.abs(np.asarray(deq) - np.asarray(w))
    assert (err <= amax / 254.0 + 1e-7).all()


def test_dense_quantized_close_to_full():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 64)) * 0.06, jnp.float32)
    full = dense(x, w)
    quant = dense(x, quantize_weight(w))
    # int8 noise averages out over the 256-term contraction; outputs near zero
    # inflate the relative metric, so bound mean loosely and check correlation
    denom = np.maximum(np.abs(np.asarray(full)), 1e-2)
    rel = np.abs(np.asarray(quant) - np.asarray(full)) / denom
    assert rel.mean() < 0.05
    corr = np.corrcoef(np.asarray(full).ravel(), np.asarray(quant).ravel())[0, 1]
    assert corr > 0.999


def test_index_weight_stacked():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((5, 32, 16)) * 0.1, jnp.float32)
    qw = quantize_weight(w)
    assert qw.scale.shape == (5, 1, 16)
    sub = index_weight(qw, jnp.asarray(3))
    assert isinstance(sub, QuantizedLinear)
    assert sub.q.shape == (32, 16) and sub.scale.shape == (1, 16)
    np.testing.assert_array_equal(np.asarray(sub.q), np.asarray(qw.q[3]))
    # unquantized passthrough
    raw = index_weight(w, jnp.asarray(2))
    np.testing.assert_array_equal(np.asarray(raw), np.asarray(w[2]))


def test_quantize_params_selective(tiny_model):
    cfg, params = tiny_model
    qp = quantize_params(params)
    assert isinstance(qp["talker"]["transformer"]["layers"]["wq"], QuantizedLinear)
    assert isinstance(qp["talker"]["lm_head"], QuantizedLinear)
    assert isinstance(qp["code_predictor"]["heads"], QuantizedLinear)
    # embeddings / vocoder / norms untouched
    assert not isinstance(qp["embeddings"]["text_embed"], QuantizedLinear)
    assert not isinstance(qp["vocoder"]["codebooks"], QuantizedLinear)
    assert not isinstance(
        qp["talker"]["transformer"]["final_norm"], QuantizedLinear
    )


def test_fused_params_exact_match(tiny_model, tiny_vocab_files):
    """fuse_params (wqkv/wgu concat) is numerically exact: greedy codes and
    logits match the unfused layout."""
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.frontend import Tokenizer
    from leaxer_qwen3_tts_tpu.ops.quant import fuse_params

    cfg, params = tiny_model
    fused = fuse_params(params)
    layers = fused["talker"]["transformer"]["layers"]
    assert "wqkv" in layers and "wq" not in layers
    assert "wgu" in layers and "wg" not in layers
    t = cfg.talker.transformer
    assert layers["wqkv"].shape == (t.num_layers, t.hidden_size, t.q_dim + 2 * t.kv_dim)

    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)
    e_plain = TTSEngine(
        config=cfg, params=params, tokenizer=tok,
        max_frames=4, chunk_len=2, fuse=False,
    )
    e_fused = TTSEngine(
        config=cfg, params=params, tokenizer=tok,
        max_frames=4, chunk_len=2, fuse=True,
    )
    a = e_plain.synthesize("hello world", temperature=0.0)
    b = e_fused.synthesize("hello world", temperature=0.0)
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_allclose(a.audio, b.audio, atol=2e-5)


def test_quantized_generate_runs(tiny_model, tiny_vocab_files):
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.frontend import Tokenizer

    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    eng = TTSEngine(
        config=cfg,
        params=params,
        tokenizer=Tokenizer(vocab_path, merges_path),
        max_frames=6,
        chunk_len=3,
        quantize="int8",
    )
    r = eng.synthesize("hello world", temperature=0.0)
    assert np.isfinite(r.audio).all()
    assert r.codes.shape[1] == 16

    # quantized prefill logits strongly correlate with full precision (token
    # agreement is meaningless on a tiny RANDOM model: near-flat logits flip
    # argmax under 1% noise; with real weights the margins dominate)
    import jax as _jax
    from leaxer_qwen3_tts_tpu.models.talker import talker_init_cache, talker_prefill
    from leaxer_qwen3_tts_tpu.ops.quant import quantize_params as _qp
    from leaxer_qwen3_tts_tpu.runtime.prompt import build_prompt

    ids = jnp.asarray([[5, 6, 7]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)
    bundle = build_prompt(params["embeddings"], ids, lens, None)
    cache = talker_init_cache(cfg.talker, 1, 32)
    lg_full, *_ = talker_prefill(
        cfg.talker, params["talker"], bundle.prompt_embeds, bundle.prompt_len, cache
    )
    qp = _qp(params)
    cache = talker_init_cache(cfg.talker, 1, 32)
    lg_q, *_ = talker_prefill(
        cfg.talker, qp["talker"], bundle.prompt_embeds, bundle.prompt_len, cache
    )
    corr = np.corrcoef(np.asarray(lg_full).ravel(), np.asarray(lg_q).ravel())[0, 1]
    assert corr > 0.99, corr