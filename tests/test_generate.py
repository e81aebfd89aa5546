"""Generation-loop tests: determinism, EOS latching, chunking equivalence,
prompt structure, multi-stream batching."""

import jax
import jax.numpy as jnp
import pytest

from leaxer_qwen3_tts_tpu.config import (
    CODEC_BOS,
    CODEC_EOS,
    LANG_ENGLISH,
    TTS_PAD,
)
from leaxer_qwen3_tts_tpu.models.embeddings import codec_embed, text_project
from leaxer_qwen3_tts_tpu.runtime.generate import make_generate_fns
from leaxer_qwen3_tts_tpu.runtime.prompt import build_prompt, prompt_length
from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams


SP = SamplingParams.create(0.8, 50, 0.95)


def run_chunks(fns, params, state, bundle, sp, n_chunks):
    frames_all, valid_all = [], []
    for _ in range(n_chunks):
        state, frames, valid = fns.decode(
            params, state, bundle.trailing, bundle.trailing_len, bundle.tts_pad_embed, sp
        )
        frames_all.append(frames)
        valid_all.append(valid)
    return state, jnp.concatenate(frames_all, 1), jnp.concatenate(valid_all, 1)


def test_generation_deterministic(tiny_model):
    cfg, params = tiny_model
    fns = make_generate_fns(cfg, batch=2, max_len=64, chunk_len=8, lang_id=LANG_ENGLISH, donate=False)
    text_ids = jnp.array([[5, 6, 7, 0], [9, 10, 0, 0]], jnp.int32)
    text_len = jnp.array([3, 2], jnp.int32)

    outs = []
    for _ in range(2):
        state, bundle = fns.prefill(params, text_ids, text_len, jax.random.PRNGKey(42))
        _, frames, valid = run_chunks(fns, params, state, bundle, SP, 2)
        outs.append((frames, valid))
    assert jnp.array_equal(outs[0][0], outs[1][0])
    assert jnp.array_equal(outs[0][1], outs[1][1])

    # different seed -> different codes (overwhelmingly likely)
    state, bundle = fns.prefill(params, text_ids, text_len, jax.random.PRNGKey(7))
    _, frames2, _ = run_chunks(fns, params, state, bundle, SP, 2)
    assert not jnp.array_equal(outs[0][0], frames2)


def test_chunk_size_equivalence(tiny_model):
    """Decoding 16 frames as 2x8 must equal 4x4 (host chunking is transparent)."""
    cfg, params = tiny_model
    text_ids = jnp.array([[5, 6, 7, 0]], jnp.int32)
    text_len = jnp.array([3], jnp.int32)

    fns8 = make_generate_fns(cfg, batch=1, max_len=64, chunk_len=8, lang_id=None, donate=False)
    fns4 = make_generate_fns(cfg, batch=1, max_len=64, chunk_len=4, lang_id=None, donate=False)

    s8, b8 = fns8.prefill(params, text_ids, text_len, jax.random.PRNGKey(1))
    _, f8, v8 = run_chunks(fns8, params, s8, b8, SP, 2)
    s4, b4 = fns4.prefill(params, text_ids, text_len, jax.random.PRNGKey(1))
    _, f4, v4 = run_chunks(fns4, params, s4, b4, SP, 4)
    assert jnp.array_equal(f8, f4)
    assert jnp.array_equal(v8, v4)


def test_greedy_mode(tiny_model):
    """temperature == 0 is greedy: independent of the PRNG key."""
    cfg, params = tiny_model
    greedy = SamplingParams.create(0.0, 50, 0.95)
    fns = make_generate_fns(cfg, batch=1, max_len=64, chunk_len=8, lang_id=None, donate=False)
    text_ids = jnp.array([[5, 6, 7, 0]], jnp.int32)
    text_len = jnp.array([3], jnp.int32)

    s1, b1 = fns.prefill(params, text_ids, text_len, jax.random.PRNGKey(1))
    _, f1, _ = run_chunks(fns, params, s1, b1, greedy, 1)
    s2, b2 = fns.prefill(params, text_ids, text_len, jax.random.PRNGKey(999))
    _, f2, _ = run_chunks(fns, params, s2, b2, greedy, 1)
    assert jnp.array_equal(f1, f2)


def test_eos_latches(tiny_model):
    """EOS at frame 0 (rigged via state.last_logits) must invalidate that frame
    and every later frame (reference breaks before emitting, tts_onnx.cpp:812)."""
    cfg, params = tiny_model
    greedy = SamplingParams.create(0.0, 0, 1.0)
    fns = make_generate_fns(cfg, batch=2, max_len=64, chunk_len=4, lang_id=None, donate=False)
    text_ids = jnp.array([[5, 6, 0, 0], [5, 6, 0, 0]], jnp.int32)
    text_len = jnp.array([2, 2], jnp.int32)
    state, bundle = fns.prefill(params, text_ids, text_len, jax.random.PRNGKey(0))

    # stream 0: logits peak at CODEC_EOS -> immediate EOS; stream 1: peak at 7
    rig = jnp.zeros_like(state.last_logits)
    rig = rig.at[0, CODEC_EOS].set(100.0)
    rig = rig.at[1, 7].set(100.0)
    state = state._replace(last_logits=rig)

    _, frames, valid = fns.decode(
        params, state, bundle.trailing, bundle.trailing_len, bundle.tts_pad_embed, greedy
    )
    assert not bool(valid[0].any())  # EOS frame not emitted, latched forever
    assert bool((frames[0] == 0).all())
    assert bool(valid[1].all())
    assert int(frames[1, 0, 0]) == 7

    # done=True carried into a chunk also stays latched
    state2, bundle2 = fns.prefill(params, text_ids, text_len, jax.random.PRNGKey(0))
    state2 = state2._replace(done=jnp.array([True, False]))
    _, _, valid2 = fns.decode(
        params, state2, bundle2.trailing, bundle2.trailing_len, bundle2.tts_pad_embed, SP
    )
    assert not bool(valid2[0].any())
    assert bool(valid2[1].all())


def test_prompt_structure(tiny_model):
    """Prompt layout matches the reference assembly (tts_onnx.cpp:442-539)."""
    cfg, params = tiny_model
    emb = params["embeddings"]
    text_ids = jnp.array([[5, 6, 7]], jnp.int32)
    text_len = jnp.array([3], jnp.int32)

    for lang_id, exp_len in ((None, 8), (LANG_ENGLISH, 9)):
        bundle = build_prompt(emb, text_ids, text_len, lang_id)
        assert bundle.prompt_embeds.shape[1] == exp_len
        assert prompt_length(lang_id, False) == exp_len

    # with speaker: +1
    spk = jnp.ones((1, 64), jnp.float32)
    bundle = build_prompt(emb, text_ids, text_len, LANG_ENGLISH, spk)
    assert bundle.prompt_embeds.shape[1] == 10
    assert prompt_length(LANG_ENGLISH, True) == 10

    # role part == text_project of [IM_START, ASSISTANT, TTS_BOS]
    from leaxer_qwen3_tts_tpu.config import ASSISTANT, IM_START, TTS_BOS

    role = text_project(emb, jnp.array([IM_START, ASSISTANT, TTS_BOS]))
    assert jnp.allclose(bundle.prompt_embeds[0, :3], role, atol=1e-4)

    # trailing: rows 0..1 = text tokens 2,3; row 2 = TTS_EOS embed
    from leaxer_qwen3_tts_tpu.config import TTS_EOS

    t1 = text_project(emb, jnp.array([6, 7]))
    eos = text_project(emb, jnp.array([TTS_EOS]))[0]
    assert jnp.allclose(bundle.trailing[0, :2], t1, atol=1e-4)
    assert jnp.allclose(bundle.trailing[0, 2], eos, atol=1e-4)
    assert int(bundle.trailing_len[0]) == 3

    # tts_pad_embed
    pad = text_project(emb, jnp.array([TTS_PAD]))[0]
    assert jnp.allclose(bundle.tts_pad_embed, pad, atol=1e-4)

    # last prompt slot = first_text + CODEC_BOS codec embed
    first = text_project(emb, jnp.array([5]))[0] + codec_embed(emb, jnp.array([CODEC_BOS]))[0]
    assert jnp.allclose(bundle.prompt_embeds[0, -1], first, atol=1e-4)


def test_multistream_independence(tiny_model):
    """A request's codes must not depend on what else is in the batch when the
    prompts and per-stream keys match... (batch semantics: the fused key differs
    per batch position, so we check structural independence: EOS in stream 0
    does not invalidate stream 1)."""
    cfg, params = tiny_model
    fns = make_generate_fns(cfg, batch=2, max_len=64, chunk_len=8, lang_id=None, donate=False)
    text_ids = jnp.array([[5, 6, 7, 0], [9, 10, 0, 0]], jnp.int32)
    text_len = jnp.array([3, 2], jnp.int32)
    state, bundle = fns.prefill(params, text_ids, text_len, jax.random.PRNGKey(0))
    state = state._replace(done=jnp.array([True, False]))
    _, frames, valid = fns.decode(
        params, state, bundle.trailing, bundle.trailing_len, bundle.tts_pad_embed, SP
    )
    assert not bool(valid[0].any())
    assert bool(valid[1].all())
    assert bool((frames[0] == 0).all())


def test_mtp_dense_matches_cached(tiny_model):
    """predict_subcodes impl='dense' (cache-free recompute) produces the same
    greedy sub-codes and embedding sum as the incremental-KV path."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from leaxer_qwen3_tts_tpu.models.code_predictor import predict_subcodes
    from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams, sample_token

    cfg, params = tiny_model
    rng = np.random.default_rng(0)
    B, H = 2, cfg.talker.hidden_size
    hidden = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    c0e = jnp.asarray(rng.standard_normal((B, H)) * 0.02, jnp.float32)
    sp = SamplingParams.create(temperature=0.0)
    sample_fn = lambda k, lg: sample_token(k, lg, sp)
    key = jax.random.PRNGKey(0)

    cached_cfg = dataclasses.replace(cfg.code_predictor, impl="cached")
    dense_cfg = dataclasses.replace(cfg.code_predictor, impl="dense")
    subs_c, sum_c = predict_subcodes(
        cached_cfg, params["code_predictor"], params["embeddings"]["pred_embed"],
        hidden, c0e, key, sample_fn,
    )
    subs_d, sum_d = predict_subcodes(
        dense_cfg, params["code_predictor"], params["embeddings"]["pred_embed"],
        hidden, c0e, key, sample_fn,
    )
    np.testing.assert_array_equal(np.asarray(subs_c), np.asarray(subs_d))
    np.testing.assert_allclose(np.asarray(sum_c), np.asarray(sum_d), atol=1e-5)


def test_prompt_length_accounting():
    """Static prompt-length math covers every conditioning combination
    (language x speaker x instruct) — the engine's ladder sizing relies on it."""
    import jax
    import jax.numpy as jnp

    from leaxer_qwen3_tts_tpu.config import LANG_ENGLISH
    from leaxer_qwen3_tts_tpu.models.embeddings import init_embedding_params
    from leaxer_qwen3_tts_tpu.config import CodePredictorConfig, TalkerConfig
    from leaxer_qwen3_tts_tpu.runtime.prompt import build_prompt, prompt_length

    tcfg = TalkerConfig()
    emb = init_embedding_params(
        TalkerConfig(
            transformer=tcfg.transformer.__class__(
                hidden_size=32, num_layers=1, num_heads=2, num_kv_heads=2,
                head_dim=16, intermediate_size=64, dtype="float32",
            ),
            text_vocab_size=152000,
            text_embed_dim=32,
        ),
        CodePredictorConfig(num_steps=2, subcode_vocab_size=8),
        jax.random.PRNGKey(0),
    )
    ids = jnp.asarray([[5, 6, 7]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)
    spk = jnp.zeros((1, 32), jnp.float32)
    instr = jnp.asarray([[9, 10]], jnp.int32)
    ilen = jnp.asarray([2], jnp.int32)

    for lang in (None, LANG_ENGLISH):
        for use_spk in (False, True):
            for use_instr in (False, True):
                bundle = build_prompt(
                    emb, ids, lens, lang,
                    spk if use_spk else None,
                    instr if use_instr else None,
                    ilen if use_instr else None,
                )
                expected = prompt_length(
                    lang, use_spk, instr.shape[1] if use_instr else 0
                )
                assert bundle.prompt_embeds.shape[1] == expected, (
                    lang, use_spk, use_instr,
                )
