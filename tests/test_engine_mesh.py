"""Engine on a mesh: TP+DP-sharded synthesis matches single-device output,
and the 1.7B preset traces (shape-level) under TP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.api.engine import EngineError, TTSEngine
from leaxer_qwen3_tts_tpu.frontend import Tokenizer
from leaxer_qwen3_tts_tpu.parallel import make_mesh


def test_engine_sharded_matches_single(tiny_model, tiny_vocab_files):
    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)

    plain = TTSEngine(
        config=cfg, params=params, tokenizer=tok, max_frames=4, chunk_len=2
    )
    r0 = plain.synthesize_batch(["hello world", "hello"], temperature=0.0)

    mesh = make_mesh(2, 4)
    with jax.set_mesh(mesh):
        sharded = TTSEngine(
            config=cfg, params=params, tokenizer=tok,
            max_frames=4, chunk_len=2, mesh=mesh,
        )
        r1 = sharded.synthesize_batch(["hello world", "hello"], temperature=0.0)

    for a, b in zip(r0, r1):
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_allclose(a.audio, b.audio, atol=2e-4)


def test_quantize_plus_mesh_rejected(tiny_model):
    cfg, params = tiny_model
    mesh = make_mesh(2, 4)
    eng = TTSEngine(config=cfg, params=params, mesh=mesh, quantize="int8")
    assert not eng.is_ready()
    assert "unsupported" in eng.get_error()


def test_17b_preset_traces_under_tp():
    """The 1.7B VoiceDesign-scale config compiles shape-level (eval_shape —
    no 1.7B allocation on the test host) with TP-sharded dims divisible."""
    from leaxer_qwen3_tts_tpu.config import QWEN3_TTS_17B
    from leaxer_qwen3_tts_tpu.parallel import param_pspec
    from leaxer_qwen3_tts_tpu.runtime.generate import make_generate_fns
    from leaxer_qwen3_tts_tpu.runtime.weights import init_params

    cfg = QWEN3_TTS_17B
    t = cfg.talker.transformer
    # every TP-sharded dim divides a 4-way model axis
    for dim in (t.q_dim, t.kv_dim, t.intermediate_size, cfg.talker.codec_vocab_size):
        assert dim % 4 == 0, dim

    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, with_speaker_encoder=False),
        jax.random.PRNGKey(0),
    )
    assert shapes["talker"]["transformer"]["layers"]["wq"].shape == (28, 2048, 2048)

    fns = make_generate_fns(cfg, batch=1, max_len=64, chunk_len=4)
    ids = jnp.zeros((1, 8), jnp.int32)
    lens = jnp.full((1,), 8, jnp.int32)
    out_shapes = jax.eval_shape(
        fns.prefill, shapes, ids, lens, jax.random.PRNGKey(0)
    )
    state_shape = out_shapes[0]
    assert state_shape.last_logits.shape == (1, 3072)
    assert state_shape.cache.k.shape == (28, 1, 8, 64, 128)  # head-major

def test_engine_sharded_kv_quant_matches_single(tiny_model, tiny_vocab_files):
    """int8 KV cache under a TP x DP mesh: GSPMD shards the int8 cache and
    scale arrays; greedy output identical to the single-device kv_quant
    engine."""
    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)
    kw = dict(config=cfg, params=params, tokenizer=tok, max_frames=4,
              chunk_len=2, kv_quant=True)

    plain = TTSEngine(**kw)
    r0 = plain.synthesize_batch(["hello world", "hello"], temperature=0.0)

    mesh = make_mesh(2, 4)
    with jax.set_mesh(mesh):
        sharded = TTSEngine(**kw, mesh=mesh)
        assert sharded.is_ready(), sharded.get_error()
        r1 = sharded.synthesize_batch(["hello world", "hello"], temperature=0.0)
    for a, b in zip(r0, r1):
        np.testing.assert_array_equal(a.codes, b.codes)
