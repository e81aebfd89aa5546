"""Trained speculative-draft head: shapes, training signal, and the
end-to-end payoff — higher spec-decode commit rates with output unchanged."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from leaxer_qwen3_tts_tpu.config import DraftConfig
from leaxer_qwen3_tts_tpu.models.draft import (
    draft_predict,
    init_draft_params,
    model_draft_fn,
)
from leaxer_qwen3_tts_tpu.runtime.generate import make_generate_fns
from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams
from leaxer_qwen3_tts_tpu.runtime.speculative import make_spec_generate_fns
from leaxer_qwen3_tts_tpu.training.draft_loss import (
    draft_loss,
    make_draft_train_step,
)

GREEDY = SamplingParams.create(temperature=0.0, forbid_eos=True)
TEXT_IDS = jnp.array([[5, 6, 7, 0]], jnp.int32)
TEXT_LEN = jnp.array([3], jnp.int32)


def _dcfg(cfg):
    return DraftConfig(
        hidden_size=cfg.talker.transformer.hidden_size,
        d_model=64,
        codec_vocab_size=cfg.talker.codec_vocab_size,
        subcode_vocab_size=cfg.code_predictor.subcode_vocab_size,
        dtype="float32",
    )


def test_draft_predict_shapes(tiny_model):
    cfg, params = tiny_model
    dcfg = _dcfg(cfg)
    dp = init_draft_params(dcfg, jax.random.PRNGKey(0))
    H = cfg.talker.transformer.hidden_size
    codes = draft_predict(
        dcfg, dp, params["embeddings"],
        jnp.zeros((2, H)), jnp.zeros((2, H)), 3,
    )
    assert codes.shape == (2, 3, 16) and codes.dtype == jnp.int32
    assert (codes >= 0).all()


def _greedy_rollout(cfg, params, n_chunks=3, chunk=8):
    fns = make_generate_fns(cfg, batch=1, max_len=64, chunk_len=chunk,
                            lang_id=None, donate=False)
    state, bundle = fns.prefill(params, TEXT_IDS, TEXT_LEN, jax.random.PRNGKey(3))
    frames = []
    for _ in range(n_chunks):
        state, fr, _ = fns.decode(
            params, state, bundle.trailing, bundle.trailing_len,
            bundle.tts_pad_embed, GREEDY,
        )
        frames.append(fr)
    return jnp.concatenate(frames, axis=1)  # [1, F, 16]


def test_draft_training_improves_and_stays_exact(tiny_model):
    """Train the draft on the tiny model's own greedy rollout: the loss must
    drop, spec-decode commits-per-dispatch must beat an always-wrong draft,
    and the committed output must STILL equal the sequential rollout."""
    cfg, params = tiny_model
    dcfg = _dcfg(cfg)
    dp = init_draft_params(dcfg, jax.random.PRNGKey(1))

    codes = _greedy_rollout(cfg, params)  # [1, F, 16]
    F = codes.shape[1]
    batch = {
        "text_ids": TEXT_IDS,
        "text_len": TEXT_LEN,
        "codes": codes,
        "num_frames": jnp.array([F], jnp.int32),
    }

    m0 = draft_loss(cfg, dcfg, params, dp, batch["text_ids"],
                    batch["text_len"], batch["codes"], batch["num_frames"])
    tx = optax.adam(3e-3)
    opt = tx.init(dp)
    step = make_draft_train_step(cfg, dcfg, tx)
    for _ in range(150):
        dp, opt, m = step(dp, opt, params, batch)
    assert float(m.loss) < float(m0.loss) * 0.5, (float(m0.loss), float(m.loss))

    # spec decode with the trained draft vs an always-wrong draft
    k, iters, n_dispatch = 4, 2, 3

    def run_spec(draft_fn):
        fns = make_spec_generate_fns(cfg, max_len=64, k=k, num_iters=iters,
                                     lang_id=None, donate=False,
                                     draft_fn=draft_fn)
        state, bundle, f0, v0 = fns.prefill(
            params, TEXT_IDS, TEXT_LEN, jax.random.PRNGKey(3), GREEDY
        )
        frames = [np.asarray(f0)]
        valid = [np.asarray(v0)]
        for _ in range(n_dispatch):
            state, fr, vd = fns.decode(
                params, state, bundle.trailing, bundle.trailing_len,
                bundle.tts_pad_embed, GREEDY,
            )
            frames.append(np.asarray(fr)[0])
            valid.append(np.asarray(vd)[0])
        frames = np.concatenate(frames, 0)
        valid = np.concatenate(valid, 0)
        return frames[valid], int(np.asarray(state.step)[0])

    def wrong_draft(state, kk):
        return jnp.broadcast_to((state.pending[:, None, :] + 1) % 2048, (1, kk - 1, 16)), None

    out_wrong, commits_wrong = run_spec(wrong_draft)
    trained = model_draft_fn(dcfg, dp, params["embeddings"])
    out_trained, commits_trained = run_spec(trained)

    assert commits_wrong == 1 + n_dispatch * iters  # exactly 1/iteration
    assert commits_trained > commits_wrong, (commits_trained, commits_wrong)

    # exactness is draft-independent
    seq = np.asarray(_greedy_rollout(cfg, params))[0]
    n = min(len(out_trained), len(seq))
    np.testing.assert_array_equal(out_trained[:n], seq[:n])
    n = min(len(out_wrong), len(seq))
    np.testing.assert_array_equal(out_wrong[:n], seq[:n])


def test_engine_uses_model_draft_and_matches(tiny_model, tiny_vocab_files):
    """A checkpoint with draft config+params routes spec decode through the
    model draft (greedy output still identical to sequential)."""
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.frontend import Tokenizer

    cfg, params = tiny_model
    dcfg = _dcfg(cfg)
    cfg_d = dataclasses.replace(cfg, draft=dcfg)
    params_d = dict(params)
    params_d["draft"] = init_draft_params(dcfg, jax.random.PRNGKey(2))

    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)
    kw = dict(tokenizer=tok, max_frames=10, chunk_len=4)
    seq_eng = TTSEngine(config=cfg, params=params, **kw)
    spec_eng = TTSEngine(config=cfg_d, params=params_d, spec_k=3,
                         spec_iters=2, **kw)
    assert spec_eng.is_ready(), spec_eng.get_error()
    a = seq_eng.synthesize("hello world", temperature=0.0, seed=5)
    b = spec_eng.synthesize("hello world", temperature=0.0, seed=5)
    np.testing.assert_array_equal(np.asarray(b.codes), np.asarray(a.codes))


def test_draft_config_checkpoint_roundtrip(tmp_path, tiny_model):
    from leaxer_qwen3_tts_tpu.runtime.weights import (
        init_params,
        load_checkpoint,
        save_checkpoint,
    )

    cfg, _ = tiny_model
    cfg_d = dataclasses.replace(cfg, draft=_dcfg(cfg))
    params = init_params(cfg_d, jax.random.PRNGKey(0), with_speaker_encoder=False)
    assert "draft" in params
    save_checkpoint(str(tmp_path), cfg_d, params)
    cfg2, params2 = load_checkpoint(str(tmp_path))
    assert cfg2.draft == cfg_d.draft
    np.testing.assert_array_equal(
        np.asarray(params2["draft"]["w_in"]), np.asarray(params["draft"]["w_in"])
    )


def test_train_draft_tool_end_to_end(tiny_model, tiny_vocab_files, tmp_path):
    """tools/train_draft.py: self-rollout -> train -> checkpoint carries the
    draft -> a spec engine uses it and still greedy-matches sequential."""
    import json as _json
    import os
    import shutil as _sh

    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.runtime.weights import save_checkpoint
    from tools.train_draft import main as train_main

    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, cfg, params)
    _sh.copy(vocab_path, os.path.join(d, "vocab.json"))
    _sh.copy(merges_path, os.path.join(d, "merges.txt"))
    out = str(tmp_path / "ckpt_draft")

    rc = train_main(["--model", d, "--out", out, "--steps", "40",
                     "--frames", "8", "--d-model", "32"])
    assert rc == 0

    eng = TTSEngine(out, max_frames=8, chunk_len=4, spec_k=3, spec_iters=2)
    assert eng.is_ready(), eng.get_error()
    assert eng.cfg.draft is not None and "draft" in eng.params
    seq = TTSEngine(d, max_frames=8, chunk_len=4)
    a = seq.synthesize("hello world", temperature=0.0, seed=5)
    b = eng.synthesize("hello world", temperature=0.0, seed=5)
    np.testing.assert_array_equal(np.asarray(b.codes), np.asarray(a.codes))
