"""Profiling hook test: QTTS_PROFILE captures an XPlane trace per synthesis."""

import os

import pytest


def test_profile_trace_written(tiny_model, tiny_vocab_files, tmp_path, monkeypatch):
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.frontend import Tokenizer

    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    monkeypatch.setenv("QTTS_PROFILE", str(tmp_path))
    eng = TTSEngine(
        config=cfg,
        params=params,
        tokenizer=Tokenizer(vocab_path, merges_path),
        max_frames=3,
        chunk_len=3,
    )
    eng.synthesize("hello", temperature=0.0)
    traces = [
        os.path.join(root, f)
        for root, _, files in os.walk(tmp_path)
        for f in files
    ]
    assert traces, "no profiler output written"


def test_no_profile_without_env(tiny_model, tiny_vocab_files, tmp_path, monkeypatch):
    from leaxer_qwen3_tts_tpu.utils.profiling import maybe_trace

    monkeypatch.delenv("QTTS_PROFILE", raising=False)
    with maybe_trace("x"):
        pass  # no-op without the env var
    assert list(tmp_path.iterdir()) == []
