"""parity_check tool: self-consistency run (fixture generated from our own
tiny model must PASS; a corrupted fixture must FAIL)."""

import json
import os
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_dir(tiny_model, tiny_vocab_files, tmp_path_factory):
    from leaxer_qwen3_tts_tpu.runtime.weights import save_checkpoint

    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    d = str(tmp_path_factory.mktemp("pc") / "ckpt")
    save_checkpoint(d, cfg, params)
    shutil.copy(vocab_path, os.path.join(d, "vocab.json"))
    shutil.copy(merges_path, os.path.join(d, "merges.txt"))
    return d


def test_parity_check_pass_and_fail(model_dir, tmp_path):
    from tools.parity_check import main
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine

    eng = TTSEngine(model_dir, max_frames=4, chunk_len=2)
    text = "hello world"
    r = eng.synthesize(text, temperature=0.0)
    fx = str(tmp_path / "fx.npz")
    np.savez(
        fx,
        text=text,
        token_ids=np.asarray(eng.tokenizer.encode(text), np.int32),
        codes=r.codes,
        waveform=r.audio,
    )
    assert main(["--model", model_dir, "--fixture", fx]) == 0

    bad = str(tmp_path / "bad.npz")
    np.savez(
        bad,
        text=text,
        token_ids=np.asarray([1, 2, 3], np.int32),
        waveform=r.audio + 0.5,
    )
    assert main(["--model", model_dir, "--fixture", bad]) == 1
