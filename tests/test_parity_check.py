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


def test_parity_all_stages_across_onnx_roundtrip(model_dir, tmp_path):
    """The executable per-stage parity gate (round-1 verdict item 3): generate
    a fixture (embeds / prefill logits / per-step decode logits / codes /
    waveform) from checkpoint A, push A through the 8-graph ONNX export ->
    converter round trip, and run the gate against the round-tripped
    checkpoint.  Every stage must PASS — the same invocation swaps in
    reference-generated fixtures when real assets arrive."""
    import jax

    import tools.convert as tc
    from tools.make_parity_fixtures import main as gen
    from tools.onnx_export import export_onnx_model_dir
    from tools.parity_check import main as check
    from leaxer_qwen3_tts_tpu.runtime.weights import load_checkpoint

    fx = str(tmp_path / "fx.npz")
    rc = gen([
        "--model", model_dir, "--text", "hello world",
        "--max-frames", "4", "--out", fx,
    ])
    assert rc == 0
    with np.load(fx, allow_pickle=True) as z:
        keys = set(z.files)
    assert {"prompt_embeds", "prefill_logits", "decode_logits",
            "codes", "waveform", "token_ids"} <= keys

    onnx_dir = str(tmp_path / "onnx")
    _, params = load_checkpoint(model_dir)
    export_onnx_model_dir(jax.device_get(params), onnx_dir)
    ckpt2 = str(tmp_path / "ckpt2")
    rc = tc.main([
        "onnx", "--src", onnx_dir, "--out", ckpt2,
        "--config", os.path.join(model_dir, "config.json"), "--strict",
    ])
    assert rc == 0
    for f in ("vocab.json", "merges.txt"):
        shutil.copy(os.path.join(model_dir, f), os.path.join(ckpt2, f))

    assert check(["--model", ckpt2, "--fixture", fx]) == 0

    # corrupted stage fixtures must FAIL the gate
    with np.load(fx, allow_pickle=True) as z:
        bad = {k: z[k] for k in z.files}
    bad["prefill_logits"] = bad["prefill_logits"] + 1.0
    bad_path = str(tmp_path / "bad.npz")
    np.savez(bad_path, **bad)
    assert check(["--model", ckpt2, "--fixture", bad_path]) == 1


def test_quality_report_runs(model_dir, capsys):
    """int8-vs-bf16 fidelity report (round-1 verdict item 5) runs end-to-end
    and emits the expected metrics."""
    from tools.quality_report import main

    rc = main(["--model", model_dir, "--max-frames", "3"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= report["code_agreement"] <= 1.0
    assert -1.0 <= report["prefill_logit_corr"] <= 1.0
    assert report["frames_compared"] >= 1


def test_spec_report_runs(model_dir, capsys):
    """Speculative-acceptance report runs end-to-end: greedy parity holds
    and the acceptance accounting is self-consistent."""
    from tools.spec_report import main

    rc = main(["--model", model_dir, "--max-frames", "6", "--k", "3"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["greedy_parity_vs_sequential"] is True
    assert 0.0 <= report["acceptance"] <= 1.0
    assert 1.0 <= report["commits_per_iteration"] <= report["k"]
    assert report["draft"] == "repeat"
    assert report["frames"] >= 1
