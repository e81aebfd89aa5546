"""Readiness pack: the committed name manifests for the expected real weight
exports must dry-run green against the conversion rules (tools/convert.py),
and the dry-run must actually catch deviations."""

import json

import pytest

from tools.convert import dry_run


ONNX = "tests/fixtures/manifest_onnx_8graph.json"
HF = "tests/fixtures/manifest_hf.json"


def test_onnx_manifest_dry_run_green(capsys):
    assert dry_run(ONNX, "qwen3-tts-12hz-0.6b-base", None, True) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"] and not rep["unmapped"] and not rep["missing"]
    # the talker transformer is duplicated across prefill/decode graphs and
    # must dedup (every model param covered from 860 source tensors)
    assert rep["source_tensors"] > rep["model_params"]


def test_hf_manifest_dry_run_green(capsys):
    assert dry_run(HF, "qwen3-tts-12hz-0.6b-base", None, False) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"] and not rep["unmapped"]
    # LM-only checkpoint: the codec decoder ships separately
    assert rep["absent_modules_tolerated"] == ["vocoder"]


def test_manifests_match_generator(tmp_path):
    """Committed fixtures == regenerated (shapes track the model config)."""
    from tools.make_manifests import main as gen

    gen([str(tmp_path)])
    for name in (
        "manifest_onnx_8graph.json",
        "manifest_hf.json",
        "manifest_onnx_fallback.json",
        "manifest_onnx_customvoice.json",
        "config_fallback.json",
    ):
        with open(f"tests/fixtures/{name}") as f:
            committed = json.load(f)
        with open(tmp_path / name) as f:
            fresh = json.load(f)
        assert committed == fresh, name


@pytest.mark.parametrize("mutation", ["rename", "reshape"])
def test_dry_run_catches_deviations(tmp_path, capsys, mutation):
    """A renamed or reshaped tensor in the manifest must fail the gate —
    that is exactly the failure mode the dry-run exists to surface when a
    real export's naming differs from these expectations."""
    with open(ONNX) as f:
        man = json.load(f)
    key = "talker_decode::model.layers.0.self_attn.q_proj.weight"
    if mutation == "rename":
        man["talker_decode::model.layers.0.self_attn.query.weight"] = man.pop(key)
    else:
        man[key] = [7, 7]
    p = tmp_path / "mut.json"
    p.write_text(json.dumps(man))
    assert dry_run(str(p), "qwen3-tts-12hz-0.6b-base", None, True) == 1
    rep = json.loads(capsys.readouterr().out)
    assert not rep["ok"]
    if mutation == "rename":
        assert any("query" in u for u in rep["unmapped"])
    else:
        assert rep["conflicts"] or rep["shape_mismatches"]


FALLBACK = "tests/fixtures/manifest_onnx_fallback.json"
FALLBACK_CFG = "tests/fixtures/config_fallback.json"
CUSTOMVOICE = "tests/fixtures/manifest_onnx_customvoice.json"


def test_fallback_manifest_dry_run_green(capsys):
    """The all-fallback-topology export (shared MTP head, iSTFT vocoder
    head, ECAPA speaker encoder — docs/FALSIFIABILITY.md) must map fully
    under the fallback config: real-weight bring-up is a config flip
    whichever guess the dump confirms."""
    assert dry_run(FALLBACK, FALLBACK_CFG, None, True) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"] and not rep["unmapped"] and not rep["missing"]


def test_fallback_manifest_fails_primary_config(capsys):
    """The same export must NOT silently convert under the primary-guess
    config — the dry-run is the gate that tells bring-up which topology
    the dump matches."""
    assert dry_run(FALLBACK, "qwen3-tts-12hz-0.6b-base", None, True) == 1
    rep = json.loads(capsys.readouterr().out)
    assert not rep["ok"]


def test_customvoice_manifest_dry_run_green(capsys):
    """CustomVoice-shaped export: base 8 graphs + the preset-speaker table
    (tts_onnx.h:82-93), which converts as an optional pass-through."""
    assert dry_run(CUSTOMVOICE, "qwen3-tts-12hz-0.6b-base", None, True) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"]
    assert rep["optional_targets"] == ["speaker_table"]
