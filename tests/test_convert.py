"""Converter tests: ONNX wire-format parser round-trip and HF-name mapping
into a runnable checkpoint."""

import json
import os
import struct

import numpy as np
import pytest

from tools.onnx_tensors import load_onnx_initializers
from tools.convert import _HF_RULES, assemble, map_tensors


# ---------------------------------------------------------------------------
# minimal protobuf ENCODER (test-only) to fabricate ONNX files
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    if v < 0:
        v += 1 << 64
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int, payload) -> bytes:
    tag = _varint((num << 3) | wire)
    if wire == 0:
        return tag + _varint(payload)
    if wire == 2:
        return tag + _varint(len(payload)) + payload
    raise ValueError(wire)


def _tensor_proto(name: str, arr: np.ndarray, bf16: bool = False) -> bytes:
    body = b""
    for d in arr.shape:
        body += _field(1, 0, d)
    if bf16:
        body += _field(2, 0, 16)
        u32 = arr.astype(np.float32).view(np.uint32)
        body += _field(9, 2, (u32 >> 16).astype("<u2").tobytes())
    elif arr.dtype == np.float32:
        body += _field(2, 0, 1)
        body += _field(9, 2, arr.astype("<f4").tobytes())
    elif arr.dtype == np.int64:
        body += _field(2, 0, 7)
        body += _field(9, 2, arr.astype("<i8").tobytes())
    elif arr.dtype == np.float16:
        body += _field(2, 0, 10)
        body += _field(9, 2, arr.astype("<f2").tobytes())
    else:
        raise ValueError(arr.dtype)
    body += _field(8, 2, name.encode())
    return body


def _onnx_file(path: str, tensors: dict, bf16_names=()) -> None:
    graph = b""
    for name, arr in tensors.items():
        graph += _field(5, 2, _tensor_proto(name, arr, bf16=name in bf16_names))
    model = _field(1, 0, 8)  # ir_version
    model += _field(7, 2, graph)
    with open(path, "wb") as f:
        f.write(model)


def test_onnx_parser_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "layer.weight": rng.standard_normal((4, 6)).astype(np.float32),
        "embed": rng.standard_normal((10, 3)).astype(np.float32),
        "ids": np.arange(7, dtype=np.int64),
        "half": rng.standard_normal((2, 2)).astype(np.float16),
        "bf": rng.standard_normal((3, 5)).astype(np.float32),
        "scalar": np.float32(2.5).reshape(()),
    }
    path = str(tmp_path / "m.onnx")
    _onnx_file(path, tensors, bf16_names={"bf"})
    out = load_onnx_initializers(path)
    assert set(out) == set(tensors)
    np.testing.assert_array_equal(out["layer.weight"], tensors["layer.weight"])
    np.testing.assert_array_equal(out["ids"], tensors["ids"])
    np.testing.assert_array_equal(out["half"], tensors["half"])
    assert out["scalar"].shape == ()
    # bf16 loses mantissa bits only
    np.testing.assert_allclose(out["bf"], tensors["bf"], atol=0.02, rtol=0.01)


def test_hf_name_mapping_and_stacking():
    rng = np.random.default_rng(1)
    H, L = 8, 2
    tensors = {}
    for l in range(L):
        p = f"talker.model.layers.{l}"
        tensors[f"{p}.input_layernorm.weight"] = rng.standard_normal(H).astype(np.float32)
        tensors[f"{p}.self_attn.q_proj.weight"] = rng.standard_normal((2 * H, H)).astype(np.float32)
        tensors[f"{p}.mlp.down_proj.weight"] = rng.standard_normal((H, 3 * H)).astype(np.float32)
    tensors["talker.model.norm.weight"] = rng.standard_normal(H).astype(np.float32)
    tensors["talker.lm_head.weight"] = rng.standard_normal((32, H)).astype(np.float32)
    tensors["talker.model.embed_tokens.weight"] = rng.standard_normal((100, H)).astype(np.float32)
    tensors["something.unknown"] = np.zeros(3, np.float32)
    for s in range(3):  # per-step MTP heads: [out, in] torch -> [in, out] ours
        tensors[f"talker.code_predictor.heads.{s}.weight"] = rng.standard_normal(
            (16, H)
        ).astype(np.float32)

    staged, unmapped, conflicts = map_tensors(tensors)
    assert unmapped == ["something.unknown"]
    assert conflicts == []
    flat = assemble(staged)
    assert flat["code_predictor/heads"].shape == (3, H, 16)
    assert flat["talker/transformer/layers/wq"].shape == (L, H, 2 * H)  # transposed
    assert flat["talker/transformer/layers/wd"].shape == (L, 3 * H, H)
    assert flat["talker/lm_head"].shape == (H, 32)
    assert flat["embeddings/text_embed"].shape == (100, H)  # not transposed
    np.testing.assert_array_equal(
        flat["talker/transformer/layers/wq"][1],
        tensors["talker.model.layers.1.self_attn.q_proj.weight"].T,
    )


def test_full_hf_conversion_runs(tmp_path, tiny_model):
    """Fabricate a complete HF-style safetensors for the tiny talker and check
    the CLI converts + the checkpoint loads and runs prefill."""
    from safetensors.numpy import save_file

    import tools.convert as tc
    from leaxer_qwen3_tts_tpu.runtime.weights import (
        flatten_params,
        load_checkpoint,
    )
    import jax

    cfg, params = tiny_model
    flat = flatten_params(jax.device_get(params))

    # fabricate HF names for every talker-transformer tensor of the tiny model
    inv = {
        "attn_norm": "input_layernorm.weight",
        "wq": "self_attn.q_proj.weight",
        "wk": "self_attn.k_proj.weight",
        "wv": "self_attn.v_proj.weight",
        "wo": "self_attn.o_proj.weight",
        "q_norm": "self_attn.q_norm.weight",
        "k_norm": "self_attn.k_norm.weight",
        "mlp_norm": "post_attention_layernorm.weight",
        "wg": "mlp.gate_proj.weight",
        "wu": "mlp.up_proj.weight",
        "wd": "mlp.down_proj.weight",
    }
    hf = {}
    L = cfg.talker.transformer.num_layers
    for our, theirs in inv.items():
        stacked = flat[f"talker/transformer/layers/{our}"]
        for l in range(L):
            arr = stacked[l]
            if arr.ndim == 2:
                arr = arr.T  # converter transposes back
            hf[f"talker.model.layers.{l}.{theirs}"] = np.ascontiguousarray(
                arr, np.float32
            )
    hf["talker.model.norm.weight"] = flat["talker/transformer/final_norm"]
    hf["talker.lm_head.weight"] = np.ascontiguousarray(flat["talker/lm_head"].T)
    hf["talker.model.embed_tokens.weight"] = flat["embeddings/text_embed"]
    hf["talker.model.text_proj.weight"] = np.ascontiguousarray(
        flat["embeddings/text_proj"].T
    )
    hf["talker.model.codec_embed.weight"] = flat["embeddings/codec_embed"]

    src = tmp_path / "hf"
    src.mkdir()
    save_file(hf, str(src / "model.safetensors"))

    out = str(tmp_path / "ckpt")
    # non-strict: code-predictor / vocoder params stay random-init
    rc = tc.main([
        "hf", "--src", str(src), "--out", out, "--config", "tiny-test",
    ])
    assert rc == 0

    cfg2, params2 = load_checkpoint(out)
    flat2 = flatten_params(jax.device_get(params2))
    np.testing.assert_allclose(
        flat2["talker/transformer/layers/wq"],
        flat["talker/transformer/layers/wq"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        flat2["talker/lm_head"], flat["talker/lm_head"], rtol=1e-6
    )


@pytest.fixture(autouse=True)
def _register_tiny_preset(tiny_model):
    """Expose the tiny config under PRESETS for the converter CLI."""
    from leaxer_qwen3_tts_tpu.config import PRESETS

    cfg, _ = tiny_model
    PRESETS[cfg.name] = cfg
    yield
    PRESETS.pop(cfg.name, None)


def test_onnx_8graph_roundtrip_strict(tmp_path, tiny_model):
    """The full proof-of-path for the real export (round-1 verdict item 2):
    re-export the tiny model as the reference's 8-graph ONNX layout
    (tools/onnx_export.py, torch naming + layouts), convert it back with
    ZERO --remap entries under --strict, and assert a bit-identical
    round-trip for EVERY parameter of every module — talker, MTP, embeddings,
    vocoder, speaker encoder."""
    import jax

    import tools.convert as tc
    from tools.onnx_export import export_onnx_model_dir
    from leaxer_qwen3_tts_tpu.runtime.weights import (
        flatten_params,
        load_checkpoint,
    )

    cfg, params = tiny_model
    src = str(tmp_path / "onnx")
    export_onnx_model_dir(jax.device_get(params), src)
    names = sorted(os.listdir(src))
    assert names == [
        "code_predictor.onnx", "code_predictor_embed.onnx", "codec_embed.onnx",
        "speaker_encoder.onnx", "talker_decode.onnx", "talker_prefill.onnx",
        "text_project.onnx", "tokenizer12hz_decode.onnx",
    ]

    out = str(tmp_path / "ckpt")
    rc = tc.main([
        "onnx", "--src", src, "--out", out, "--config", cfg.name, "--strict",
    ])
    assert rc == 0  # strict: no unmapped / missing / mismatched / conflicting

    _, params2 = load_checkpoint(out)
    a = flatten_params(jax.device_get(params))
    b = flatten_params(jax.device_get(params2))
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_array_equal(
            np.asarray(a[key], np.float32), np.asarray(b[key], np.float32),
            err_msg=key,
        )


def test_onnx_conflict_detection(tmp_path):
    """Tensors staged to the same target from two graphs must agree; a
    doctored talker_decode with different weights fails strict."""
    from tools.onnx_tensors import write_onnx_model

    rng = np.random.default_rng(3)
    w = rng.standard_normal((8, 8)).astype(np.float32)
    base = {"model.layers.0.self_attn.q_proj.weight": w}
    src = tmp_path / "onnx"
    src.mkdir()
    write_onnx_model(str(src / "talker_prefill.onnx"), base)
    write_onnx_model(
        str(src / "talker_decode.onnx"),
        {"model.layers.0.self_attn.q_proj.weight": w + 1.0},
    )
    tensors = {}
    from tools.convert import load_source

    tensors = load_source("onnx", str(src))
    staged, unmapped, conflicts = map_tensors(tensors)
    assert unmapped == []
    assert len(conflicts) == 1 and "wq" in conflicts[0]


def test_onnx_fallback_roundtrip_strict(tmp_path, tiny_model):
    """Same strict 8-graph round-trip, but for the FALLBACK topologies
    (docs/FALSIFIABILITY.md): shared MTP head + step embedding, iSTFT
    vocoder head, ECAPA speaker encoder.  Bring-up must be config-only
    whichever guess a real dump confirms."""
    import dataclasses

    import jax

    import tools.convert as tc
    from tools.onnx_export import export_onnx_model_dir
    from leaxer_qwen3_tts_tpu.config import PRESETS
    from leaxer_qwen3_tts_tpu.runtime.weights import (
        flatten_params,
        init_params,
        load_checkpoint,
    )

    cfg, _ = tiny_model
    fb = dataclasses.replace(
        cfg,
        name="tiny-test-fallback",
        code_predictor=dataclasses.replace(cfg.code_predictor, head_mode="shared"),
        vocoder=dataclasses.replace(cfg.vocoder, head="istft"),
        speaker_encoder=dataclasses.replace(
            cfg.speaker_encoder,
            topology="ecapa", ecapa_channels=32, ecapa_scale=4,
            ecapa_mfa_dim=48, ecapa_att_dim=16,
        ),
    )
    params = jax.device_get(init_params(fb, jax.random.PRNGKey(5)))
    src = str(tmp_path / "onnx_fb")
    export_onnx_model_dir(params, src)

    PRESETS[fb.name] = fb
    try:
        out = str(tmp_path / "ckpt_fb")
        rc = tc.main([
            "onnx", "--src", src, "--out", out, "--config", fb.name,
            "--strict",
        ])
        assert rc == 0
        _, params2 = load_checkpoint(out)
    finally:
        PRESETS.pop(fb.name, None)

    a = flatten_params(params)
    b = flatten_params(jax.device_get(params2))
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_array_equal(
            np.asarray(a[key], np.float32), np.asarray(b[key], np.float32),
            err_msg=key,
        )


def test_customvoice_conversion_roundtrip(tmp_path, tiny_model, tiny_vocab_files):
    """CustomVoice: a converted checkpoint carrying a preset-speaker table
    must activate engine.synthesize_speaker (beyond the reference stub,
    tts_onnx.cpp:320-329)."""
    import jax

    import tools.convert as tc
    from tools.onnx_export import export_onnx_model_dir
    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.frontend import Tokenizer
    from leaxer_qwen3_tts_tpu.runtime.weights import load_checkpoint

    cfg, params = tiny_model
    rng = np.random.default_rng(7)
    table = rng.standard_normal((9, 64)).astype(np.float32)
    p = dict(jax.device_get(params))
    p["speaker_table"] = table
    src = str(tmp_path / "onnx_cv")
    export_onnx_model_dir(p, src)

    out = str(tmp_path / "ckpt_cv")
    rc = tc.main([
        "onnx", "--src", src, "--out", out, "--config", cfg.name, "--strict",
    ])
    assert rc == 0

    _, params2 = load_checkpoint(out)
    np.testing.assert_array_equal(
        np.asarray(params2["speaker_table"], np.float32), table
    )

    vocab_path, merges_path, _ = tiny_vocab_files
    eng = TTSEngine(
        config=cfg, params=params2,
        tokenizer=Tokenizer(vocab_path, merges_path),
        max_frames=8, chunk_len=4,
    )
    assert eng.is_ready(), eng.get_error()
    r = eng.synthesize_speaker("hello", "vivian", temperature=0.0)
    plain = eng.synthesize("hello", temperature=0.0)
    # the table row conditions the prompt: output differs from default voice
    assert (r.codes.shape != plain.codes.shape) or not np.array_equal(
        r.codes, plain.codes
    )
