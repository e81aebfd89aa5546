"""Re-export a framework checkpoint as the reference's 8-graph ONNX layout.

Produces the same model-dir shape the reference consumes
(tts_onnx.cpp:91-107): text_project / codec_embed / code_predictor_embed /
talker_prefill / talker_decode / code_predictor / tokenizer12hz_decode /
speaker_encoder .onnx files, with torch-export initializer naming and layouts
(Linear [out,in], Conv1d [out,in,K]).  The talker transformer is embedded in
BOTH talker_prefill and talker_decode, as in the real export.

Primary use: prove tools/convert.py end-to-end without the real assets —
export a tiny instance of this framework's models, convert it back, assert a
bit-identical round-trip (tests/test_convert.py).  The graphs carry
initializers only (weights), not executable node defs; the converter and the
reference's weight loading only read initializers.

Usage:
  python -m tools.onnx_export --src <ckpt_dir> --out <onnx_dir>
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict

import numpy as np

from .onnx_tensors import write_onnx_model


def _lin(a: np.ndarray) -> np.ndarray:
    """[in, out] -> torch nn.Linear.weight [out, in]."""
    return np.ascontiguousarray(a.T)


def _conv(a: np.ndarray) -> np.ndarray:
    """[K, in, out] -> torch nn.Conv1d.weight [out, in, K]."""
    return np.ascontiguousarray(a.transpose(2, 1, 0))


def _dw(a: np.ndarray) -> np.ndarray:
    """[K, C] -> torch depthwise nn.Conv1d.weight [C, 1, K]."""
    return np.ascontiguousarray(a.T[:, None, :])


def _transformer_tensors(layers: dict, final_norm, prefix: str) -> Dict[str, np.ndarray]:
    """Stacked [L, ...] layer params -> per-layer torch-named tensors."""
    names = {
        "attn_norm": ("input_layernorm.weight", None),
        "wq": ("self_attn.q_proj.weight", _lin),
        "wk": ("self_attn.k_proj.weight", _lin),
        "wv": ("self_attn.v_proj.weight", _lin),
        "wo": ("self_attn.o_proj.weight", _lin),
        "q_norm": ("self_attn.q_norm.weight", None),
        "k_norm": ("self_attn.k_norm.weight", None),
        "mlp_norm": ("post_attention_layernorm.weight", None),
        "wg": ("mlp.gate_proj.weight", _lin),
        "wu": ("mlp.up_proj.weight", _lin),
        "wd": ("mlp.down_proj.weight", _lin),
    }
    out: Dict[str, np.ndarray] = {}
    num_layers = np.asarray(layers["wq"]).shape[0]
    for key, (torch_name, tf) in names.items():
        stacked = np.asarray(layers[key])
        for layer in range(num_layers):
            a = stacked[layer]
            out[f"{prefix}layers.{layer}.{torch_name}"] = tf(a) if tf else a
    out[f"{prefix}norm.weight"] = np.asarray(final_norm)
    return out


def export_onnx_model_dir(params: dict, out_dir: str) -> None:
    """Write the 8 .onnx graph files for a framework params pytree."""
    os.makedirs(out_dir, exist_ok=True)
    f32 = lambda x: np.asarray(x, np.float32)  # noqa: E731 — export dtype

    emb = params["embeddings"]
    write_onnx_model(
        os.path.join(out_dir, "text_project.onnx"),
        {
            "model.embed_tokens.weight": f32(emb["text_embed"]),
            "text_projection.weight": _lin(f32(emb["text_proj"])),
        },
    )
    write_onnx_model(
        os.path.join(out_dir, "codec_embed.onnx"),
        {"codec_embedding.weight": f32(emb["codec_embed"])},
    )
    pred = f32(emb["pred_embed"])  # [steps, vocab, H]
    write_onnx_model(
        os.path.join(out_dir, "code_predictor_embed.onnx"),
        {f"embed_tokens.{j}.weight": pred[j] for j in range(pred.shape[0])},
    )

    talker = {
        k: f32(v) if not isinstance(v, dict) else v
        for k, v in params["talker"].items()
    }
    t_tensors = _transformer_tensors(
        {k: f32(v) for k, v in talker["transformer"]["layers"].items()},
        f32(talker["transformer"]["final_norm"]),
        "model.",
    )
    t_tensors["lm_head.weight"] = _lin(f32(talker["lm_head"]))
    if "speaker_table" in params:
        # CustomVoice preset-speaker table (tts_onnx.h:82-93), embedded in
        # the talker graphs like the other embedding-adjacent tensors
        t_tensors["model.speaker_embed.weight"] = f32(params["speaker_table"])
    # the real export embeds the transformer in both graphs
    write_onnx_model(os.path.join(out_dir, "talker_prefill.onnx"), t_tensors)
    write_onnx_model(os.path.join(out_dir, "talker_decode.onnx"), t_tensors)

    cp = params["code_predictor"]
    cp_tensors = _transformer_tensors(
        {k: f32(v) for k, v in cp["transformer"]["layers"].items()},
        f32(cp["transformer"]["final_norm"]),
        "model.",
    )
    if "head" in cp:
        # fallback topology: ONE shared head + step embedding
        cp_tensors["lm_head.weight"] = _lin(f32(cp["head"]))
        cp_tensors["step_embed.weight"] = f32(cp["step_embed"])
    else:
        heads = f32(cp["heads"])  # [steps, H, V]
        for j in range(heads.shape[0]):
            cp_tensors[f"lm_heads.{j}.weight"] = _lin(heads[j])
    write_onnx_model(os.path.join(out_dir, "code_predictor.onnx"), cp_tensors)

    voc = params["vocoder"]
    v: Dict[str, np.ndarray] = {}
    books = f32(voc["codebooks"])  # [16, size, D]
    for i in range(books.shape[0]):
        v[f"quantizer.codebooks.{i}.weight"] = books[i]
    for i, blk in enumerate(voc["prenet"]):
        v[f"decoder.prenet.{i}.dwconv.weight"] = _dw(f32(blk["dw"]))
        v[f"decoder.prenet.{i}.norm.weight"] = f32(blk["ln_scale"])
        v[f"decoder.prenet.{i}.norm.bias"] = f32(blk["ln_bias"])
        v[f"decoder.prenet.{i}.pwconv1.weight"] = _lin(f32(blk["w1"]))
        v[f"decoder.prenet.{i}.pwconv1.bias"] = f32(blk["b1"])
        v[f"decoder.prenet.{i}.pwconv2.weight"] = _lin(f32(blk["w2"]))
        v[f"decoder.prenet.{i}.pwconv2.bias"] = f32(blk["b2"])
    if "istft_out_w" in voc:
        # fallback topology: Vocos-style iSTFT head (no upsample stages);
        # the synthesis window ships in the export but is regenerated here
        v["decoder.head.norm.weight"] = f32(voc["head_ln_scale"])
        v["decoder.head.norm.bias"] = f32(voc["head_ln_bias"])
        v["decoder.head.out.weight"] = _lin(f32(voc["istft_out_w"]))
        v["decoder.head.out.bias"] = f32(voc["istft_out_b"])
        n_fft = f32(voc["istft_out_b"]).shape[0] - 2
        v["decoder.head.istft.window"] = (
            0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
        ).astype(np.float32)
    else:
        for s, stage in enumerate(voc["stages"]):
            v[f"decoder.ups.{s}.weight"] = _conv(f32(stage["up_w"]))
            v[f"decoder.ups.{s}.bias"] = f32(stage["up_b"])
            for r, blk in enumerate(stage["res"]):
                v[f"decoder.ups.{s}.resblocks.{r}.conv1.weight"] = _conv(f32(blk["w1"]))
                v[f"decoder.ups.{s}.resblocks.{r}.conv1.bias"] = f32(blk["b1"])
                v[f"decoder.ups.{s}.resblocks.{r}.conv2.weight"] = _conv(f32(blk["w2"]))
                v[f"decoder.ups.{s}.resblocks.{r}.conv2.bias"] = f32(blk["b2"])
        v["decoder.final_conv.weight"] = _conv(f32(voc["final_w"]))
        v["decoder.final_conv.bias"] = f32(voc["final_b"])
    write_onnx_model(os.path.join(out_dir, "tokenizer12hz_decode.onnx"), v)

    if "speaker_encoder" in params and "frontend" in params["speaker_encoder"]:
        # fallback topology: ECAPA-TDNN (docs/FALSIFIABILITY.md §3)
        spk = params["speaker_encoder"]
        s: Dict[str, np.ndarray] = {}

        def bn(prefix, p):
            s[f"{prefix}.weight"] = f32(p["g"])
            s[f"{prefix}.bias"] = f32(p["b"])
            s[f"{prefix}.running_mean"] = f32(p["m"])
            s[f"{prefix}.running_var"] = f32(p["v"])

        s["frontend.conv.weight"] = _conv(f32(spk["frontend"]["w"]))
        s["frontend.conv.bias"] = f32(spk["frontend"]["b"])
        bn("frontend.bn", spk["frontend"]["bn"])
        for i, blk in enumerate(spk["blocks"]):
            e = f"blocks.{i}"
            s[f"{e}.conv_in.weight"] = _conv(f32(blk["in_w"]))
            s[f"{e}.conv_in.bias"] = f32(blk["in_b"])
            bn(f"{e}.bn_in", blk["in_bn"])
            rw, rb = f32(blk["res_w"]), f32(blk["res_b"])
            for r in range(rw.shape[0]):
                s[f"{e}.res2net.convs.{r}.weight"] = _conv(rw[r])
                s[f"{e}.res2net.convs.{r}.bias"] = rb[r]
            bn(f"{e}.bn_res", blk["res_bn"])
            s[f"{e}.conv_out.weight"] = _conv(f32(blk["out_w"]))
            s[f"{e}.conv_out.bias"] = f32(blk["out_b"])
            bn(f"{e}.bn_out", blk["out_bn"])
            s[f"{e}.se.fc1.weight"] = _lin(f32(blk["se_w1"]))
            s[f"{e}.se.fc1.bias"] = f32(blk["se_b1"])
            s[f"{e}.se.fc2.weight"] = _lin(f32(blk["se_w2"]))
            s[f"{e}.se.fc2.bias"] = f32(blk["se_b2"])
        s["mfa.weight"] = _lin(f32(spk["mfa_w"]))
        s["mfa.bias"] = f32(spk["mfa_b"])
        s["pool.att1.weight"] = _lin(f32(spk["asp_w1"]))
        s["pool.att1.bias"] = f32(spk["asp_b1"])
        s["pool.att2.weight"] = _lin(f32(spk["asp_w2"]))
        s["pool.att2.bias"] = f32(spk["asp_b2"])
        bn("post_bn", spk["post_bn"])
        s["fc.weight"] = _lin(f32(spk["out_w"]))
        s["fc.bias"] = f32(spk["out_b"])
        write_onnx_model(os.path.join(out_dir, "speaker_encoder.onnx"), s)
    elif "speaker_encoder" in params:
        spk = params["speaker_encoder"]
        s: Dict[str, np.ndarray] = {
            "input_proj.weight": _lin(f32(spk["in_proj"])),
            "input_proj.bias": f32(spk["in_bias"]),
            "pooling.attention.weight": _lin(f32(spk["pool_w"])),
            "pooling.v.weight": _lin(f32(spk["pool_v"])),
            "output_proj.weight": _lin(f32(spk["out_proj"])),
            "output_proj.bias": f32(spk["out_bias"]),
        }
        ren = {
            "ln1_s": ("norm1.weight", None), "ln1_b": ("norm1.bias", None),
            "wq": ("self_attn.q_proj.weight", _lin),
            "wk": ("self_attn.k_proj.weight", _lin),
            "wv": ("self_attn.v_proj.weight", _lin),
            "wo": ("self_attn.o_proj.weight", _lin),
            "ln2_s": ("norm2.weight", None), "ln2_b": ("norm2.bias", None),
            "w1": ("linear1.weight", _lin), "b1": ("linear1.bias", None),
            "w2": ("linear2.weight", _lin), "b2": ("linear2.bias", None),
        }
        for i, lp in enumerate(spk["layers"]):
            for key, (torch_name, tf) in ren.items():
                a = f32(lp[key])
                s[f"encoder.layers.{i}.{torch_name}"] = tf(a) if tf else a
        write_onnx_model(os.path.join(out_dir, "speaker_encoder.onnx"), s)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tools.onnx_export", description=__doc__)
    p.add_argument("--src", required=True, help="framework checkpoint dir")
    p.add_argument("--out", required=True, help="output onnx model dir")
    args = p.parse_args(argv)

    from leaxer_qwen3_tts_tpu.runtime.weights import load_checkpoint

    _, params = load_checkpoint(args.src)
    import jax

    export_onnx_model_dir(jax.device_get(params), args.out)
    print(f"wrote 8-graph onnx dir to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
