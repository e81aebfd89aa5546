"""Checkpoint converter: ONNX graphs / HF safetensors -> framework checkpoint.

The reference distributes weights as 8 ONNX graphs (README.md:69-93,
tts_onnx.cpp:91-107); original Qwen3-TTS checkpoints ship as HF safetensors.
This tool converts either into this framework's checkpoint layout
(runtime/weights.py: config.json + params.npz with '/'-joined flat keys).

Usage:
  python -m tools.convert dump --src model.onnx            # list tensors
  python -m tools.convert onnx --src <dir> --out <ckpt> [--remap map.json]
  python -m tools.convert hf   --src <dir> --out <ckpt> [--remap map.json]

Mapping: built-in rules cover HF Qwen-style transformer naming
(model.layers.N.self_attn.q_proj.weight, ...); anything the rules miss can be
supplied via --remap, a JSON {source_name: target_flat_key} (torch [out,in]
linear weights are auto-transposed when the target expects [in,out]).
--strict exits nonzero if any model parameter is left unconverted.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np


# targets whose last two dims are [in, out] in our layout but [out, in] in
# torch exports (nn.Linear.weight)
_TRANSPOSE_TARGETS = re.compile(
    r".*(wq|wk|wv|wo|wg|wu|wd|lm_head|text_proj|in_proj|out_proj|w1|w2|pool_w"
    r"|code_predictor/heads)$"
)

# (regex, target template) — {L} = layer index, {prefix} = talker|code_predictor
_HF_RULES: List[Tuple[str, str]] = [
    (r"(?:talker\.)?model\.layers\.(\d+)\.input_layernorm\.weight",
     "talker/transformer/layers/attn_norm@{L}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.self_attn\.q_proj\.weight",
     "talker/transformer/layers/wq@{L}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.self_attn\.k_proj\.weight",
     "talker/transformer/layers/wk@{L}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.self_attn\.v_proj\.weight",
     "talker/transformer/layers/wv@{L}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.self_attn\.o_proj\.weight",
     "talker/transformer/layers/wo@{L}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.self_attn\.q_norm\.weight",
     "talker/transformer/layers/q_norm@{L}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.self_attn\.k_norm\.weight",
     "talker/transformer/layers/k_norm@{L}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.post_attention_layernorm\.weight",
     "talker/transformer/layers/mlp_norm@{L}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.mlp\.gate_proj\.weight",
     "talker/transformer/layers/wg@{L}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.mlp\.up_proj\.weight",
     "talker/transformer/layers/wu@{L}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.mlp\.down_proj\.weight",
     "talker/transformer/layers/wd@{L}"),
    (r"(?:talker\.)?model\.norm\.weight", "talker/transformer/final_norm"),
    (r"(?:talker\.)?(?:lm_head|codec_head)\.weight", "talker/lm_head"),
    (r"(?:talker\.)?model\.embed_tokens\.weight", "embeddings/text_embed"),
    (r"(?:talker\.)?(?:model\.)?text_proj(?:ection)?\.weight", "embeddings/text_proj"),
    (r"(?:talker\.)?(?:model\.)?codec_embed(?:ding)?s?\.weight", "embeddings/codec_embed"),
    # code predictor (MTP) block
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.input_layernorm\.weight",
     "code_predictor/transformer/layers/attn_norm@{L}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.self_attn\.q_proj\.weight",
     "code_predictor/transformer/layers/wq@{L}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.self_attn\.k_proj\.weight",
     "code_predictor/transformer/layers/wk@{L}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.self_attn\.v_proj\.weight",
     "code_predictor/transformer/layers/wv@{L}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.self_attn\.o_proj\.weight",
     "code_predictor/transformer/layers/wo@{L}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.self_attn\.q_norm\.weight",
     "code_predictor/transformer/layers/q_norm@{L}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.self_attn\.k_norm\.weight",
     "code_predictor/transformer/layers/k_norm@{L}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.post_attention_layernorm\.weight",
     "code_predictor/transformer/layers/mlp_norm@{L}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.mlp\.gate_proj\.weight",
     "code_predictor/transformer/layers/wg@{L}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.mlp\.up_proj\.weight",
     "code_predictor/transformer/layers/wu@{L}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.mlp\.down_proj\.weight",
     "code_predictor/transformer/layers/wd@{L}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?norm\.weight",
     "code_predictor/transformer/final_norm"),
    # per-step MTP heads / embedding tables: index = generation step
    (r"(?:talker\.)?code_predictor\.(?:lm_)?heads?\.(\d+)\.weight",
     "code_predictor/heads@{L}"),
    (r"(?:talker\.)?code_predictor\.(?:embed(?:_tokens)?s?|embedding)\.(\d+)\.weight",
     "embeddings/pred_embed@{L}"),
]


def load_source(kind: str, src: str) -> Dict[str, np.ndarray]:
    tensors: Dict[str, np.ndarray] = {}
    if kind == "onnx":
        from .onnx_tensors import load_onnx_initializers

        files = sorted(glob.glob(os.path.join(src, "*.onnx"))) if os.path.isdir(src) else [src]
        if not files:
            raise FileNotFoundError(f"no .onnx files under {src}")
        for path in files:
            graph = os.path.splitext(os.path.basename(path))[0]
            for name, arr in load_onnx_initializers(path).items():
                tensors[f"{graph}::{name}"] = arr
    elif kind == "hf":
        from safetensors.numpy import load_file

        files = (
            sorted(glob.glob(os.path.join(src, "*.safetensors")))
            if os.path.isdir(src)
            else [src]
        )
        if not files:
            raise FileNotFoundError(f"no .safetensors files under {src}")
        for path in files:
            tensors.update(load_file(path))
    else:
        raise ValueError(kind)
    return tensors


def map_tensors(
    tensors: Dict[str, np.ndarray],
    remap: Optional[Dict[str, str]] = None,
) -> Tuple[Dict[str, Dict[int, np.ndarray]], List[str]]:
    """Returns ({target_key: {index_or_-1: tensor}}, unmapped_names)."""
    staged: Dict[str, Dict[int, np.ndarray]] = {}
    unmapped: List[str] = []

    def stage(target: str, arr: np.ndarray):
        if "@" in target:
            key, idx = target.split("@")
            idx = int(idx)
        else:
            key, idx = target, -1
        if _TRANSPOSE_TARGETS.match(key) and arr.ndim == 2:
            arr = arr.T
        staged.setdefault(key, {})[idx] = arr

    for name, arr in tensors.items():
        bare = name.split("::", 1)[-1]
        if remap and name in remap:
            stage(remap[name], arr)
            continue
        if remap and bare in remap:
            stage(remap[bare], arr)
            continue
        for pattern, template in _HF_RULES:
            m = re.fullmatch(pattern, bare)
            if m:
                L = m.group(1) if m.groups() else None
                stage(template.replace("{L}", L or ""), arr)
                break
        else:
            unmapped.append(name)
    return staged, unmapped


def assemble(staged: Dict[str, Dict[int, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack indexed targets along a new leading axis; pass through the rest."""
    flat: Dict[str, np.ndarray] = {}
    for key, by_idx in staged.items():
        if -1 in by_idx:
            flat[key] = by_idx[-1]
        else:
            idxs = sorted(by_idx)
            if idxs != list(range(len(idxs))):
                raise ValueError(f"{key}: non-contiguous indices {idxs}")
            flat[key] = np.stack([by_idx[i] for i in idxs])
    return flat


def convert(kind: str, src: str, out: str, config_name: str,
            remap_path: Optional[str], strict: bool) -> int:
    import jax

    from leaxer_qwen3_tts_tpu.config import PRESETS
    from leaxer_qwen3_tts_tpu.runtime.weights import (
        flatten_params,
        init_params,
        save_checkpoint,
        unflatten_params,
    )

    cfg = PRESETS[config_name]
    remap = None
    if remap_path:
        with open(remap_path) as f:
            remap = json.load(f)

    tensors = load_source(kind, src)
    print(f"loaded {len(tensors)} source tensors")
    staged, unmapped = map_tensors(tensors, remap)
    converted = assemble(staged)

    # start from random init so shapes/dtypes are authoritative, then overlay
    ref = flatten_params(jax.device_get(init_params(cfg, jax.random.PRNGKey(0))))
    missing, bad_shape, applied = [], [], 0
    for key, refarr in ref.items():
        if key not in converted:
            missing.append(key)
            continue
        arr = converted[key]
        if tuple(arr.shape) != tuple(refarr.shape):
            bad_shape.append(f"{key}: got {arr.shape}, want {refarr.shape}")
            continue
        ref[key] = arr.astype(refarr.dtype)
        applied += 1
    extra = [k for k in converted if k not in ref]

    print(f"applied {applied}/{len(ref)} parameters")
    for title, items in (
        ("UNMAPPED source tensors", unmapped),
        ("MISSING model parameters", missing),
        ("SHAPE MISMATCH", bad_shape),
        ("UNKNOWN targets", extra),
    ):
        if items:
            print(f"{title} ({len(items)}):")
            for it in items[:40]:
                print(f"  {it}")
            if len(items) > 40:
                print(f"  ... and {len(items) - 40} more")

    if strict and (missing or bad_shape or unmapped):
        print("strict mode: conversion incomplete", file=sys.stderr)
        return 1

    save_checkpoint(out, cfg, unflatten_params(ref))
    print(f"wrote checkpoint to {out}")
    return 0


def dump(kind: str, src: str) -> int:
    tensors = load_source(kind, src)
    for name, arr in sorted(tensors.items()):
        print(f"{name}  shape={tuple(arr.shape)}  dtype={arr.dtype}")
    print(f"total: {len(tensors)} tensors")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tools.convert", description=__doc__)
    p.add_argument("mode", choices=["onnx", "hf", "dump"])
    p.add_argument("--src", required=True, help="source file or directory")
    p.add_argument("--out", help="output checkpoint dir")
    p.add_argument("--config", default="qwen3-tts-12hz-0.6b-base")
    p.add_argument("--remap", help="JSON {source_name: target_key} overrides")
    p.add_argument("--strict", action="store_true")
    p.add_argument("--kind", default="onnx", help="for dump mode: onnx|hf")
    args = p.parse_args(argv)

    if args.mode == "dump":
        kind = "hf" if args.src.endswith(".safetensors") else args.kind
        return dump(kind, args.src)
    if not args.out:
        p.error("--out is required for conversion")
    return convert(args.mode, args.src, args.out, args.config, args.remap,
                   args.strict)


if __name__ == "__main__":
    sys.exit(main())
