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
(model.layers.N.self_attn.q_proj.weight, ...) AND the 8-graph ONNX layout —
ONNX tensors are keyed ``graph::initializer_name`` so the same layer names in
talker_prefill/talker_decode/code_predictor disambiguate by graph; tensors
duplicated across the prefill/decode graphs are deduped with a consistency
check.  Torch layouts are normalized per-rule: Linear [out,in] -> [in,out],
Conv1d [out,in,K] -> [K,in,out], depthwise Conv1d [C,1,K] -> [K,C].  Anything
the rules miss can be supplied via --remap, a JSON
{source_name: target_flat_key} (2-D remap tensors are auto-transposed when
the target expects [in,out]).  --strict exits nonzero if any model parameter
is left unconverted.  --config accepts a preset name or a path to a
config.json.
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
    r"|code_predictor/heads?)$"
)

# (regex, target template) — {0} = layer index, {prefix} = talker|code_predictor
_HF_RULES: List[Tuple[str, str]] = [
    (r"(?:talker\.)?model\.layers\.(\d+)\.input_layernorm\.weight",
     "talker/transformer/layers/attn_norm@{0}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.self_attn\.q_proj\.weight",
     "talker/transformer/layers/wq@{0}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.self_attn\.k_proj\.weight",
     "talker/transformer/layers/wk@{0}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.self_attn\.v_proj\.weight",
     "talker/transformer/layers/wv@{0}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.self_attn\.o_proj\.weight",
     "talker/transformer/layers/wo@{0}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.self_attn\.q_norm\.weight",
     "talker/transformer/layers/q_norm@{0}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.self_attn\.k_norm\.weight",
     "talker/transformer/layers/k_norm@{0}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.post_attention_layernorm\.weight",
     "talker/transformer/layers/mlp_norm@{0}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.mlp\.gate_proj\.weight",
     "talker/transformer/layers/wg@{0}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.mlp\.up_proj\.weight",
     "talker/transformer/layers/wu@{0}"),
    (r"(?:talker\.)?model\.layers\.(\d+)\.mlp\.down_proj\.weight",
     "talker/transformer/layers/wd@{0}"),
    (r"(?:talker\.)?model\.norm\.weight", "talker/transformer/final_norm"),
    (r"(?:talker\.)?(?:lm_head|codec_head)\.weight", "talker/lm_head"),
    (r"(?:talker\.)?model\.embed_tokens\.weight", "embeddings/text_embed"),
    (r"(?:talker\.)?(?:model\.)?text_proj(?:ection)?\.weight", "embeddings/text_proj"),
    (r"(?:talker\.)?(?:model\.)?codec_embed(?:ding)?s?\.weight", "embeddings/codec_embed"),
    # code predictor (MTP) block
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.input_layernorm\.weight",
     "code_predictor/transformer/layers/attn_norm@{0}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.self_attn\.q_proj\.weight",
     "code_predictor/transformer/layers/wq@{0}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.self_attn\.k_proj\.weight",
     "code_predictor/transformer/layers/wk@{0}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.self_attn\.v_proj\.weight",
     "code_predictor/transformer/layers/wv@{0}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.self_attn\.o_proj\.weight",
     "code_predictor/transformer/layers/wo@{0}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.self_attn\.q_norm\.weight",
     "code_predictor/transformer/layers/q_norm@{0}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.self_attn\.k_norm\.weight",
     "code_predictor/transformer/layers/k_norm@{0}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.post_attention_layernorm\.weight",
     "code_predictor/transformer/layers/mlp_norm@{0}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.mlp\.gate_proj\.weight",
     "code_predictor/transformer/layers/wg@{0}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.mlp\.up_proj\.weight",
     "code_predictor/transformer/layers/wu@{0}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?layers\.(\d+)\.mlp\.down_proj\.weight",
     "code_predictor/transformer/layers/wd@{0}"),
    (r"(?:talker\.)?code_predictor\.(?:model\.)?norm\.weight",
     "code_predictor/transformer/final_norm"),
    # per-step MTP heads / embedding tables: index = generation step
    (r"(?:talker\.)?code_predictor\.(?:lm_)?heads?\.(\d+)\.weight",
     "code_predictor/heads@{0}"),
    (r"(?:talker\.)?code_predictor\.(?:embed(?:_tokens)?s?|embedding)\.(\d+)\.weight",
     "embeddings/pred_embed@{0}"),
    # fallback topology: shared MTP head + step embedding (FALSIFIABILITY §2)
    (r"(?:talker\.)?code_predictor\.(?:lm_)?head\.weight",
     "code_predictor/head"),
    (r"(?:talker\.)?code_predictor\.step_embed(?:ding)?s?\.weight",
     "code_predictor/step_embed"),
    # CustomVoice preset-speaker table (tts_onnx.h:82-93)
    (r"(?:talker\.)?(?:model\.)?speaker_(?:embed(?:ding)?s?|table)\.weight",
     "speaker_table"),
]


# ---------------------------------------------------------------------------
# Torch-export layout transforms (applied per-rule)
# ---------------------------------------------------------------------------


def _t_lin(a: np.ndarray) -> np.ndarray:
    """nn.Linear.weight [out, in] -> [in, out]."""
    return a.T if a.ndim == 2 else a


def _t_conv(a: np.ndarray) -> np.ndarray:
    """nn.Conv1d.weight [out, in, K] -> [K, in, out]."""
    return a.transpose(2, 1, 0) if a.ndim == 3 else a


def _t_dw(a: np.ndarray) -> np.ndarray:
    """depthwise nn.Conv1d.weight [C, 1, K] -> [K, C]."""
    return a[:, 0, :].T if a.ndim == 3 else a


def _t_pw(a: np.ndarray) -> np.ndarray:
    """pointwise projection exported as EITHER nn.Linear [out, in] OR
    nn.Conv1d k=1 [out, in, 1] -> [in, out]."""
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[..., 0]
    return a.T if a.ndim == 2 else a


def _bn_rules(src: str, tgt: str) -> List[Tuple[str, Optional[str], object]]:
    """Inference BatchNorm1d: 4 torch leaves -> g/b/m/v (models _bn_init);
    num_batches_tracked is intentionally dropped (no inference meaning)."""
    return [
        (src + r"\.weight", tgt + "/g", None),
        (src + r"\.bias", tgt + "/b", None),
        (src + r"\.running_mean", tgt + "/m", None),
        (src + r"\.running_var", tgt + "/v", None),
        (src + r"\.num_batches_tracked", None, None),
    ]


# ---------------------------------------------------------------------------
# ONNX rules: matched against the FULL "graph::initializer" key, so identical
# module names inside talker_prefill / talker_decode / code_predictor resolve
# by graph.  Covers all 8 graphs of the reference distribution
# (tts_onnx.cpp:91-107; I/O contracts :545-776).
# ---------------------------------------------------------------------------

_G_TALKER = r"(?:talker_prefill|talker_decode)::(?:talker\.)?"
_G_CP = r"code_predictor::(?:model\.)?"
_G_VOC = r"tokenizer12hz_decode::"
_G_SPK = r"speaker_encoder::"

_ONNX_RULES: List[Tuple[str, str, object]] = [
    # --- text_project.onnx (tts_onnx.cpp:545-559) ---
    (r"text_project::(?:model\.)?embed_tokens\.weight",
     "embeddings/text_embed", None),
    (r"text_project::(?:model\.)?text_proj(?:ection)?\.weight",
     "embeddings/text_proj", _t_lin),
    # --- codec_embed.onnx (:561-590) ---
    (r"codec_embed::(?:model\.)?(?:codec_)?embed(?:ding)?(?:_tokens)?s?\.weight",
     "embeddings/codec_embed", None),
    # --- code_predictor_embed.onnx (:592-613): one table per step ---
    (r"code_predictor_embed::(?:model\.)?embed(?:_tokens)?s?\.(\d+)\.weight",
     "embeddings/pred_embed@{0}", None),
    # --- talker_prefill.onnx / talker_decode.onnx (:615-732): same 28-layer
    #     GQA transformer in both graphs (deduped on stage) ---
    (_G_TALKER + r"model\.layers\.(\d+)\.input_layernorm\.weight",
     "talker/transformer/layers/attn_norm@{0}", None),
    (_G_TALKER + r"model\.layers\.(\d+)\.self_attn\.q_proj\.weight",
     "talker/transformer/layers/wq@{0}", _t_lin),
    (_G_TALKER + r"model\.layers\.(\d+)\.self_attn\.k_proj\.weight",
     "talker/transformer/layers/wk@{0}", _t_lin),
    (_G_TALKER + r"model\.layers\.(\d+)\.self_attn\.v_proj\.weight",
     "talker/transformer/layers/wv@{0}", _t_lin),
    (_G_TALKER + r"model\.layers\.(\d+)\.self_attn\.o_proj\.weight",
     "talker/transformer/layers/wo@{0}", _t_lin),
    (_G_TALKER + r"model\.layers\.(\d+)\.self_attn\.q_norm\.weight",
     "talker/transformer/layers/q_norm@{0}", None),
    (_G_TALKER + r"model\.layers\.(\d+)\.self_attn\.k_norm\.weight",
     "talker/transformer/layers/k_norm@{0}", None),
    (_G_TALKER + r"model\.layers\.(\d+)\.post_attention_layernorm\.weight",
     "talker/transformer/layers/mlp_norm@{0}", None),
    (_G_TALKER + r"model\.layers\.(\d+)\.mlp\.gate_proj\.weight",
     "talker/transformer/layers/wg@{0}", _t_lin),
    (_G_TALKER + r"model\.layers\.(\d+)\.mlp\.up_proj\.weight",
     "talker/transformer/layers/wu@{0}", _t_lin),
    (_G_TALKER + r"model\.layers\.(\d+)\.mlp\.down_proj\.weight",
     "talker/transformer/layers/wd@{0}", _t_lin),
    (_G_TALKER + r"model\.norm\.weight", "talker/transformer/final_norm", None),
    (_G_TALKER + r"(?:lm|codec)_head\.weight", "talker/lm_head", _t_lin),
    # --- code_predictor.onnx (:734-757) ---
    (_G_CP + r"layers\.(\d+)\.input_layernorm\.weight",
     "code_predictor/transformer/layers/attn_norm@{0}", None),
    (_G_CP + r"layers\.(\d+)\.self_attn\.q_proj\.weight",
     "code_predictor/transformer/layers/wq@{0}", _t_lin),
    (_G_CP + r"layers\.(\d+)\.self_attn\.k_proj\.weight",
     "code_predictor/transformer/layers/wk@{0}", _t_lin),
    (_G_CP + r"layers\.(\d+)\.self_attn\.v_proj\.weight",
     "code_predictor/transformer/layers/wv@{0}", _t_lin),
    (_G_CP + r"layers\.(\d+)\.self_attn\.o_proj\.weight",
     "code_predictor/transformer/layers/wo@{0}", _t_lin),
    (_G_CP + r"layers\.(\d+)\.self_attn\.q_norm\.weight",
     "code_predictor/transformer/layers/q_norm@{0}", None),
    (_G_CP + r"layers\.(\d+)\.self_attn\.k_norm\.weight",
     "code_predictor/transformer/layers/k_norm@{0}", None),
    (_G_CP + r"layers\.(\d+)\.post_attention_layernorm\.weight",
     "code_predictor/transformer/layers/mlp_norm@{0}", None),
    (_G_CP + r"layers\.(\d+)\.mlp\.gate_proj\.weight",
     "code_predictor/transformer/layers/wg@{0}", _t_lin),
    (_G_CP + r"layers\.(\d+)\.mlp\.up_proj\.weight",
     "code_predictor/transformer/layers/wu@{0}", _t_lin),
    (_G_CP + r"layers\.(\d+)\.mlp\.down_proj\.weight",
     "code_predictor/transformer/layers/wd@{0}", _t_lin),
    (_G_CP + r"norm\.weight", "code_predictor/transformer/final_norm", None),
    (r"code_predictor::(?:lm_)?heads?\.(\d+)\.weight",
     "code_predictor/heads@{0}", _t_lin),
    # --- tokenizer12hz_decode.onnx (vocoder, :759-776) ---
    (_G_VOC + r"(?:quantizer\.)?codebooks\.(\d+)\.weight",
     "vocoder/codebooks@{0}", None),
    (_G_VOC + r"decoder\.prenet\.(\d+)\.dwconv\.weight",
     "vocoder/prenet/{0}/dw", _t_dw),
    (_G_VOC + r"decoder\.prenet\.(\d+)\.norm\.weight",
     "vocoder/prenet/{0}/ln_scale", None),
    (_G_VOC + r"decoder\.prenet\.(\d+)\.norm\.bias",
     "vocoder/prenet/{0}/ln_bias", None),
    (_G_VOC + r"decoder\.prenet\.(\d+)\.pwconv1\.weight",
     "vocoder/prenet/{0}/w1", _t_lin),
    (_G_VOC + r"decoder\.prenet\.(\d+)\.pwconv1\.bias",
     "vocoder/prenet/{0}/b1", None),
    (_G_VOC + r"decoder\.prenet\.(\d+)\.pwconv2\.weight",
     "vocoder/prenet/{0}/w2", _t_lin),
    (_G_VOC + r"decoder\.prenet\.(\d+)\.pwconv2\.bias",
     "vocoder/prenet/{0}/b2", None),
    (_G_VOC + r"decoder\.ups\.(\d+)\.weight", "vocoder/stages/{0}/up_w", _t_conv),
    (_G_VOC + r"decoder\.ups\.(\d+)\.bias", "vocoder/stages/{0}/up_b", None),
    (_G_VOC + r"decoder\.ups\.(\d+)\.res(?:blocks)?\.(\d+)\.conv1\.weight",
     "vocoder/stages/{0}/res/{1}/w1", _t_conv),
    (_G_VOC + r"decoder\.ups\.(\d+)\.res(?:blocks)?\.(\d+)\.conv1\.bias",
     "vocoder/stages/{0}/res/{1}/b1", None),
    (_G_VOC + r"decoder\.ups\.(\d+)\.res(?:blocks)?\.(\d+)\.conv2\.weight",
     "vocoder/stages/{0}/res/{1}/w2", _t_conv),
    (_G_VOC + r"decoder\.ups\.(\d+)\.res(?:blocks)?\.(\d+)\.conv2\.bias",
     "vocoder/stages/{0}/res/{1}/b2", None),
    (_G_VOC + r"decoder\.final(?:_conv)?\.weight", "vocoder/final_w", _t_conv),
    (_G_VOC + r"decoder\.final(?:_conv)?\.bias", "vocoder/final_b", None),
    # --- speaker_encoder.onnx (:367-403) ---
    (_G_SPK + r"(?:input|in)_proj\.weight", "speaker_encoder/in_proj", _t_lin),
    (_G_SPK + r"(?:input|in)_proj\.bias", "speaker_encoder/in_bias", None),
    (_G_SPK + r"encoder\.layers\.(\d+)\.norm1\.weight",
     "speaker_encoder/layers/{0}/ln1_s", None),
    (_G_SPK + r"encoder\.layers\.(\d+)\.norm1\.bias",
     "speaker_encoder/layers/{0}/ln1_b", None),
    (_G_SPK + r"encoder\.layers\.(\d+)\.self_attn\.q_proj\.weight",
     "speaker_encoder/layers/{0}/wq", _t_lin),
    (_G_SPK + r"encoder\.layers\.(\d+)\.self_attn\.k_proj\.weight",
     "speaker_encoder/layers/{0}/wk", _t_lin),
    (_G_SPK + r"encoder\.layers\.(\d+)\.self_attn\.v_proj\.weight",
     "speaker_encoder/layers/{0}/wv", _t_lin),
    (_G_SPK + r"encoder\.layers\.(\d+)\.self_attn\.o(?:ut)?_proj\.weight",
     "speaker_encoder/layers/{0}/wo", _t_lin),
    (_G_SPK + r"encoder\.layers\.(\d+)\.norm2\.weight",
     "speaker_encoder/layers/{0}/ln2_s", None),
    (_G_SPK + r"encoder\.layers\.(\d+)\.norm2\.bias",
     "speaker_encoder/layers/{0}/ln2_b", None),
    (_G_SPK + r"encoder\.layers\.(\d+)\.linear1\.weight",
     "speaker_encoder/layers/{0}/w1", _t_lin),
    (_G_SPK + r"encoder\.layers\.(\d+)\.linear1\.bias",
     "speaker_encoder/layers/{0}/b1", None),
    (_G_SPK + r"encoder\.layers\.(\d+)\.linear2\.weight",
     "speaker_encoder/layers/{0}/w2", _t_lin),
    (_G_SPK + r"encoder\.layers\.(\d+)\.linear2\.bias",
     "speaker_encoder/layers/{0}/b2", None),
    (_G_SPK + r"pool(?:ing)?\.(?:attention|w)\.weight",
     "speaker_encoder/pool_w", _t_lin),
    (_G_SPK + r"pool(?:ing)?\.v\.weight", "speaker_encoder/pool_v", _t_lin),
    (_G_SPK + r"(?:output|out)_proj\.weight", "speaker_encoder/out_proj", _t_lin),
    (_G_SPK + r"(?:output|out)_proj\.bias", "speaker_encoder/out_bias", None),
    # ------------------------------------------------------------------
    # Fallback topologies (docs/FALSIFIABILITY.md): rules for the alternate
    # architectures so real-weight bring-up is a config flip whichever
    # guess the dump confirms.  A `None` target = intentionally dropped
    # (constants this framework regenerates, e.g. the iSTFT hann window).
    # ------------------------------------------------------------------
    # code_predictor fallback: ONE shared head + learned step embedding
    # (FALSIFIABILITY §2; contract tts_onnx.cpp:734-757)
    (r"code_predictor::(?:lm_)?head\.weight", "code_predictor/head", _t_lin),
    (r"code_predictor::step_embed(?:ding)?s?\.weight",
     "code_predictor/step_embed", None),
    # vocoder fallback: Vocos-style iSTFT head (FALSIFIABILITY §1; contract
    # tts_onnx.cpp:759-776) — LayerNorm + linear to mag/phase bins; the
    # synthesis window is regenerated (periodic hann), not converted
    (_G_VOC + r"(?:decoder\.)?head\.norm\.weight", "vocoder/head_ln_scale", None),
    (_G_VOC + r"(?:decoder\.)?head\.norm\.bias", "vocoder/head_ln_bias", None),
    (_G_VOC + r"(?:decoder\.)?head\.out\.weight", "vocoder/istft_out_w", _t_pw),
    (_G_VOC + r"(?:decoder\.)?head\.out\.bias", "vocoder/istft_out_b", None),
    (_G_VOC + r"(?:decoder\.)?head\.istft\.window", None, None),
    # speaker-encoder fallback: ECAPA-TDNN (FALSIFIABILITY §3; contract
    # tts_onnx.cpp:367-403) — conv frontend, SE-Res2Net blocks, MFA,
    # attentive stats pooling
    (_G_SPK + r"frontend\.conv\.weight", "speaker_encoder/frontend/w", _t_conv),
    (_G_SPK + r"frontend\.conv\.bias", "speaker_encoder/frontend/b", None),
    *_bn_rules(_G_SPK + r"frontend\.bn", "speaker_encoder/frontend/bn"),
    (_G_SPK + r"blocks\.(\d+)\.conv_in\.weight",
     "speaker_encoder/blocks/{0}/in_w", _t_conv),
    (_G_SPK + r"blocks\.(\d+)\.conv_in\.bias",
     "speaker_encoder/blocks/{0}/in_b", None),
    *_bn_rules(_G_SPK + r"blocks\.(\d+)\.bn_in",
               "speaker_encoder/blocks/{0}/in_bn"),
    (_G_SPK + r"blocks\.(\d+)\.res2net\.convs\.(\d+)\.weight",
     "speaker_encoder/blocks/{0}/res_w@{1}", _t_conv),
    (_G_SPK + r"blocks\.(\d+)\.res2net\.convs\.(\d+)\.bias",
     "speaker_encoder/blocks/{0}/res_b@{1}", None),
    *_bn_rules(_G_SPK + r"blocks\.(\d+)\.bn_res",
               "speaker_encoder/blocks/{0}/res_bn"),
    (_G_SPK + r"blocks\.(\d+)\.conv_out\.weight",
     "speaker_encoder/blocks/{0}/out_w", _t_conv),
    (_G_SPK + r"blocks\.(\d+)\.conv_out\.bias",
     "speaker_encoder/blocks/{0}/out_b", None),
    *_bn_rules(_G_SPK + r"blocks\.(\d+)\.bn_out",
               "speaker_encoder/blocks/{0}/out_bn"),
    (_G_SPK + r"blocks\.(\d+)\.se\.fc1\.weight",
     "speaker_encoder/blocks/{0}/se_w1", _t_pw),
    (_G_SPK + r"blocks\.(\d+)\.se\.fc1\.bias",
     "speaker_encoder/blocks/{0}/se_b1", None),
    (_G_SPK + r"blocks\.(\d+)\.se\.fc2\.weight",
     "speaker_encoder/blocks/{0}/se_w2", _t_pw),
    (_G_SPK + r"blocks\.(\d+)\.se\.fc2\.bias",
     "speaker_encoder/blocks/{0}/se_b2", None),
    (_G_SPK + r"mfa\.weight", "speaker_encoder/mfa_w", _t_pw),
    (_G_SPK + r"mfa\.bias", "speaker_encoder/mfa_b", None),
    (_G_SPK + r"pool\.att1\.weight", "speaker_encoder/asp_w1", _t_pw),
    (_G_SPK + r"pool\.att1\.bias", "speaker_encoder/asp_b1", None),
    (_G_SPK + r"pool\.att2\.weight", "speaker_encoder/asp_w2", _t_pw),
    (_G_SPK + r"pool\.att2\.bias", "speaker_encoder/asp_b2", None),
    *_bn_rules(_G_SPK + r"post_bn", "speaker_encoder/post_bn"),
    (_G_SPK + r"fc\.weight", "speaker_encoder/out_w", _t_lin),
    (_G_SPK + r"fc\.bias", "speaker_encoder/out_b", None),
    # ------------------------------------------------------------------
    # CustomVoice: preset-speaker embedding table [num_speakers, hidden]
    # (reference Speaker enum tts_onnx.h:82-93; the stub tts_onnx.cpp:320-329
    # names "CustomVoice model with spk_id config").  Feeds
    # engine.synthesize_speaker via params["speaker_table"].
    # ------------------------------------------------------------------
    (_G_TALKER + r"(?:model\.)?speaker_(?:embed(?:ding)?s?|table)\.weight",
     "speaker_table", None),
]

# flat targets that are OPTIONAL extensions of the base parameter tree:
# absent from init_params, passed through to the checkpoint when present
_OPTIONAL_TARGETS = frozenset({"speaker_table"})


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
) -> Tuple[Dict[str, Dict[int, np.ndarray]], List[str], List[str]]:
    """Returns ({target_key: {index_or_-1: tensor}}, unmapped, conflicts).

    ONNX sources (names with a ``graph::`` prefix) try the graph-qualified
    _ONNX_RULES first, then the bare-name _HF_RULES.  Tensors staged twice
    (the talker transformer appears in both talker_prefill and talker_decode)
    must agree bit-for-bit; disagreement is reported in ``conflicts``.
    """
    staged: Dict[str, Dict[int, np.ndarray]] = {}
    unmapped: List[str] = []
    conflicts: List[str] = []

    def stage(target: str, arr: np.ndarray, src: str, auto_t: bool):
        if "@" in target:
            key, idx = target.split("@")
            idx = int(idx)
        else:
            key, idx = target, -1
        if auto_t and _TRANSPOSE_TARGETS.match(key) and arr.ndim == 2:
            arr = arr.T
        slot = staged.setdefault(key, {})
        if idx in slot:
            if slot[idx].shape != arr.shape or not np.array_equal(slot[idx], arr):
                conflicts.append(f"{src} -> {target}: disagrees with earlier source")
            return
        slot[idx] = arr

    def fill(template: str, groups) -> str:
        out = template
        for i, g in enumerate(groups):
            out = out.replace("{" + str(i) + "}", g or "")
        return out

    for name, arr in tensors.items():
        bare = name.split("::", 1)[-1]
        if remap and name in remap:
            stage(remap[name], arr, name, auto_t=True)
            continue
        if remap and bare in remap:
            stage(remap[bare], arr, name, auto_t=True)
            continue
        matched = False
        if "::" in name:
            for pattern, template, transform in _ONNX_RULES:
                m = re.fullmatch(pattern, name)
                if m:
                    if template is not None:  # None = intentionally dropped
                        a = transform(arr) if transform is not None else arr
                        stage(fill(template, m.groups()), a, name, auto_t=False)
                    matched = True
                    break
        if not matched:
            for pattern, template in _HF_RULES:
                m = re.fullmatch(pattern, bare)
                if m:
                    stage(fill(template, m.groups()), arr, name, auto_t=True)
                    matched = True
                    break
        if not matched:
            unmapped.append(name)
    return staged, unmapped, conflicts


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
            shapes = {by_idx[i].shape for i in idxs}
            if len(shapes) != 1:
                raise ValueError(
                    f"{key}: inconsistent per-index shapes {sorted(shapes)}"
                )
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

    if config_name.endswith(".json") or os.path.sep in config_name:
        from leaxer_qwen3_tts_tpu.config import TTSModelConfig

        with open(config_name) as f:
            cfg = TTSModelConfig.from_json(f.read())
    else:
        cfg = PRESETS[config_name]
    remap = None
    if remap_path:
        with open(remap_path) as f:
            remap = json.load(f)

    tensors = load_source(kind, src)
    print(f"loaded {len(tensors)} source tensors")
    staged, unmapped, conflicts = map_tensors(tensors, remap)
    converted = assemble(staged)

    # start from random init so shapes/dtypes are authoritative, then overlay.
    # speaker_encoder.onnx is optional in the reference distribution
    # (tts_onnx.cpp:107): absent source -> checkpoint without the encoder.
    has_spk = any(k.startswith("speaker_encoder/") for k in converted)
    if not has_spk:
        print("no speaker_encoder tensors in source (optional); omitting")
    ref = flatten_params(
        jax.device_get(
            init_params(cfg, jax.random.PRNGKey(0), with_speaker_encoder=has_spk)
        )
    )
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
    # optional extensions (CustomVoice speaker_table): not in init_params,
    # passed through to the checkpoint verbatim
    for key in sorted(_OPTIONAL_TARGETS & set(converted)):
        ref[key] = converted[key].astype(np.float32)
        applied += 1
        print(f"optional target passed through: {key} {converted[key].shape}")
    extra = [k for k in converted if k not in ref]

    print(f"applied {applied}/{len(ref)} parameters")
    for title, items in (
        ("UNMAPPED source tensors", unmapped),
        ("MISSING model parameters", missing),
        ("SHAPE MISMATCH", bad_shape),
        ("UNKNOWN targets", extra),
        ("CONFLICTS (same target, different values)", conflicts),
    ):
        if items:
            print(f"{title} ({len(items)}):")
            for it in items[:40]:
                print(f"  {it}")
            if len(items) > 40:
                print(f"  ... and {len(items) - 40} more")

    if strict and (missing or bad_shape or unmapped or conflicts):
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


def _ref_shapes(config_name: str, with_speaker: bool) -> Dict[str, tuple]:
    """Expected flat target keys -> shapes, via eval_shape (no allocation)."""
    import jax

    from leaxer_qwen3_tts_tpu.config import PRESETS, TTSModelConfig
    from leaxer_qwen3_tts_tpu.runtime.weights import init_params

    if config_name.endswith(".json") or os.path.sep in config_name:
        with open(config_name) as f:
            cfg = TTSModelConfig.from_json(f.read())
    else:
        cfg = PRESETS[config_name]
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, with_speaker_encoder=with_speaker),
        jax.random.PRNGKey(0),
    )

    out: Dict[str, tuple] = {}

    def walk(node, prefix=""):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}{k}/")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}{i}/")
        else:
            out[prefix[:-1]] = tuple(node.shape)

    walk(shapes)
    return out


def dry_run(manifest_path: str, config_name: str,
            remap_path: Optional[str], expect_full: bool) -> int:
    """Diff a NAME MANIFEST (JSON {source_tensor_name: shape}) against the
    mapping rules and the model's expected parameters — without any real
    weights.  This enumerates conversion failure modes in advance of real
    assets (round-3 readiness pack): every unmapped name, shape mismatch, or
    missing target the real export would hit prints here first.

    Green = every manifest tensor maps, every mapped shape matches, no
    unknown targets; with --expect-full additionally no model parameter is
    left uncovered (the 8-graph ONNX manifest); without it, wholesale-absent
    optional modules (speaker encoder; vocoder for HF LM-only checkpoints)
    are reported but tolerated."""
    with open(manifest_path) as f:
        man = json.load(f)
    remap = None
    if remap_path:
        with open(remap_path) as f:
            remap = json.load(f)
    zero = np.zeros((), np.float16)
    tensors = {
        name: np.broadcast_to(
            zero, tuple(spec["shape"] if isinstance(spec, dict) else spec)
        )
        for name, spec in man.items()
    }
    staged, unmapped, conflicts = map_tensors(tensors, remap)
    try:
        converted = assemble(staged)
    except ValueError as e:
        conflicts = conflicts + [f"assemble: {e}"]
        converted = {}
    has_spk = any(k.startswith("speaker_encoder/") for k in converted)
    ref = _ref_shapes(config_name, with_speaker=has_spk)
    missing = [k for k in ref if k not in converted]
    bad_shape = [
        f"{k}: manifest maps to {tuple(converted[k].shape)}, model wants {ref[k]}"
        for k in ref
        if k in converted and tuple(converted[k].shape) != ref[k]
    ]
    extra = [
        k for k in converted if k not in ref and k not in _OPTIONAL_TARGETS
    ]
    optional = sorted(_OPTIONAL_TARGETS & set(converted))
    # absent-module tolerance: modules with NO mapped tensor at all
    covered_modules = {k.split("/", 1)[0] for k in converted}
    tolerated = sorted(
        {k.split("/", 1)[0] for k in missing} - covered_modules
    )
    hard_missing = [
        k for k in missing if k.split("/", 1)[0] in covered_modules
    ]

    report = {
        "manifest": os.path.basename(manifest_path),
        "source_tensors": len(tensors),
        "mapped_targets": len(converted),
        "model_params": len(ref),
        "unmapped": sorted(unmapped),
        "shape_mismatches": bad_shape,
        "unknown_targets": sorted(extra),
        "optional_targets": optional,
        "conflicts": conflicts,
        "missing_in_covered_modules": sorted(hard_missing),
        "absent_modules_tolerated": tolerated if not expect_full else [],
        "missing": sorted(missing) if expect_full else [],
    }
    fail = bool(
        unmapped or conflicts or bad_shape or extra or hard_missing
        or (expect_full and missing)
    )
    report["ok"] = not fail
    print(json.dumps(report, indent=1))
    return 1 if fail else 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tools.convert", description=__doc__)
    p.add_argument("mode", choices=["onnx", "hf", "dump", "dry-run"])
    p.add_argument("--src", help="source file or directory")
    p.add_argument("--out", help="output checkpoint dir")
    p.add_argument("--config", default="qwen3-tts-12hz-0.6b-base")
    p.add_argument("--remap", help="JSON {source_name: target_key} overrides")
    p.add_argument("--strict", action="store_true")
    p.add_argument("--kind", default="onnx", help="for dump mode: onnx|hf")
    p.add_argument("--manifest", help="dry-run: JSON {tensor_name: shape}")
    p.add_argument("--expect-full", action="store_true",
                   help="dry-run: fail on ANY uncovered model parameter")
    args = p.parse_args(argv)

    if args.mode == "dry-run":
        if not args.manifest:
            p.error("--manifest is required for dry-run")
        return dry_run(args.manifest, args.config, args.remap,
                       args.expect_full)
    if not args.src:
        p.error("--src is required")
    if args.mode == "dump":
        kind = "hf" if args.src.endswith(".safetensors") else args.kind
        return dump(kind, args.src)
    if not args.out:
        p.error("--out is required for conversion")
    return convert(args.mode, args.src, args.out, args.config, args.remap,
                   args.strict)


if __name__ == "__main__":
    sys.exit(main())
