"""Generate name-manifest fixtures for the expected REAL weight exports.

No real assets exist on this machine (docs/PARITY.md), so conversion can
only be proven against this repo's own exports — circular.  These manifests
break the deadlock as far as possible WITHOUT assets: they enumerate, tensor
by tensor, the names and torch-layout shapes we EXPECT the real
distributions to use —

  * the 8-graph ONNX layout (reference tts_onnx.cpp:91-107; per-graph I/O
    contracts :545-776), with the talker transformer duplicated across
    talker_prefill/talker_decode exactly as the reference loads it, and
  * the HF safetensors layout for the published LM checkpoints (public
    Qwen3 naming: model.layers.N.self_attn.q_proj.weight ... under a
    ``talker.`` root, code_predictor nested — the vocoder/speaker encoder
    ship separately, so the HF manifest covers the LM modules only)

— so that ``tools/convert.py dry-run`` can diff a real export's `dump`
output against the rules BEFORE any conversion is attempted, printing every
unmapped name / shape mismatch instead of failing mid-way.  At bring-up:

  python -m tools.convert dump --src real/ > names.txt   # real tensor list
  python -m tools.convert dry-run --manifest real_names.json ...

Shapes are derived from the model's own parameter tree (eval_shape) with
the per-rule torch-layout transforms inverted (Linear [in,out]->[out,in],
Conv1d [K,in,out]->[out,in,K], depthwise [K,C]->[C,1,K]), so the committed
manifests are self-consistent with the converter by construction — the
tests run dry-run over both and require green.
"""

from __future__ import annotations

import json
import os
import sys


def _flat_shapes(cfg):
    import jax

    from leaxer_qwen3_tts_tpu.runtime.weights import init_params

    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, with_speaker_encoder=True),
        jax.random.PRNGKey(0),
    )
    out = {}

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


def _inv_lin(s):  # target [in, out] -> torch Linear [out, in]
    return [s[1], s[0]] if len(s) == 2 else list(s)


def _inv_conv(s):  # target [K, in, out] -> torch Conv1d [out, in, K]
    return [s[2], s[1], s[0]]


def _inv_dw(s):  # target [K, C] -> torch depthwise [C, 1, K]
    return [s[1], 1, s[0]]


def _transformer_entries(flat, man, tgt_prefix, src_graphs, src_prefix):
    """Per-layer transformer tensors for every graph in src_graphs (the
    talker appears in both talker_prefill and talker_decode — the converter
    dedups with a bit-equality check, which the manifest exercises)."""
    L = flat[f"{tgt_prefix}/transformer/layers/attn_norm"][0]
    per = {
        "input_layernorm.weight": ("attn_norm", None),
        "self_attn.q_proj.weight": ("wq", _inv_lin),
        "self_attn.k_proj.weight": ("wk", _inv_lin),
        "self_attn.v_proj.weight": ("wv", _inv_lin),
        "self_attn.o_proj.weight": ("wo", _inv_lin),
        "self_attn.q_norm.weight": ("q_norm", None),
        "self_attn.k_norm.weight": ("k_norm", None),
        "post_attention_layernorm.weight": ("mlp_norm", None),
        "mlp.gate_proj.weight": ("wg", _inv_lin),
        "mlp.up_proj.weight": ("wu", _inv_lin),
        "mlp.down_proj.weight": ("wd", _inv_lin),
    }
    for g in src_graphs:
        for i in range(L):
            for src_leaf, (tgt_leaf, inv) in per.items():
                stacked = flat[f"{tgt_prefix}/transformer/layers/{tgt_leaf}"]
                s = list(stacked[1:])
                man[f"{g}::{src_prefix}layers.{i}.{src_leaf}"] = (
                    inv(s) if inv else s
                )
        man[f"{g}::{src_prefix}norm.weight"] = list(
            flat[f"{tgt_prefix}/transformer/final_norm"]
        )


def _bn_entries(man, src, c):
    man[f"{src}.weight"] = [c]
    man[f"{src}.bias"] = [c]
    man[f"{src}.running_mean"] = [c]
    man[f"{src}.running_var"] = [c]
    man[f"{src}.num_batches_tracked"] = []  # dropped by rule


def onnx_manifest(flat):
    man = {}
    # text_project.onnx (tts_onnx.cpp:545-559)
    man["text_project::model.embed_tokens.weight"] = list(
        flat["embeddings/text_embed"]
    )
    man["text_project::model.text_proj.weight"] = _inv_lin(
        flat["embeddings/text_proj"]
    )
    # codec_embed.onnx (:561-590)
    man["codec_embed::model.codec_embed.weight"] = list(
        flat["embeddings/codec_embed"]
    )
    # code_predictor_embed.onnx (:592-613)
    n_steps = flat["embeddings/pred_embed"][0]
    for j in range(n_steps):
        man[f"code_predictor_embed::model.embeds.{j}.weight"] = list(
            flat["embeddings/pred_embed"][1:]
        )
    # talker_prefill.onnx + talker_decode.onnx (:615-732): duplicated
    _transformer_entries(
        flat, man, "talker", ("talker_prefill", "talker_decode"), "model.",
    )
    for g in ("talker_prefill", "talker_decode"):
        man[f"{g}::lm_head.weight"] = _inv_lin(flat["talker/lm_head"])
    # code_predictor.onnx (:734-757)
    _transformer_entries(flat, man, "code_predictor", ("code_predictor",),
                         "model.")
    if "code_predictor/head" in flat:
        # fallback topology: ONE shared head + step embedding
        man["code_predictor::lm_head.weight"] = _inv_lin(
            flat["code_predictor/head"]
        )
        man["code_predictor::step_embed.weight"] = list(
            flat["code_predictor/step_embed"]
        )
    else:
        for j in range(flat["code_predictor/heads"][0]):
            man[f"code_predictor::heads.{j}.weight"] = _inv_lin(
                flat["code_predictor/heads"][1:]
            )
    # tokenizer12hz_decode.onnx (vocoder, :759-776)
    g = "tokenizer12hz_decode"
    for j in range(flat["vocoder/codebooks"][0]):
        man[f"{g}::quantizer.codebooks.{j}.weight"] = list(
            flat["vocoder/codebooks"][1:]
        )
    i = 0
    while f"vocoder/prenet/{i}/dw" in flat:
        p = f"vocoder/prenet/{i}"
        man[f"{g}::decoder.prenet.{i}.dwconv.weight"] = _inv_dw(flat[f"{p}/dw"])
        man[f"{g}::decoder.prenet.{i}.norm.weight"] = list(flat[f"{p}/ln_scale"])
        man[f"{g}::decoder.prenet.{i}.norm.bias"] = list(flat[f"{p}/ln_bias"])
        man[f"{g}::decoder.prenet.{i}.pwconv1.weight"] = _inv_lin(flat[f"{p}/w1"])
        man[f"{g}::decoder.prenet.{i}.pwconv1.bias"] = list(flat[f"{p}/b1"])
        man[f"{g}::decoder.prenet.{i}.pwconv2.weight"] = _inv_lin(flat[f"{p}/w2"])
        man[f"{g}::decoder.prenet.{i}.pwconv2.bias"] = list(flat[f"{p}/b2"])
        i += 1
    if "vocoder/istft_out_w" in flat:
        # fallback topology: Vocos-style iSTFT head (no upsample stages)
        man[f"{g}::decoder.head.norm.weight"] = list(flat["vocoder/head_ln_scale"])
        man[f"{g}::decoder.head.norm.bias"] = list(flat["vocoder/head_ln_bias"])
        man[f"{g}::decoder.head.out.weight"] = _inv_lin(flat["vocoder/istft_out_w"])
        man[f"{g}::decoder.head.out.bias"] = list(flat["vocoder/istft_out_b"])
        # synthesis window: regenerated (periodic hann), dropped by rule;
        # n_fft = 2 * (n_bins - 1) where out bias holds 2 * n_bins entries
        man[f"{g}::decoder.head.istft.window"] = [flat["vocoder/istft_out_b"][0] - 2]
    s = 0
    while f"vocoder/stages/{s}/up_w" in flat:
        st = f"vocoder/stages/{s}"
        man[f"{g}::decoder.ups.{s}.weight"] = _inv_conv(flat[f"{st}/up_w"])
        man[f"{g}::decoder.ups.{s}.bias"] = list(flat[f"{st}/up_b"])
        r = 0
        while f"{st}/res/{r}/w1" in flat:
            man[f"{g}::decoder.ups.{s}.res.{r}.conv1.weight"] = _inv_conv(
                flat[f"{st}/res/{r}/w1"]
            )
            man[f"{g}::decoder.ups.{s}.res.{r}.conv1.bias"] = list(
                flat[f"{st}/res/{r}/b1"]
            )
            man[f"{g}::decoder.ups.{s}.res.{r}.conv2.weight"] = _inv_conv(
                flat[f"{st}/res/{r}/w2"]
            )
            man[f"{g}::decoder.ups.{s}.res.{r}.conv2.bias"] = list(
                flat[f"{st}/res/{r}/b2"]
            )
            r += 1
        s += 1
    if "vocoder/final_w" in flat:
        man[f"{g}::decoder.final.weight"] = _inv_conv(flat["vocoder/final_w"])
        man[f"{g}::decoder.final.bias"] = list(flat["vocoder/final_b"])
    # speaker_encoder.onnx (:367-403)
    g = "speaker_encoder"
    if "speaker_encoder/frontend/w" in flat:
        return _ecapa_entries(flat, man, g)
    man[f"{g}::input_proj.weight"] = _inv_lin(flat["speaker_encoder/in_proj"])
    man[f"{g}::input_proj.bias"] = list(flat["speaker_encoder/in_bias"])
    i = 0
    while f"speaker_encoder/layers/{i}/wq" in flat:
        p = f"speaker_encoder/layers/{i}"
        e = f"{g}::encoder.layers.{i}"
        man[f"{e}.norm1.weight"] = list(flat[f"{p}/ln1_s"])
        man[f"{e}.norm1.bias"] = list(flat[f"{p}/ln1_b"])
        for w in ("q", "k", "v", "o"):
            man[f"{e}.self_attn.{w}_proj.weight"] = _inv_lin(flat[f"{p}/w{w}"])
        man[f"{e}.norm2.weight"] = list(flat[f"{p}/ln2_s"])
        man[f"{e}.norm2.bias"] = list(flat[f"{p}/ln2_b"])
        man[f"{e}.linear1.weight"] = _inv_lin(flat[f"{p}/w1"])
        man[f"{e}.linear1.bias"] = list(flat[f"{p}/b1"])
        man[f"{e}.linear2.weight"] = _inv_lin(flat[f"{p}/w2"])
        man[f"{e}.linear2.bias"] = list(flat[f"{p}/b2"])
        i += 1
    man[f"{g}::pool.attention.weight"] = _inv_lin(flat["speaker_encoder/pool_w"])
    man[f"{g}::pool.v.weight"] = _inv_lin(flat["speaker_encoder/pool_v"])
    man[f"{g}::output_proj.weight"] = _inv_lin(flat["speaker_encoder/out_proj"])
    man[f"{g}::output_proj.bias"] = list(flat["speaker_encoder/out_bias"])
    return man


def _ecapa_entries(flat, man, g):
    """ECAPA-TDNN fallback speaker encoder (docs/FALSIFIABILITY.md §3)."""
    man[f"{g}::frontend.conv.weight"] = _inv_conv(flat[f"{g}/frontend/w"])
    man[f"{g}::frontend.conv.bias"] = list(flat[f"{g}/frontend/b"])
    _bn_entries(man, f"{g}::frontend.bn", flat[f"{g}/frontend/b"][0])
    b = 0
    while f"{g}/blocks/{b}/in_w" in flat:
        p = f"{g}/blocks/{b}"
        e = f"{g}::blocks.{b}"
        C = flat[f"{p}/in_b"][0]
        man[f"{e}.conv_in.weight"] = _inv_conv(flat[f"{p}/in_w"])
        man[f"{e}.conv_in.bias"] = [C]
        _bn_entries(man, f"{e}.bn_in", C)
        n_res = flat[f"{p}/res_w"][0]
        for r in range(n_res):
            man[f"{e}.res2net.convs.{r}.weight"] = _inv_conv(
                flat[f"{p}/res_w"][1:]
            )
            man[f"{e}.res2net.convs.{r}.bias"] = list(flat[f"{p}/res_b"][1:])
        _bn_entries(man, f"{e}.bn_res", C)
        man[f"{e}.conv_out.weight"] = _inv_conv(flat[f"{p}/out_w"])
        man[f"{e}.conv_out.bias"] = [C]
        _bn_entries(man, f"{e}.bn_out", C)
        man[f"{e}.se.fc1.weight"] = _inv_lin(flat[f"{p}/se_w1"])
        man[f"{e}.se.fc1.bias"] = list(flat[f"{p}/se_b1"])
        man[f"{e}.se.fc2.weight"] = _inv_lin(flat[f"{p}/se_w2"])
        man[f"{e}.se.fc2.bias"] = list(flat[f"{p}/se_b2"])
        b += 1
    man[f"{g}::mfa.weight"] = _inv_lin(flat[f"{g}/mfa_w"])
    man[f"{g}::mfa.bias"] = list(flat[f"{g}/mfa_b"])
    man[f"{g}::pool.att1.weight"] = _inv_lin(flat[f"{g}/asp_w1"])
    man[f"{g}::pool.att1.bias"] = list(flat[f"{g}/asp_b1"])
    man[f"{g}::pool.att2.weight"] = _inv_lin(flat[f"{g}/asp_w2"])
    man[f"{g}::pool.att2.bias"] = list(flat[f"{g}/asp_b2"])
    _bn_entries(man, f"{g}::post_bn", flat[f"{g}/post_bn/g"][0])
    man[f"{g}::fc.weight"] = _inv_lin(flat[f"{g}/out_w"])
    man[f"{g}::fc.bias"] = list(flat[f"{g}/out_b"])
    return man


def fallback_cfg():
    """The all-fallback-topology 0.6B config (docs/FALSIFIABILITY.md): shared
    MTP head, iSTFT vocoder head, ECAPA speaker encoder — so dry-run can
    gate a real export that falsifies the primary guesses."""
    import dataclasses

    from leaxer_qwen3_tts_tpu.config import PRESETS

    cfg = PRESETS["qwen3-tts-12hz-0.6b-base"]
    return dataclasses.replace(
        cfg,
        name="qwen3-tts-12hz-0.6b-fallback",
        code_predictor=dataclasses.replace(cfg.code_predictor, head_mode="shared"),
        vocoder=dataclasses.replace(cfg.vocoder, head="istft"),
        speaker_encoder=dataclasses.replace(cfg.speaker_encoder, topology="ecapa"),
    )


def hf_manifest(flat):
    """LM checkpoint only: talker + code predictor + embeddings (the codec
    decoder and speaker encoder ship as separate artifacts upstream)."""
    man = {}
    L = flat["talker/transformer/layers/attn_norm"][0]
    per = {
        "input_layernorm.weight": ("attn_norm", None),
        "self_attn.q_proj.weight": ("wq", _inv_lin),
        "self_attn.k_proj.weight": ("wk", _inv_lin),
        "self_attn.v_proj.weight": ("wv", _inv_lin),
        "self_attn.o_proj.weight": ("wo", _inv_lin),
        "self_attn.q_norm.weight": ("q_norm", None),
        "self_attn.k_norm.weight": ("k_norm", None),
        "post_attention_layernorm.weight": ("mlp_norm", None),
        "mlp.gate_proj.weight": ("wg", _inv_lin),
        "mlp.up_proj.weight": ("wu", _inv_lin),
        "mlp.down_proj.weight": ("wd", _inv_lin),
    }

    def block(root, tgt):
        n = flat[f"{tgt}/transformer/layers/attn_norm"][0]
        for i in range(n):
            for src_leaf, (tgt_leaf, inv) in per.items():
                s = list(flat[f"{tgt}/transformer/layers/{tgt_leaf}"][1:])
                man[f"{root}.layers.{i}.{src_leaf}"] = inv(s) if inv else s
        man[f"{root}.norm.weight"] = list(flat[f"{tgt}/transformer/final_norm"])

    block("talker.model", "talker")
    man["talker.lm_head.weight"] = _inv_lin(flat["talker/lm_head"])
    man["talker.model.embed_tokens.weight"] = list(flat["embeddings/text_embed"])
    man["talker.text_proj.weight"] = _inv_lin(flat["embeddings/text_proj"])
    man["talker.model.codec_embeds.weight"] = list(flat["embeddings/codec_embed"])
    block("talker.code_predictor.model", "code_predictor")
    for j in range(flat["code_predictor/heads"][0]):
        man[f"talker.code_predictor.heads.{j}.weight"] = _inv_lin(
            flat["code_predictor/heads"][1:]
        )
    for j in range(flat["embeddings/pred_embed"][0]):
        man[f"talker.code_predictor.embeds.{j}.weight"] = list(
            flat["embeddings/pred_embed"][1:]
        )
    return man


def main(argv=None) -> int:
    import os as _os

    _os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from leaxer_qwen3_tts_tpu.config import PRESETS

    out_dir = (argv or sys.argv[1:] or ["tests/fixtures"])[0]
    cfg = PRESETS["qwen3-tts-12hz-0.6b-base"]
    flat = _flat_shapes(cfg)
    fb_cfg = fallback_cfg()
    fb_flat = _flat_shapes(fb_cfg)
    # CustomVoice: the base 8-graph export + a preset-speaker table
    # [num_speakers, talker_hidden] (tts_onnx.h:82-93, 9 presets)
    from leaxer_qwen3_tts_tpu.config import PRESET_SPEAKERS

    cv = dict(onnx_manifest(flat))
    cv["talker_decode::model.speaker_embed.weight"] = [
        len(PRESET_SPEAKERS), flat["talker/transformer/final_norm"][0],
    ]
    os.makedirs(out_dir, exist_ok=True)
    for name, man in (
        ("manifest_onnx_8graph.json", onnx_manifest(flat)),
        ("manifest_hf.json", hf_manifest(flat)),
        ("manifest_onnx_fallback.json", onnx_manifest(fb_flat)),
        ("manifest_onnx_customvoice.json", cv),
    ):
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            json.dump(man, f, indent=0, sort_keys=True)
        print(f"wrote {path}: {len(man)} tensors")
    with open(os.path.join(out_dir, "config_fallback.json"), "w") as f:
        f.write(fb_cfg.to_json())
    print(f"wrote {out_dir}/config_fallback.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
