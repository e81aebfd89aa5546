"""Stage-level parity gate vs reference fixtures (BASELINE: <=1e-2 L-inf).

Compares this framework's outputs against recorded reference outputs for any
subset of stages, given a fixture .npz with any of these keys:

  text                : str       — the prompt
  token_ids           : int32 [T] — expected BPE ids (tokenizer stage)
  mel_input_wav       : str path  — reference WAV fed to the mel stage
  mel                 : f32 [frames, 128] — expected log-mel
  prompt_embeds       : f32 [P, H] — assembled prompt embedding sequence
                        (reference build_prompt_embeddings, tts_onnx.cpp:442-539)
  prefill_logits      : f32 [V]   — talker logits after the prompt
  decode_logits       : f32 [F, V] — per-frame talker logits under greedy
                        decode (logits after frame t select frame t+1's code0)
  codes               : int32 [F, 16] — greedy codec frames
  waveform            : f32 [N]   — final audio (<=1e-2 L-inf gate)

Fixtures come from either (a) instrumenting the reference (its ONNX graphs
emit every intermediate; SURVEY §4) once real assets exist, or (b) this
repo's own generator ``tools/make_parity_fixtures.py`` — used today to prove
the full gate end-to-end across the ONNX export->convert round trip
(tests/test_parity_check.py).

  python -m tools.parity_check --model <ckpt_dir> --fixture fx.npz

Exit code 0 = all present stages pass; 1 = any stage fails.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

WAVEFORM_LINF = 1e-2  # BASELINE.md gate
EMBEDS_LINF = 1e-2
LOGITS_LINF = 5e-2  # logit magnitudes ~10; bf16 checkpoints need the slack


def compute_stages(engine, text: str, language: str = "auto",
                   max_frames=None) -> dict:
    """Greedy per-stage oracles for ``text`` on ``engine``'s model.

    Returns {token_ids, prompt_embeds, prefill_logits, decode_logits, codes,
    waveform}; decode runs one frame per dispatch so every frame's logits are
    observable (the reference's per-step run_decode boundary, SURVEY §3.1).
    """
    import jax

    from leaxer_qwen3_tts_tpu.config import language_to_codec_id
    from leaxer_qwen3_tts_tpu.models.codec12hz import vocoder_forward
    from leaxer_qwen3_tts_tpu.runtime.generate import make_generate_fns
    from leaxer_qwen3_tts_tpu.runtime.sampling import SamplingParams

    cfg = engine.cfg
    ids = engine.tokenizer.encode(text)
    lang_id = language_to_codec_id(language if language != "auto" else None)
    max_frames = engine.max_frames if max_frames is None else int(max_frames)

    t_bucket = ((len(ids) + 15) // 16) * 16
    ids_arr = np.zeros((1, t_bucket), np.int32)
    ids_arr[0, : len(ids)] = ids
    lens = np.asarray([len(ids)], np.int32)

    fns = make_generate_fns(
        cfg, batch=1, max_len=engine.kv_ladder[-1], chunk_len=1, lang_id=lang_id
    )
    state, bundle = fns.prefill(
        engine.params, ids_arr, lens, jax.random.PRNGKey(0)
    )
    P = int(np.asarray(bundle.prompt_len)[0])
    out = {
        "text": text,
        "token_ids": np.asarray(ids, np.int32),
        "prompt_embeds": np.asarray(bundle.prompt_embeds, np.float32)[0, :P],
        "prefill_logits": np.asarray(state.last_logits, np.float32)[0],
    }
    sp = SamplingParams.create(temperature=0.0)
    frames, valids, logits_seq = [], [], []
    for _ in range(max_frames):
        state, frame, valid = fns.decode(
            engine.params, state, bundle.trailing, bundle.trailing_len,
            bundle.tts_pad_embed, sp,
        )
        frames.append(np.asarray(frame)[0, 0])
        valids.append(bool(np.asarray(valid)[0, 0]))
        logits_seq.append(np.asarray(state.last_logits, np.float32)[0])
        if bool(np.asarray(state.done).all()):
            break
    n_valid = sum(valids)
    codes = np.asarray(frames[:n_valid], np.int32).reshape(n_valid, -1)
    out["codes"] = codes
    out["decode_logits"] = np.asarray(logits_seq[:n_valid], np.float32)
    if n_valid:
        wav = vocoder_forward(cfg.vocoder, engine.params["vocoder"], codes[None])
        out["waveform"] = np.asarray(wav, np.float32)[0]
    else:
        out["waveform"] = np.zeros((0,), np.float32)
    return out


def _linf_stage(name, got, want, bound, failures):
    if got.shape != want.shape:
        print(f"{name}: FAIL (shape {got.shape} vs {want.shape})")
        failures.append(name)
        return
    err = float(np.max(np.abs(got - want))) if got.size else 0.0
    ok = err <= bound
    print(f"{name}: {'PASS' if ok else 'FAIL'} (L-inf {err:.2e} <= {bound})")
    if not ok:
        failures.append(name)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tools.parity_check", description=__doc__)
    p.add_argument("--model", required=True, help="framework checkpoint dir")
    p.add_argument("--fixture", required=True, help=".npz with reference outputs")
    p.add_argument("--language", default="auto")
    args = p.parse_args(argv)

    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
    from leaxer_qwen3_tts_tpu.config import MelConfig
    from leaxer_qwen3_tts_tpu.frontend import log_mel, read_wav, resample

    with np.load(args.fixture, allow_pickle=True) as z:
        fx = {k: z[k] for k in z.files}

    engine = TTSEngine(args.model)
    if not engine.is_ready():
        print(f"engine not ready: {engine.get_error()}", file=sys.stderr)
        return 1

    failures = []
    text = str(fx["text"]) if "text" in fx else None

    if "token_ids" in fx and text is not None:
        got = np.asarray(engine.tokenizer.encode(text), np.int32)
        want = fx["token_ids"].astype(np.int32).ravel()
        ok = got.shape == want.shape and (got == want).all()
        print(f"tokenizer: {'PASS' if ok else 'FAIL'} ({len(got)} ids)")
        if not ok:
            failures.append("tokenizer")

    if "mel" in fx and "mel_input_wav" in fx:
        audio, sr = read_wav(str(fx["mel_input_wav"]))
        if sr != 24000:
            audio = resample(audio, sr, 24000)
        got = np.asarray(log_mel(audio, MelConfig()))
        want = fx["mel"]
        err = float(np.max(np.abs(got - want))) if got.shape == want.shape else np.inf
        ok = got.shape == want.shape and err < 1e-2
        print(f"mel: {'PASS' if ok else 'FAIL'} (L-inf {err:.2e})")
        if not ok:
            failures.append("mel")

    needs_stages = any(
        k in fx for k in ("prompt_embeds", "prefill_logits", "decode_logits")
    )
    if needs_stages and text is not None:
        st = compute_stages(
            engine, text, args.language,
            max_frames=len(fx["decode_logits"]) if "decode_logits" in fx else None,
        )
        if "prompt_embeds" in fx:
            _linf_stage("prompt_embeds", st["prompt_embeds"],
                        fx["prompt_embeds"].astype(np.float32), EMBEDS_LINF,
                        failures)
        if "prefill_logits" in fx:
            _linf_stage("prefill_logits", st["prefill_logits"],
                        fx["prefill_logits"].astype(np.float32).ravel(),
                        LOGITS_LINF, failures)
        if "decode_logits" in fx:
            want = fx["decode_logits"].astype(np.float32)
            n = min(len(st["decode_logits"]), len(want))
            _linf_stage("decode_logits", st["decode_logits"][:n], want[:n],
                        LOGITS_LINF, failures)

    needs_generation = any(k in fx for k in ("codes", "waveform"))
    if needs_generation and text is not None:
        # bound generation by the fixture's length (greedy is deterministic,
        # so equal-length runs are comparable frame-for-frame)
        if "codes" in fx:
            max_tok = int(len(fx["codes"]))
        elif "waveform" in fx:
            max_tok = max(1, int(np.ceil(len(fx["waveform"].ravel()) / 2000)))
        else:
            max_tok = None
        result = engine.synthesize(
            text, language=args.language, temperature=0.0, max_tokens=max_tok
        )
        if "codes" in fx:
            got, want = result.codes, fx["codes"]
            n = min(len(got), len(want))
            match = float((got[:n] == want[:n]).mean()) if n else 0.0
            ok = got.shape == want.shape and match == 1.0
            print(f"codes: {'PASS' if ok else 'FAIL'} (match {match:.3f}, "
                  f"{got.shape} vs {want.shape})")
            if not ok:
                failures.append("codes")
        if "waveform" in fx:
            got, want = result.audio, fx["waveform"].ravel()
            n = min(len(got), len(want))
            err = float(np.max(np.abs(got[:n] - want[:n]))) if n else np.inf
            ok = len(got) == len(want) and err <= WAVEFORM_LINF
            print(f"waveform: {'PASS' if ok else 'FAIL'} "
                  f"(L-inf {err:.2e} <= {WAVEFORM_LINF})")
            if not ok:
                failures.append("waveform")

    if failures:
        print(f"FAILED stages: {failures}", file=sys.stderr)
        return 1
    print("all present stages PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
