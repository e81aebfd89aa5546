"""Stage-level parity gate vs reference fixtures (BASELINE: <=1e-2 L-inf).

Compares this framework's outputs against recorded reference outputs for any
subset of stages, given a fixture .npz with any of these keys:

  text                : str       — the prompt
  token_ids           : int32 [T] — expected BPE ids (tokenizer stage)
  mel_input_wav       : str path  — reference WAV fed to the mel stage
  mel                 : f32 [frames, 128] — expected log-mel
  prefill_logits      : f32 [V]   — talker logits after the prompt (greedy)
  codes               : int32 [F, 16] — greedy codec frames
  waveform            : f32 [N]   — final audio (<=1e-2 L-inf gate)

Fixtures are produced by instrumenting the reference (its ONNX graphs emit
every intermediate; SURVEY §4) — this tool is the "compare" half, committed
now so the gate runs the moment assets exist:

  python -m tools.parity_check --model <ckpt_dir> --fixture fx.npz [--seed 0]

Exit code 0 = all present stages pass; 1 = any stage fails.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

WAVEFORM_LINF = 1e-2  # BASELINE.md gate
LOGITS_RTOL = 1e-3


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

    needs_generation = any(k in fx for k in ("prefill_logits", "codes", "waveform"))
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
