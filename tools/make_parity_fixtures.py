"""Generate a per-stage parity fixture (.npz) from a framework checkpoint.

Produces every stage oracle tools/parity_check.py understands: token_ids,
prompt_embeds, prefill_logits, decode_logits, codes, waveform — under greedy
decoding, so the fixture is deterministic and comparable frame-for-frame.

Primary uses:
  * prove the parity gate end-to-end today (fixture from checkpoint A, gate
    run against checkpoint B = A's ONNX re-export converted back —
    tests/test_parity_check.py);
  * capture a golden snapshot before refactors;
  * when real reference assets exist, the same .npz schema is produced by
    instrumenting the reference instead, and the gate swaps fixtures without
    code changes (SURVEY §4 implications).

Usage:
  python -m tools.make_parity_fixtures --model <ckpt> --text "..." --out fx.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tools.make_parity_fixtures",
                                description=__doc__)
    p.add_argument("--model", required=True, help="framework checkpoint dir")
    p.add_argument("--text", default="hello world")
    p.add_argument("--language", default="auto")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--out", required=True, help="output .npz path")
    args = p.parse_args(argv)

    from leaxer_qwen3_tts_tpu.api.engine import TTSEngine

    from .parity_check import compute_stages

    engine = TTSEngine(args.model)
    if not engine.is_ready():
        print(f"engine not ready: {engine.get_error()}", file=sys.stderr)
        return 1
    stages = compute_stages(engine, args.text, args.language, args.max_frames)
    np.savez_compressed(args.out, **stages)
    for k, v in stages.items():
        shape = getattr(v, "shape", None)
        print(f"  {k}: {shape if shape is not None else v!r}")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
