"""Per-stage timing + first-class TTS metrics (RTF, TTFA).

The reference's only observability is a final "Generated X.XX seconds" print
(main_onnx.cpp:181-182); here every synthesis returns a structured metrics
object: per-stage wall clock (tokenize / prefill / decode / vocode), real-time
factor, and time-to-first-audio (meaningful with the streaming vocoder).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class SynthesisMetrics:
    stage_seconds: Dict[str, float] = field(default_factory=dict)
    audio_seconds: float = 0.0
    frames: int = 0
    ttfa_seconds: Optional[float] = None  # time to first audio chunk
    total_seconds: float = 0.0
    # speculative decoding (engine spec_k path): verify iterations run and
    # draft slots accepted — acceptance = spec_accepted / (iterations * (k-1)).
    # NOTE spec_iterations counts every verify iteration DISPATCHED, including
    # ones after a stream latched EOS (tail of the final dispatch; in the
    # batched path, iterations after early-finishing streams freeze), so the
    # derived acceptance rate is a mild UNDERestimate for short utterances.
    spec_iterations: int = 0
    spec_accepted: int = 0
    # adaptive spec: True when trailing acceptance fell below the engine's
    # spec_accept_floor and the request reverted to sequential decode
    spec_fallback: bool = False

    @property
    def rtf(self) -> float:
        """Real-time factor: audio seconds generated per wall-clock second."""
        return self.audio_seconds / self.total_seconds if self.total_seconds > 0 else 0.0

    @property
    def frames_per_second(self) -> float:
        return self.frames / self.total_seconds if self.total_seconds > 0 else 0.0

    def summary(self) -> str:
        stages = ", ".join(f"{k} {v * 1e3:.1f}ms" for k, v in self.stage_seconds.items())
        ttfa = f", ttfa {self.ttfa_seconds * 1e3:.1f}ms" if self.ttfa_seconds is not None else ""
        return (
            f"audio {self.audio_seconds:.2f}s in {self.total_seconds:.2f}s "
            f"(RTF {self.rtf:.2f}x{ttfa}; {stages})"
        )


class StageTimer:
    """Accumulates wall-clock per named stage into a SynthesisMetrics."""

    def __init__(self, metrics: SynthesisMetrics):
        self.metrics = metrics
        self._start = time.perf_counter()

    def stage(self, name: str) -> "_StageCtx":
        return _StageCtx(self, name)

    def mark_first_audio(self) -> None:
        if self.metrics.ttfa_seconds is None:
            self.metrics.ttfa_seconds = time.perf_counter() - self._start

    def finish(self) -> SynthesisMetrics:
        self.metrics.total_seconds = time.perf_counter() - self._start
        return self.metrics


class _StageCtx:
    def __init__(self, timer: StageTimer, name: str):
        self.timer = timer
        self.name = name

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        m = self.timer.metrics.stage_seconds
        m[self.name] = m.get(self.name, 0.0) + dt
        return False
