"""jax.profiler integration (SURVEY §5: the reference has no tracing at all).

Set ``QTTS_PROFILE=/some/dir`` to capture a TensorBoard-compatible XPlane
trace of every synthesis call (one subdirectory per label).  View with
``tensorboard --logdir $QTTS_PROFILE`` or xprof.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def maybe_trace(label: str):
    """Wraps a region in jax.profiler.trace when QTTS_PROFILE is set."""
    base = os.environ.get("QTTS_PROFILE")
    if not base:
        yield
        return
    import jax

    path = os.path.join(base, f"{label}-{int(time.time() * 1e3)}")
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield


def annotate(name: str):
    """TraceAnnotation context for fine-grained regions inside a trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)
