"""Structured logging with a verbosity switch.

Replaces the reference's ad-hoc stderr prints (EP selection tts_onnx.cpp:158-226,
tokenizer progress tokenizer.cpp:277-279).  QTTS_LOG_LEVEL=debug|info|warning|
error controls verbosity; user-facing run summaries stay on stdout (CLI).
"""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def get_logger(name: str = "leaxer_qwen3_tts_tpu") -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        level = os.environ.get("QTTS_LOG_LEVEL", "warning").upper()
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("[%(levelname)s %(name)s] %(message)s")
        )
        root = logging.getLogger("leaxer_qwen3_tts_tpu")
        root.addHandler(handler)
        root.setLevel(getattr(logging, level, logging.WARNING))
        _CONFIGURED = True
    return logging.getLogger(name)
