"""Multi-stream serving: dynamic + continuous batching, HTTP facade."""

from .pool import ContinuousBatcher
from .server import BatchingServer, make_http_server, wav_bytes

__all__ = [
    "BatchingServer",
    "ContinuousBatcher",
    "make_http_server",
    "wav_bytes",
]
