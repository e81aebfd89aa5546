"""Multi-stream serving: dynamic batching + HTTP facade."""

from .server import BatchingServer, make_http_server, wav_bytes

__all__ = ["BatchingServer", "make_http_server", "wav_bytes"]
