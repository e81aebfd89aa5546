from .attention import attend, attend_xla

__all__ = ["attend", "attend_xla"]
