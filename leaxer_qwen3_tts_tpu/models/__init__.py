from .layers import KVCache, init_kv_cache, init_transformer_params, transformer_forward

__all__ = ["KVCache", "init_kv_cache", "init_transformer_params", "transformer_forward"]
