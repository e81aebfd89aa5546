"""Weight-only int8 quantization for the memory-bound decode path.

Single-token decode reads every talker weight (431M params) plus the MTP
stack 15x (92M each) per 12 Hz frame — pure HBM bandwidth.  Storing weights
as int8 with per-output-channel scales halves the bytes; the dequant
(convert + scale) fuses into the matmul's operand read on TPU.

Applied as a RUNTIME transform after checkpoint load (checkpoints stay
bf16/f32): `quantize_params(params)` rewrites matmul weights to
``QuantizedLinear``; the model code calls :func:`dense`, which dispatches on
leaf type.  Training and TP-sharded paths use unquantized params (the
sharding rules key on raw array paths).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Union

import jax
import jax.numpy as jnp


class QuantizedLinear(NamedTuple):
    """int8 weight + per-output-channel scale.

    q:     int8, [..., in, out] (leading axes = layer stack)
    scale: float32, [..., 1, out]
    """

    q: jax.Array
    scale: jax.Array


WeightLike = Union[jax.Array, QuantizedLinear]


def quantize_weight(w: jax.Array) -> QuantizedLinear:
    """Per-output-channel symmetric int8 quantization over the 'in' axis."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, out]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedLinear(q=q, scale=scale.astype(jnp.float32))


def dense(x: jax.Array, w: WeightLike) -> jax.Array:
    """x [..., in] @ w -> [..., out] with float32 accumulation.

    QuantizedLinear path: the int8 tensor converts to bf16 in-graph and XLA
    fuses the convert into the dot's operand stream (HBM traffic = int8
    bytes).  Measured on v5e this beats a per-dot Pallas kernel
    (quant_kernels.py, opt-in via QTTS_PALLAS_QUANT=1), which pays grid
    overheads and blocks XLA's surrounding fusions at these tiny-M shapes.
    """
    if isinstance(w, QuantizedLinear):
        if _use_pallas_path(w):
            from .quant_kernels import dense_int8_pallas

            return dense_int8_pallas(x, w.q, w.scale)
        y = jnp.dot(
            x, w.q.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        return y * w.scale.reshape(w.scale.shape[-1])
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _use_pallas_path(w: QuantizedLinear) -> bool:
    import os

    if not os.environ.get("QTTS_PALLAS_QUANT"):
        return False
    if jax.default_backend() != "tpu":
        return False
    K, N = w.q.shape[-2], w.q.shape[-1]
    return K % 128 == 0 and N % 128 == 0


def weight_dtype(w: WeightLike):
    return jnp.bfloat16 if isinstance(w, QuantizedLinear) else w.dtype


def index_weight(w: WeightLike, i, axis: int = 0) -> WeightLike:
    """dynamic_index_in_dim through a possibly-quantized stacked weight."""
    if isinstance(w, QuantizedLinear):
        return QuantizedLinear(
            q=jax.lax.dynamic_index_in_dim(w.q, i, axis=axis, keepdims=False),
            scale=jax.lax.dynamic_index_in_dim(w.scale, i, axis=axis, keepdims=False),
        )
    return jax.lax.dynamic_index_in_dim(w, i, axis=axis, keepdims=False)


# weight names (leaf keys) that are matmul operands and safe to quantize
_MATMUL_KEYS = frozenset(
    {"wq", "wk", "wv", "wo", "wg", "wu", "wd", "lm_head", "heads",
     "wqkv", "wgu"}
)


def fuse_params(params, modules: Sequence[str] = ("talker", "code_predictor")):
    """Concatenate per-layer (wq,wk,wv) -> wqkv and (wg,wu) -> wgu.

    One [H, q+2kv] matvec instead of three and one [H, 2I] instead of two:
    fewer op dispatches and denser HBM streams on the decode path.  Inference
    transform only — training and TP sharding keep the separate layout
    (models/layers.py dispatches on key presence)."""

    def fuse_layers(layers: dict) -> dict:
        out = {k: v for k, v in layers.items()}
        if all(k in out for k in ("wq", "wk", "wv")):
            out["wqkv"] = jnp.concatenate(
                [out.pop("wq"), out.pop("wk"), out.pop("wv")], axis=-1
            )
        if all(k in out for k in ("wg", "wu")):
            out["wgu"] = jnp.concatenate([out.pop("wg"), out.pop("wu")], axis=-1)
        return out

    out = {}
    for key, sub in params.items():
        if key in modules and isinstance(sub, dict) and "transformer" in sub:
            tr = dict(sub["transformer"])
            tr["layers"] = fuse_layers(tr["layers"])
            out[key] = {**sub, "transformer": tr}
        else:
            out[key] = sub
    return out


def quantize_params(params, modules: Sequence[str] = ("talker", "code_predictor")):
    """Quantize the matmul weights of the given top-level modules.

    Embedding gather tables, norms, the vocoder, and the speaker encoder stay
    in their original dtype (gathers don't dequant-fuse; the rest is cheap).
    """

    def walk(node, quantizing: bool):
        if isinstance(node, dict):
            return {
                k: (
                    quantize_weight(v)
                    if quantizing and k in _MATMUL_KEYS and hasattr(v, "ndim")
                    else walk(v, quantizing)
                )
                for k, v in node.items()
            }
        if hasattr(node, "_fields"):  # NamedTuple (QuantizedLinear,
            return node  # FusedStepWeights, ...): already-packed, pass through
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, quantizing) for v in node)
        return node

    out = {}
    for key, sub in params.items():
        out[key] = walk(sub, quantizing=key in modules)
    return out
