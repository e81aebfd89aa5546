"""Streamed-trunk MTP chain: the whole 15-step sub-code loop in ONE Pallas
kernel with the trunk weights DMA-STREAMED from HBM through a ring scratch.

Why this exists (the 1.7B single-chip gap): the resident chain
(ops/fused_mtp.py) needs the packed trunk to fit VMEM — true for 0.6B
(78 MB int8), never true single-chip for 1.7B (302 MB int8 / 151 MB int4).
1.7B therefore decoded on the per-step path: 15 separate kernel dispatches
per frame with the step head matmul, Gumbel sampling, table gather and the
dispatch glue all in XLA between them — measured ~6.3 ms of a ~8.75 ms
frame against a ~2.8 ms DMA floor for the 16 int4 trunk streams
(docs/BENCH_EVIDENCE_r5.md, ring-sweep decomposition).  This kernel keeps
the per-step path's weight traffic (the trunk streams once per chain
position — residency is impossible) but deletes everything between the
steps: head logits, sampling, and the embed-row gather run in-kernel
exactly like the resident chain, and the next position's unit DMAs issue
behind the current position's matmuls (the manual-DMA ring protocol of
ops/fused_step._manual_layer_core, extended across chain positions).

Replaces the loop at reference tts_onnx.cpp:851-872 (one ONNX session call
per sub-code) for trunks too large to hold on-chip.

Sampling: same precomputed-Gumbel in-kernel sampler as the resident chain
(fused_mtp.gumbel_topk_topp_sample) on the same split(key, n) noise chain —
streamed and resident chains produce IDENTICAL outputs (same values, same
op order; only the weight transport differs), which the tests pin exactly
and hardware confirms (manual_probe --streamdiag: bit-equal at ring 2/4/8,
greedy AND sampled, on the shape both kernels run).  vs the per-step XLA
path, greedy is identical modulo head-matmul ROUNDING: at H=1024 shapes
they match bit-for-bit; at the 1.7B shape (I=6144 accumulation depth) the
in-kernel bf16 head dot rounds differently from XLA's, flipping argmax on
near-tie logits (~3-4%/step on random *0.02-init weights — scattered,
unpatterned first divergences; manual_probe --streamdiag17).  On trained
weights, whose logit margins are far wider than bf16 ulps, flips are
expected to vanish; the resident chain's greedy contract is the same.

VMEM budget: ring unit slots + all-layer scales + head double-buffer +
the <=17-slot f32 KV scratch + activations — ~25 MB at 1.7B int4
(vs the 151 MB trunk residency would need).  supports_stream() does the
arithmetic.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

try:  # pragma: no cover - exercised on TPU / interpret
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pl = None
    pltpu = None
    _VMEM = None
    _SMEM = None

from ..config import TransformerConfig
from .fused_mtp import RESIDENT_MAX_BYTES, gumbel_topk_topp_sample
from .fused_step import (
    N_UNIT,
    FusedStepWeights,
    _matmul_unit,
    _rms,
    _rope,
    _unit_counts,
    supports,
)

__all__ = [
    "supports_stream",
    "stream_compiler_options",
    "fused_mtp_chain_streamed",
]

# fixed VMEM beyond the streamed slots: activations, caches, emb row block
_STREAM_FIXED = 8 * 1024 * 1024

# XLA charges the kernel's VMEM blocks against its scoped-vmem stack, whose
# 16 MiB default rejects this kernel (observed on v5e: "Scoped allocation
# with size 25.22M and limit 16.00M" — ring 4 + head double-buffer + KV
# scratch at 1.7B int8).  48 MiB covers ring-depth sweeps to 8 with slack
# while perturbing XLA's other choices far less than the 115 MiB resident
# cap (see fused_mtp.resident_compiler_options for why the cap is gated
# tightly).  jits that can embed ONLY the streamed chain (trunk too big to
# be resident) should pass these options instead of the resident ones.
_STREAM_VMEM_KIB = int(__import__("os").environ.get(
    "QTTS_STREAM_VMEM_KIB", "49152"
))


def stream_compiler_options() -> "dict | None":
    """compiler_options for jits embedding the streamed-trunk chain, or
    None off-TPU (CPU/interpret paths must not see the TPU-only flag)."""
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return None
    except Exception:  # pragma: no cover
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(_STREAM_VMEM_KIB)}


def supports_stream(
    fw: FusedStepWeights, n_steps: int, V: int, ring: int = 4
) -> bool:
    """True when the ring slots + scales + head double-buffer fit the
    resident VMEM budget.  Unlike supports_resident, the TRUNK never needs
    to fit — only ``ring`` unit slots do."""
    if fw is None:
        return False
    L, U, KU, NU = fw.units.shape
    unit_b = KU * NU * fw.units.dtype.itemsize
    scales_b = fw.scales.size * 4
    # head double buffer: [2, H, V] — H from the norms (always [L, 1, H]);
    # int8 heads assumed (bf16 doubles this — still small vs the budget)
    Hn = fw.attn_norm.shape[-1]
    heads_b = 2 * Hn * V
    total = ring * unit_b + scales_b + heads_b + _STREAM_FIXED
    return total <= RESIDENT_MAX_BYTES


def _make_stream_chain_kernel(
    cfg: TransformerConfig,
    n_steps: int,
    V: int,
    T: int,
    w4: bool,
    n_groups: int,
    ring: int,
):
    """Merged prefix + chain loop (fused_mtp._chain_core's schedule) with
    the trunk unit walk reading a ring-DMA scratch instead of a resident
    ref.  The global unit counter runs across chain positions: the last
    ring-1 units of position p prefetch position p+1's layer-0 units, so
    the stream never drains between steps."""
    H = cfg.hidden_size
    nq, nk, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = nq // nk
    qd, kvd = cfg.q_dim, cfg.kv_dim
    I = cfg.intermediate_size
    eps = cfg.rms_norm_eps
    n_qkv, n_wo, n_gu, n_wd = _unit_counts(cfg)
    U = n_qkv + n_wo + n_gu + n_wd
    b2, b3 = n_qkv + n_wo, n_qkv + n_wo + n_gu
    nn = H // N_UNIT
    n = n_steps
    L = cfg.num_layers
    LU = L * U
    assert 2 <= ring <= LU, f"ring {ring} outside [2, L*U={LU}]"

    def kernel(
        temp_ref, topk_ref, topp_ref,  # SMEM [1]
        lh_ref, c0_ref,  # [1, H] f32
        cos_ref, sin_ref,  # [n + 1, 1, d//2]
        w_hbm,  # ANY [L, U, KU, N_UNIT] — STREAMED trunk units
        s_ref,  # [L, U, G, N_UNIT] f32 — all-layer scales, resident
        an_ref, mn_ref,  # [L, 1, H]
        qn_ref, kn_ref,  # [L, 1, d]
        fn_ref,  # [1, H]
        hq_hbm,  # ANY [n, H, V] — step heads, double-buffered
        hs_ref,  # [n, 1, V] f32
        tab_hbm,  # ANY [n, Vt//8, 8, H]
        g_ref,  # [n, 1, V] f32
        subc_out, ssum_out,  # [1, n] i32, [1, H] f32
        x_s, h_s, qkv_s, attn_s, gu_s, hp_s,  # activations
        kc_s, vc_s,  # [L, nk, T, d] f32
        w_vm,  # [ring, KU, N_UNIT] — unit ring scratch
        head_vm,  # [2, H, V]
        emb_vm,  # [8, H]
        usems,  # DMA (ring,) — unit ring
        sems,  # DMA (3,) — 0/1 head buf, 2 emb row
    ):
        temp = temp_ref[0]
        top_k = topk_ref[0]
        top_p = topp_ref[0]

        def dma_unit(li, ui, sl):
            return pltpu.make_async_copy(
                w_hbm.at[li, ui], w_vm.at[sl], usems.at[sl]
            )

        kc_s[:] = jnp.zeros_like(kc_s[:])
        vc_s[:] = jnp.zeros_like(vc_s[:])
        ssum_out[:] = jnp.zeros_like(ssum_out[:])
        subc_out[:] = jnp.zeros_like(subc_out[:])
        pltpu.make_async_copy(hq_hbm.at[0], head_vm.at[0], sems.at[0]).start()
        # prime the ring: units 0..ring-2 of position 0 (slot = counter%ring)
        for gi in range(ring - 1):
            li, ui = divmod(gi, U)
            dma_unit(li, ui, gi).start()

        def trunk_step(pos):
            """One incremental trunk pass on the token in x_s at position
            pos; leaves the final-normed hidden in hp_s.  Unit walk =
            _manual_layer_core's schedule with the global counter
            pos*L*U + l*U + u; the prefetch for the last ring-1 units wraps
            to position pos+1's layer 0 (same HBM indices — the trunk
            stream is identical every position)."""
            cos = cos_ref[pos]
            sin = sin_ref[pos]
            # this position's slot phase: (pos*LU) % ring, traced via pos
            base = lax.rem(pos * LU, jnp.int32(ring))
            for l in range(L):
                for u in range(U):
                    off = l * U + u
                    sl = lax.rem(base + off, jnp.int32(ring))
                    # issue unit off+ring-1 BEFORE waiting on unit off: its
                    # slot is unit off-1's, already consumed last iteration
                    pre = off + ring - 1
                    psl = lax.rem(base + pre, jnp.int32(ring))
                    if pre < LU:
                        pli, pui = divmod(pre, U)
                        dma_unit(pli, pui, psl).start()
                    else:
                        pli, pui = divmod(pre - LU, U)

                        @pl.when(pos + 1 <= n)
                        def _prefetch_next_pos(pli=pli, pui=pui, psl=psl):
                            dma_unit(pli, pui, psl).start()

                    dma_unit(l, u, sl).wait()

                    # static phase boundaries (cf. _manual_layer_core)
                    if u == 0:
                        h_s[:] = _rms(x_s[:], an_ref[l], eps)
                    if u == n_qkv:
                        # --- attention (T slots resident in scratch) ---
                        qkv = qkv_s[:]
                        q = qkv[0, :qd].reshape(nq, d)
                        k = qkv[0, qd : qd + kvd].reshape(nk, d)
                        v = qkv[0, qd + kvd :].reshape(nk, d)
                        q = _rms(q, qn_ref[l, 0], eps)
                        k = _rms(k, kn_ref[l, 0], eps)
                        q = _rope(q, cos, sin)
                        k = _rope(k, cos, sin)
                        slot = lax.broadcasted_iota(
                            jnp.int32, (nk, T, d), 1
                        )
                        K_new = jnp.where(
                            slot == pos, k[:, None, :], kc_s[l]
                        )
                        V_new = jnp.where(
                            slot == pos, v[:, None, :], vc_s[l]
                        )
                        kc_s[l] = K_new
                        vc_s[l] = V_new
                        qg = q.reshape(nk, g, d)
                        scores = lax.dot_general(
                            qg, K_new, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                        ) * (1.0 / (d**0.5))
                        sl_i = lax.broadcasted_iota(
                            jnp.int32, (nk, g, T), 2
                        )
                        scores = jnp.where(sl_i <= pos, scores, -1e30)
                        m = jnp.max(scores, axis=-1, keepdims=True)
                        e = jnp.exp(scores - m)
                        w = e / jnp.sum(e, axis=-1, keepdims=True)
                        out = lax.dot_general(
                            w, V_new, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                        )
                        attn_s[:] = out.reshape(1, qd)
                    if u == b2:
                        h_s[:] = _rms(x_s[:], mn_ref[l], eps)
                    if u == b3:
                        gu = gu_s[:]
                        gate = gu[:, :I]
                        up = gu[:, I:]
                        gu_s[:, :I] = (
                            gate * (1.0 / (1.0 + jnp.exp(-gate))) * up
                        )

                    matmul = _matmul_unit(
                        w_vm[sl], s_ref[l, u], w4, n_groups
                    )
                    if u < n_qkv:  # qkv N-block
                        noff = u * N_UNIT
                        qkv_s[:, noff : noff + N_UNIT] = matmul(h_s[:])
                    elif u < b2:  # wo K-split tile
                        i_ks = u - n_qkv
                        k_off = (i_ks // nn) * H
                        n_off = (i_ks % nn) * N_UNIT
                        x_s[:, n_off : n_off + N_UNIT] = x_s[
                            :, n_off : n_off + N_UNIT
                        ] + matmul(attn_s[:, k_off : k_off + H])
                    elif u < b3:  # gate/up N-block
                        noff = (u - b2) * N_UNIT
                        gu_s[:, noff : noff + N_UNIT] = matmul(h_s[:])
                    else:  # wd K-split tile
                        i_ks = u - b3
                        k_off = (i_ks // nn) * H
                        n_off = (i_ks % nn) * N_UNIT
                        x_s[:, n_off : n_off + N_UNIT] = x_s[
                            :, n_off : n_off + N_UNIT
                        ] + matmul(gu_s[:, k_off : k_off + H])

            hp_s[:] = _rms(x_s[:], fn_ref[:], eps)

        def body(it, carry):
            @pl.when(it == 0)
            def _prefix0():
                x_s[:] = lh_ref[:]

            @pl.when(it == 1)
            def _prefix1():
                x_s[:] = c0_ref[:]

            @pl.when(it >= 2)
            def _sample():
                j = it - 2
                slot = lax.rem(j, 2)
                pltpu.make_async_copy(
                    hq_hbm.at[j], head_vm.at[slot], sems.at[slot]
                ).wait()

                @pl.when(j + 1 < n)
                def _prefetch_next_head():
                    nsl = 1 - slot
                    pltpu.make_async_copy(
                        hq_hbm.at[j + 1], head_vm.at[nsl], sems.at[nsl]
                    ).start()

                hw = head_vm[slot].astype(jnp.bfloat16)  # [H, V]
                logits = (
                    lax.dot_general(
                        hp_s[:].astype(jnp.bfloat16), hw,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * hs_ref[j]
                )  # [1, V]
                sub = gumbel_topk_topp_sample(
                    logits, g_ref[j], temp, top_k, top_p
                )[0]

                lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
                subc_out[:] = jnp.where(lane == j, sub, subc_out[:])

                # aligned 8-row block gather (cf. fused_mtp._chain_core)
                row = pltpu.make_async_copy(
                    tab_hbm.at[j, lax.div(sub, 8)], emb_vm, sems.at[2]
                )
                row.start()
                row.wait()
                emb8 = emb_vm[:].astype(jnp.float32)
                rsel = (
                    lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                    == lax.rem(sub, 8)
                )
                emb_f32 = jnp.sum(
                    jnp.where(rsel, emb8, 0.0), axis=0, keepdims=True
                )
                ssum_out[:] = ssum_out[:] + emb_f32
                x_s[:] = emb_f32

            @pl.when(it <= n)
            def _trunk():
                trunk_step(it)

            return carry

        lax.fori_loop(0, n + 2, body, 0)

    return kernel, U


def fused_mtp_chain_streamed(
    cfg: TransformerConfig,
    fw: FusedStepWeights,
    final_norm: jax.Array,  # [H]
    heads,  # QuantizedLinear [n, H, V] int8 | raw [n, H, V] array
    tables: jax.Array,  # [n, Vt, H]
    last_hidden: jax.Array,  # [1, H]
    code0_embed: jax.Array,  # [1, H]
    gumbel: jax.Array,  # [n, 1, V] f32
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    ring: int = 4,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run the whole sub-code chain in one kernel, trunk streamed from HBM.

    Returns (subcodes [1, n] int32, sub_sum [1, H] f32) — numerically
    identical to fused_mtp_chain (the resident variant) on the same
    inputs; only the weight transport differs."""
    from .quant import QuantizedLinear

    L = fw.attn_norm.shape[0]
    H = cfg.hidden_size
    nk, d = cfg.num_kv_heads, cfg.head_dim
    qd, kvd, I = cfg.q_dim, cfg.kv_dim, cfg.intermediate_size
    KU = fw.units.shape[2]
    w4 = KU == H // 2
    n_groups = fw.scales.shape[2]
    n, _, V = gumbel.shape
    T = n + 2
    Vt = tables.shape[1]
    if Vt % 8:
        tables = jnp.pad(tables, ((0, 0), (0, -Vt % 8), (0, 0)))
        Vt = tables.shape[1]
    tables = tables.reshape(n, Vt // 8, 8, H)

    if isinstance(heads, QuantizedLinear):
        hq, hs = heads.q, heads.scale.astype(jnp.float32)
    else:
        hq = heads.astype(jnp.bfloat16)
        hs = jnp.ones((n, 1, V), jnp.float32)

    half = d // 2
    freqs = 1.0 / (
        cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half)
    )
    angles = jnp.arange(n + 1, dtype=jnp.float32)[:, None] * freqs[None, :]
    cos = jnp.cos(angles)[:, None, :]
    sin = jnp.sin(angles)[:, None, :]

    n_qkv, n_wo, n_gu, n_wd = _unit_counts(cfg)
    U = n_qkv + n_wo + n_gu + n_wd
    ring = max(2, min(int(ring), L * U))
    kernel, _ = _make_stream_chain_kernel(cfg, n, V, T, w4, n_groups, ring)

    def vm(shape):
        return pl.BlockSpec(
            shape, lambda *_: (0,) * len(shape), memory_space=_VMEM
        )

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec(memory_space=_SMEM),  # temp
        pl.BlockSpec(memory_space=_SMEM),  # top_k
        pl.BlockSpec(memory_space=_SMEM),  # top_p
        vm((1, H)),
        vm((1, H)),
        vm((n + 1, 1, half)),
        vm((n + 1, 1, half)),
        any_spec,  # trunk units — STREAMED
        vm((L, U, n_groups, N_UNIT)),  # scales (all layers resident)
        vm((L, 1, H)),
        vm((L, 1, H)),
        vm((L, 1, d)),
        vm((L, 1, d)),
        vm((1, H)),
        any_spec,  # heads (streamed)
        vm((n, 1, V)),
        any_spec,  # tables (row-DMA)
        vm((n, 1, V)),
    ]
    out_specs = [vm((1, n)), vm((1, H))]
    out_shape = [
        jax.ShapeDtypeStruct((1, n), jnp.int32),
        jax.ShapeDtypeStruct((1, H), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((1, H), jnp.float32),  # x_s
        pltpu.VMEM((1, H), jnp.float32),  # h_s
        pltpu.VMEM((1, qd + 2 * kvd), jnp.float32),  # qkv_s
        pltpu.VMEM((1, qd), jnp.float32),  # attn_s
        pltpu.VMEM((1, 2 * I), jnp.float32),  # gu_s
        pltpu.VMEM((1, H), jnp.float32),  # hp_s
        pltpu.VMEM((L, nk, T, d), jnp.float32),  # kc_s
        pltpu.VMEM((L, nk, T, d), jnp.float32),  # vc_s
        pltpu.VMEM((ring, KU, N_UNIT), fw.units.dtype),  # unit ring
        pltpu.VMEM((2, H, V), hq.dtype),  # head double buffer
        pltpu.VMEM((8, H), tables.dtype),  # emb 8-row block
        pltpu.SemaphoreType.DMA((ring,)),  # unit ring sems
        pltpu.SemaphoreType.DMA((3,)),  # head x2 + emb
    ]
    args = [
        jnp.reshape(jnp.asarray(temperature, jnp.float32), (-1,))[:1],
        jnp.reshape(jnp.asarray(top_k, jnp.int32), (-1,))[:1],
        jnp.reshape(jnp.asarray(top_p, jnp.float32), (-1,))[:1],
        last_hidden.astype(jnp.float32),
        code0_embed.astype(jnp.float32),
        cos,
        sin,
        fw.units,
        fw.scales,
        fw.attn_norm,
        fw.mlp_norm,
        fw.q_norm,
        fw.k_norm,
        final_norm.astype(jnp.float32).reshape(1, H),
        hq,
        hs,
        tables,
        gumbel.astype(jnp.float32),
    ]
    compiler_params = None
    if not interpret and pltpu is not None:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        )
    call = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=compiler_params,
    )
    subc, ssum = call(*args)
    return subc, ssum
