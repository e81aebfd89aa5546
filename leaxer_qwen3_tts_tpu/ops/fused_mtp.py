"""Resident-trunk MTP chain: all 15 sub-code steps in ONE Pallas kernel.

The per-step fused path (models/code_predictor.predict_subcodes_fused)
dispatches one fused_decode_step kernel per MTP step, so the 6-layer trunk
streams from HBM 15 times per frame (15 x ~78 MB int8 on the 0.6B MTP) —
the round-3/4 cost attribution puts that at ~60% of the single-stream frame
(docs/KERNEL_PLAN.md).  The whole int8 trunk FITS v5e VMEM (~78 MB of 128;
int4: ~39 MB), so this kernel keeps it RESIDENT: trunk weights load once
per frame and the chain's serial dependency — sample step j before step
j+1's trunk pass — runs entirely in-kernel, including the sampler.  Per
frame the weight traffic drops from ~1.2 GB to ~110 MB (trunk once + 15
step heads + 15 embed rows).

Reference contract unchanged (tts_onnx.cpp:851-872 / :734-757): growing
2..17-token sequence, step-indexed heads and embedding tables, the sum of
the 15 sub-embeddings feeds the next talker input.

The 2-token prefix ([talker_hidden, codec_embed(code0)]) ALSO runs
in-kernel: the first resident-chain revision primed the KV cache with an
XLA ``transformer_forward`` — one more full trunk read (~78 MB int8) per
frame plus a dispatch and two cache DMAs, all to compute 2 positions of a
6-layer model whose weights are already sitting in VMEM.  Folding the
prefix into the kernel makes the trunk truly load-once: per-frame MTP
weight traffic is trunk + 15 heads + embeds, nothing else.

In-kernel sampling (``gumbel_topk_topp_sample`` below is shared by the
kernel and the XLA reference, so tests compare twins):

  * greedy (temperature <= 0): argmax with first-index tie-break — exactly
    ``sample_token``'s greedy path.
  * sampled: temperature scale -> top-k mask (the k-th-largest threshold
    found by f32 bisection; keeps ties like the reference filter,
    tts_onnx.cpp:917-927) -> nucleus mask (bisected prob threshold keeping
    tokens whose strictly-greater mass is < p, i.e. including the first
    token crossing p, tts_onnx.cpp:929-950) -> argmax(masked_scaled +
    Gumbel), the Gumbel noise PRECOMPUTED outside the kernel from the
    request's PRNG chain — the same construction jax.random.categorical
    uses, so the sampled distribution matches ``sample_token`` exactly.
    The random BITS differ from the multi-dispatch path (which draws over
    a top-K_CAP permuted subset), so resident-sampled outputs are a
    different — still per-seed deterministic — stream.  Exact prob TIES at
    the nucleus boundary keep/drop together here, where the sort-based
    mask splits them by sort order (a measure-zero event for continuous
    logits).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None
    _SMEM = None

from ..config import TransformerConfig
from .fused_step import (
    N_UNIT,
    FusedStepWeights,
    _matmul_unit,
    _rms,
    _rope,
    _unit_counts,
)
from .quant import QuantizedLinear

NEG_INF = -1e30
_BISECT_ITERS = 40  # f32 bisection: interval shrinks 2^-40 — below ulp of
# any realistic logit/prob spacing, so the threshold set matches the
# sort-based masks (runtime/sampling.py) except on exact float ties

import os as _os

# XLA charges a Pallas kernel's VMEM input/scratch blocks against its
# scoped-vmem stack, whose default cap (16 MiB, --xla_tpu_scoped_vmem_limit
# _kib) rejects the ~78 MB resident trunk — observed on v5e: "Scoped
# allocation with size 87.49M and limit 16.00M".  Mosaic's own
# CompilerParams(vmem_limit_bytes=...) bounds only Mosaic's internal check;
# it does NOT raise the XLA-side stack limit.  Any jit whose program embeds
# a resident/frame kernel must pass these executable build options
# (jax.jit(..., compiler_options=resident_compiler_options())).  TPU-only:
# other backends reject the unknown flag.
_SCOPED_VMEM_KIB = int(_os.environ.get("QTTS_SCOPED_VMEM_KIB", "117760"))


def resident_compiler_options() -> dict | None:
    """compiler_options for jits embedding a VMEM-resident kernel, or None
    off-TPU (CPU/interpret paths must not see the TPU-only flag)."""
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return None
    except Exception:  # pragma: no cover
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(_SCOPED_VMEM_KIB)}

# Total-VMEM budget for the resident kernels (v5e has 128 MB; leave slack
# for the compiler's own allocations below the 110/120 MB scoped limits)
RESIDENT_MAX_BYTES = 112 * 1024 * 1024
# measured footprint model: fixed = double-buffered heads (2x2 MB) +
# tables (2x4 MB, batched only) + norms/scales/rope; per row = KV scratch
# (~0.84 MB at T=17) + gumbel + f32 activations
_FIXED_B1 = 5 * 1024 * 1024
_FIXED_BATCHED = 13 * 1024 * 1024
_PER_ROW = 1_100_000


def supports_resident(fw: FusedStepWeights, batch: int = 1) -> bool:
    """True when trunk + caches + buffers fit the resident-VMEM budget.
    int8 0.6B MTP (78 MB): yes at B=1..16; at B=32 the batch state pushes
    past VMEM, so B=32 serving needs the int4 trunk (39 MB packs,
    mtp_quantize="int4") or falls back to the per-step batched kernels.
    bf16 packs and the 1.7B MTP (288 MB) always fall back."""
    if fw.units.dtype != jnp.int8:
        return False
    fixed = _FIXED_BATCHED if batch > 1 else _FIXED_B1
    total = fw.units.nbytes + fixed + _PER_ROW * batch
    return total <= RESIDENT_MAX_BYTES


def _bisect_topk_mask(scaled: jax.Array, top_k: jax.Array) -> jax.Array:
    """Keep entries >= the top_k-th largest PER ROW (ties kept), found by
    bisection instead of a sort.  scaled [B, V] f32; top_k scalar or [B, 1]
    int32.  Inactive (keep all) when top_k <= 0 or top_k >= V."""
    V = scaled.shape[-1]
    lo = jnp.min(scaled, axis=-1, keepdims=True)
    hi = jnp.max(scaled, axis=-1, keepdims=True)
    for _ in range(_BISECT_ITERS):
        mid = 0.5 * (lo + hi)
        ge = jnp.sum((scaled >= mid).astype(jnp.int32), axis=-1, keepdims=True)
        sel = ge >= top_k
        lo = jnp.where(sel, mid, lo)
        hi = jnp.where(sel, hi, mid)
    active = (top_k > 0) & (top_k < V)
    return (scaled >= lo) | jnp.logical_not(active)


def _bisect_topp_mask(probs: jax.Array, top_p: jax.Array) -> jax.Array:
    """Nucleus mask by threshold: keep token i iff the row's total mass of
    STRICTLY larger probs is < top_p (the argmax always qualifies).  Found
    by bisecting theta in [0, 1] on sum(probs[probs > theta]) < top_p.
    top_p scalar or [B, 1].  Inactive when top_p >= 1."""
    lo = jnp.zeros(probs.shape[:-1] + (1,), jnp.float32)
    hi = jnp.ones(probs.shape[:-1] + (1,), jnp.float32)
    for _ in range(_BISECT_ITERS):
        mid = 0.5 * (lo + hi)
        s = jnp.sum(jnp.where(probs > mid, probs, 0.0), axis=-1, keepdims=True)
        sel = s < top_p  # mid is at/above the boundary -> move hi down
        lo = jnp.where(sel, lo, mid)
        hi = jnp.where(sel, mid, hi)
    return (probs > lo) | (top_p >= 1.0)


def _first_argmax(x: jax.Array) -> jax.Array:
    """Per-row argmax over [B, V] with first-index tie-break (jnp.argmax
    semantics), written as max + masked min-index so it lowers to plain
    VPU reductions inside Mosaic.  Returns [B] int32."""
    V = x.shape[-1]
    iota = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    m = jnp.max(x, axis=-1, keepdims=True)
    return jnp.min(jnp.where(x == m, iota, V), axis=-1).astype(jnp.int32)


def gumbel_topk_topp_sample(
    logits: jax.Array,  # [B, V] f32
    gumbel: jax.Array,  # [B, V] f32 — precomputed Gumbel(0, 1) noise
    temperature: jax.Array,  # scalar f32, or [B, 1] per-row
    top_k: jax.Array,  # scalar int32, or [B, 1]
    top_p: jax.Array,  # scalar f32, or [B, 1]
) -> jax.Array:
    """One temperature/top-k/top-p draw per row as pure vector math (no
    sort, no categorical): shared VERBATIM by the resident kernels and
    their XLA references.  Distributionally identical to
    runtime.sampling.sample_token (argmax(masked_scaled + Gumbel) IS the
    categorical draw) — see module docstring for the tie/bitstream
    caveats.  Returns [B] int32."""
    greedy = _first_argmax(logits)

    def sampled():
        t = jnp.maximum(temperature, 1e-6)
        scaled = logits / t
        keep_k = _bisect_topk_mask(scaled, top_k)
        masked = jnp.where(keep_k, scaled, NEG_INF)
        mm = jnp.max(masked, axis=-1, keepdims=True)
        e = jnp.exp(masked - mm)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        keep_p = _bisect_topp_mask(probs, top_p)
        final = jnp.where(keep_p, masked, NEG_INF)
        return _first_argmax(final + gumbel)

    if getattr(temperature, "ndim", 0) == 0:
        # scalar knobs: skip the whole sampled pipeline under greedy
        return lax.cond(
            temperature <= 0.0, lambda _: greedy, lambda _: sampled(),
            operand=None,
        )
    # per-row knobs (pool slots): compute both, select per row
    return jnp.where((temperature <= 0.0).reshape(greedy.shape), greedy,
                     sampled())


def _make_chain_kernel(
    cfg: TransformerConfig,
    n_steps: int,
    V: int,
    T: int,
    w4: bool,
    n_groups: int,
):
    """Kernel body: 2 prefix trunk steps (positions 0-1, cache built from a
    zeroed scratch), then fori over the n_steps chain; per trunk step, fori
    over layers with the unit loop unrolled (the manual-DMA kernel's
    schedule, ops/fused_step._make_kernel_manual, reading a RESIDENT weight
    ref instead of a streamed 2-slot scratch)."""
    run_chain, U = _chain_core(cfg, n_steps, V, T, w4, n_groups)

    def kernel(
        temp_ref,  # SMEM [1] f32
        topk_ref,  # SMEM [1] i32
        topp_ref,  # SMEM [1] f32
        lh_ref,  # [1, H] f32 — talker hidden (prefix token 0)
        c0_ref,  # [1, H] f32 — codec_embed(code0) (prefix token 1)
        cos_ref,  # [n + 1, 1, d//2] f32 — rope rows for positions 0..n
        sin_ref,
        w_ref,  # [L, U, KU, N_UNIT] int8 — RESIDENT trunk units
        s_ref,  # [L, U, G, N_UNIT] f32
        an_ref,  # [L, 1, H] f32
        mn_ref,
        qn_ref,  # [L, 1, d] f32
        kn_ref,
        fn_ref,  # [1, H] f32 — final norm (head input)
        hq_hbm,  # ANY [n, H, V] int8|bf16 — step heads, double-buffered
        hs_ref,  # [n, 1, V] f32 — head output scales
        tab_hbm,  # ANY [n, Vt//8, 8, H] — step embed tables (block gather)
        g_ref,  # [n, 1, V] f32 — Gumbel noise rows
        subc_out,  # [1, n] i32
        ssum_out,  # [1, H] f32
        x_s,  # scratch [1, H] f32
        h_s,  # scratch [1, H] f32
        qkv_s,  # scratch [1, qd + 2*kvd] f32
        attn_s,  # scratch [1, qd] f32
        gu_s,  # scratch [1, 2I] f32
        hp_s,  # scratch [1, H] f32 — final-normed hidden feeding head j
        kc_s,  # scratch [L, nk, T, d]
        vc_s,
        head_vm,  # scratch [2, H, V] heads dtype
        emb_vm,  # scratch [1, H] tables dtype
        sems,  # DMA semaphores (3,)
    ):
        run_chain(
            temp_ref[0], topk_ref[0], topp_ref[0], lh_ref[:], c0_ref[:],
            cos_ref, sin_ref, w_ref, s_ref, an_ref, mn_ref, qn_ref, kn_ref,
            fn_ref, hq_hbm, hs_ref, tab_hbm, g_ref, subc_out, ssum_out,
            x_s, h_s, qkv_s, attn_s, gu_s, hp_s, kc_s, vc_s, head_vm,
            emb_vm, sems,
        )

    return kernel, U


def _chain_core(
    cfg: TransformerConfig,
    n_steps: int,
    V: int,
    T: int,
    w4: bool,
    n_groups: int,
):
    """The B=1 resident-chain body (in-kernel prefix + sampled chain),
    extracted so the whole-frame kernel (ops/fused_frame.py) can run the
    SAME op sequence inside its own grid.  All refs belong to the caller;
    ``lh``/``c0`` are [1, H] f32 VALUES; the trunk ref ``w_ref`` may be a
    VMEM input block or a caller-filled scratch."""
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

    def run_chain(
        temp, top_k, top_p, lh, c0, cos_ref, sin_ref, w_ref, s_ref,
        an_ref, mn_ref, qn_ref, kn_ref, fn_ref, hq_hbm, hs_ref, tab_hbm,
        g_ref, subc_out, ssum_out, x_s, h_s, qkv_s, attn_s, gu_s, hp_s,
        kc_s, vc_s, head_vm, emb_vm, sems,
    ):
        # --- init: zeroed cache scratch, accumulators, head-0 DMA ---
        kc_s[:] = jnp.zeros_like(kc_s[:])
        vc_s[:] = jnp.zeros_like(vc_s[:])
        ssum_out[:] = jnp.zeros_like(ssum_out[:])
        subc_out[:] = jnp.zeros_like(subc_out[:])
        pltpu.make_async_copy(hq_hbm.at[0], head_vm.at[0], sems.at[0]).start()

        def trunk_step(pos):
            """One incremental trunk pass on the token preloaded in x_s at
            position pos; leaves the final-normed hidden in hp_s.  Same op
            sequence as _make_kernel_manual, weights read from the resident
            ref.  Instantiated ONCE (inside the merged loop below): the
            6-layer unrolled body dominates the Mosaic module size, and
            three static copies (prefix x2 + chain) pushed the whole-frame
            kernel past the remote-compile body limit."""
            cos = cos_ref[pos]  # [1, d//2]
            sin = sin_ref[pos]

            # layers UNROLLED (L <= 6 under the VMEM gate): every weight,
            # norm and cache index is static — only the step index j and
            # the cache write position are dynamic
            for l in range(cfg.num_layers):
                h_s[:] = _rms(x_s[:], an_ref[l], eps)

                def matmul(u, l=l):
                    return _matmul_unit(w_ref[l, u], s_ref[l, u], w4, n_groups)

                for u in range(n_qkv):
                    off = u * N_UNIT
                    qkv_s[:, off : off + N_UNIT] = matmul(u)(h_s[:])

                # --- attention (T slots resident in scratch) ---
                qkv = qkv_s[:]
                q = qkv[0, :qd].reshape(nq, d)
                k = qkv[0, qd : qd + kvd].reshape(nk, d)
                v = qkv[0, qd + kvd :].reshape(nk, d)
                q = _rms(q, qn_ref[l, 0], eps)
                k = _rms(k, kn_ref[l, 0], eps)
                q = _rope(q, cos, sin)
                k = _rope(k, cos, sin)
                slot = lax.broadcasted_iota(jnp.int32, (nk, T, d), 1)
                K_new = jnp.where(
                    slot == pos, k[:, None, :].astype(kc_s.dtype), kc_s[l]
                )
                V_new = jnp.where(
                    slot == pos, v[:, None, :].astype(vc_s.dtype), vc_s[l]
                )
                kc_s[l] = K_new
                vc_s[l] = V_new
                qg = q.reshape(nk, g, d)
                scores = lax.dot_general(
                    qg, K_new.astype(jnp.float32),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * (1.0 / (d**0.5))
                sl_i = lax.broadcasted_iota(jnp.int32, (nk, g, T), 2)
                scores = jnp.where(sl_i <= pos, scores, -1e30)
                m = jnp.max(scores, axis=-1, keepdims=True)
                e = jnp.exp(scores - m)
                w = e / jnp.sum(e, axis=-1, keepdims=True)
                out = lax.dot_general(
                    w, V_new.astype(jnp.float32),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                attn_s[:] = out.reshape(1, qd)

                for u in range(n_qkv, b2):  # wo K-split tiles
                    i_ks = u - n_qkv
                    k_off = (i_ks // nn) * H
                    n_off = (i_ks % nn) * N_UNIT
                    x_s[:, n_off : n_off + N_UNIT] = x_s[
                        :, n_off : n_off + N_UNIT
                    ] + matmul(u)(attn_s[:, k_off : k_off + H])

                h_s[:] = _rms(x_s[:], mn_ref[l], eps)
                for u in range(b2, b3):  # gate/up N-blocks
                    off = (u - b2) * N_UNIT
                    gu_s[:, off : off + N_UNIT] = matmul(u)(h_s[:])
                gu = gu_s[:]
                gate = gu[:, :I]
                up = gu[:, I:]
                gu_s[:, :I] = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up
                for u in range(b3, U):  # wd K-split tiles
                    i_ks = u - b3
                    k_off = (i_ks // nn) * H
                    n_off = (i_ks % nn) * N_UNIT
                    x_s[:, n_off : n_off + N_UNIT] = x_s[
                        :, n_off : n_off + N_UNIT
                    ] + matmul(u)(gu_s[:, k_off : k_off + H])

            hp_s[:] = _rms(x_s[:], fn_ref[:], eps)

        # --- merged prefix + chain loop: it = 0,1 run the in-kernel prefix
        # (talker hidden at pos 0, code0 embed at pos 1 — the trunk is
        # already resident; an XLA prefill would re-read all of it from
        # HBM); it = 2..n+1 sample sub-code j = it-2 from the previous
        # trunk output (hp_s) and advance the trunk at pos = it.  One loop
        # means trunk_step's unrolled body is emitted once.
        def body(it, carry):
            @pl.when(it == 0)
            def _prefix0():
                x_s[:] = lh

            @pl.when(it == 1)
            def _prefix1():
                x_s[:] = c0

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
                )[0]  # scalar

                lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
                subc_out[:] = jnp.where(lane == j, sub, subc_out[:])

                # embed row gather: Mosaic requires slices on the
                # (8,128)-tiled sublane dim to be 8-aligned, so the table
                # arrives reshaped to [n, Vt//8, 8, H] — DMA the aligned
                # 8-row block holding `sub` (dynamic indices only on
                # untiled leading dims), then select the row in VMEM
                row = pltpu.make_async_copy(
                    tab_hbm.at[j, lax.div(sub, 8)], emb_vm, sems.at[2]
                )
                row.start()
                row.wait()
                emb8 = emb_vm[:].astype(jnp.float32)  # [8, H]
                rsel = (
                    lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                    == lax.rem(sub, 8)
                )
                emb_f32 = jnp.sum(
                    jnp.where(rsel, emb8, 0.0), axis=0, keepdims=True
                )
                ssum_out[:] = ssum_out[:] + emb_f32
                x_s[:] = emb_f32  # next trunk input

            @pl.when(it <= n)  # it = n+1 only samples the final sub-code
            def _trunk():
                trunk_step(it)

            return carry

        lax.fori_loop(0, n + 2, body, 0)

    return run_chain, U


def _make_chain_kernel_batched(
    cfg: TransformerConfig,
    B: int,
    n_steps: int,
    V: int,
    T: int,
    w4: bool,
    n_groups: int,
):
    """Batched variant: [B, H] activations, per-row sampling knobs/noise,
    in-kernel prefix (cache built in a zeroed scratch — see the B=1 kernel),
    embed gathers as one-hot GEMMs against a double-buffered streamed table
    (no per-row DMA).  Weight traffic per frame collapses from B-amortized
    15 x trunk to trunk-once + heads + tables — the serving batch's MTP
    read was ~3/4 of its frame bytes."""
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

    def kernel(
        temp_ref,  # [B, 1] f32 (VMEM — per-row knobs)
        topk_ref,  # [B, 1] i32
        topp_ref,  # [B, 1] f32
        lh_ref,  # [B, H] f32 — talker hidden (prefix token 0)
        c0_ref,  # [B, H] f32 — codec_embed(code0) (prefix token 1)
        cos_ref,  # [n + 1, 1, d//2] f32
        sin_ref,
        w_ref,  # [L, U, KU, N_UNIT] int8 — RESIDENT
        s_ref,
        an_ref,
        mn_ref,
        qn_ref,
        kn_ref,
        fn_ref,
        hq_hbm,  # ANY [n, H, V]
        hs_ref,  # [n, 1, V] f32
        tab_hbm,  # ANY [n, Vt, H] — streamed whole tables
        g_ref,  # [n, B, V] f32
        subc_out,  # [B, n] i32
        ssum_out,  # [B, H] f32
        x_s,  # [B, H] f32
        h_s,
        qkv_s,  # [B, qd + 2*kvd] f32
        attn_s,  # [B, qd] f32
        gu_s,  # [B, 2I] f32
        hp_s,  # [B, H] f32
        kc_s,  # [L, B, nk, T, d]
        vc_s,
        head_vm,  # [2, H, V]
        tab_vm,  # [2, Vt, H]
        sems,  # DMA (4,): 0-1 heads, 2-3 tables
    ):
        kc_s[:] = jnp.zeros_like(kc_s[:])
        vc_s[:] = jnp.zeros_like(vc_s[:])
        ssum_out[:] = jnp.zeros_like(ssum_out[:])
        subc_out[:] = jnp.zeros_like(subc_out[:])
        pltpu.make_async_copy(hq_hbm.at[0], head_vm.at[0], sems.at[0]).start()
        pltpu.make_async_copy(tab_hbm.at[0], tab_vm.at[0], sems.at[2]).start()

        def trunk_step(pos):
            # input token preloaded in x_s (see the B=1 kernel: one static
            # instantiation of the unrolled body keeps the Mosaic module
            # small enough for the remote-compile body limit)
            cos = cos_ref[pos]  # [1, d//2]
            sin = sin_ref[pos]

            # layers UNROLLED: static weight/norm/cache indices (see B=1)
            for l in range(cfg.num_layers):
                h_s[:] = _rms(x_s[:], an_ref[l], eps)

                def matmul(u, l=l):
                    return _matmul_unit(w_ref[l, u], s_ref[l, u], w4, n_groups)

                for u in range(n_qkv):
                    off = u * N_UNIT
                    qkv_s[:, off : off + N_UNIT] = matmul(u)(h_s[:])

                qkv = qkv_s[:]
                q = qkv[:, :qd].reshape(B, nq, d)
                k = qkv[:, qd : qd + kvd].reshape(B, nk, d)
                v = qkv[:, qd + kvd :].reshape(B, nk, d)
                q = _rms(q, qn_ref[l, 0], eps)
                k = _rms(k, kn_ref[l, 0], eps)
                q = _rope_rows(q, cos, sin)
                k = _rope_rows(k, cos, sin)
                slot = lax.broadcasted_iota(jnp.int32, (B, nk, T, d), 2)
                K_new = jnp.where(
                    slot == pos, k[:, :, None, :].astype(kc_s.dtype), kc_s[l]
                )
                V_new = jnp.where(
                    slot == pos, v[:, :, None, :].astype(vc_s.dtype), vc_s[l]
                )
                kc_s[l] = K_new
                vc_s[l] = V_new
                # single batch dim (B*nk): Mosaic's tpu.matmul supports at
                # most 1 batch dim (hardware verifier); same contractions
                qg = q.reshape(B * nk, g, d)
                Kf = K_new.astype(jnp.float32).reshape(B * nk, T, d)
                Vf = V_new.astype(jnp.float32).reshape(B * nk, T, d)
                scores = lax.dot_general(
                    qg, Kf,
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * (1.0 / (d**0.5))  # [B*nk, g, T]
                sl_i = lax.broadcasted_iota(jnp.int32, (B * nk, g, T), 2)
                scores = jnp.where(sl_i <= pos, scores, -1e30)
                m = jnp.max(scores, axis=-1, keepdims=True)
                e = jnp.exp(scores - m)
                w = e / jnp.sum(e, axis=-1, keepdims=True)
                out = lax.dot_general(
                    w, Vf,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [B*nk, g, d]
                attn_s[:] = out.reshape(B, qd)

                for u in range(n_qkv, b2):
                    i_ks = u - n_qkv
                    k_off = (i_ks // nn) * H
                    n_off = (i_ks % nn) * N_UNIT
                    x_s[:, n_off : n_off + N_UNIT] = x_s[
                        :, n_off : n_off + N_UNIT
                    ] + matmul(u)(attn_s[:, k_off : k_off + H])

                h_s[:] = _rms(x_s[:], mn_ref[l], eps)
                for u in range(b2, b3):
                    off = (u - b2) * N_UNIT
                    gu_s[:, off : off + N_UNIT] = matmul(u)(h_s[:])
                gu = gu_s[:]
                gate = gu[:, :I]
                up = gu[:, I:]
                gu_s[:, :I] = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up
                for u in range(b3, U):
                    i_ks = u - b3
                    k_off = (i_ks // nn) * H
                    n_off = (i_ks % nn) * N_UNIT
                    x_s[:, n_off : n_off + N_UNIT] = x_s[
                        :, n_off : n_off + N_UNIT
                    ] + matmul(u)(gu_s[:, k_off : k_off + H])

            hp_s[:] = _rms(x_s[:], fn_ref[:], eps)

        # merged prefix + chain loop (see the B=1 kernel): it = 0,1 run the
        # in-kernel prefix; it = 2..n+1 sample sub-code j = it-2 and advance
        # the trunk at pos = it — trunk_step emitted once.
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
                pltpu.make_async_copy(
                    tab_hbm.at[j], tab_vm.at[slot], sems.at[2 + slot]
                ).wait()

                @pl.when(j + 1 < n)
                def _prefetch_next():
                    nsl = 1 - slot
                    pltpu.make_async_copy(
                        hq_hbm.at[j + 1], head_vm.at[nsl], sems.at[nsl]
                    ).start()
                    pltpu.make_async_copy(
                        tab_hbm.at[j + 1], tab_vm.at[nsl], sems.at[2 + nsl]
                    ).start()

                hw = head_vm[slot].astype(jnp.bfloat16)
                logits = (
                    lax.dot_general(
                        hp_s[:].astype(jnp.bfloat16), hw,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * hs_ref[j]
                )  # [B, V]
                sub = gumbel_topk_topp_sample(
                    logits, g_ref[j], temp_ref[:], topk_ref[:], topp_ref[:]
                )  # [B]

                lane = lax.broadcasted_iota(jnp.int32, (B, n), 1)
                subc_out[:] = jnp.where(lane == j, sub[:, None], subc_out[:])

                # one-hot gather: exact row copy through the MXU (1.0 * x,
                # one nonzero per row) in the TABLE's dtype
                vio = lax.broadcasted_iota(jnp.int32, (B, V), 1)
                oh = (vio == sub[:, None]).astype(tab_vm.dtype)
                emb_f32 = lax.dot_general(
                    oh, tab_vm[slot],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [B, H]
                ssum_out[:] = ssum_out[:] + emb_f32
                x_s[:] = emb_f32  # next trunk input

            @pl.when(it <= n)  # it = n+1 only samples the final sub-code
            def _trunk():
                trunk_step(it)

            return carry

        lax.fori_loop(0, n + 2, body, 0)

    return kernel, U


def _rope_rows(x, cos, sin):
    """Rotate-half rope on [B, heads, d] rows; cos/sin [1, d//2]."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    c = cos[None, :, :]
    s = sin[None, :, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def fused_mtp_chain_batched(
    cfg: TransformerConfig,
    fw: FusedStepWeights,
    final_norm: jax.Array,
    heads,
    tables: jax.Array,
    last_hidden: jax.Array,  # [B, H] — talker hidden (prefix token 0)
    code0_embed: jax.Array,  # [B, H] — codec_embed(code0) (prefix token 1)
    gumbel: jax.Array,  # [n, B, V] f32
    temperature: jax.Array,  # scalar or [B]
    top_k: jax.Array,
    top_p: jax.Array,
    interpret: bool = False,
    cache_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Batched resident chain (prefix in-kernel).  Returns
    (subcodes [B, n] i32, sub_sum [B, H] f32)."""
    L = fw.attn_norm.shape[0]
    B, H = last_hidden.shape
    nk, d = cfg.num_kv_heads, cfg.head_dim
    qd, kvd, I = cfg.q_dim, cfg.kv_dim, cfg.intermediate_size
    KU = fw.units.shape[2]
    w4 = KU == H // 2
    n_groups = fw.scales.shape[2]
    n, _, V = gumbel.shape
    T = n + 2  # prefix (2) + chain writes at 2..n
    Vt = tables.shape[1]

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

    def knob(x, dt):
        x = jnp.asarray(x, dt)
        x = jnp.broadcast_to(jnp.reshape(x, (-1, 1)) if x.ndim else x, (B, 1))
        return x.astype(dt)

    kernel, U = _make_chain_kernel_batched(cfg, B, n, V, T, w4, n_groups)

    def vm(shape):
        return pl.BlockSpec(
            shape, lambda *_: (0,) * len(shape), memory_space=_VMEM
        )

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        vm((B, 1)),  # temperature
        vm((B, 1)),  # top_k
        vm((B, 1)),  # top_p
        vm((B, H)),  # last_hidden
        vm((B, H)),  # code0_embed
        vm((n + 1, 1, half)),
        vm((n + 1, 1, half)),
        vm((L, U, KU, N_UNIT)),
        vm((L, U, n_groups, N_UNIT)),
        vm((L, 1, H)),
        vm((L, 1, H)),
        vm((L, 1, d)),
        vm((L, 1, d)),
        vm((1, H)),
        any_spec,  # heads
        vm((n, 1, V)),
        any_spec,  # tables
        vm((n, B, V)),  # gumbel
    ]
    out_specs = [vm((B, n)), vm((B, H))]
    out_shape = [
        jax.ShapeDtypeStruct((B, n), jnp.int32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((B, qd + 2 * kvd), jnp.float32),
        pltpu.VMEM((B, qd), jnp.float32),
        pltpu.VMEM((B, 2 * I), jnp.float32),
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((L, B, nk, T, d), cache_dtype),
        pltpu.VMEM((L, B, nk, T, d), cache_dtype),
        pltpu.VMEM((2, H, V), hq.dtype),
        pltpu.VMEM((2, Vt, H), tables.dtype),
        pltpu.SemaphoreType.DMA((4,)),
    ]
    args = [
        knob(temperature, jnp.float32),
        knob(top_k, jnp.int32),
        knob(top_p, jnp.float32),
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
            vmem_limit_bytes=120 * 1024 * 1024
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
    subcodes, sub_sum = call(*args)
    return subcodes, sub_sum


def fused_mtp_chain(
    cfg: TransformerConfig,
    fw: FusedStepWeights,
    final_norm: jax.Array,  # [H] — trunk final-norm weight (head input)
    heads,  # QuantizedLinear [n, H, V] int8 | raw [n, H, V] array
    tables: jax.Array,  # [n, Vt, H] — step embedding tables (reshaped to
    # [n, Vt//8, 8, H] for the in-kernel aligned-block row gather)
    last_hidden: jax.Array,  # [1, H] — talker hidden (prefix token 0)
    code0_embed: jax.Array,  # [1, H] — codec_embed(code0) (prefix token 1)
    gumbel: jax.Array,  # [n, 1, V] f32 — per-step Gumbel noise
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    interpret: bool = False,
    cache_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Run the whole sub-code chain — prefix included — in one kernel.

    Returns (subcodes [1, n] int32, sub_sum [1, H] f32)."""
    L = fw.attn_norm.shape[0]
    H = cfg.hidden_size
    nk, d = cfg.num_kv_heads, cfg.head_dim
    qd, kvd, I = cfg.q_dim, cfg.kv_dim, cfg.intermediate_size
    KU = fw.units.shape[2]
    w4 = KU == H // 2
    n_groups = fw.scales.shape[2]
    n, _, V = gumbel.shape
    T = n + 2  # prefix (2) + chain writes at 2..n
    Vt = tables.shape[1]
    # aligned-block row gather: [n, Vt, H] -> [n, Vt//8, 8, H] (a bitcast —
    # row-major layout is identical); the kernel DMAs 8-row blocks
    if Vt % 8:
        tables = jnp.pad(tables, ((0, 0), (0, -Vt % 8), (0, 0)))
        Vt = tables.shape[1]
    tables = tables.reshape(n, Vt // 8, 8, H)

    if isinstance(heads, QuantizedLinear):
        hq, hs = heads.q, heads.scale.astype(jnp.float32)  # [n,H,V],[n,1,V]
    else:
        hq = heads.astype(jnp.bfloat16)
        hs = jnp.ones((n, 1, V), jnp.float32)

    half = d // 2
    freqs = 1.0 / (
        cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half)
    )
    angles = jnp.arange(n + 1, dtype=jnp.float32)[:, None] * freqs[None, :]
    cos = jnp.cos(angles)[:, None, :]  # [n + 1, 1, half]
    sin = jnp.sin(angles)[:, None, :]

    kernel, U = _make_chain_kernel(cfg, n, V, T, w4, n_groups)

    def vm(shape):
        return pl.BlockSpec(
            shape, lambda *_: (0,) * len(shape), memory_space=_VMEM
        )

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec(memory_space=_SMEM),  # temp
        pl.BlockSpec(memory_space=_SMEM),  # top_k
        pl.BlockSpec(memory_space=_SMEM),  # top_p
        vm((1, H)),  # last_hidden
        vm((1, H)),  # code0_embed
        vm((n + 1, 1, half)),  # cos
        vm((n + 1, 1, half)),  # sin
        vm((L, U, KU, N_UNIT)),  # trunk units — RESIDENT
        vm((L, U, n_groups, N_UNIT)),  # scales
        vm((L, 1, H)),  # attn_norm
        vm((L, 1, H)),  # mlp_norm
        vm((L, 1, d)),  # q_norm
        vm((L, 1, d)),  # k_norm
        vm((1, H)),  # final_norm
        any_spec,  # heads (streamed)
        vm((n, 1, V)),  # head scales
        any_spec,  # tables (row-DMA)
        vm((n, 1, V)),  # gumbel
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
        pltpu.VMEM((L, nk, T, d), cache_dtype),  # kc_s
        pltpu.VMEM((L, nk, T, d), cache_dtype),  # vc_s
        pltpu.VMEM((2, H, V), hq.dtype),  # head double buffer
        pltpu.VMEM((8, H), tables.dtype),  # emb 8-row aligned block
        pltpu.SemaphoreType.DMA((3,)),
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
    subcodes, sub_sum = call(*args)
    return subcodes, sub_sum
