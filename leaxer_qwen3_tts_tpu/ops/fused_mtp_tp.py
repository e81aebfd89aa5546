"""TP-sharded resident MTP chain: one Pallas kernel per chip, trunk shard
resident in VMEM, cross-chip reductions as IN-KERNEL ICI remote DMAs.

Why this exists (round-4 verdict #4 / ROUND5_PLAN §2): the 1.7B code
predictor's trunk (288 MB int8) can never be VMEM-resident on one chip, so
the 1.7B chain pays 15 HBM re-reads per frame (~4.3 GB — the dominant
single-stream cost; tts_onnx.cpp:851-872 is the loop being replaced).
Sharding the trunk over a "model" axis makes residency arithmetic work
again: int8/TP=4 = 72 MB/chip, int4/TP=2 = 72 MB/chip — inside the
112 MB resident budget (ops/fused_mtp.RESIDENT_MAX_BYTES).

The multi-dispatch TP decomposition (ops/fused_tp.py) cannot deliver this:
VMEM residency only lives WITHIN one pallas_call, and a chain step needs 2
cross-chip reductions per layer — so the reductions must happen inside the
kernel.  Each chip runs the WHOLE 15-step chain in one kernel on its
Megatron shard (qkv/gate-up column-split, wo/down row-split, KV heads
local) and the [1, H] partial sums are exchanged over ICI with
`pltpu.make_async_remote_copy` in a hypercube all-reduce (log2(tp)
pairwise rounds; 2 per layer + 1 per head sample ≈ 13 exchanges of 8 KB
per chain position).  Head logits reduce the same way BEFORE scaling, and
the Gumbel noise is replicated, so every chip samples the identical
sub-code — no gather, no divergence.

Determinism note: the pairwise adds are IEEE-commutative (a+b == b+a
bitwise) and the hypercube pairing is symmetric, so all chips hold
bit-identical activations after every reduce.

Weights ride the ops/fused_tp.FusedTPWeights pack (per-shard int8 with the
non-uniform NU/KCo/KCd tile schedule); heads are row-sharded (each chip
dots its H/tp rows of the step head); step-embedding tables are replicated
(small).  Validated in interpret mode on a virtual CPU mesh — JAX's TPU
interpret mode executes the remote copies with real inter-device
semantics — via tests/test_fused_mtp_tp.py and the dryrun_multichip
"tp-resident-mtp" stage.  Per-chip traffic per frame: trunk/tp resident
(ingest-bound, ~1.12 us per int8 MB — docs/BENCH_EVIDENCE_r5.md) + 15 x
head-shard DMA + ~219 x 8 KB ICI exchanges (~2 MB of ICI traffic; ~1-2 us
each on real hardware, overlappable with the next unit walk).
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
from .fused_step import _rms, _rope
from .fused_tp import FusedTPWeights, _dims, supports_tp
from .quant import QuantizedLinear

__all__ = [
    "supports_tp_resident",
    "fused_mtp_chain_tp",
]

# fixed VMEM beyond the resident trunk shard: head double-buffer
# (2 x Hs x V int8), exchange slots, activations, the T<=17-slot KV scratch
_TP_FIXED = 16 * 1024 * 1024


def supports_tp_resident(cfg: TransformerConfig, tp: int,
                         n_steps: int, V: int) -> bool:
    """True when the per-chip trunk shard + fixed buffers fit the resident
    VMEM budget and the Megatron tile schedule exists at this tp."""
    if tp < 2 or tp & (tp - 1):
        return False  # hypercube all-reduce: power-of-two only
    if not supports_tp(cfg, tp):
        return False
    H = cfg.hidden_size
    if (H // tp) % 128:
        return False  # head row-shard slice must be lane-aligned
    per_layer = (
        H * (cfg.q_dim + 2 * cfg.kv_dim)  # qkv
        + cfg.q_dim * H  # wo
        + H * 2 * cfg.intermediate_size  # gate+up
        + cfg.intermediate_size * H  # down
    )
    shard = cfg.num_layers * per_layer // tp  # int8 = 1 byte/weight
    heads_buf = 2 * (H // tp) * V  # int8 double buffer
    return shard + heads_buf + _TP_FIXED <= RESIDENT_MAX_BYTES


def _make_tp_chain_kernel(cfg: TransformerConfig, tp: int, n_steps: int,
                          V: int, T: int, mesh_axes):
    """mesh_axes: ordered (name, size) pairs of the FULL mesh — remote-copy
    device ids are LINEARIZED logical indices over the whole mesh (row-major
    over mesh.devices), so a chip's model-peer id needs the offsets of every
    other axis (e.g. its "data" row) plus the model axis stride."""
    H, d, nq_s, nk_s, qd_s, kvd_s, A_s, I_s, NU, KCo, KCd = _dims(cfg, tp)
    g = nq_s // nk_s  # GQA ratio is preserved per shard
    eps = cfg.rms_norm_eps
    Hs = H // tp
    n = n_steps
    Uq = A_s // NU
    Uo = (qd_s // KCo) * (H // NU)
    Ug = 2 * I_s // NU
    Ud = (I_s // KCd) * (H // NU)
    nnH = H // NU
    rounds = tp.bit_length() - 1  # log2(tp)
    L = cfg.num_layers
    names = [nm for nm, _ in mesh_axes]
    sizes = [sz for _, sz in mesh_axes]
    mi = names.index("model")
    model_stride = 1
    for sz in sizes[mi + 1 :]:
        model_stride *= sz

    def kernel(
        temp_ref, topk_ref, topp_ref,  # SMEM [1]
        lh_ref, c0_ref,  # [1, H] f32 (replicated)
        cos_ref, sin_ref,  # [n + 1, 1, d//2]
        qkv_u, qkv_s, wo_u, wo_s, gu_u, gu_s, wd_u, wd_s,  # shard, RESIDENT
        an_ref, mn_ref, qn_ref, kn_ref, fn_ref,  # norms (replicated)
        hq_hbm,  # ANY [1, n, Hs, V] — head ROW shard, streamed
        hs_ref,  # [n, 1, V] f32 (replicated scales)
        tab_hbm,  # ANY [n, Vt//8, 8, H] — replicated tables, row-DMA
        g_ref,  # [n, 1, V] f32 — REPLICATED noise: all chips sample alike
        subc_out, ssum_out,  # [1, n] i32, [1, H] f32
        x_s, h_s, qkv_sc, attn_sc, gu_sc, hp_s,  # activations
        kc_s, vc_s,  # [L, nk_s, T, d]
        head_vm,  # [2, Hs, V]
        emb_vm,  # [8, H]
        xr_send,  # [1, H] f32 — exchange send staging
        xr_recv,  # [2, 1, H] f32 — parity-slotted receive
        lr_send,  # [1, V] f32
        lr_recv,  # [2, 1, V] f32
        sems,  # DMA sems: 0/1 head buf, 2 emb row
        xsend_sem, xrecv_sem,  # DMA (2,) each — exchange channels
    ):
        me = lax.axis_index("model")
        # linearized logical base id of this chip's model-group (offsets of
        # every non-model mesh axis); peer id = base + peer_model * stride
        lin_base = jnp.int32(0)
        stride = 1
        for nm, sz in reversed(list(zip(names, sizes))):
            if nm != "model":
                lin_base = lin_base + lax.axis_index(nm) * stride
            stride *= sz
        temp = temp_ref[0]
        top_k = topk_ref[0]
        top_p = topp_ref[0]

        kc_s[:] = jnp.zeros_like(kc_s[:])
        vc_s[:] = jnp.zeros_like(vc_s[:])
        ssum_out[:] = jnp.zeros_like(ssum_out[:])
        subc_out[:] = jnp.zeros_like(subc_out[:])
        pltpu.make_async_copy(
            hq_hbm.at[0, 0], head_vm.at[0], sems.at[0]
        ).start()

        def allreduce(send_ref, recv_ref, width, site):
            """Hypercube all-reduce of send_ref[0, :width] across "model".

            site: traced EXECUTION-ORDERED exchange-site index (lockstep on
            every chip); each site consumes `rounds` counter values and the
            counter's parity picks the receive slot.  Two slots suffice
            because consecutive exchanges alternate slots and the symmetric
            .wait() is a rendezvous: a chip cannot reach exchange k+2 (the
            slot's next reuse) before its partner consumed exchange k."""
            acc = send_ref[:]
            for r in range(rounds):
                partner = lin_base + (me ^ (1 << r)) * model_stride
                slot = lax.rem(site * rounds + r, 2)
                send_ref[:] = acc
                rdma = pltpu.make_async_remote_copy(
                    src_ref=send_ref,
                    dst_ref=recv_ref.at[slot],
                    send_sem=xsend_sem.at[slot],
                    recv_sem=xrecv_sem.at[slot],
                    device_id=partner,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )
                rdma.start()
                rdma.wait()
                acc = acc + recv_ref[slot]
            return acc

        def matmul_u(w_ref, s_ref, l, u, lhs):
            w16 = w_ref[0, l, u].astype(jnp.bfloat16)
            return (
                lax.dot_general(
                    lhs.astype(jnp.bfloat16), w16,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * s_ref[0, l, u]
            )

        def trunk_step(pos, site0):
            cos = cos_ref[pos]
            sin = sin_ref[pos]
            for l in range(cfg.num_layers):
                h_s[:] = _rms(x_s[:], an_ref[l], eps)
                for u in range(Uq):
                    off = u * NU
                    qkv_sc[:, off : off + NU] = matmul_u(
                        qkv_u, qkv_s, l, u, h_s[:]
                    )

                qkv = qkv_sc[:]
                q = qkv[0, :qd_s].reshape(nq_s, d)
                k = qkv[0, qd_s : qd_s + kvd_s].reshape(nk_s, d)
                v = qkv[0, qd_s + kvd_s :].reshape(nk_s, d)
                q = _rms(q, qn_ref[l, 0], eps)
                k = _rms(k, kn_ref[l, 0], eps)
                q = _rope(q, cos, sin)
                k = _rope(k, cos, sin)
                slot = lax.broadcasted_iota(jnp.int32, (nk_s, T, d), 1)
                K_new = jnp.where(slot == pos, k[:, None, :], kc_s[l])
                V_new = jnp.where(slot == pos, v[:, None, :], vc_s[l])
                kc_s[l] = K_new
                vc_s[l] = V_new
                qg = q.reshape(nk_s, g, d)
                scores = lax.dot_general(
                    qg, K_new, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * (1.0 / (d**0.5))
                sl_i = lax.broadcasted_iota(jnp.int32, (nk_s, g, T), 2)
                scores = jnp.where(sl_i <= pos, scores, -1e30)
                m = jnp.max(scores, axis=-1, keepdims=True)
                e = jnp.exp(scores - m)
                w = e / jnp.sum(e, axis=-1, keepdims=True)
                out = lax.dot_general(
                    w, V_new, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                attn_sc[:] = out.reshape(1, qd_s)

                # wo row-shard: accumulate the chip's partial [1, H], then
                # all-reduce BEFORE the residual add (Megatron psum #1)
                xr_send[:] = jnp.zeros_like(xr_send[:])
                for u in range(Uo):
                    i_ks, j_ns = divmod(u, nnH)
                    k_off = i_ks * KCo
                    n_off = j_ns * NU
                    xr_send[:, n_off : n_off + NU] = xr_send[
                        :, n_off : n_off + NU
                    ] + matmul_u(
                        wo_u, wo_s, l, u, attn_sc[:, k_off : k_off + KCo]
                    )
                red = allreduce(xr_send, xr_recv, H, site0 + 2 * l)
                x_s[:] = x_s[:] + red

                h_s[:] = _rms(x_s[:], mn_ref[l], eps)
                for u in range(Ug):
                    off = u * NU
                    gu_sc[:, off : off + NU] = matmul_u(
                        gu_u, gu_s, l, u, h_s[:]
                    )
                gu = gu_sc[:]
                gate = gu[:, :I_s]
                up = gu[:, I_s:]
                gu_sc[:, :I_s] = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up

                xr_send[:] = jnp.zeros_like(xr_send[:])
                for u in range(Ud):
                    i_ks, j_ns = divmod(u, nnH)
                    k_off = i_ks * KCd
                    n_off = j_ns * NU
                    xr_send[:, n_off : n_off + NU] = xr_send[
                        :, n_off : n_off + NU
                    ] + matmul_u(
                        wd_u, wd_s, l, u, gu_sc[:, k_off : k_off + KCd]
                    )
                red = allreduce(
                    xr_send, xr_recv, H, site0 + 2 * l + 1
                )
                x_s[:] = x_s[:] + red

            hp_s[:] = _rms(x_s[:], fn_ref[:], eps)

        def body(it, carry):
            # execution-ordered exchange-site numbering: trunk its 0..n run
            # 2L sites each; sample its 2..n+1 run ONE site FIRST.  base =
            # sites completed before this iteration; the sample (if any)
            # takes `base`, the trunk walk takes base+has_sample+k.
            base = it * (2 * L) + jnp.maximum(it - 2, 0)
            has_s = jnp.where(it >= 2, 1, 0)
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
                    hq_hbm.at[0, j], head_vm.at[slot], sems.at[slot]
                ).wait()

                @pl.when(j + 1 < n)
                def _prefetch_next_head():
                    nsl = 1 - slot
                    pltpu.make_async_copy(
                        hq_hbm.at[0, j + 1], head_vm.at[nsl], sems.at[nsl]
                    ).start()

                # row-sharded head: this chip's Hs rows of hp against its
                # head shard -> partial [1, V]; all-reduce, THEN scale
                off = pl.multiple_of(me * Hs, 128)
                hp_rows = hp_s[:, pl.ds(off, Hs)]
                hw = head_vm[slot].astype(jnp.bfloat16)  # [Hs, V]
                lr_send[:] = lax.dot_general(
                    hp_rows.astype(jnp.bfloat16), hw,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                logits = allreduce(lr_send, lr_recv, V, base) * hs_ref[j]
                # replicated noise -> every chip samples the SAME sub-code
                sub = gumbel_topk_topp_sample(
                    logits, g_ref[j], temp, top_k, top_p
                )[0]

                lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
                subc_out[:] = jnp.where(lane == j, sub, subc_out[:])

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
                trunk_step(it, base + has_s)

            return carry

        lax.fori_loop(0, n + 2, body, 0)

    return kernel, (Uq, Uo, Ug, Ud, NU, KCo, KCd, A_s, I_s, qd_s, kvd_s,
                    nk_s, Hs)


def fused_mtp_chain_tp(
    cfg: TransformerConfig,
    tp: int,
    mesh,
    fw: FusedTPWeights,
    final_norm: jax.Array,  # [H]
    heads,  # QuantizedLinear [n, H, V] int8 (full; row-sharded here)
    tables: jax.Array,  # [n, Vt, H] (replicated)
    last_hidden: jax.Array,  # [1, H]
    code0_embed: jax.Array,  # [1, H]
    gumbel: jax.Array,  # [n, 1, V] f32 — replicated noise
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """TP=power-of-two resident chain under shard_map("model").

    Returns (subcodes [1, n] int32, sub_sum [1, H] f32) — replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert pl is not None, "pallas unavailable"
    H = cfg.hidden_size
    d = cfg.head_dim
    L = fw.attn_norm.shape[0]
    n, _, V = gumbel.shape
    T = n + 2
    Hs = H // tp
    Vt = tables.shape[1]
    if Vt % 8:
        tables = jnp.pad(tables, ((0, 0), (0, -Vt % 8), (0, 0)))
        Vt = tables.shape[1]
    tables = tables.reshape(n, Vt // 8, 8, H)

    if isinstance(heads, QuantizedLinear):
        hq_full, hs = heads.q, heads.scale.astype(jnp.float32)
    else:
        hq_full = heads.astype(jnp.bfloat16)
        hs = jnp.ones((n, 1, V), jnp.float32)
    hs = hs.reshape(n, 1, V)
    # row-shard the step heads: [n, H, V] -> [TP, n, Hs, V]
    hq_sh = jnp.stack(
        [hq_full[:, s * Hs : (s + 1) * Hs, :] for s in range(tp)]
    )

    half = d // 2
    freqs = 1.0 / (
        cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half)
    )
    angles = jnp.arange(n + 1, dtype=jnp.float32)[:, None] * freqs[None, :]
    cos = jnp.cos(angles)[:, None, :]
    sin = jnp.sin(angles)[:, None, :]

    mesh_axes = tuple(zip(mesh.axis_names, mesh.devices.shape))
    kernel, dims = _make_tp_chain_kernel(cfg, tp, n, V, T, mesh_axes)
    (Uq, Uo, Ug, Ud, NU, KCo, KCd, A_s, I_s, qd_s, kvd_s, nk_s, _) = dims

    def vm(shape):
        return pl.BlockSpec(
            shape, lambda *_: (0,) * len(shape), memory_space=_VMEM
        )

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec(memory_space=_SMEM),  # temp
        pl.BlockSpec(memory_space=_SMEM),  # top_k
        pl.BlockSpec(memory_space=_SMEM),  # top_p
        vm((1, H)), vm((1, H)),  # lh, c0
        vm((n + 1, 1, half)), vm((n + 1, 1, half)),  # cos, sin
        vm((1, L, Uq, H, NU)), vm((1, L, Uq, 1, NU)),  # qkv shard
        vm((1, L, Uo, KCo, NU)), vm((1, L, Uo, 1, NU)),  # wo shard
        vm((1, L, Ug, H, NU)), vm((1, L, Ug, 1, NU)),  # gu shard
        vm((1, L, Ud, KCd, NU)), vm((1, L, Ud, 1, NU)),  # wd shard
        vm((L, 1, H)), vm((L, 1, H)),  # attn/mlp norms
        vm((L, 1, d)), vm((L, 1, d)),  # q/k norms
        vm((1, H)),  # final norm
        any_spec,  # head shard (streamed)
        vm((n, 1, V)),  # head scales
        any_spec,  # tables
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
        pltpu.VMEM((1, A_s), jnp.float32),  # qkv_sc
        pltpu.VMEM((1, qd_s), jnp.float32),  # attn_sc
        pltpu.VMEM((1, 2 * I_s), jnp.float32),  # gu_sc
        pltpu.VMEM((1, H), jnp.float32),  # hp_s
        pltpu.VMEM((L, nk_s, T, d), jnp.float32),  # kc_s
        pltpu.VMEM((L, nk_s, T, d), jnp.float32),  # vc_s
        pltpu.VMEM((2, Hs, V), hq_sh.dtype),  # head double buffer
        pltpu.VMEM((8, H), tables.dtype),  # emb row block
        pltpu.VMEM((1, H), jnp.float32),  # xr_send
        pltpu.VMEM((2, 1, H), jnp.float32),  # xr_recv
        pltpu.VMEM((1, V), jnp.float32),  # lr_send
        pltpu.VMEM((2, 1, V), jnp.float32),  # lr_recv
        pltpu.SemaphoreType.DMA((3,)),
        pltpu.SemaphoreType.DMA((2,)),  # xsend
        pltpu.SemaphoreType.DMA((2,)),  # xrecv
    ]

    compiler_params = None
    if not interpret and pltpu is not None:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            collective_id=7,
        )
    interp = (
        pltpu.InterpretParams() if interpret and pltpu is not None else False
    )
    call = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interp,
        compiler_params=compiler_params,
    )

    def per_chip(t, k, p, lh, c0, cosv, sinv, qu, qs, wou, wos, guu, gus,
                 wdu, wds, an, mn, qn, kn, fn, hq, hsv, tab, gum):
        return call(t, k, p, lh, c0, cosv, sinv, qu, qs, wou, wos, guu,
                    gus, wdu, wds, an, mn, qn, kn, fn, hq, hsv, tab, gum)

    rep = P()
    sh = P("model")
    f = jax.shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, rep,
                  sh, sh, sh, sh, sh, sh, sh, sh,
                  rep, rep, rep, rep, rep, sh, rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    # MUST run under jit: the TPU interpreter synchronizes the mesh's
    # devices with a threading.Barrier sized to the device count, and only
    # a jitted dispatch runs every per-device program concurrently — an
    # eager shard_map executes them with too little parallelism and the
    # barrier deadlocks (observed: threads parked in _allocate_buffer)
    f = jax.jit(f)
    args = (
        jnp.reshape(jnp.asarray(temperature, jnp.float32), (-1,))[:1],
        jnp.reshape(jnp.asarray(top_k, jnp.int32), (-1,))[:1],
        jnp.reshape(jnp.asarray(top_p, jnp.float32), (-1,))[:1],
        last_hidden.astype(jnp.float32),
        code0_embed.astype(jnp.float32),
        cos, sin,
        fw.qkv_u, fw.qkv_s, fw.wo_u, fw.wo_s,
        fw.gu_u, fw.gu_s, fw.wd_u, fw.wd_s,
        fw.attn_norm, fw.mlp_norm, fw.q_norm, fw.k_norm,
        final_norm.astype(jnp.float32).reshape(1, H),
        hq_sh, hs, tables, gumbel.astype(jnp.float32),
    )
    subc, ssum = f(*args)
    if interpret:
        # Interpret-mode executions must not overlap: JAX's async dispatch
        # lets a second invocation start on some device threads while the
        # first still runs on others, and the interpreter's remote-copy
        # rendezvous then cross-talks between runs and deadlocks (measured
        # 2026-08-19: back-to-back unblocked calls hang; blocked calls pass).
        # Real-TPU dispatch orders collectives per device queue — no block.
        jax.block_until_ready((subc, ssum))
    return subc, ssum
