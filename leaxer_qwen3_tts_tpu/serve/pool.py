"""Continuous batching: a persistent SPMD decode pool with per-slot admit/retire.

The static batcher (server.py) forms a batch, runs it to completion, and only
then admits new work — a long utterance holds its batch-mates hostage and a
language change head-of-line-blocks the queue.  This pool fixes both:

  * B decode SLOTS run one shared chunked-decode program forever; requests are
    ADMITTED into free slots at chunk boundaries and RETIRED independently on
    EOS or their own max_tokens.  A short request admitted mid-flight
    finishes without waiting for a long batch-mate.
  * language / speaker-style conditioning lives entirely in the per-request
    PREFILL (batch-1, its own jit signature); the pool decode program is
    signature-uniform, so mixed languages coexist in one batch — no
    head-of-line blocking on jit signatures.
  * per-request sampling knobs ride as [B] vectors (runtime/sampling.py) and
    are updated host-side on admission.

Mechanics: admission runs a batch-1 prefill sized to the pool's KV bucket,
then SPLICES the resulting single-stream state into slot b of the pool state
(per-slot ``pos`` / ``step`` / text-drip buffers — GenerateState carries all
of these as [B] vectors).  Retirement vocodes the stream's own codes (length
bucketed) and resolves its future.

Determinism note: the pool threads ONE PRNG chain through the shared decode
program, so a request's sampled output depends on what else is in flight.
Per-request seeded determinism needs the offline API (engine.synthesize).

The reference has no serving layer at all (SURVEY §2.3: one process, one
request, batch fixed at 1 — tts_onnx.cpp:547,618,672,760).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..api.engine import (
    EngineError,
    SynthesisResult,
    TTSEngine,
    _round_up,
)
from ..config import SAMPLE_RATE, language_to_codec_id
from ..models.codec12hz import vocoder_forward
from ..models.talker import talker_init_cache
from ..runtime.generate import GenerateState, make_generate_fns
from ..runtime.prompt import prompt_length
from ..runtime.sampling import SamplingParams
from ..utils.logging import get_logger
from ..utils.metrics import SynthesisMetrics

log = get_logger(__name__)




@dataclass
class _PoolRequest:
    text: str
    language: str
    temperature: float
    top_k: int
    top_p: float
    max_tokens: Optional[int]
    forbid_eos: bool = False  # benchmarking / length-forcing knob
    future: Future = field(default_factory=Future)
    enqueued_at: float = field(default_factory=time.perf_counter)


@dataclass
class _Active:
    req: _PoolRequest
    budget: int
    frames: List[np.ndarray] = field(default_factory=list)  # [16] rows
    admitted_at: float = field(default_factory=time.perf_counter)


class ContinuousBatcher:
    """Drop-in alternative to BatchingServer with continuous admission.

    Same surface: ``submit`` -> Future[SynthesisResult], ``synthesize``,
    ``stats``, ``shutdown``; composes with ``make_http_server``.
    """

    def __init__(
        self,
        engine: TTSEngine,
        pool_size: int = 8,
        chunk_len: int = 16,
        kv_bucket: int = 512,
        text_bucket_max: int = 64,
        seed: int = 0,
        spec_k: Optional[int] = None,
        spec_iters: int = 2,
    ):
        if not engine.is_ready():
            raise EngineError(f"engine not ready: {engine.get_error()}")
        if engine.mesh is not None:
            data = engine.mesh.shape.get("data", 1)
            if int(pool_size) % max(data, 1) != 0:
                raise EngineError(
                    f"pool_size ({pool_size}) must divide over the mesh "
                    f"data axis ({data})"
                )
        self.engine = engine
        self.cfg = engine.cfg
        self.pool_size = int(pool_size)
        self.chunk_len = int(chunk_len)
        self.kv_bucket = int(kv_bucket)
        self.text_bucket_max = int(text_bucket_max)
        # speculative mode: one S=K verify pass covers pool_size*K frame
        # slots per iteration with per-slot acceptance (runtime/speculative)
        if spec_k is not None and not 2 <= int(spec_k) <= 8:
            raise ValueError("spec_k must be in [2, 8]")
        self.spec_k = int(spec_k) if spec_k else None
        self.spec_iters = max(1, int(spec_iters))

        cfg = self.cfg
        self._seed = int(seed)
        self._prefill_cache: Dict[tuple, object] = {}
        self._splice_cache: Dict[int, object] = {}
        self._vocode_cache: Dict[int, object] = {}

        if self.spec_k:
            from ..runtime.speculative import decode_frames_spec, repeat_draft

            if cfg.draft is not None and "draft" in (engine.params or {}):
                from ..models.draft import model_draft_fn

                draft_fn = model_draft_fn(
                    cfg.draft, engine.params["draft"],
                    engine.params["embeddings"],
                )
            else:
                draft_fn = repeat_draft
            k, iters = self.spec_k, self.spec_iters

            def dec(params, state, trailing, trailing_len, pad, sp):
                return decode_frames_spec(
                    cfg, params, state, trailing, trailing_len, pad, sp,
                    k, iters, draft_fn,
                )

            self._decode = jax.jit(dec, donate_argnums=(1,))
        else:
            # uniform_fill=False: pool slots run at DIFFERENT fill levels, so
            # the cache write takes the per-sequence scatter path
            self._fns = make_generate_fns(cfg, batch=self.pool_size,
                                          max_len=self.kv_bucket,
                                          chunk_len=self.chunk_len,
                                          uniform_fill=False)
            self._decode = self._fns.decode
        self._state = self._make_idle_state()
        B = self.pool_size
        H = cfg.talker.hidden_size
        dt = cfg.talker.transformer.jnp_dtype
        self._trailing = jnp.zeros((B, self.text_bucket_max, H), dt)
        self._trailing_len = jnp.zeros((B,), jnp.int32)
        if engine.mesh is not None:
            self._trailing = self._put(self._trailing, 0)
            self._trailing_len = self._put(self._trailing_len, 0)
        from ..models.embeddings import text_project
        from ..config import TTS_PAD

        self._tts_pad = jax.jit(
            lambda p: text_project(p, jnp.asarray(TTS_PAD, jnp.int32))
        )(engine.params["embeddings"])

        # host-side per-slot sampling knobs ([B] vectors into the decode jit)
        self._temps = np.full((B,), 0.8, np.float32)
        self._top_ks = np.full((B,), 50, np.int32)
        self._top_ps = np.full((B,), 0.95, np.float32)
        self._forbid = np.zeros((B,), bool)

        self._slots: List[Optional[_Active]] = [None] * B
        self._queue: "queue.Queue[_PoolRequest]" = queue.Queue()
        self._stop = threading.Event()
        self._requests_done = 0
        self._chunks_run = 0
        self._admits = 0  # per-request PRNG derivation counter
        # adaptive spec (aggregate): per-stream spec modes are not
        # SPMD-expressible (one decode program covers every slot), so the
        # pool tracks POOL-WIDE trailing acceptance and, when it stays below
        # the engine's spec_accept_floor, converts the whole state to
        # sequential (runtime/speculative.spec_to_seq batched) — after which
        # spec can never underperform the plain pool
        self._acc_slots = 0
        self._acc_iters = 0
        self._spec_fallback = False
        # Retirement vocoding runs off the decode loop (see _retire).
        # Workers scale with the pool so a burst of simultaneous retirements
        # (their slots already re-admitted) doesn't serialize all vocoding
        # behind one thread — a latency cliff at larger pools (round-2
        # verdict).  Python threads suffice: the work is jitted device
        # dispatch + host assembly, which releases the GIL.
        self._finisher = ThreadPoolExecutor(
            max_workers=max(2, self.pool_size // 4),
            thread_name_prefix="pool-retire",
        )
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def warmup(self) -> float:
        """Pre-compile the pool's programs (prefill, splice, the persistent
        decode dispatch, retirement vocode) by running one tiny request
        through the live pool — first real requests then skip the compile
        cliffs.  Requires a tokenizer; returns wall-clock seconds."""
        import time as _time

        t0 = _time.perf_counter()
        self.submit("a", temperature=0.0, max_tokens=self.chunk_len).result()
        dt = _time.perf_counter() - t0
        log.info("pool warmup done in %.1fs", dt)
        return dt

    # ------------------------------------------------------------------
    def submit(
        self,
        text: str,
        language: str = "auto",
        temperature: float = 0.8,
        top_k: int = 50,
        top_p: float = 0.95,
        max_tokens: Optional[int] = None,
        forbid_eos: bool = False,
    ) -> "Future[SynthesisResult]":
        if self._stop.is_set():
            raise RuntimeError("server is shut down")
        req = _PoolRequest(text, language, temperature, top_k, top_p,
                           max_tokens, forbid_eos)
        self._queue.put(req)
        return req.future

    def synthesize(self, text: str, **kw) -> SynthesisResult:
        return self.submit(text, **kw).result()

    @property
    def stats(self) -> dict:
        return {
            "chunks": self._chunks_run,
            "requests": self._requests_done,
            "queued": self._queue.qsize(),
            "active": sum(s is not None for s in self._slots),
            "spec_fallback": self._spec_fallback,
        }

    def shutdown(self, wait: bool = True) -> None:
        self._stop.set()
        if wait:
            self._thread.join(timeout=60)
        self._finisher.shutdown(wait=wait)

    # ------------------------------------------------------------------
    # jitted helpers (cached per signature)
    # ------------------------------------------------------------------

    def _put(self, x, axis):
        """device_put with the pool-batch axis sharded over "data"."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = [None] * x.ndim
        if axis is not None:
            spec[axis] = "data"
        return jax.device_put(x, NamedSharding(self.engine.mesh, P(*spec)))

    def _shard_state(self, state):
        """Shard the pool state over the mesh: slots (the pool batch axis)
        over "data", everything else following GSPMD propagation from the
        TP-sharded params.  Host-side admit/retire stays unchanged — the
        splice jits reshard their 1-stream inputs automatically."""
        if self.engine.mesh is None:
            return state
        cache = state.cache
        cache = cache._replace(
            k=self._put(cache.k, 1),
            v=self._put(cache.v, 1),
            length=self._put(cache.length, 0),
        )
        if state.cache.k_scale is not None:
            cache = cache._replace(
                k_scale=self._put(state.cache.k_scale, 1),
                v_scale=self._put(state.cache.v_scale, 1),
            )
        rest = {
            f: self._put(getattr(state, f), None if f == "key" else 0)
            for f in state._fields
            if f != "cache"
        }
        return state._replace(cache=cache, **rest)

    def _make_idle_state(self):
        """Fresh all-slots-idle pool state.  Used at construction AND to
        recover after a failed dispatch: the decode jit donates the state,
        so after an exception the old buffers are deleted and the pool must
        rebuild (in-flight requests were already failed by the caller)."""
        cfg = self.cfg
        B, T = self.pool_size, self.kv_bucket
        t = cfg.talker.transformer
        H, V = cfg.talker.hidden_size, cfg.talker.codec_vocab_size
        dt = t.jnp_dtype
        cache = talker_init_cache(cfg.talker, B, T)
        if self.spec_k:
            from ..runtime.speculative import SpecState

            return self._shard_state(SpecState(
                cache=cache,
                valid_mask=jnp.zeros((B, T), bool),
                pending=jnp.zeros((B, 16), jnp.int32),
                pending_nodrip=jnp.zeros((B, H), dt),
                pending_hidden=jnp.zeros((B, H), dt),
                rope_pos=jnp.zeros((B,), jnp.int32),
                step=jnp.ones((B,), jnp.int32),
                done=jnp.ones((B,), bool),  # empty slots idle as "done"
                key=jax.random.PRNGKey(self._seed),
            ))
        return self._shard_state(GenerateState(
            cache=cache,
            valid_mask=jnp.zeros((B, T), bool),
            last_logits=jnp.zeros((B, V), jnp.float32),
            # MODEL dtype, not f32: the decode scan carries last_hidden and
            # the talker emits it in the transformer dtype — a f32 idle state
            # type-mismatched the scan on bf16 checkpoints (caught by
            # tools/tpu_smoke.py on the flagship preset; the f32 tiny test
            # model could never see it)
            last_hidden=jnp.zeros((B, H), dt),
            pos=jnp.zeros((B,), jnp.int32),
            step=jnp.zeros((B,), jnp.int32),
            done=jnp.ones((B,), bool),  # empty slots idle as "done"
            key=jax.random.PRNGKey(self._seed),
        ))

    def _get_prefill(self, t_bucket: int, lang_id):
        key = (t_bucket, lang_id)
        if key not in self._prefill_cache:
            self._prefill_cache[key] = make_generate_fns(
                self.cfg, batch=1, max_len=self.kv_bucket, chunk_len=1,
                lang_id=lang_id,
            ).prefill
        return self._prefill_cache[key]

    def _get_splice(self, t_bucket: int):
        if t_bucket not in self._splice_cache:
            TB = self.text_bucket_max

            def splice(state, trailing, trailing_len, slot,
                       cache1, valid1, logits1, hidden1, pos1, t1, t1len):
                from ..models.layers import splice_kv_cache

                cache = splice_kv_cache(state.cache, cache1, slot)
                z32 = jnp.zeros((1,), jnp.int32)
                new = state._replace(
                    cache=cache,
                    valid_mask=jax.lax.dynamic_update_slice(
                        state.valid_mask, valid1, (slot, 0)
                    ),
                    last_logits=jax.lax.dynamic_update_slice(
                        state.last_logits, logits1, (slot, 0)
                    ),
                    last_hidden=jax.lax.dynamic_update_slice(
                        state.last_hidden,
                        hidden1.astype(state.last_hidden.dtype), (slot, 0),
                    ),
                    pos=jax.lax.dynamic_update_slice(state.pos, pos1, (slot,)),
                    step=jax.lax.dynamic_update_slice(state.step, z32, (slot,)),
                    done=jax.lax.dynamic_update_slice(
                        state.done, jnp.zeros((1,), bool), (slot,)
                    ),
                )
                row = jnp.zeros((1, TB, trailing.shape[2]), trailing.dtype)
                row = jax.lax.dynamic_update_slice(row, t1, (0, 0, 0))
                trailing = jax.lax.dynamic_update_slice(
                    trailing, row, (slot, 0, 0)
                )
                trailing_len = jax.lax.dynamic_update_slice(
                    trailing_len, t1len, (slot,)
                )
                return new, trailing, trailing_len

            self._splice_cache[t_bucket] = jax.jit(
                splice, donate_argnums=(0, 1, 2)
            )
        return self._splice_cache[t_bucket]

    def _get_spec_prefill(self, t_bucket: int, lang_id):
        key = ("spec", t_bucket, lang_id)
        if key not in self._prefill_cache:
            from ..runtime.speculative import make_spec_generate_fns

            self._prefill_cache[key] = make_spec_generate_fns(
                self.cfg, max_len=self.kv_bucket, k=self.spec_k,
                num_iters=self.spec_iters, batch=1, lang_id=lang_id,
                donate=False,
            ).prefill
        return self._prefill_cache[key]

    def _get_spec_splice(self, t_bucket: int):
        key = ("spec_splice", t_bucket)
        if key not in self._splice_cache:
            TB = self.text_bucket_max

            def splice(state, trailing, trailing_len, slot,
                       cache1, valid1, pend1, nod1, hid1, rope1, done1,
                       t1, t1len):
                from ..models.layers import splice_kv_cache

                dus = jax.lax.dynamic_update_slice
                cache = splice_kv_cache(state.cache, cache1, slot)
                new = state._replace(
                    cache=cache,
                    valid_mask=dus(state.valid_mask, valid1, (slot, 0)),
                    pending=dus(state.pending, pend1, (slot, 0)),
                    pending_nodrip=dus(
                        state.pending_nodrip,
                        nod1.astype(state.pending_nodrip.dtype), (slot, 0),
                    ),
                    pending_hidden=dus(
                        state.pending_hidden,
                        hid1.astype(state.pending_hidden.dtype), (slot, 0),
                    ),
                    rope_pos=dus(state.rope_pos, rope1, (slot,)),
                    step=dus(
                        state.step, jnp.ones((1,), jnp.int32), (slot,)
                    ),
                    done=dus(state.done, done1, (slot,)),
                )
                row = jnp.zeros((1, TB, trailing.shape[2]), trailing.dtype)
                row = jax.lax.dynamic_update_slice(row, t1, (0, 0, 0))
                trailing = dus(trailing, row, (slot, 0, 0))
                trailing_len = dus(trailing_len, t1len, (slot,))
                return new, trailing, trailing_len

            self._splice_cache[key] = jax.jit(
                splice, donate_argnums=(0, 1, 2)
            )
        return self._splice_cache[key]

    def _get_mark_done(self):
        if "mark_done" not in self._splice_cache:
            def mark(state, slot):
                return state._replace(
                    done=jax.lax.dynamic_update_slice(
                        state.done, jnp.ones((1,), bool), (slot,)
                    )
                )

            self._splice_cache["mark_done"] = jax.jit(mark, donate_argnums=(0,))
        return self._splice_cache["mark_done"]

    def _vocode(self, codes: np.ndarray) -> np.ndarray:
        """Length-bucketed whole-utterance vocode at retirement."""
        F = len(codes)
        if F == 0:
            return np.zeros((0,), np.float32)
        Fb = _round_up(F, self.chunk_len)
        if Fb not in self._vocode_cache:
            voc_cfg = self.cfg.vocoder
            self._vocode_cache[Fb] = jax.jit(
                lambda p, c: vocoder_forward(voc_cfg, p, c)
            )
        padded = np.zeros((1, Fb, 16), np.int32)
        padded[0, :F] = codes
        audio = self._vocode_cache[Fb](self.engine.params["vocoder"], padded)
        spf = self.cfg.vocoder.samples_per_frame
        return np.asarray(audio, np.float32)[0, : F * spf]

    # ------------------------------------------------------------------
    # pool loop
    # ------------------------------------------------------------------

    def _admit(self, slot: int, req: _PoolRequest) -> None:
        eng = self.engine
        ids = eng._tokenize(req.text)
        vocab = self.cfg.talker.text_vocab_size
        bad = [i for i in ids if not 0 <= int(i) < vocab]
        if bad:
            raise EngineError(f"token id(s) out of range [0, {vocab}): {bad[:8]}")
        t_bucket = _round_up(len(ids), 16)
        if t_bucket > self.text_bucket_max:
            raise EngineError(
                f"text too long for the pool ({len(ids)} tokens > "
                f"{self.text_bucket_max} bucket)"
            )
        lang_id = language_to_codec_id(
            req.language if req.language != "auto" else None
        )
        P = prompt_length(lang_id, False, 0)
        per_dispatch = (
            self.spec_k * self.spec_iters if self.spec_k else self.chunk_len
        )
        budget = self.kv_bucket - P - per_dispatch
        if budget < 1:
            raise EngineError("pool kv_bucket too small for the prompt")
        if req.max_tokens is not None:
            budget = min(budget, int(req.max_tokens))

        ids_arr = np.zeros((1, t_bucket), np.int32)
        ids_arr[0, : len(ids)] = ids
        lens = np.asarray([len(ids)], np.int32)
        active = _Active(req=req, budget=budget)
        # Per-request key: fold the admit counter into the pool seed.  The
        # non-spec prefill discards it (the splice drops last_logits' sample;
        # the pool threads its own shared PRNG chain through the decode
        # program), but the SPEC prefill samples and commits frame 0 with it,
        # so a fixed key would give every same-text request an identical
        # first frame at temperature > 0 (round-2 advisor finding).
        admit_key = jax.random.fold_in(
            jax.random.PRNGKey(self._seed), self._admits
        )
        self._admits += 1
        if self.spec_k:
            sp1 = SamplingParams.create(
                req.temperature, req.top_k, req.top_p,
                forbid_eos=req.forbid_eos,
            )
            prefill = self._get_spec_prefill(t_bucket, lang_id)
            s1, bundle, frame0, valid0 = prefill(
                self.engine.params, ids_arr, lens, admit_key, sp1
            )
            splice = self._get_spec_splice(t_bucket)
            self._state, self._trailing, self._trailing_len = splice(
                self._state, self._trailing, self._trailing_len,
                jnp.asarray(slot, jnp.int32),
                s1.cache, s1.valid_mask,
                s1.pending, s1.pending_nodrip, s1.pending_hidden,
                s1.rope_pos, s1.done, bundle.trailing, bundle.trailing_len,
            )
            # the spec bootstrap already committed frame 0
            if bool(np.asarray(valid0)[0]) and budget >= 1:
                active.frames.append(np.asarray(frame0)[0])
        else:
            prefill = self._get_prefill(t_bucket, lang_id)
            s1, bundle = prefill(
                self.engine.params, ids_arr, lens, admit_key
            )
            splice = self._get_splice(t_bucket)
            self._state, self._trailing, self._trailing_len = splice(
                self._state, self._trailing, self._trailing_len,
                jnp.asarray(slot, jnp.int32),
                s1.cache, s1.valid_mask,
                s1.last_logits, s1.last_hidden, s1.pos, bundle.trailing,
                bundle.trailing_len,
            )
        self._temps[slot] = req.temperature
        self._top_ks[slot] = req.top_k
        self._top_ps[slot] = req.top_p
        self._forbid[slot] = req.forbid_eos
        self._slots[slot] = active

    def _retire(self, slot: int) -> None:
        """Free the slot immediately; vocode + future resolution run on the
        finisher pool so a long utterance's whole-sequence vocode (plus any
        first-time length-bucket compile) never stalls the decode loop —
        that would reintroduce the head-of-line blocking this pool exists to
        remove.  Multiple workers keep a retirement burst from serializing
        (requests resolve independently; FIFO is not required)."""
        active = self._slots[slot]
        self._slots[slot] = None
        self._state = self._get_mark_done()(
            self._state, jnp.asarray(slot, jnp.int32)
        )
        self._requests_done += 1
        self._finisher.submit(self._finish, active)

    def _finish(self, active: "_Active") -> None:
        try:
            codes = (
                np.stack(active.frames).astype(np.int32)
                if active.frames else np.zeros((0, 16), np.int32)
            )
            codes = codes[: active.budget]
            audio = self._vocode(codes)
            now = time.perf_counter()
            spf = self.cfg.vocoder.samples_per_frame
            m = SynthesisMetrics(
                audio_seconds=len(codes) * spf / float(SAMPLE_RATE),
                frames=len(codes),
                total_seconds=now - active.req.enqueued_at,
            )
            m.stage_seconds["queued"] = active.admitted_at - active.req.enqueued_at
            active.req.future.set_result(
                SynthesisResult(audio=audio, codes=codes, metrics=m)
            )
        except Exception as e:  # pragma: no cover
            if not active.req.future.done():
                active.req.future.set_exception(e)

    def _try_admissions(self) -> None:
        for slot in range(self.pool_size):
            if self._slots[slot] is not None:
                continue
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return
            try:
                self._admit(slot, req)
            except Exception as e:
                log.exception("admission failed")
                if not req.future.done():
                    req.future.set_exception(e)

    def _switch_to_sequential(self) -> None:
        """Adaptive-spec fallback: convert every slot's SpecState row into a
        sequential GenerateState (one talker step consuming each pending
        input) and swap the decode program.  Idle slots convert harmlessly
        (their rows are overwritten at the next admission splice)."""
        from ..runtime.generate import make_generate_fns
        from ..runtime.speculative import spec_to_seq

        cfg = self.cfg
        conv = jax.jit(
            lambda p, s, tr, tl, pad: spec_to_seq(
                cfg, p, s, tr, tl, pad, uniform_fill=False
            )
        )
        self._state = conv(
            self.engine.params, self._state, self._trailing,
            self._trailing_len, self._tts_pad,
        )
        self.spec_k = None
        self._fns = make_generate_fns(
            cfg, batch=self.pool_size, max_len=self.kv_bucket,
            chunk_len=self.chunk_len, uniform_fill=False,
        )
        self._decode = self._fns.decode
        self._spec_fallback = True

    def _loop(self) -> None:
        params = self.engine.params
        while not self._stop.is_set():
            self._try_admissions()
            if not any(s is not None for s in self._slots):
                time.sleep(0.005)
                continue
            sp = SamplingParams.create(
                jnp.asarray(self._temps), jnp.asarray(self._top_ks),
                jnp.asarray(self._top_ps), forbid_eos=jnp.asarray(self._forbid),
            )
            try:
                self._state, frames, valid = self._decode(
                    params, self._state, self._trailing, self._trailing_len,
                    self._tts_pad, sp,
                )
                frames_np = np.asarray(frames)
                valid_np = np.asarray(valid)
                done_np = np.asarray(self._state.done)
            except Exception as e:  # pragma: no cover
                log.exception("pool decode failed; failing active requests")
                for slot, active in enumerate(self._slots):
                    if active is not None and not active.req.future.done():
                        active.req.future.set_exception(e)
                    self._slots[slot] = None
                # the decode jit donated self._state: its buffers may now be
                # deleted, which would poison every future splice — rebuild
                # a fresh idle state so the pool keeps serving
                self._state = self._make_idle_state()
                continue
            self._chunks_run += 1
            if self.spec_k and self.engine.spec_accept_floor > 0:
                live = [
                    i for i in range(self.pool_size)
                    if self._slots[i] is not None and not bool(done_np[i])
                ]
                if live:
                    self._acc_iters += self.spec_iters * len(live)
                    self._acc_slots += int(valid_np[live].sum())
                if self._acc_iters >= max(self.engine.spec_adapt_window,
                                          2 * self.spec_iters):
                    accept = max(0, self._acc_slots - self._acc_iters) / max(
                        self._acc_iters * (self.spec_k - 1), 1
                    )
                    if accept < self.engine.spec_accept_floor:
                        log.info(
                            "pool spec acceptance %.2f < floor %.2f; "
                            "switching the pool to sequential decode", accept,
                            self.engine.spec_accept_floor,
                        )
                        self._switch_to_sequential()
                    else:
                        self._acc_slots = 0  # rolling window
                        self._acc_iters = 0
            for slot, active in enumerate(self._slots):
                if active is None:
                    continue
                for frame, ok in zip(frames_np[slot], valid_np[slot]):
                    if ok and len(active.frames) < active.budget:
                        active.frames.append(frame)
                if bool(done_np[slot]) or len(active.frames) >= active.budget:
                    self._retire(slot)
        # drain on shutdown
        for active in self._slots:
            if active is not None and not active.req.future.done():
                active.req.future.set_exception(RuntimeError("server shut down"))
        while True:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            r.future.set_exception(RuntimeError("server shut down"))
