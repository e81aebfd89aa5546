"""Continuous-batching pool: mid-flight admission, independent retirement,
mixed-language coexistence, greedy parity with the offline engine."""

import threading
import time

import jax

import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.api.engine import EngineError, TTSEngine
from leaxer_qwen3_tts_tpu.frontend import Tokenizer
from leaxer_qwen3_tts_tpu.serve import ContinuousBatcher

SPF = 2000


@pytest.fixture(scope="module")
def engine(tiny_model, tiny_vocab_files):
    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    return TTSEngine(
        config=cfg,
        params=params,
        tokenizer=Tokenizer(vocab_path, merges_path),
        max_frames=8,
        chunk_len=4,
    )


@pytest.fixture(params=["sequential", "spec"])
def pool(engine, request):
    kw = dict(pool_size=4, chunk_len=2, kv_bucket=64, text_bucket_max=16)
    if request.param == "spec":
        # speculative pool: one S=K verify pass per iteration covers
        # pool_size*K frame slots with per-slot acceptance
        kw.update(spec_k=3, spec_iters=1)
    p = ContinuousBatcher(engine, **kw)
    yield p
    p.shutdown()


def test_pool_basic_and_mixed_language(pool):
    """Requests with different languages decode CONCURRENTLY in one pool
    (conditioning lives in the per-request prefill) — the static batcher
    head-of-line-blocked on language."""
    futs = {
        lang: pool.submit("hello world", language=lang, temperature=0.0,
                          max_tokens=6)
        for lang in ("auto", "en", "zh")
    }
    results = {k: f.result(timeout=600) for k, f in futs.items()}
    for r in results.values():
        assert r.codes.shape[1] == 16
        assert r.audio.size == r.codes.shape[0] * SPF
        assert np.isfinite(r.audio).all()
        assert r.metrics.frames == r.codes.shape[0]
    # language token conditions generation through the pool prefill
    assert (results["en"].codes.shape != results["auto"].codes.shape) or not (
        np.array_equal(results["en"].codes, results["auto"].codes)
    )
    assert pool.stats["requests"] == 3


def test_short_request_not_blocked_by_long(pool):
    """THE continuous-batching property: a short request admitted mid-flight
    completes while a long one is still decoding (round-1 verdict item 6)."""
    order = []
    long_f = pool.submit("hello world", temperature=0.0, forbid_eos=True,
                         max_tokens=40)
    long_f.add_done_callback(lambda f: order.append("long"))
    # wait until the long request is genuinely in flight
    deadline = time.time() + 300
    while pool.stats["chunks"] < 1 or pool.stats["active"] < 1:
        assert time.time() < deadline, "long request never started"
        time.sleep(0.01)
    short_f = pool.submit("hello", temperature=0.0, forbid_eos=True,
                          max_tokens=2)
    short_f.add_done_callback(lambda f: order.append("short"))
    short = short_f.result(timeout=600)
    long_ = long_f.result(timeout=600)
    assert short.codes.shape[0] == 2
    assert long_.codes.shape[0] == 40
    assert order == ["short", "long"]  # retired independently, in length order


def test_pool_matches_engine_greedy(pool, engine):
    got = pool.synthesize("hello world", temperature=0.0, max_tokens=4)
    want = engine.synthesize("hello world", temperature=0.0, max_tokens=4)
    np.testing.assert_array_equal(got.codes, want.codes)
    np.testing.assert_allclose(got.audio, want.audio, atol=2e-4)


def test_pool_more_requests_than_slots(pool):
    """Queue drains through admissions: 10 requests through 4 slots."""
    futs = [
        pool.submit("hello", temperature=0.0, max_tokens=3) for _ in range(10)
    ]
    results = [f.result(timeout=600) for f in futs]
    assert len(results) == 10
    for r in results:
        assert r.codes.shape[0] <= 3
    # identical greedy requests produce identical codes regardless of slot
    for r in results[1:]:
        np.testing.assert_array_equal(r.codes, results[0].codes)


def test_pool_rejects_overlong_text(pool):
    f = pool.submit("hello " * 40, temperature=0.0)  # > text_bucket_max tokens
    with pytest.raises(Exception, match="too long"):
        f.result(timeout=600)


def test_pool_http_facade(pool):
    """The HTTP facade composes with the continuous pool unchanged."""
    import json
    import urllib.request

    from leaxer_qwen3_tts_tpu.serve import make_http_server

    httpd = make_http_server(pool, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=json.dumps({"text": "hello", "temperature": 0.0,
                             "max_tokens": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            assert r.read()[:4] == b"RIFF"
    finally:
        httpd.shutdown()


def test_pool_recovers_after_decode_failure(engine):
    """A failing dispatch fails the in-flight requests but the pool rebuilds
    its (donated) state and keeps serving new requests (review finding:
    without the rebuild, one transient error poisoned every future splice)."""
    p = ContinuousBatcher(engine, pool_size=2, chunk_len=2, kv_bucket=64,
                          text_bucket_max=16)
    try:
        real_decode = p._decode
        calls = {"n": 0}

        def flaky(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected device error")
            return real_decode(*a, **kw)

        p._decode = flaky
        f1 = p.submit("hello", temperature=0.0, max_tokens=3)
        with pytest.raises(Exception, match="injected"):
            f1.result(timeout=300)
        # the pool must still serve after the failure
        r = p.submit("hello", temperature=0.0, max_tokens=3).result(timeout=300)
        assert r.codes.shape[0] <= 3
        assert np.isfinite(r.audio).all()
    finally:
        p.shutdown()


@pytest.mark.parametrize("data,model", [(4, 2), (2, 4)])
def test_pool_on_mesh_matches_single_device(tiny_model, tiny_vocab_files,
                                            data, model):
    """Continuous pool with a TP x DP mesh: greedy output identical to the
    single-device pool (slots sharded over "data", params over "model")."""
    from leaxer_qwen3_tts_tpu.parallel import make_mesh

    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)
    kw = dict(config=cfg, params=params, tokenizer=tok, max_frames=8,
              chunk_len=2)
    pool_kw = dict(pool_size=4, chunk_len=2, kv_bucket=64, text_bucket_max=16)
    texts = ["hello world", "hello", "world hello", "hello hello"]

    plain_eng = TTSEngine(**kw)
    plain = ContinuousBatcher(plain_eng, **pool_kw)
    try:
        base = [plain.synthesize(t, temperature=0.0, max_tokens=6) for t in texts]
    finally:
        plain.shutdown()

    mesh = make_mesh(data, model)
    with jax.set_mesh(mesh):
        meng = TTSEngine(**kw, mesh=mesh)
        assert meng.is_ready(), meng.get_error()
        mpool = ContinuousBatcher(meng, **pool_kw)
        try:
            futs = [mpool.submit(t, temperature=0.0, max_tokens=6) for t in texts]
            got = [f.result(timeout=600) for f in futs]
        finally:
            mpool.shutdown()

    for b, g in zip(base, got):
        np.testing.assert_array_equal(np.asarray(b.codes), np.asarray(g.codes))


def test_pool_mesh_rejects_indivisible_pool_size(tiny_model):
    from leaxer_qwen3_tts_tpu.parallel import make_mesh

    cfg, params = tiny_model
    mesh = make_mesh(4, 2)
    with jax.set_mesh(mesh):
        eng = TTSEngine(config=cfg, params=params, mesh=mesh)
        with pytest.raises(EngineError, match="data axis"):
            ContinuousBatcher(eng, pool_size=3, chunk_len=2, kv_bucket=64,
                              text_bucket_max=16)


def test_pool_spec_on_mesh(tiny_model, tiny_vocab_files):
    """Speculative continuous pool sharded: runs and matches the greedy
    single-device spec pool."""
    from leaxer_qwen3_tts_tpu.parallel import make_mesh

    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)
    kw = dict(config=cfg, params=params, tokenizer=tok, max_frames=8,
              chunk_len=2)
    pool_kw = dict(pool_size=2, chunk_len=2, kv_bucket=64, text_bucket_max=16,
                   spec_k=3, spec_iters=1)

    plain = ContinuousBatcher(TTSEngine(**kw), **pool_kw)
    try:
        base = plain.synthesize("hello world", temperature=0.0, max_tokens=6)
    finally:
        plain.shutdown()

    mesh = make_mesh(2, 4)
    with jax.set_mesh(mesh):
        meng = TTSEngine(**kw, mesh=mesh)
        mpool = ContinuousBatcher(meng, **pool_kw)
        try:
            got = mpool.synthesize("hello world", temperature=0.0, max_tokens=6)
        finally:
            mpool.shutdown()
    np.testing.assert_array_equal(np.asarray(base.codes), np.asarray(got.codes))


def test_pool_adaptive_spec_fallback(tiny_model, tiny_vocab_files):
    """A spec pool whose acceptance stays below the (forced) floor switches
    itself to sequential decode mid-flight; requests before and after the
    switch complete with the same greedy codes as a plain pool."""
    cfg, params = tiny_model
    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)
    kw = dict(config=cfg, params=params, tokenizer=tok, max_frames=10,
              chunk_len=2)
    pool_kw = dict(pool_size=2, chunk_len=2, kv_bucket=64, text_bucket_max=16)

    plain = ContinuousBatcher(TTSEngine(**kw), **pool_kw)
    try:
        want = plain.synthesize("hello world", temperature=0.0, max_tokens=8)
    finally:
        plain.shutdown()

    eng = TTSEngine(**kw, spec_accept_floor=1.01, spec_adapt_window=1)
    pool = ContinuousBatcher(eng, **pool_kw, spec_k=3, spec_iters=1)
    try:
        r1 = pool.synthesize("hello world", temperature=0.0, max_tokens=8)
        assert pool.stats["spec_fallback"], pool.stats
        # post-switch admissions go through the sequential prefill/splice
        r2 = pool.synthesize("hello world", temperature=0.0, max_tokens=8)
    finally:
        pool.shutdown()
    np.testing.assert_array_equal(np.asarray(r1.codes), np.asarray(want.codes))
    np.testing.assert_array_equal(np.asarray(r2.codes), np.asarray(want.codes))


def test_pool_bf16_model(tiny_model, tiny_vocab_files):
    """bf16-dtype checkpoint in the pool: the idle state's carry dtypes must
    match what the decode step emits (a f32 last_hidden type-mismatched the
    scan on the bf16 flagship — caught on hardware, pinned here)."""
    import dataclasses

    cfg, _ = tiny_model
    bf = dataclasses.replace(
        cfg,
        talker=dataclasses.replace(
            cfg.talker,
            transformer=dataclasses.replace(
                cfg.talker.transformer, dtype="bfloat16"
            ),
        ),
        code_predictor=dataclasses.replace(
            cfg.code_predictor,
            transformer=dataclasses.replace(
                cfg.code_predictor.transformer, dtype="bfloat16"
            ),
        ),
    )
    from leaxer_qwen3_tts_tpu.runtime.weights import init_params

    params = init_params(bf, jax.random.PRNGKey(0))
    vocab_path, merges_path, _ = tiny_vocab_files
    tok = Tokenizer(vocab_path, merges_path)
    eng = TTSEngine(config=bf, params=params, tokenizer=tok, max_frames=8,
                    chunk_len=2)
    assert eng.is_ready(), eng.get_error()
    pool = ContinuousBatcher(eng, pool_size=2, chunk_len=2, kv_bucket=64,
                             text_bucket_max=16)
    try:
        r = pool.synthesize("hello world", temperature=0.0, max_tokens=4)
        assert len(r.codes) > 0 and np.isfinite(r.audio).all()
    finally:
        pool.shutdown()


def test_pool_streaming_matches_retired(pool):
    """Streaming THROUGH the pool (round-3 verdict #2): audio chunks arrive
    per decode chunk; the final result's audio is the streamed concatenation
    BIT-exactly; codes equal a non-streaming request with the same seed; and
    the incremental left-context vocode matches the whole-utterance vocode."""
    base = pool.synthesize("hello world", temperature=0.7, seed=11,
                           max_tokens=6)
    h = pool.submit_stream("hello world", temperature=0.7, seed=11,
                           max_tokens=6)
    chunks, result = [], None
    for item in h:
        if hasattr(item, "metrics"):
            result = item
        else:
            chunks.append(item)
    assert result is h.future.result()
    assert chunks, "no incremental audio emitted"
    concat = np.concatenate(chunks)
    np.testing.assert_array_equal(concat, result.audio)  # bit-exact contract
    np.testing.assert_array_equal(result.codes, base.codes)
    # incremental causal vocode == whole-utterance vocode (fp-reduction only)
    np.testing.assert_allclose(result.audio, base.audio, atol=2e-4)
    assert result.metrics.ttfa_seconds is not None


def test_pool_streaming_audio_before_completion(pool):
    """THE streaming property: a chunk is delivered while the request is
    still decoding (the round-3 pool only spoke at retirement)."""
    h = pool.submit_stream("hello world", temperature=0.0, max_tokens=24)
    it = iter(h)
    first = next(it)
    assert isinstance(first, np.ndarray) and first.dtype == np.float32
    assert not h.future.done(), "first audio arrived only at retirement"
    rest = list(it)
    result = rest[-1]
    total = np.concatenate([first] + rest[:-1])
    np.testing.assert_array_equal(total, result.audio)


def test_pool_streaming_http(pool):
    """/synthesize_stream rides the continuous pool (no private decode)."""
    import json
    import urllib.request

    from leaxer_qwen3_tts_tpu.serve import make_http_server

    httpd = make_http_server(pool, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        sreq = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize_stream",
            data=json.dumps({"text": "hello", "temperature": 0.0,
                             "max_tokens": 4, "seed": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(sreq, timeout=600) as r:
            assert r.headers["Content-Type"].startswith("audio/L16")
            pcm = r.read()
        samples = np.frombuffer(pcm, "<i2")
        assert len(samples) > 0 and len(samples) % SPF == 0  # whole frames
    finally:
        httpd.shutdown()


@pytest.mark.parametrize("mode", ["sequential", "spec"])
def test_pool_seeded_request_occupancy_invariant(engine, mode):
    """Per-request determinism in the PRODUCTION path (round-3 verdict #3):
    identical (text, seed, knobs) yields identical sampled codes with 0, 3,
    and 7 co-tenant requests in flight.  The pool state carries per-slot
    PRNG chains ([B, 2], runtime/sampling.split_keys) seeded from (pool
    seed, request seed) at admission — a slot's draws depend only on its
    own chain, never on batch-mates or the admit counter."""
    kw = dict(pool_size=8, chunk_len=2, kv_bucket=64, text_bucket_max=16)
    if mode == "spec":
        kw.update(spec_k=3, spec_iters=1)
    p = ContinuousBatcher(engine, **kw)
    runs = {}
    try:
        for n_cot in (0, 3, 7):
            cots = [
                p.submit("hello world", temperature=0.9, seed=100 + i,
                         forbid_eos=True, max_tokens=24)
                for i in range(n_cot)
            ]
            if n_cot:
                # the probe must genuinely share dispatches with co-tenants
                deadline = time.time() + 300
                while p.stats["active"] < n_cot:
                    assert time.time() < deadline, "co-tenants never admitted"
                    time.sleep(0.01)
            r = p.submit("hello", temperature=0.7, seed=42,
                         forbid_eos=True, max_tokens=6).result(timeout=600)
            for f in cots:
                f.result(timeout=600)
            runs[n_cot] = r
        assert runs[0].codes.shape[0] == 6
        for n in (3, 7):
            np.testing.assert_array_equal(
                runs[0].codes, runs[n].codes,
                err_msg=f"seeded request changed with {n} co-tenants",
            )
        # and a DIFFERENT seed actually changes the sampled output
        other = p.synthesize("hello", temperature=0.7, seed=43,
                             forbid_eos=True, max_tokens=6)
        assert not np.array_equal(other.codes, runs[0].codes)
    finally:
        p.shutdown()


def test_pool_warmup(pool):
    dt = pool.warmup()
    assert dt > 0
    r = pool.synthesize("hello world", temperature=0.0, max_tokens=4)
    assert len(r.codes) > 0


def test_pool_warmup_covers_declared_signatures(engine):
    """warmup(languages, text_buckets) pre-compiles every declared
    (text-bucket, language) prefill/splice signature — later requests with
    those signatures hit only cached programs (round-3 verdict #4)."""
    p = ContinuousBatcher(engine, pool_size=2, chunk_len=2, kv_bucket=64,
                          text_bucket_max=32)
    try:
        p.warmup(languages=("auto", "en"), text_buckets=(16, 32))
        keys = set(p._prefill_cache.keys())
        # sequential prefills are keyed (t_bucket, lang_id)
        assert {k[0] for k in keys} == {16, 32}
        assert len(keys) == 4
        r = p.synthesize("hello " * 12, language="en", temperature=0.0,
                         max_tokens=3)  # bucket-32 text, precompiled
        assert len(r.codes) > 0
    finally:
        p.shutdown()


def test_pool_admission_does_not_stall_decode(engine):
    """A COLD-signature admission (first-time text-bucket compile) must not
    freeze the decode loop: prefills run on admission workers and only the
    pre-compiled splice runs on the decode thread (round-3 verdict #4).
    The long in-flight request keeps committing chunks while the cold
    request's prefill compiles."""
    p = ContinuousBatcher(engine, pool_size=2, chunk_len=2, kv_bucket=64,
                          text_bucket_max=32)
    try:
        long_f = p.submit("hello", temperature=0.0, forbid_eos=True,
                          max_tokens=40)
        deadline = time.time() + 300
        while p.stats["active"] < 1:
            assert time.time() < deadline
            time.sleep(0.01)
        chunks0 = p.stats["chunks"]
        # bucket-32 text: never compiled in this pool -> cold prefill
        cold = p.submit("hello " * 12, temperature=0.0, max_tokens=2)
        cold.result(timeout=600)
        chunks_during = p.stats["chunks"] - chunks0
        long_f.result(timeout=600)
        # with the old synchronous admission the counter freezes for the
        # whole cold compile (only ~1-2 post-splice chunks); async admission
        # keeps the long request streaming through it
        assert chunks_during >= 5, (
            f"decode ran only {chunks_during} chunks during a cold admission"
        )
    finally:
        p.shutdown()
