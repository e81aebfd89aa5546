"""Pool soak: a randomized admit/stream/retire/fail schedule over hundreds
of mixed requests (languages, seeds, lengths, streaming, rejected inputs),
asserting per-request determinism (occupancy invariance), zero slot leaks,
and a drained queue — the long-running-mix coverage the targeted pool tests
don't provide (round-4 verdict weak #7).
"""

import os
import random
import time

import numpy as np
import pytest

from leaxer_qwen3_tts_tpu.api.engine import TTSEngine
from leaxer_qwen3_tts_tpu.frontend import Tokenizer
from leaxer_qwen3_tts_tpu.serve import ContinuousBatcher


N_REQUESTS = int(os.environ.get("QTTS_SOAK_N", "200"))


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


def test_pool_soak(engine):
    rng = random.Random(0xC0FFEE)
    pool = ContinuousBatcher(
        engine, pool_size=4, chunk_len=2, kv_bucket=64, text_bucket_max=16
    )
    try:
        texts = ["hello", "hello world", "abc", "one two three"]
        langs = ["auto", "en", "zh", "ja"]
        seeds = [1, 2, 3]  # small set so duplicate keys occur often

        # (text, lang, temp, max_tokens, seed) -> first observed codes;
        # every later duplicate must reproduce them exactly, regardless of
        # what else occupied the pool at the time (determinism contract)
        first_codes = {}
        pending = []  # (key_or_None, kind, handle)
        n_rejected = 0

        for i in range(N_REQUESTS):
            kind = rng.random()
            if kind < 0.06:
                # failure injection: overlong text is rejected in admission
                # (the slot must come back; the queue must keep moving)
                f = pool.submit("hello " * 40, temperature=0.0)
                pending.append((None, "reject", f))
                n_rejected += 1
            else:
                text = rng.choice(texts)
                lang = rng.choice(langs)
                greedy = rng.random() < 0.5
                temp = 0.0 if greedy else 0.8
                mt = rng.randint(1, 6)
                seed = rng.choice(seeds)
                key = (text, lang, temp, mt, seed)
                kw = dict(
                    language=lang, temperature=temp, max_tokens=mt, seed=seed
                )
                if rng.random() < 0.2:
                    stream = pool.submit_stream(text, **kw)
                    pending.append((key, "stream", stream))
                else:
                    pending.append((key, "future", pool.submit(text, **kw)))
            # drain opportunistically so in-flight depth varies over the run
            # (different occupancy mixes for identical keys)
            while len(pending) > rng.randint(4, 12):
                _consume(pending.pop(0), first_codes)

        while pending:
            _consume(pending.pop(0), first_codes)

        # queue drained, nothing stuck, no leaked slots
        deadline = time.time() + 60
        while pool.stats["active"] > 0 or pool.stats["queued"] > 0:
            assert time.time() < deadline, f"pool did not drain: {pool.stats}"
            time.sleep(0.02)
        st = pool.stats
        # rejected admissions fail their future without counting as done
        assert st["requests"] == N_REQUESTS - n_rejected
        assert n_rejected > 0  # the schedule actually exercised rejection
        assert len(first_codes) >= 10  # and a real mix of request keys
    finally:
        pool.shutdown()


def _consume(item, first_codes):
    key, kind, handle = item
    if kind == "reject":
        with pytest.raises(Exception, match="too long"):
            handle.result(timeout=600)
        return
    if kind == "stream":
        chunks = []
        result = None
        for x in handle:
            if isinstance(x, np.ndarray):
                chunks.append(x)
            else:
                result = x
        assert result is not None
        streamed = (
            np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
        )
        # streamed chunks re-assemble the retired waveform exactly
        np.testing.assert_allclose(streamed, result.audio, atol=2e-4)
    else:
        result = handle.result(timeout=600)
    assert result.codes.shape[0] <= key[3]
    assert np.isfinite(result.audio).all()
    got = np.asarray(result.codes)
    if key in first_codes:
        np.testing.assert_array_equal(
            got, first_codes[key],
            err_msg=f"occupancy-dependent output for {key}",
        )
    else:
        first_codes[key] = got
