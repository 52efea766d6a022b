"""Decode serving pipeline: DecodeService == decode_batch, batched.

The service micro-batches queued requests and double-buffers device
dispatch against host work (``serve.py``); these tests pin that the
pipelining is purely an execution-order change — every request gets the
exact hypotheses the one-shot ``decode_batch`` produces — and that the
shape-bucketing keeps the jit cache bounded.
"""

import dataclasses

import numpy as np
import pytest

from poccala_tpu.config import ModelConfig
from poccala_tpu.decoder.device import DeviceBeamDecoder
from poccala_tpu.io.corpus import UnitInventory
from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
from poccala_tpu.models import senone_bank as sb
from poccala_tpu.serve import DecodeService


def _world(rng, d=8):
    import jax.numpy as jnp

    units = ["n", "i3", "h", "ao3", "m", "a1"]
    inv = UnitInventory(units)
    cfg = ModelConfig(state_num=5, mix_level=1, max_mix_level=1)
    bank = sb.create_bank(len(units), cfg, d, differentiation=False)
    emb = rng.normal(size=(len(units), d)).astype(np.float32) * 4
    means = np.repeat(emb, cfg.state_num - 2, axis=0)[:, None, :]
    bank = dataclasses.replace(bank, means=jnp.asarray(means))
    table = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"]}
    lex = PronunciationLexicon()
    lex.generate(["你好", "你", "马"], PinYin(table))
    flat = FlatLexicon.from_tree(lex.lexicon, inv)
    dec = DeviceBeamDecoder(bank, flat, candidate=3)

    def utt(unit_ids, frames_per_unit=12):
        xs = [
            emb[u] + rng.normal(size=(frames_per_unit, d)) * 0.3
            for u in unit_ids
        ]
        return np.concatenate(xs).astype(np.float32)

    return dec, utt


def _oneshot(dec, feats_list, nbest=1, frame_bucket=32, batch=None):
    """decode_batch on the same fixed (B, bucketed-T) padding the
    service uses, so scores are bit-identical."""
    b = batch or len(feats_list)
    t_max = max(f.shape[0] for f in feats_list)
    t_pad = max(frame_bucket, -(-t_max // frame_bucket) * frame_bucket)
    fb = np.zeros((b, t_pad, feats_list[0].shape[1]), np.float32)
    nf = np.zeros((b,), np.int32)
    for i, f in enumerate(feats_list):
        fb[i, : f.shape[0]] = f
        nf[i] = f.shape[0]
    return dec.decode_batch(fb, nf, return_nbest=nbest)[: len(feats_list)]


class TestDecodeService:
    def test_matches_decode_batch(self, rng):
        dec, utt = _world(rng)
        seqs = [[0, 1, 2, 3], [0, 1], [4, 5], [0, 1, 2, 3, 4, 5]]
        feats = [utt(s) for s in seqs]
        want = _oneshot(dec, feats, nbest=2, batch=4)
        with DecodeService(dec, batch_size=4, frame_bucket=32,
                           return_nbest=2) as svc:
            got = svc.decode_many(feats)
        for w, g in zip(want, got):
            assert [h.words for h in g] == [h.words for h in w]
            assert np.allclose([h.score for h in g],
                               [h.score for h in w])

    def test_partial_batch_padding(self, rng):
        """3 requests through a batch_size-8 service: dead padding slots
        must not perturb real results."""
        dec, utt = _world(rng)
        feats = [utt([0, 1]), utt([2, 3]), utt([4, 5])]
        want = _oneshot(dec, feats, batch=8)
        with DecodeService(dec, batch_size=8, frame_bucket=32) as svc:
            got = svc.decode_many(feats)
        assert [[h.words for h in g] for g in got] == \
            [[h.words for h in w] for w in want]
        assert svc.stats.batches == 1
        assert svc.stats.padded_slots == 5

    def test_many_batches_bounded_shapes(self, rng):
        """12 requests of assorted lengths, batch 4: >=3 batches, all
        compiled shapes share the bucket grid."""
        dec, utt = _world(rng)
        feats = [utt([i % 6], frames_per_unit=8 + 3 * (i % 5))
                 for i in range(12)]
        with DecodeService(dec, batch_size=4, frame_bucket=32,
                           max_wait_s=0.2) as svc:
            got = svc.decode_many(feats)
        assert len(got) == 12
        assert svc.stats.requests == 12
        assert svc.stats.batches >= 3
        for b, t in svc.stats.shapes:
            assert b == 4 and t % 32 == 0
        # every request individually matches its solo decode
        for f, g in zip(feats[:3], got[:3]):
            w = _oneshot(dec, [f], batch=4)[0]
            assert [h.words for h in g] == [h.words for h in w]

    def test_submit_after_close_raises(self, rng):
        dec, utt = _world(rng)
        svc = DecodeService(dec, batch_size=2)
        svc.close()
        svc.close()  # idempotent
        with pytest.raises(RuntimeError):
            svc.submit(utt([0]))

    def test_bad_shape_rejected(self, rng):
        dec, utt = _world(rng)
        with DecodeService(dec, batch_size=2) as svc:
            with pytest.raises(ValueError):
                svc.submit(np.zeros((4, 4, 8), np.float32))

    def test_dispatch_collect_split_is_decode_batch(self, rng):
        """The underlying dispatch/collect split composes back to
        decode_batch exactly (two handles in flight at once)."""
        dec, utt = _world(rng)
        f1, f2 = utt([0, 1, 2, 3]), utt([4, 5])
        b = np.zeros((2, 48, 8), np.float32)
        b[0, : len(f1)] = f1
        b[1, : len(f2)] = f2
        nf = np.array([len(f1), len(f2)], np.int32)
        want = dec.decode_batch(b, nf, return_nbest=2)
        h1 = dec.decode_dispatch(b, nf, return_nbest=2)
        h2 = dec.decode_dispatch(b, nf, return_nbest=2)  # overlapped
        got1 = dec.decode_collect(h1)
        got2 = dec.decode_collect(h2)
        for w, g1, g2 in zip(want, got1, got2):
            assert [h.words for h in g1] == [h.words for h in w]
            assert [h.words for h in g2] == [h.words for h in w]

    def test_latency_stats_and_batch_fill(self, rng):
        """Back-to-back submits within max_wait_s fill batches (no dead
        padding slots), and per-request latency lands in the stats."""
        dec, utt = _world(rng)
        feats = [utt([0, 1]) for _ in range(6)]
        with DecodeService(dec, batch_size=3, frame_bucket=32,
                           max_wait_s=2.0) as svc:
            svc.decode_many(feats)
        st = svc.stats
        assert st.requests == 6
        assert st.padded_slots == 0, "batches must fill"
        assert len(st.latencies_s) == 6
        s = st.latency_summary()
        assert s["n"] == 6
        assert s["p99_ms"] >= s["p50_ms"] > 0.0
        assert s["max_ms"] >= s["p99_ms"]

    def test_close_fails_stragglers(self, rng):
        """A request that lands in the queue after the worker exited
        (the submit/close race window) must get its future failed by
        close(), not hang its client forever."""
        from concurrent.futures import Future

        dec, utt = _world(rng)
        svc = DecodeService(dec, batch_size=2)
        svc.close()
        fut = Future()
        svc._q.put((utt([0, 1]), 24, fut, 0.0))  # simulated racer
        svc.close()  # drains + fails it
        with pytest.raises(RuntimeError):
            fut.result(timeout=1)

    def test_adaptive_fill_under_slow_device(self, rng):
        """While a batch is in flight, the gather window extends to the
        estimated device completion (waiting is free — the chip is
        busy), so trickled arrivals fill batches instead of each paying
        a dead-padded dispatch.  serve.py:_loop `until` logic; the
        measured failure mode it prevents is benchmarks/serve_bench.json
        r04's 3 s p99 at 0.3x offered load."""
        import threading
        import time as _time

        class SlowDec:
            """decode_dispatch/collect stub with a fixed device time."""

            def __init__(self, busy_s):
                self.busy_s = busy_s
                self.batches = []

            def decode_dispatch(self, feats, nf, return_nbest=1,
                                mesh=None):
                self.batches.append(int((nf > 0).sum()))
                return (_time.monotonic() + self.busy_s, len(nf))

            def decode_collect(self, handle):
                t_done, b = handle
                _time.sleep(max(0.0, t_done - _time.monotonic()))
                return [[] for _ in range(b)]

        dec = SlowDec(busy_s=0.25)
        feats = np.zeros((16, 8), np.float32)
        svc = DecodeService(dec, batch_size=4, frame_bucket=8,
                            max_wait_s=0.001)
        try:
            futs = [svc.submit(feats)]
            _time.sleep(0.3)  # first batch dispatched alone; EMA learned
            # trickle 8 more at 40 ms spacing: within one 0.25 s device
            # window but far apart vs max_wait_s=1 ms
            def trickle():
                for _ in range(8):
                    futs.append(svc.submit(feats))
                    _time.sleep(0.04)

            th = threading.Thread(target=trickle)
            th.start()
            th.join()
            for f in list(futs):
                f.result(timeout=10)
        finally:
            svc.close()
        # without the adaptive window every trickled request dispatches
        # ~alone (8-9 batches); with it they coalesce near the device
        # rate: first solo batch + ~ceil(8/ (0.25/0.04)) groups.  Bound
        # is loose (<=6) because the trickle thread runs on wall-clock
        # sleeps and a loaded CI host can delay it past a gather window
        assert len(dec.batches) <= 6, dec.batches
        assert sum(dec.batches) == 9

    def test_stream_equals_oneshot(self, rng):
        """A ServiceStream fed in ragged chunks yields exactly the
        decoder's one-shot decode of the concatenated features, with
        partial results available mid-stream."""
        dec, utt = _world(rng)
        x = utt([0, 1, 2, 3])  # ni3 hao3 -> 你好
        want = dec.decode_batch(x[None], np.asarray([len(x)]),
                                return_nbest=2)[0]
        with DecodeService(dec, batch_size=2, frame_bucket=32,
                           max_wait_s=0.001) as svc:
            stream = svc.open_stream(chunk_frames=10, max_frames=256)
            # ragged feeds: 7 + 13 + rest
            stream.feed(x[:7])
            stream.feed(x[7:20])
            partial = stream.result().result(timeout=60)
            assert isinstance(partial, list)
            stream.feed(x[20:])
            got = stream.result(return_nbest=2).result(timeout=60)
        assert [h.words for h in got] == [h.words for h in want]
        assert np.allclose([h.score for h in got],
                           [h.score for h in want], rtol=1e-5)
        assert svc.stats.stream_sessions == 1
        assert svc.stats.stream_chunks >= 4

    def test_stream_interleaves_with_batch_requests(self, rng):
        """Stream chunks and micro-batched one-shot requests share the
        worker without corrupting each other."""
        dec, utt = _world(rng)
        xs = [utt([0, 1]) for _ in range(4)]
        x_s = utt([4, 5])  # ma1 -> 马
        want_b = _oneshot(dec, xs, frame_bucket=32)
        want_s = dec.decode_batch(
            x_s[None], np.asarray([len(x_s)]))[0]
        with DecodeService(dec, batch_size=2, frame_bucket=32,
                           max_wait_s=0.02) as svc:
            stream = svc.open_stream(chunk_frames=8, max_frames=128)
            futs = []
            for i, x in enumerate(xs):
                stream.feed(x_s[i * 6: (i + 1) * 6])
                futs.append(svc.submit(x))
            stream.feed(x_s[24:])
            got_s = stream.result().result(timeout=60)
            got_b = [f.result(timeout=60) for f in futs]
        for w, g in zip(want_b, got_b):
            assert [h.words for h in w] == [h.words for h in g]
        assert [h.words for h in got_s] == [h.words for h in want_s]

    def test_batched_lockstep_streams(self, rng):
        """batch > 1: the Viterbi carries stack and one chunk advances
        all streams in one device program; per-stream results equal
        the one-shot batch decode of the concatenated features."""
        dec, utt = _world(rng)
        xs = [utt([0, 1, 2, 3]), utt([4, 5, 0, 1])]
        t = min(len(x) for x in xs)
        xb = np.stack([x[:t] for x in xs])            # [2, T, D]
        want = dec.decode_batch(xb, np.full(2, t, np.int32),
                                return_nbest=2)
        with DecodeService(dec, batch_size=2, frame_bucket=32,
                           max_wait_s=0.001) as svc:
            stream = svc.open_stream(chunk_frames=10, max_frames=256,
                                     batch=2)
            for lo in range(0, t, 7):                 # ragged feeds
                stream.feed(xb[:, lo: lo + 7])
            got = stream.result(return_nbest=2).result(timeout=60)
        assert len(got) == 2
        for w, g in zip(want, got):
            assert [h.words for h in g] == [h.words for h in w]
            assert np.allclose([h.score for h in g],
                               [h.score for h in w], rtol=1e-5)

    def test_stream_error_surfaces_to_client(self, rng):
        """A failed chunk (capacity overrun on the worker thread) must
        surface on the next result()/feed(), never silently truncate
        the transcript."""
        dec, utt = _world(rng)
        x = utt([0, 1])
        with DecodeService(dec, batch_size=2, frame_bucket=32,
                           max_wait_s=0.001) as svc:
            stream = svc.open_stream(chunk_frames=8, max_frames=16)
            stream.feed(x[:16])
            stream.result().result(timeout=60)  # fine at capacity
            stream.feed(x[16:24])  # exceeds max_frames on the worker
            with pytest.raises(Exception):
                stream.result().result(timeout=60)
            with pytest.raises(RuntimeError):
                stream.feed(x[:8])

    def test_compile_sample_excluded_from_ema(self):
        """The first collect (JIT compile — minutes for large graphs)
        must not seed the adaptive-gather EMA, and the window is
        hard-capped by gather_cap_s, so a cold start cannot hold later
        requests hostage for 0.9x a compile-inflated estimate."""
        import time as _time

        class CompileThenFastDec:
            def __init__(self):
                self.n = 0

            def decode_dispatch(self, feats, nf, return_nbest=1,
                                mesh=None):
                self.n += 1
                # first batch simulates a slow compile
                busy = 0.5 if self.n == 1 else 0.01
                return (_time.monotonic() + busy, len(nf))

            def decode_collect(self, handle):
                t_done, b = handle
                _time.sleep(max(0.0, t_done - _time.monotonic()))
                return [[] for _ in range(b)]

        feats = np.zeros((8, 4), np.float32)
        svc = DecodeService(CompileThenFastDec(), batch_size=2,
                            frame_bucket=8, max_wait_s=0.001,
                            gather_cap_s=0.05)
        try:
            svc.submit(feats).result(timeout=10)   # compile batch
            assert svc._ema_batch_s == 0.0, \
                "compile sample must not seed the EMA"
            svc.submit(feats).result(timeout=10)   # fast batch, timed
            # pathological EMA (e.g. a later shape recompile) must be
            # capped: a lone follow-up request resolves well under
            # 0.9 * EMA thanks to gather_cap_s
            svc._ema_batch_s = 30.0
            t0 = _time.monotonic()
            svc.submit(feats).result(timeout=10)
            assert _time.monotonic() - t0 < 5.0
        finally:
            svc.close()
