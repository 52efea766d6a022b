"""Streaming (online) decode: chunked == one-shot.

The reference's serving path is record → VAD → decode in one shot
(``Decoder.py:190-218``); the device decoder's scan is chunk-
incremental by construction, and ``decode_stream`` exposes it online.
These tests pin that feeding an utterance in chunks reproduces the
one-shot ``decode_batch`` hypotheses exactly (same carry, same absolute
traceback pointers), including mid-stream results and batched streams.
"""

import dataclasses

import numpy as np

from poccala_tpu.config import ModelConfig
from poccala_tpu.decoder.device import DeviceBeamDecoder
from poccala_tpu.io.corpus import UnitInventory
from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
from poccala_tpu.models import senone_bank as sb


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


class TestStreamingDecode:
    def test_four_chunks_match_one_shot(self, rng):
        dec, utt = _world(rng)
        x = utt([0, 1, 2, 3])  # ni3 hao3 -> "你好"
        t = len(x)
        one_shot = dec.decode_batch(x[None], np.array([t]))[0]
        chunks = np.split(x, 4)
        streamed = dec.decode_stream(chunks)[0]
        assert [h.words for h in streamed] == [h.words for h in one_shot]
        assert np.allclose(
            [h.score for h in streamed], [h.score for h in one_shot]
        )

    def test_uneven_chunks(self, rng):
        dec, utt = _world(rng)
        x = utt([4, 5])  # ma1 -> "马"
        one_shot = dec.decode_batch(x[None], np.array([len(x)]))[0]
        streamed = dec.decode_stream([x[:11], x[11:13], x[13:]])[0]
        assert streamed[0].words == one_shot[0].words
        assert np.isclose(streamed[0].score, one_shot[0].score)

    def test_mid_stream_result_then_continue(self, rng):
        """stream_result is a checkpoint, not a terminator: the session
        keeps decoding afterwards and still matches one-shot."""
        dec, utt = _world(rng)
        x = utt([0, 1, 4, 5])  # 你 马
        st = dec.stream_init(batch=1, max_frames=len(x))
        half = len(x) // 2
        st = dec.stream_feed(st, x[:half])
        mid = dec.stream_result(st)[0]
        assert mid, "mid-stream hypotheses must exist"
        st = dec.stream_feed(st, x[half:])
        final = dec.stream_result(st)[0]
        one_shot = dec.decode_batch(x[None], np.array([len(x)]))[0]
        assert final[0].words == one_shot[0].words
        assert np.isclose(final[0].score, one_shot[0].score)

    def test_batched_streams(self, rng):
        dec, utt = _world(rng)
        xa, xb = utt([0, 1]), utt([4, 5])
        t = len(xa)
        feats = np.stack([xa, xb])
        one_shot = dec.decode_batch(feats, np.array([t, t]))
        st = dec.stream_init(batch=2, max_frames=t)
        for lo in range(0, t, 8):
            st = dec.stream_feed(st, feats[:, lo:lo + 8])
        streamed = dec.stream_result(st)
        for u in range(2):
            assert streamed[u][0].words == one_shot[u][0].words

    def test_capacity_guard(self, rng):
        dec, utt = _world(rng)
        x = utt([0, 1])
        st = dec.stream_init(batch=1, max_frames=10)
        try:
            dec.stream_feed(st, x)
        except ValueError as e:
            assert "max_frames" in str(e)
        else:
            raise AssertionError("expected capacity ValueError")
