"""Sparse decoder LM: the searchsorted lookup must equal the dense
bigram matrix, and full-vocabulary decode with an LM must not
materialize the dense [V+1, V] table (5.8 GB at 37.5k words)."""

import numpy as np
import pytest

from poccala_tpu.lm import Ngram


def _rand_lm(rng, vocab, n_sent=40):
    lm = Ngram(2)
    sents = [
        [vocab[i] for i in rng.integers(0, len(vocab), size=rng.integers(1, 6))]
        for _ in range(n_sent)
    ]
    lm.train(sents)
    return lm


class TestSparseLmLookup:
    @pytest.mark.parametrize("smoothing", ["jm", "wb"])
    def test_matches_dense_matrix(self, rng, smoothing):
        from poccala_tpu.decoder.vector import VectorBeamDecoder

        vocab = [f"w{i}" for i in range(37)]
        lm = _rand_lm(rng, vocab)
        lm.smoothing = smoothing
        dense = lm.bigram_matrix(vocab)

        # a decoder instance only for its _lm_lookup machinery
        class _D(VectorBeamDecoder):
            def __init__(self):
                self.lm = lm
                self.lm_weight = 7.0
                self.word_penalty = 3.0
                self._vocab = vocab

        d = _D()
        v = len(vocab)
        uni, rboff, cbase, rows, cols, vals = \
            lm.bigram_tables_backoff(vocab)
        keys = rows.astype(np.int64) * v + cols
        order = np.argsort(keys)
        d._lm_sparse = (
            (7.0 * uni - 3.0).astype(np.float32),
            (7.0 * np.concatenate([rboff, [0.0]])).astype(np.float32),
            (7.0 * cbase - 3.0).astype(np.float32),
            keys[order],
            (7.0 * vals[order] - 3.0).astype(np.float32),
        )
        d._lm_tab = None

        last = rng.integers(0, v + 1, size=500)      # incl. the V row
        words = rng.integers(0, v, size=500)
        got = d._lm_lookup(last, words)
        want = 7.0 * dense[last, words] - 3.0
        assert np.allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("smoothing", ["jm", "wb"])
    def test_backoff_tables_match_logprob(self, rng, smoothing):
        """bigram_tables_backoff must reproduce per-pair logprob for
        seen pairs, unseen pairs (row_boff + col_base) and the
        no-previous-word row, in BOTH smoothing modes — the property
        that lets WB attach to the first-pass decoder."""
        vocab = [f"w{i}" for i in range(23)]
        lm = Ngram(2, smoothing=smoothing)
        sents = [
            [vocab[i] for i in rng.integers(0, 15, size=rng.integers(1, 6))]
            for _ in range(30)
        ]  # words 15..22 stay unseen (zero-count contexts)
        lm.train(sents)
        uni, rboff, cbase, rows, cols, vals = \
            lm.bigram_tables_backoff(vocab)
        for i in range(len(rows)):
            want = lm.logprob(vocab[cols[i]], [vocab[rows[i]]])
            assert np.isclose(vals[i], want), (smoothing, i)
        seen = set(zip(rows.tolist(), cols.tolist()))
        n_checked = 0
        for p in range(len(vocab)):
            for q in range(0, len(vocab), 5):
                if (p, q) in seen:
                    continue
                want = lm.logprob(vocab[q], [vocab[p]])
                assert np.isclose(rboff[p] + cbase[q], want), \
                    (smoothing, p, q, rboff[p] + cbase[q], want)
                n_checked += 1
        assert n_checked > 20
        for q in range(len(vocab)):
            assert np.isclose(uni[q], lm.logprob(vocab[q], []))

    @pytest.mark.parametrize("smoothing", ["jm", "wb"])
    def test_device_sparse_equals_dense_fallback(self, rng, smoothing):
        """Decode with the Ngram (sparse path) vs a foreign-LM wrapper of
        the same model (dense fallback path): identical hypotheses.
        Runs in both smoothing modes — 'wb' pins the per-row backoff
        gather end to end through the device scan."""
        import dataclasses

        import jax.numpy as jnp

        from poccala_tpu.config import ModelConfig
        from poccala_tpu.decoder.device import DeviceBeamDecoder
        from poccala_tpu.io.corpus import UnitInventory
        from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
        from poccala_tpu.models import senone_bank as sb

        units = ["n", "i3", "h", "ao3", "m", "a1"]
        inv = UnitInventory(units)
        d = 8
        cfg = ModelConfig(state_num=5, mix_level=1, max_mix_level=1)
        bank = sb.create_bank(len(units), cfg, d, differentiation=False)
        emb = rng.normal(size=(len(units), d)).astype(np.float32) * 4
        means = np.repeat(emb, 3, axis=0)[:, None, :]
        bank = dataclasses.replace(bank, means=jnp.asarray(means))
        table = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"]}
        lex = PronunciationLexicon()
        lex.generate(["你好", "你", "马", "好"], PinYin(table))
        flat = FlatLexicon.from_tree(lex.lexicon, inv)

        lm = _rand_lm(rng, ["你好", "你", "马", "好"])
        lm.smoothing = smoothing

        class ForeignLm:
            """No bigram_tables -> forces the dense fallback."""

            def logprob(self, w, ctx=None):
                return lm.logprob(w, ctx)

        dec_sparse = DeviceBeamDecoder(bank, flat, lm=lm, lm_weight=5.0,
                                       word_penalty=2.0)
        dec_dense = DeviceBeamDecoder(bank, flat, lm=ForeignLm(),
                                      lm_weight=5.0, word_penalty=2.0)
        dec_sparse._prep_tables()
        dec_dense._prep_tables()
        assert dec_sparse._lm_sparse is not None
        assert dec_dense._lm_sparse is None and dec_dense._lm_tab is not None

        def feats_for(seq, fp=8):
            xs = [emb[u] + rng.normal(size=(fp, d)).astype(np.float32) * 0.4
                  for u in seq]
            return np.concatenate(xs)

        for seq in ([0, 1, 2, 3], [4, 5, 0, 1], [0, 1], [2, 3, 4, 5]):
            x = feats_for(seq)
            hs = dec_sparse.decode(x, return_nbest=3)
            hd = dec_dense.decode(x, return_nbest=3)
            assert [h.words for h in hs] == [h.words for h in hd], seq
            assert np.allclose([h.score for h in hs],
                               [h.score for h in hd], rtol=1e-5), seq

    def test_full_vocab_lm_decode_memory_sane(self, rng):
        """An Ngram over the full 37.5k-word vocabulary decodes without
        a dense table (the sparse arrays are ~KBs; dense would be
        5.8 GB)."""
        import os

        from poccala_tpu.lexicon.build import DEFAULT_DAT

        if not os.path.exists(DEFAULT_DAT):
            pytest.skip("reference Mandarin.dat absent")
        import dataclasses

        import jax.numpy as jnp

        from poccala_tpu.config import ModelConfig
        from poccala_tpu.decoder.device import DeviceBeamDecoder
        from poccala_tpu.io.corpus import UnitInventory
        from poccala_tpu.lexicon.build import build_reference_lexicon
        from poccala_tpu.models import senone_bank as sb

        inv = UnitInventory.standard("XIF_tone")
        flat, words, py = build_reference_lexicon(
            inv, n_single=26000, n_multi=12000)
        lm = _rand_lm(rng, words[:200], n_sent=60)
        d = 8
        cfg = ModelConfig(state_num=5, mix_level=1, max_mix_level=1)
        bank = sb.create_bank(len(inv), cfg, d, differentiation=False)
        emb = rng.normal(size=(len(inv), d)).astype(np.float32) * 4
        means = np.repeat(emb, 3, axis=0)[:, None, :]
        bank = dataclasses.replace(bank, means=jnp.asarray(means))

        dec = DeviceBeamDecoder(bank, flat, lm=lm, lm_weight=3.0)
        x = np.concatenate([
            emb[u] + rng.normal(size=(8, d)).astype(np.float32) * 0.3
            for u in (0, 30)
        ])
        hyps = dec.decode(x)
        assert dec._lm_sparse is not None and dec._lm_tab is None
        assert hyps and hyps[0].words
