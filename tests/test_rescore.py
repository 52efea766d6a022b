"""N-best rescoring: exact decode-LM decomposition + trigram reranking.

Reference intent: ``Decoder.py:201-204`` constructs ``Ngram(k)`` for
every order 1..n; orders above 2 apply through the two-pass
decode-then-rescore path (``poccala_tpu/decoder/rescore.py``)."""

import numpy as np
import pytest

from poccala_tpu.decoder.beam import Hypothesis
from poccala_tpu.decoder.rescore import (decode_lm_score, rescore_hyps,
                                         rescore_nbest)
from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
from poccala_tpu.lm import Ngram

from .test_lexicon_decoder import _trained_setup

TABLE = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"]}


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    tr, inv, emb, utt = _trained_setup(rng)
    lex = PronunciationLexicon()
    lex.generate(["你好", "你", "马"], PinYin(TABLE))
    flat = FlatLexicon.from_tree(lex.lexicon, inv)
    return tr, inv, flat, utt


class TestDecomposition:
    def test_rescore_with_decode_lm_is_noop(self, setup):
        """Subtract-then-add the same LM must reproduce the device
        decoder's scores (proves the reconstruction matches what the
        decode scan actually applied, per emitted word incl. the
        unigram first-word row)."""
        from poccala_tpu.decoder.device import DeviceBeamDecoder

        tr, inv, flat, utt = setup
        lm = Ngram(2)
        lm.train([["你好", "马"], ["你好"], ["你", "马"], ["马"]] * 3)
        dec = DeviceBeamDecoder(tr.bank, flat, lm=lm, lm_weight=5.0,
                                word_penalty=2.0)
        for seq in ([0, 1, 2, 3], [4, 5], [0, 1, 4, 5]):
            x, _ = utt(seq, frames_per_unit=10)
            hyps = dec.decode(x, return_nbest=4)
            assert hyps
            re = rescore_hyps(hyps, lm, lm, 5.0, 2.0)
            assert [h.words for h in re] == [h.words for h in hyps]
            for a, b in zip(re, hyps):
                assert np.isclose(a.score, b.score, rtol=1e-5), seq

    def test_no_lm_decode_decomposes(self, setup):
        """No-LM decode applied only the insertion penalty; rescoring
        with None must be a no-op too."""
        from poccala_tpu.decoder.device import DeviceBeamDecoder

        tr, inv, flat, utt = setup
        dec = DeviceBeamDecoder(tr.bank, flat, word_penalty=3.0)
        x, _ = utt([0, 1, 2, 3], frames_per_unit=10)
        hyps = dec.decode(x, return_nbest=4)
        re = rescore_hyps(hyps, None, None, 10.0, 3.0)
        for a, b in zip(re, hyps):
            assert a.words == b.words
            assert np.isclose(a.score, b.score, rtol=1e-6)

    def test_decode_lm_score_shape(self):
        lm = Ngram(2)
        lm.train([["a", "b"]] * 4)
        s = decode_lm_score(lm, ("a", "b"), lm_weight=2.0,
                            word_penalty=1.0)
        want = 2.0 * (lm.logprob("a", []) + lm.logprob("b", ["a"])) - 2.0
        assert np.isclose(s, want)
        assert decode_lm_score(None, ("a", "b"), 2.0, 1.0) == -2.0


class TestTrigramRerank:
    def test_trigram_flips_bigram_tie(self):
        """Classic case a bigram cannot decide: P(c|b) == P(d|b), but
        the trigram knows c follows (a, b).  Rescoring must flip the
        acoustically-preferred wrong hypothesis."""
        text = [["a", "b", "c"]] * 10 + [["x", "b", "d"]] * 10
        bi = Ngram(2)
        bi.train(text)
        tri = Ngram(3)
        tri.train(text)
        assert np.isclose(bi.logprob("c", ["b"]), bi.logprob("d", ["b"]))
        assert tri.logprob("c", ["a", "b"]) > tri.logprob("d", ["a", "b"])

        lm_w = 8.0
        right = Hypothesis(
            score=0.0 + decode_lm_score(bi, ("a", "b", "c"), lm_w, 0.0),
            words=("a", "b", "c"))
        wrong = Hypothesis(
            score=0.5 + decode_lm_score(bi, ("a", "b", "d"), lm_w, 0.0),
            words=("a", "b", "d"))
        assert wrong.score > right.score  # bigram decode prefers wrong

        re = rescore_hyps([wrong, right], bi, tri, lm_w, 0.0)
        assert re[0].words == ("a", "b", "c")

    def test_batch_form_and_weight_override(self):
        bi = Ngram(2)
        bi.train([["a", "b"]] * 5)
        tri = Ngram(3)
        tri.train([["a", "b"]] * 5)
        nb = [[Hypothesis(score=1.0, words=("a", "b"))], []]
        out = rescore_nbest(nb, bi, tri, 4.0, 1.0,
                            rescore_lm_weight=6.0,
                            rescore_word_penalty=0.5)
        assert out[1] == []
        acoustic = 1.0 - decode_lm_score(bi, ("a", "b"), 4.0, 1.0)
        want = acoustic + decode_lm_score(tri, ("a", "b"), 6.0, 0.5)
        assert np.isclose(out[0][0].score, want)
