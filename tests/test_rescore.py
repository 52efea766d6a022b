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


class TestHomophoneSausage:
    """Homophone sausage rescoring (pinyin->hanzi conversion): words
    sharing a lexicon node have identical acoustics, so rescoring may
    swap them freely; the LM order decides how much context picks the
    hanzi."""

    def _lex(self):
        table = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"],
                 "妈": ["ma1"], "吗": ["ma1"]}
        lex = PronunciationLexicon()
        lex.generate(["你", "好", "马", "妈", "吗"], PinYin(table))
        from poccala_tpu.io.corpus import UnitInventory
        inv = UnitInventory(["n", "i3", "h", "ao3", "m", "a1"])
        return FlatLexicon.from_tree(lex.lexicon, inv)

    def test_groups_from_lexicon(self):
        from poccala_tpu.decoder.rescore import homophone_groups

        g = homophone_groups(self._lex())
        assert set(g["马"]) == {"马", "妈", "吗"}
        assert g["马"] == g["妈"] == g["吗"]
        assert "你" not in g  # unique pronunciation: no group

    def test_trigram_resolves_what_bigram_ties(self):
        from poccala_tpu.decoder.rescore import (best_homophone_path,
                                                 homophone_groups)

        # corpus: after (你, 好) the third word is always 妈; after
        # (马, 好) it is always 吗.  A bigram only sees 好 and ties.
        corpus = [["你", "好", "妈"]] * 10 + [["马", "好", "吗"]] * 10
        bg, tg = Ngram(2, smoothing="wb"), Ngram(3, smoothing="wb")
        bg.train(corpus)
        tg.train(corpus)
        g = homophone_groups(self._lex())
        seq3, _ = best_homophone_path(("你", "好", "吗"), g, tg, 10.0)
        assert seq3 == ("你", "好", "妈"), seq3  # trigram fixes it
        seq2, _ = best_homophone_path(("你", "好", "吗"), g, bg, 10.0)
        # the bigram cannot prefer 妈 over the decoded 吗 (tie keeps
        # the decoder's choice)
        assert seq2[2] == "吗", seq2

    def test_no_homophones_equals_plain_rescore(self):
        from poccala_tpu.decoder.rescore import (rescore_nbest,
                                                 rescore_sausage)

        lm = Ngram(2)
        lm.train([["你", "好"], ["你", "马"]] * 3)
        tri = Ngram(3, smoothing="wb")
        tri.train([["你", "好"], ["你", "马"]] * 3)
        hyps = [[Hypothesis(score=-5.0, words=("你", "好")),
                 Hypothesis(score=-6.0, words=("你", "马"))]]
        a = rescore_nbest(hyps, lm, tri, 4.0, 1.5)
        b = rescore_sausage(hyps, {}, lm, tri, 4.0, 1.5)
        for ha, hb in zip(a[0], b[0]):
            assert ha.words == hb.words
            assert abs(ha.score - hb.score) < 1e-9
