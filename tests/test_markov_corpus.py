"""Second-order transcript grammar (``generate_formant_corpus
markov_order=2``).

The default corpus draws words i.i.d. from a Zipf marginal, so any LM
above order 1 is informationless by construction — which made trigram
rescoring demonstrations vacuous (r04 flagship: delta exactly 0.0).
The structured mode builds sentences from a seeded 3-word collocation
phrase inventory whose middle words come from a small shared pool (see
the grammar block in ``generate_formant_corpus``): after a middle word
a bigram splits its mass across every phrase sharing it, while the
two-word history resolves the continuation exactly.  Train and test
share the inventory via ``grammar_seed``.

Pinned here: (1) a trigram beats a bigram in held-out perplexity on
structured transcripts but not on i.i.d. ones; (2) the grammar is
carried by ``grammar_seed``, not the corpus ``seed``.
"""

import numpy as np
import pytest

from poccala_tpu.io.synth_formant import generate_formant_corpus
from poccala_tpu.lexicon import PinYin
from poccala_tpu.lm import Ngram


def _vocab_py():
    table = {
        "你": ["ni3"], "好": ["hao3"], "马": ["ma1"], "天": ["tian1"],
        "大": ["da4"], "小": ["xiao3"], "山": ["shan1"], "水": ["shui3"],
        "人": ["ren2"], "口": ["kou3"], "中": ["zhong1"], "文": ["wen2"],
    }
    return list(table), PinYin(table)


def _gen(tmp_path, tag, **kw):
    words, py = _vocab_py()
    _, _, trans = generate_formant_corpus(
        str(tmp_path / tag), words, py, words_per_utt=(4, 7),
        n_speakers=2, **kw)
    return [ws for _, ws in trans]


def _ppl(lm, sents):
    logp, n = 0.0, 0  # logprob is log10
    for ws in sents:
        for i, w in enumerate(ws):
            logp += lm.logprob(w, ws[max(0, i - lm.n + 1): i])
            n += 1
    return float(10.0 ** (-logp / max(n, 1)))


class TestMarkovStructure:
    def test_trigram_wins_only_with_structure(self, tmp_path):
        tr_s = _gen(tmp_path, "s_tr", num_utts=120, seed=11,
                    markov_order=2, grammar_seed=5)
        te_s = _gen(tmp_path, "s_te", num_utts=40, seed=97,
                    markov_order=2, grammar_seed=5)
        tr_i = _gen(tmp_path, "i_tr", num_utts=120, seed=11)
        te_i = _gen(tmp_path, "i_te", num_utts=40, seed=97)

        def gain(tr, te, smoothing):
            bg = Ngram(2, smoothing=smoothing)
            tg = Ngram(3, smoothing=smoothing)
            bg.train(tr)
            tg.train(tr)
            return _ppl(bg, te) / _ppl(tg, te)

        g_wb = gain(tr_s, te_s, "wb")
        g_jm = gain(tr_s, te_s, "jm")
        g_iid = gain(tr_i, te_i, "wb")
        # structured: the trigram resolves the shared-middle phrase
        # ambiguity the bigram marginalizes away; i.i.d.: no
        # higher-order signal exists, backoff noise only hurts.
        # Witten-Bell keeps more of the gain than fixed-weight JM
        # (JM pays a flat 1-lambda on every unseen continuation)
        assert g_wb > 1.15, g_wb
        assert g_wb > g_jm, (g_wb, g_jm)
        assert g_iid < 1.02, g_iid

    def test_grammar_seed_shares_structure_across_seeds(self, tmp_path):
        a = _gen(tmp_path, "a", num_utts=100, seed=1, markov_order=2,
                 grammar_seed=5)
        b = _gen(tmp_path, "b", num_utts=40, seed=2, markov_order=2,
                 grammar_seed=5)
        c = _gen(tmp_path, "c", num_utts=40, seed=2, markov_order=2,
                 grammar_seed=123)
        tg = Ngram(3)
        tg.train(a)
        # same grammar generalizes; a different grammar does not
        assert _ppl(tg, b) < _ppl(tg, c) * 0.9, (_ppl(tg, b), _ppl(tg, c))
