"""G2P, lexicon, N-gram LM, and beam-decoder tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from poccala_tpu.config import Config
from poccala_tpu.io.corpus import Batch, UnitInventory
from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
from poccala_tpu.lm import Ngram


class TestPinyin:
    def test_reference_transforms(self):
        p = PinYin()
        # separate initial/final incl. 2-char initials
        assert p.word2pinyin("中") == [["zh,ong1", "zh,ong4"]]
        assert p.word2pinyin("家") == [["j,ia1"]]
        # j/q/x u->v (PinYin.py:101-105)
        assert p.word2pinyin("去") == [["q,v4"]]
        # ue->ve (PinYin.py:106-107)
        assert p.word2pinyin("学") == [["x,ve2"]]
        # y -> #_I, w -> #_u (PinYin.py:110-114)
        assert p.word2pinyin("一") == [["#_I,i1"]]
        assert p.word2pinyin("我") == [["#_u,o3"]]
        # neutral tone 5 -> 0 (PinYin.py:116-118)
        assert p.word2pinyin("吗") == [["m,a0"]]
        # vowel-initial zero-initial expansion (fixed lookup)
        assert p.word2pinyin("爱") == [["#_a,ai4"]]
        assert p.word2pinyin("欧") == [["#_o,ou1"]]
        # unknown char
        assert p.word2pinyin("𰻝") is None

    def test_no_tone_mark(self):
        p = PinYin()
        out = p.word2pinyin("好", show_tone_mark=False)
        assert out == [["h,ao"]]

    def test_mandarin_dat_format(self, tmp_path):
        from poccala_tpu.lexicon.pinyin import load_mandarin_dat

        path = tmp_path / "m.dat"
        path.write_text("4f60\tNI3\n597d\tHAO3 HAO4\n")
        table = load_mandarin_dat(str(path))
        assert table["你"] == ["ni3"]
        assert table["好"] == ["hao3", "hao4"]
        p = PinYin(str(path))
        assert p.word2pinyin("你好")[0] == ["n,i3"]


class TestLexicon:
    def make_lexicon(self):
        table = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"]}
        lex = PronunciationLexicon()
        lex.generate(["你好", "你", "马"], PinYin(table))
        return lex

    def test_tree_structure(self):
        lex = self.make_lexicon()
        # first level keyed by initial (PronunciationLexicon.py:64-70)
        assert set(lex.lexicon.keys()) == {"n", "m"}
        node = lex.lexicon["n"]["n,i3"]
        assert "word" in node and node["word"] == ["你"]
        assert lex.lexicon["n"]["n,i3"]["h,ao3"]["word"] == ["你好"]
        assert lex.lexicon["m"]["m,a1"]["word"] == ["马"]

    def test_pickle_roundtrip(self, tmp_path):
        lex = self.make_lexicon()
        p = str(tmp_path / "lex.pkl")
        lex.save(p)
        lex2 = PronunciationLexicon()
        lex2.load(p)
        assert lex2.lexicon == lex.lexicon

    def test_flatten(self):
        lex = self.make_lexicon()
        inv = UnitInventory(["n", "i3", "h", "ao3", "m", "a1"])
        flat = FlatLexicon.from_tree(lex.lexicon, inv)
        assert flat.n_nodes == 4  # root + ni3 + hao3 + ma1
        roots = flat.children(0)
        assert len(roots) == 2
        syllables = {flat.node_syllable[n] for n in roots}
        assert syllables == {"n,i3", "m,a1"}
        ni3 = [n for n in roots if flat.node_syllable[n] == "n,i3"][0]
        assert flat.node_words[ni3] == ["你"]
        children = flat.children(ni3)
        assert len(children) == 1
        assert flat.node_words[children[0]] == ["你好"]
        assert tuple(flat.node_units[children[0]]) == (2, 3)  # h, ao3

    def test_flatten_skips_unknown_units(self):
        lex = self.make_lexicon()
        inv = UnitInventory(["n", "i3"])  # no h/ao3/m/a1
        flat = FlatLexicon.from_tree(lex.lexicon, inv)
        assert flat.n_nodes == 2  # root + ni3 only


class TestNgram:
    def test_counts_and_successors(self):
        lm = Ngram(2)
        lm.train([["你", "好"], ["你", "好"], ["你", "们"]])
        succ = lm.ngram("你")
        assert succ == {"好": 2, "们": 1}
        assert lm.logprob("好", ["你"]) > lm.logprob("们", ["你"])

    def test_unigram(self):
        lm = Ngram(1)
        lm.train([["a", "a", "b"]])
        assert lm.ngram([]) == {"a": 2, "b": 1, "</s>": 1}

    def test_save_load(self, tmp_path):
        lm = Ngram(2)
        lm.train([["x", "y"]])
        p = str(tmp_path / "lm.json")
        lm.save(p)
        lm2 = Ngram(2)
        lm2.init_gram(p)
        assert lm2.ngram("x") == {"y": 1}
        assert np.isclose(lm2.logprob("y", ["x"]), lm.logprob("y", ["x"]))


def _trained_setup(rng):
    """Train a tiny bank in feature space for units of 3 syllables."""
    from poccala_tpu.train.trainer import Trainer

    units = ["n", "i3", "h", "ao3", "m", "a1"]
    inv = UnitInventory(units)
    cfg = Config()
    cfg.model.state_num = 5
    cfg.model.mix_level = 1
    cfg.model.max_mix_level = 2
    cfg.train.max_label_len = 4
    cfg.train.max_frames = 64
    d = 8
    cfg.frontend.dct_num = 8
    cfg.frontend.delta_1 = False
    cfg.frontend.delta_2 = False

    # unit embeddings in feature space
    emb = rng.normal(size=(len(units), d)).astype(np.float32) * 4

    def utt(unit_ids, frames_per_unit=8):
        xs, lab = [], []
        for u in unit_ids:
            xs.append(emb[u] + rng.normal(size=(frames_per_unit, d)) * 0.4)
            lab.append(u)
        x = np.concatenate(xs).astype(np.float32)
        return x, lab

    seqs = [[0, 1], [0, 1, 2, 3], [2, 3], [4, 5], [4, 5, 0, 1]] * 4
    batch_x = np.zeros((len(seqs), 64, d), np.float32)
    masks = np.zeros((len(seqs), 64), bool)
    labels = np.zeros((len(seqs), 4), np.int32)
    lens = np.zeros((len(seqs),), np.int32)
    for i, s in enumerate(seqs):
        x, lab = utt(s)
        batch_x[i, : len(x)] = x
        masks[i, : len(x)] = True
        labels[i, : len(lab)] = lab
        lens[i] = len(lab)
    batch = Batch(feats=batch_x, t_masks=masks, labels=labels, label_lens=lens)

    tr = Trainer(cfg, inv)
    tr.auto([batch], t=3, mode=2, init=True)
    return tr, inv, emb, utt


class TestBeamDecoder:
    def test_decodes_trained_words(self, rng):
        from poccala_tpu.decoder import BeamDecoder

        tr, inv, emb, utt = _trained_setup(rng)
        table = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"]}
        lex = PronunciationLexicon()
        lex.generate(["你好", "你", "马"], PinYin(table))
        flat = FlatLexicon.from_tree(lex.lexicon, inv)
        dec = BeamDecoder(tr.bank, flat, candidate=3)

        # "你好" = units n i3 h ao3
        x, _ = utt([0, 1, 2, 3], frames_per_unit=10)
        hyps = dec.decode(x)
        assert hyps, "no hypotheses returned"
        assert hyps[0].words == ("你好",) or hyps[0].words == ("你", )
        all_words = [h.words for h in hyps]
        assert ("你好",) in all_words

        # "马" = units m a1
        x2, _ = utt([4, 5], frames_per_unit=10)
        hyps2 = dec.decode(x2)
        assert hyps2 and hyps2[0].words == ("马",)

    def test_lm_rescoring_biases_choice(self, rng):
        from poccala_tpu.decoder import BeamDecoder

        tr, inv, emb, utt = _trained_setup(rng)
        table = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"]}
        lex = PronunciationLexicon()
        lex.generate(["你好", "你", "马"], PinYin(table))
        flat = FlatLexicon.from_tree(lex.lexicon, inv)
        lm = Ngram(2)
        lm.train([["你好"]] * 10 + [["马"]])
        dec = BeamDecoder(tr.bank, flat, candidate=3, lm=lm, lm_weight=5.0)
        x, _ = utt([0, 1, 2, 3], frames_per_unit=10)
        hyps = dec.decode(x)
        assert hyps and hyps[0].words == ("你好",)

    def test_two_word_sequence(self, rng):
        from poccala_tpu.decoder import BeamDecoder

        tr, inv, emb, utt = _trained_setup(rng)
        table = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"]}
        lex = PronunciationLexicon()
        lex.generate(["你好", "你", "马"], PinYin(table))
        flat = FlatLexicon.from_tree(lex.lexicon, inv)
        dec = BeamDecoder(tr.bank, flat, candidate=3)
        # "你好 马" = n i3 h ao3 m a1
        x, _ = utt([0, 1, 2, 3, 4, 5], frames_per_unit=10)
        hyps = dec.decode(x)
        assert hyps
        assert ("你好", "马") in [h.words for h in hyps]
