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

    def test_save_load_roundtrips_smoothing(self, tmp_path):
        """A WB LM loaded into a default Ngram() must keep scoring WB
        (smoothing/lambda_interp persist; ADVICE r04): same counts under
        JM vs WB give different backoff probabilities."""
        lm = Ngram(3, smoothing="wb", lambda_interp=0.4)
        lm.train([["a", "b", "c"], ["a", "b", "d"], ["e", "b", "c"]])
        p = str(tmp_path / "lm_wb.json")
        lm.save(p)
        lm2 = Ngram()  # defaults: jm, 0.7 — must be overridden by load
        lm2.init_gram(p)
        assert lm2.smoothing == "wb"
        assert lm2.lambda_interp == 0.4
        assert lm2.n == 3
        for w, ctx in [("c", ["a", "b"]), ("d", ["b"]), ("q", ["a"])]:
            assert np.isclose(lm2.logprob(w, ctx), lm.logprob(w, ctx))

    def test_ngram_matches_full_scan(self):
        """The successor index must equal the brute-force scan over all
        stored k-grams (the pre-round-2 implementation)."""
        rng = np.random.default_rng(3)
        words = [f"w{i}" for i in range(40)]
        sents = [
            [words[j] for j in rng.integers(0, 40, size=rng.integers(1, 9))]
            for _ in range(60)
        ]
        lm = Ngram(2)
        lm.train(sents)

        def brute(context):
            context = ([context] if isinstance(context, str)
                       else list(context))[-1:]
            prefix = " ".join(context)
            k = len(context) + 1
            out = {}
            for key, cnt in lm.counts[k - 1].items():
                parts = key.rsplit(" ", 1)
                if len(parts) == 2 and parts[0] == prefix:
                    w = parts[-1]
                    if w != "<s>":
                        out[w] = out.get(w, 0) + cnt
            return out

        for w in words[:10] + ["<s>"]:
            assert lm.ngram(w) == brute(w), w

    def test_bigram_matrix_matches_logprob(self):
        """Property: the vectorized table equals per-pair logprob calls
        (the O(V²) build it replaces) on every cell."""
        rng = np.random.default_rng(4)
        vocab = [f"w{i}" for i in range(12)]
        sents = [
            [vocab[j] for j in rng.integers(0, 12, size=rng.integers(1, 6))]
            for _ in range(30)
        ]
        lm = Ngram(2)
        lm.train(sents)
        tab = lm.bigram_matrix(vocab)
        v = len(vocab)
        want = np.zeros((v + 1, v))
        for q in range(v):
            want[v, q] = lm.logprob(vocab[q], [])
            for p in range(v):
                want[p, q] = lm.logprob(vocab[q], [vocab[p]])
        assert np.allclose(tab, want, rtol=1e-12, atol=1e-12)

    def test_25k_vocab_table_build_is_fast(self):
        """VERDICT round-1 item 10 done-criterion: reference-scale
        (25,569-entry Mandarin lexicon) table build < 5 s."""
        import time

        rng = np.random.default_rng(5)
        v = 25600
        vocab = [f"w{i}" for i in range(v)]
        # 400k tokens of synthetic text: every word seen, Zipf-ish reuse
        ids = rng.zipf(1.3, size=400_000) % v
        sents = np.array_split(ids, 20_000)
        lm = Ngram(2)
        lm.train([[vocab[j] for j in s] for s in sents])
        t0 = time.time()
        uni, base, rows, cols, vals = lm.bigram_tables(vocab)
        dt = time.time() - t0
        assert dt < 5.0, dt
        assert len(uni) == v and len(rows) == len(vals) > 0
        # spot-check sparse entries against logprob
        for i in range(0, len(rows), max(len(rows) // 7, 1)):
            want = lm.logprob(vocab[cols[i]], [vocab[rows[i]]])
            assert np.isclose(vals[i], want), (i, vals[i], want)
        # and the backoff column
        q = int(cols[0])
        p_missing = next(
            p for p in range(v)
            if f"{vocab[p]} {vocab[q]}" not in lm.counts[1]
        )
        assert np.isclose(base[q], lm.logprob(vocab[q], [vocab[p_missing]]))


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
