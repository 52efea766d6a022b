"""Vectorized decoder: agreement with the dict decoder + batch decode."""

import numpy as np
import pytest

from poccala_tpu.decoder import BeamDecoder
from poccala_tpu.decoder.vector import VectorBeamDecoder
from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
from poccala_tpu.lm import Ngram

from .test_lexicon_decoder import _trained_setup

TABLE = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"]}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(0)
    tr, inv, emb, utt = _trained_setup(rng)
    lex = PronunciationLexicon()
    lex.generate(["你好", "你", "马"], PinYin(TABLE))
    flat = FlatLexicon.from_tree(lex.lexicon, inv)
    return tr, inv, flat, utt


class TestVectorDecoder:
    def test_one_best_matches_dict_decoder(self, setup):
        tr, inv, flat, utt = setup
        dec_ref = BeamDecoder(tr.bank, flat, candidate=3)
        dec_vec = VectorBeamDecoder(tr.bank, flat, candidate=3)
        for seq in ([0, 1, 2, 3], [4, 5], [0, 1], [0, 1, 2, 3, 4, 5]):
            x, _ = utt(seq, frames_per_unit=10)
            h_ref = dec_ref.decode(x)
            h_vec = dec_vec.decode(x)
            assert h_vec, f"no hyps for {seq}"
            assert h_vec[0].words == h_ref[0].words, seq
            # scores agree for the shared 1-best
            assert np.isclose(h_vec[0].score, h_ref[0].score, rtol=1e-5)

    def test_batch_decode(self, setup):
        tr, inv, flat, utt = setup
        dec = VectorBeamDecoder(tr.bank, flat, candidate=3)
        seqs = [[0, 1, 2, 3], [4, 5], [0, 1]]
        t_max = 80
        feats = np.zeros((3, t_max, tr.bank.dim), np.float32)
        n_frames = []
        for i, s in enumerate(seqs):
            x, _ = utt(s, frames_per_unit=10)
            feats[i, : len(x)] = x
            n_frames.append(len(x))
        out = dec.decode_batch(feats, np.asarray(n_frames))
        assert out[0][0].words == ("你好",)
        assert out[1][0].words == ("马",)
        assert out[2][0].words == ("你",)

    def test_with_lm(self, setup):
        tr, inv, flat, utt = setup
        lm = Ngram(2)
        lm.train([["你好"]] * 10 + [["马"]])
        dec = VectorBeamDecoder(tr.bank, flat, candidate=3, lm=lm,
                                lm_weight=5.0)
        x, _ = utt([0, 1, 2, 3], frames_per_unit=10)
        hyps = dec.decode(x)
        assert hyps and hyps[0].words == ("你好",)


class TestDeviceDecoder:
    def test_matches_vector_decoder(self, setup):
        from poccala_tpu.decoder.device import DeviceBeamDecoder

        tr, inv, flat, utt = setup
        dec_vec = VectorBeamDecoder(tr.bank, flat, candidate=3)
        dec_dev = DeviceBeamDecoder(tr.bank, flat, candidate=3)
        for seq in ([0, 1, 2, 3], [4, 5], [0, 1], [0, 1, 2, 3, 4, 5]):
            x, _ = utt(seq, frames_per_unit=10)
            h_vec = dec_vec.decode(x)
            h_dev = dec_dev.decode(x)
            assert h_dev, f"no hyps for {seq}"
            assert h_dev[0].words == h_vec[0].words, seq
            assert np.isclose(h_dev[0].score, h_vec[0].score, rtol=1e-4), seq

    def test_device_batch(self, setup):
        from poccala_tpu.decoder.device import DeviceBeamDecoder

        tr, inv, flat, utt = setup
        dec = DeviceBeamDecoder(tr.bank, flat, candidate=3)
        seqs = [[0, 1, 2, 3], [4, 5], [0, 1]]
        t_max = 80
        feats = np.zeros((3, t_max, tr.bank.dim), np.float32)
        nf = []
        for i, s in enumerate(seqs):
            x, _ = utt(s, frames_per_unit=10)
            feats[i, : len(x)] = x
            nf.append(len(x))
        out = dec.decode_batch(feats, np.asarray(nf))
        assert out[0][0].words == ("你好",)
        assert out[1][0].words == ("马",)
        assert out[2][0].words == ("你",)

    def test_device_with_lm(self, setup):
        from poccala_tpu.decoder.device import DeviceBeamDecoder

        tr, inv, flat, utt = setup
        lm = Ngram(2)
        lm.train([["你好"]] * 10 + [["马"]])
        dec = DeviceBeamDecoder(tr.bank, flat, candidate=3, lm=lm,
                                lm_weight=5.0)
        x, _ = utt([0, 1, 2, 3], frames_per_unit=10)
        hyps = dec.decode(x)
        assert hyps and hyps[0].words == ("你好",)


class TestDeviceDecoderLargeLexicon:
    def test_more_roots_than_tokens(self, rng):
        """Score-ranked root seeding: lexicons with more first-syllable
        nodes than the token budget still decode correctly."""
        import dataclasses
        import jax.numpy as jnp
        from poccala_tpu.config import ModelConfig
        from poccala_tpu.decoder.device import DeviceBeamDecoder
        from poccala_tpu.io.corpus import UnitInventory
        from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
        from poccala_tpu.models import senone_bank as sb

        n_ini, n_fin = 12, 10
        initials = [f"b{i}" for i in range(n_ini)]
        finals = [f"a{i}1" for i in range(n_fin)]
        units = initials + finals
        inv = UnitInventory(units)

        # bank whose senone means equal a per-unit embedding
        cfg = ModelConfig(state_num=5, mix_level=1, max_mix_level=1)
        bank = sb.create_bank(len(units), cfg, 8, differentiation=False)
        emb = rng.normal(size=(len(units), 8)).astype(np.float32) * 4
        means = np.repeat(emb, 3, axis=0)[:, None, :]  # [S, 1, D]
        bank = dataclasses.replace(bank, means=jnp.asarray(means))

        # 120 single-syllable words -> 120 first-level nodes
        table = {}
        words = []
        for i in range(n_ini):
            for j in range(n_fin):
                w = chr(0x4E00 + i * n_fin + j)
                table[w] = [f"{initials[i]}{finals[j]}"]
                words.append(w)
        # custom G2P: syllables like "b3a71" aren't standard pinyin, so
        # build the tree directly
        lex = PronunciationLexicon()
        for w in words:
            ini = table[w][0][: len(initials[0])]
            # recover the unit pair from the construction
            idx = ord(w) - 0x4E00
            syl = f"{initials[idx // n_fin]},{finals[idx % n_fin]}"
            first = lex.lexicon.setdefault(syl.split(",")[0], {})
            node = first.setdefault(syl, {})
            node.setdefault("word", []).append(w)
        flat = FlatLexicon.from_tree(lex.lexicon, inv)
        assert len(flat.children(0)) == n_ini * n_fin  # 120 roots

        dec = DeviceBeamDecoder(bank, flat, max_tokens=48, candidate=12)

        # utterance for word (i=5, j=3): frames near its two embeddings
        def feats_for(i, j, frames_per_unit=8):
            e1, e2 = emb[i], emb[n_ini + j]
            x = np.concatenate([
                e1 + rng.normal(size=(frames_per_unit, 8)) * 0.3,
                e2 + rng.normal(size=(frames_per_unit, 8)) * 0.3,
            ]).astype(np.float32)
            return x

        for (i, j) in [(5, 3), (0, 0), (11, 9)]:
            x = feats_for(i, j)
            hyps = dec.decode(x)
            want = chr(0x4E00 + i * n_fin + j)
            assert hyps, (i, j)
            assert hyps[0].words == (want,), (i, j, hyps[0].words)


class TestShardedDecode:
    def test_mesh_decode_equals_single_device(self, setup):
        """N-device data-parallel decode must equal the 1-device decode
        utterance-for-utterance (BASELINE config 5 shape)."""
        from poccala_tpu.decoder.device import DeviceBeamDecoder
        from poccala_tpu.parallel import mesh as pmesh

        tr, inv, flat, utt = setup
        dec = DeviceBeamDecoder(tr.bank, flat, candidate=3)
        mesh = pmesh.make_mesh(data_axis=4, state_axis=2)

        seqs = [[0, 1, 2, 3], [4, 5], [0, 1], [4, 5, 0, 1],
                [0, 1, 2, 3, 4, 5], [2, 3]]
        t_max = 80
        feats = np.zeros((len(seqs), t_max, tr.bank.dim), np.float32)
        nf = np.zeros(len(seqs), np.int32)
        for i, s in enumerate(seqs):
            x, _ = utt(s, frames_per_unit=10)
            feats[i, : len(x)] = x
            nf[i] = len(x)

        one = dec.decode_batch(feats, nf)
        many = dec.decode_batch(feats, nf, mesh=mesh)  # pads 6 -> 8
        assert len(many) == len(one) == len(seqs)
        for u, (h1, hm) in enumerate(zip(one, many)):
            assert hm, u
            assert hm[0].words == h1[0].words, u
            assert np.isclose(hm[0].score, h1[0].score, rtol=1e-5), u

    def test_dryrun_helper(self):
        from poccala_tpu.parallel import decode as pdecode
        from poccala_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh(data_axis=8, state_axis=1)
        words, scores = pdecode.dryrun(mesh)
        assert len(words) == 16
        assert np.isfinite(scores).all()
        assert (words >= 1).all()


class TestAdversarialDeviceHostAgreement:
    def test_confusable_units_agree(self, rng):
        """Device-vs-host 1-best agreement on deliberately confusable
        inputs: unit embeddings share components (overlapping harmonics
        analog), so multiple word boundaries stay competitive and the
        single-best-emission approximation would silently prune correct
        paths.  With emit_top>=2 the device tier must match the host
        tier's 1-best."""
        import dataclasses
        import jax.numpy as jnp
        from poccala_tpu.config import ModelConfig
        from poccala_tpu.decoder.device import DeviceBeamDecoder
        from poccala_tpu.io.corpus import UnitInventory
        from poccala_tpu.lexicon import FlatLexicon, PronunciationLexicon
        from poccala_tpu.models import senone_bank as sb

        d = 8
        units = ["n", "i3", "h", "ao3", "m", "a1"]
        inv = UnitInventory(units)
        cfg = ModelConfig(state_num=5, mix_level=1, max_mix_level=1)
        bank = sb.create_bank(len(units), cfg, d, differentiation=False)
        # confusable embeddings: pairs share most of their direction
        base = rng.normal(size=(3, d)).astype(np.float32) * 3
        emb = np.stack([
            base[0], base[0] + rng.normal(size=d).astype(np.float32) * 0.8,
            base[1], base[1] + rng.normal(size=d).astype(np.float32) * 0.8,
            base[2], base[2] + rng.normal(size=d).astype(np.float32) * 0.8,
        ])
        means = np.repeat(emb, 3, axis=0)[:, None, :]
        bank = dataclasses.replace(bank, means=jnp.asarray(means))

        # homophone-rich lexicon: several words share syllable prefixes
        lex = PronunciationLexicon()
        tree = lex.lexicon
        tree.setdefault("n", {}).setdefault("n,i3", {})["word"] = ["你"]
        tree["n"]["n,i3"].setdefault("h,ao3", {})["word"] = ["你好"]
        tree["n"]["n,i3"].setdefault("m,a1", {})["word"] = ["泥马"]
        tree.setdefault("h", {}).setdefault("h,ao3", {})["word"] = ["好"]
        tree.setdefault("m", {}).setdefault("m,a1", {})["word"] = ["马"]
        flat = FlatLexicon.from_tree(lex.lexicon, inv)

        dec_vec = VectorBeamDecoder(bank, flat, candidate=6, max_tokens=128)
        dec_dev = DeviceBeamDecoder(bank, flat, candidate=6, max_tokens=128,
                                    emit_top=4)

        def feats_for(seq, fp=8, noise=0.5):
            xs = [emb[u] + rng.normal(size=(fp, d)).astype(np.float32) * noise
                  for u in seq]
            return np.concatenate(xs).astype(np.float32)

        n_agree = n_total = 0
        for seq in ([0, 1, 2, 3], [0, 1, 4, 5], [4, 5, 2, 3],
                    [0, 1, 2, 3, 4, 5], [2, 3, 4, 5], [0, 1]):
            for trial in range(3):
                x = feats_for(seq)
                h_vec = dec_vec.decode(x)
                h_dev = dec_dev.decode(x)
                assert h_dev and h_vec, seq
                n_total += 1
                n_agree += h_dev[0].words == h_vec[0].words
        # exact agreement on every confusable trial
        assert n_agree == n_total, (n_agree, n_total)
