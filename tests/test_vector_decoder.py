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
