"""Full-loop quality test: WAV corpus -> train -> decode -> WER.

This is the BASELINE acceptance shape (train a GMM-HMM and decode with
WER measured) on a synthetic separable corpus, exercising every tier:
native/Python WAV load, MFCC frontend, pinyin-syllable labels, embedded
Baum-Welch, lexicon build, beam decode, WER scoring.
"""

import os

import numpy as np
import pytest

from poccala_tpu.config import Config
from poccala_tpu.decoder import BeamDecoder
from poccala_tpu.eval import evaluate_decoder, wer
from poccala_tpu.io import corpus as corpus_io
from poccala_tpu.io import wav as wav_io
from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
from poccala_tpu.train.trainer import Trainer

TABLE = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"]}
WORDS = ["你好", "你", "马"]
WORD_SYLLABLES = {"你好": ["ni3", "hao3"], "你": ["ni3"], "马": ["ma1"]}
UNITS = ["n", "i3", "h", "ao3", "m", "a1"]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fullloop"))
    audio_dir = os.path.join(root, "record")
    label_dir = os.path.join(root, "label")
    os.makedirs(audio_dir)
    os.makedirs(label_dir)

    inv = corpus_io.UnitInventory(UNITS)
    pinyin = PinYin(TABLE)
    rng = np.random.default_rng(11)
    rate, unit_sec = 16000, 0.3
    n_unit = int(unit_sec * rate)

    # word sequences per utterance; labels as pinyin syllables
    refs = []
    for i in range(20):
        words = [WORDS[w] for w in rng.integers(0, 3, size=rng.integers(1, 3))]
        syllables = [s for w in words for s in WORD_SYLLABLES[w]]
        unit_names = [u for s in syllables for u in pinyin.syllable_to_units(s)]
        unit_ids = inv.encode(unit_names)
        sig = np.concatenate([
            corpus_io.synth_unit_signal(u, n_unit, rate, rng) for u in unit_ids
        ])
        name = f"utt{i:04d}"
        wav_io.write_wav(os.path.join(audio_dir, name + ".wav"), sig, rate)
        with open(os.path.join(label_dir, name + ".wav.trn"), "w") as f:
            f.write(" ".join(syllables) + "\n")
        refs.append(words)

    cfg = Config()
    cfg.paths.audio_file_path = audio_dir
    cfg.paths.label_file_path = label_dir
    cfg.train.load_line = 0
    cfg.train.label_format = "pinyin"
    cfg.frontend.vad = False
    cfg.model.mix_level = 2
    cfg.model.max_mix_level = 2
    cfg.train.batch_size = 10
    cfg.train.max_frames = 256
    cfg.train.max_label_len = 8
    cfg.train.proportion = 1.0
    cfg.train.step = 4

    corpus = corpus_io.Corpus(cfg, inv)
    batches = list(corpus.batches())
    tr = Trainer(cfg, inv)
    tr.auto(batches, t=4, mode=2, init=True)
    return cfg, inv, tr, batches, refs, corpus


class TestFullLoopWer:
    def test_wer_near_zero(self, trained):
        cfg, inv, tr, batches, refs, corpus = trained
        lex = PronunciationLexicon()
        lex.generate(WORDS, PinYin(TABLE))
        flat = FlatLexicon.from_tree(lex.lexicon, inv)
        dec = BeamDecoder(tr.bank, flat, candidate=3, max_tokens=48)

        utts, n_frames = [], []
        idx = 0
        for batch in batches:
            for i in range(len(batch.feats)):
                utts.append((batch.feats[i], refs[idx]))
                n_frames.append(int(batch.t_masks[i].sum()))
                idx += 1
        result = evaluate_decoder(dec, utts, n_frames)
        # separable synthetic units, fixed seeds: decoding is perfect —
        # any regression in the train/decode pipeline shows up here
        assert result.wer == 0.0, (
            f"WER {result.wer:.2f} (S={result.substitutions} "
            f"D={result.deletions} I={result.insertions} "
            f"/ {result.ref_tokens})"
        )

    def test_pinyin_label_format_encoding(self, trained):
        cfg, inv, tr, batches, refs, corpus = trained
        # "ni3 hao3" must have become units n i3 h ao3
        b = batches[0]
        first_units = [inv.units[u] for u in b.labels[0][: b.label_lens[0]]]
        joined = "".join(first_units)
        assert set(first_units) <= set(UNITS)
        assert len(first_units) % 2 == 0  # initial+final pairs

    def test_conversion_beats_unit_name_passthrough(self):
        """A token like ``er4`` names an XIF_tone unit AND spells a
        syllable; the syllable reading (#_e, er4) is what the audio
        contains and the lexicon compiles, so encoding must use it.
        Non-convertible unit tokens (``sil``) still pass through."""
        cfg = Config()
        cfg.train.label_format = "pinyin"
        inv = corpus_io.UnitInventory(
            corpus_io.standard_inventory("XIF_tone") + ["sil"])
        c = corpus_io.Corpus(cfg, inv, pairs=[])
        ids = c._encode_label(["sil", "er4", "zu2", "sil"])
        names = [inv.units[i] for i in ids]
        assert names == ["sil", "#_e", "er4", "z", "u2", "sil"]
