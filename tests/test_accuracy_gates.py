"""Accuracy gates beyond the separable full-loop test (VERDICT r2
item 8): a confusable-corpus WER bound, the bucket-cap accuracy probe
(scheme-1 frame subsampling must not cost quality), and genuine n-best
from the device decoder."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from poccala_tpu.config import Config, ModelConfig
from poccala_tpu.decoder.device import DeviceBeamDecoder
from poccala_tpu.eval.wer import wer as wer_fn
from poccala_tpu.io.corpus import Batch, UnitInventory
from poccala_tpu.lexicon import FlatLexicon, PronunciationLexicon
from poccala_tpu.models import senone_bank as sb
from poccala_tpu.train.trainer import Trainer


def _embedding_world(rng, overlap: float):
    """Six units whose embeddings share a base direction per pair —
    ``overlap`` scales how confusable each pair is (0 = separable)."""
    d = 8
    units = ["n", "i3", "h", "ao3", "m", "a1"]
    inv = UnitInventory(units)
    cfg = ModelConfig(state_num=5, mix_level=1, max_mix_level=1)
    bank = sb.create_bank(len(units), cfg, d, differentiation=False)
    base = rng.normal(size=(3, d)).astype(np.float32) * 3
    emb = np.stack([
        base[0], base[0] * overlap + rng.normal(size=d) * (1 - overlap) * 3,
        base[1], base[1] * overlap + rng.normal(size=d) * (1 - overlap) * 3,
        base[2], base[2] * overlap + rng.normal(size=d) * (1 - overlap) * 3,
    ]).astype(np.float32)
    means = np.repeat(emb, 3, axis=0)[:, None, :]
    bank = dataclasses.replace(bank, means=jnp.asarray(means))

    lex = PronunciationLexicon()
    tree = lex.lexicon
    tree.setdefault("n", {}).setdefault("n,i3", {})["word"] = ["你"]
    tree["n"]["n,i3"].setdefault("h,ao3", {})["word"] = ["你好"]
    tree.setdefault("h", {}).setdefault("h,ao3", {})["word"] = ["好"]
    tree.setdefault("m", {}).setdefault("m,a1", {})["word"] = ["马"]
    flat = FlatLexicon.from_tree(lex.lexicon, inv)
    word_units = {"你": [0, 1], "你好": [0, 1, 2, 3], "好": [2, 3],
                  "马": [4, 5]}

    def feats_for(words, fp=8, noise=0.45):
        seq = [u for w in words for u in word_units[w]]
        xs = [emb[u] + rng.normal(size=(fp, d)).astype(np.float32) * noise
              for u in seq]
        return np.concatenate(xs).astype(np.float32)

    return inv, bank, flat, feats_for


class TestConfusableWerBound:
    def test_confusable_corpus_wer_bounded(self, rng):
        """Deliberately confusable unit pairs (70% shared direction) at
        noise 0.45: the decoder must still keep WER under a fixed bound
        — a gate that actually moves if search quality regresses."""
        inv, bank, flat, feats_for = _embedding_world(rng, overlap=0.7)
        dec = DeviceBeamDecoder(bank, flat)
        plans = [["你好"], ["你", "马"], ["马", "好"], ["你好", "马"],
                 ["好"], ["你", "你好"]]
        refs, hyps = [], []
        for trial in range(4):
            for p in plans:
                x = feats_for(p)
                h = dec.decode(x)
                refs.append(p)
                hyps.append(list(h[0].words) if h else [])
        res = wer_fn(refs, hyps)
        assert res.wer <= 0.15, (res.wer, res.substitutions,
                                 res.deletions, res.insertions)

    def test_separable_corpus_wer_zero(self, rng):
        inv, bank, flat, feats_for = _embedding_world(rng, overlap=0.0)
        dec = DeviceBeamDecoder(bank, flat)
        plans = [["你好"], ["你", "马"], ["马", "好"], ["你好", "马"]]
        refs, hyps = [], []
        for trial in range(4):
            for p in plans:
                h = dec.decode(feats_for(p, noise=0.3))
                refs.append(p)
                hyps.append(list(h[0].words) if h else [])
        assert wer_fn(refs, hyps).wer == 0.0


class TestBucketCapAccuracy:
    def test_quartered_cap_keeps_training_quality(self, rng):
        """Scheme-1 frame buckets subsample when over capacity; the
        round-1 ask: quality with cap/4 must match the full cap.  Train
        two models differing only in bucket capacity and compare the
        final embedded-BW loglik per utterance (the training-quality
        metric the reference logs, LHMM.py:535)."""
        from poccala_tpu.train import alignment as align_mod

        units = [f"u{i}" for i in range(4)]
        inv = UnitInventory(units)
        cfg = Config()
        cfg.model.state_num = 5
        cfg.model.mix_level = 2
        cfg.model.max_mix_level = 2
        cfg.frontend.dct_num = 2
        cfg.train.max_label_len = 4
        cfg.train.smem = False
        d = cfg.frontend.feat_dim

        emb = rng.normal(size=(len(units), d)).astype(np.float32) * 3
        b, t = 24, 32
        labels = rng.integers(0, 4, size=(b, 4)).astype(np.int32)
        lens = np.full((b,), 4, np.int32)
        xs = np.concatenate([
            np.repeat(emb[labels[i]], t // 4, axis=0)[None]
            for i in range(b)
        ]).astype(np.float32)
        xs += rng.normal(size=xs.shape).astype(np.float32) * 0.3
        masks = np.ones((b, t), bool)
        batches = [Batch(feats=xs, t_masks=masks, labels=labels,
                         label_lens=lens)]

        def train_with_cap(cap_divisor):
            tr = Trainer(cfg, inv)
            orig = align_mod.group_frames_by_senone

            def capped(*args, **kw):
                kw["max_frames_per_senone"] = max(
                    8, kw["max_frames_per_senone"] // cap_divisor)
                return orig(*args, **kw)

            align_mod_group = align_mod.group_frames_by_senone
            try:
                align_mod.group_frames_by_senone = capped
                tr.auto(batches, t=2, mode=1, init=True)
            finally:
                align_mod.group_frames_by_senone = align_mod_group
            return tr.history[-1]["loglik"]

        ll_full = train_with_cap(1)
        ll_quarter = train_with_cap(4)
        # subsampling is uniform: quality must not collapse
        assert ll_quarter >= ll_full - 0.05 * abs(ll_full), \
            (ll_full, ll_quarter)


class TestDeviceNbest:
    def test_nbest_distinct_and_ordered(self, rng):
        """return_nbest > 1 must yield genuinely distinct word
        sequences in descending score order, with the plausible
        alternative (the confusable transcription) present."""
        inv, bank, flat, feats_for = _embedding_world(rng, overlap=0.7)
        dec = DeviceBeamDecoder(bank, flat)
        x = feats_for(["你好"], noise=0.5)
        hyps = dec.decode(x, return_nbest=5)
        assert len(hyps) >= 2, [h.words for h in hyps]
        seqs = [h.words for h in hyps]
        assert len(set(seqs)) == len(seqs)          # distinct
        scores = [h.score for h in hyps]
        assert scores == sorted(scores, reverse=True)
        # the compositional alternative ("你" + "好") competes with the
        # compound; n-best must surface both readings
        assert ("你好",) in seqs and ("你", "好") in seqs, seqs
