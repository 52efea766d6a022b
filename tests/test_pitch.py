"""Pitch (F0) feature column: oracle accuracy on known-F0 signals,
voicing gating on noise, feature-dimension plumbing, and tone
separability on formant-synthesized minimal pairs."""

import dataclasses

import numpy as np
import pytest

from poccala_tpu.config import Config, FrontendConfig
from poccala_tpu.ops.frontend import Frontend


class TestPitchFeature:
    def test_known_f0_recovered(self, rng):
        cfg = FrontendConfig(pitch=True)
        fe = Frontend(cfg)
        rate = cfg.sample_rate
        t = np.arange(int(1.0 * rate)) / rate
        for f0 in (90.0, 140.0, 220.0, 320.0):
            # pulse-ish harmonic source (voiced speech analog)
            sig = sum(np.sin(2 * np.pi * k * f0 * t) / k
                      for k in range(1, 9))
            sig = (sig * 3000).astype(np.float32)
            feats, mask = fe.mfcc(sig)
            feats = np.asarray(feats)[np.asarray(mask)]
            pitch_col = feats[:, cfg.dct_num]   # appended after cepstra
            # interior frames: voiced, correct octave-log value
            mid = pitch_col[5:-5]
            assert (np.abs(mid) > 0).mean() > 0.9, f0
            want = cfg.pitch_scale * np.log2(f0 / 125.0)
            got = np.median(mid[np.abs(mid) > 0])
            assert abs(got - want) < 0.6, (f0, got, want)

    def test_noise_is_unvoiced(self, rng):
        cfg = FrontendConfig(pitch=True)
        fe = Frontend(cfg)
        sig = (rng.normal(size=16000) * 2000).astype(np.float32)
        feats, mask = fe.mfcc(sig)
        pitch_col = np.asarray(feats)[np.asarray(mask)][:, cfg.dct_num]
        assert (pitch_col == 0).mean() > 0.8

    def test_feat_dim_plumbing(self):
        cfg = FrontendConfig(pitch=True)
        assert cfg.feat_dim == (cfg.dct_num + 1) * 3
        fe = Frontend(cfg)
        sig = np.zeros(8000, np.float32)
        feats, _ = fe.mfcc(sig)
        assert feats.shape[-1] == cfg.feat_dim

    def test_tone_contours_recovered(self, rng):
        """Formant-synthesized tone minimal pairs (same segments,
        different tone): the pitch column must recover the lexical-tone
        F0 contour — flat for tone 1, clearly falling for tone 4,
        clearly rising for tone 2.  (The Δ of this column is what the
        GMMs then model; MFCC alone carries none of it.)"""
        from poccala_tpu.io.synth_formant import Speaker, synth_utterance

        cfg = FrontendConfig(pitch=True)
        fe = Frontend(cfg)
        spk = Speaker(f0_base=160.0)

        def slope(tone):
            slopes = []
            for trial in range(3):
                sig = synth_utterance([["m", f"a{tone}"]], spk,
                                      np.random.default_rng(trial))
                feats, mask = fe.mfcc(sig)
                p = np.asarray(feats)[np.asarray(mask)][:, cfg.dct_num]
                v = np.nonzero(p)[0]
                assert len(v) >= 8, (tone, len(v))
                # octaves per frame over the voiced span
                fit = np.polyfit(v, p[v] / cfg.pitch_scale, 1)
                slopes.append(fit[0])
            return float(np.mean(slopes))

        s1, s2, s4 = slope(1), slope(2), slope(4)
        assert abs(s1) < 0.01, s1                 # high flat
        assert s2 > 0.008, s2                     # rising
        assert s4 < -0.008, s4                    # falling
        assert s2 - s4 > 0.02, (s2, s4)
