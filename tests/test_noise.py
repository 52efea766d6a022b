"""Babble-noise synthesis + SNR mixing (the noisy-channel eval tools).

``make_babble_track`` overlap-adds independent synthetic talkers;
``mix_at_snr`` injects it at a target SNR measured over speech-active
samples.  These pin the SNR arithmetic (achieved ≈ requested), the
determinism, and that the full pipeline still decodes a babble-mixed
utterance (the VAD sees noise in its estimation window and must cope).
"""

import numpy as np

from poccala_tpu.io.synth_formant import (Speaker, make_babble_track,
                                          mix_at_snr, synth_utterance)
from poccala_tpu.lexicon import PinYin


def _vocab_py():
    table = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"], "天": ["tian1"]}
    return ["你好", "马", "天"], PinYin(table)


class TestBabble:
    def test_track_shape_and_energy(self):
        words, py = _vocab_py()
        tr = make_babble_track(words, py, duration_s=2.0, n_talkers=3,
                               seed=0)
        assert tr.shape == (32000,)
        assert tr.dtype == np.float32
        # RMS-normalized and actually nonzero everywhere-ish
        assert abs(float(np.sqrt(np.mean(tr.astype(np.float64) ** 2)))
                   - 1.0) < 1e-3
        # multiple talkers -> few long dead gaps
        frame = tr[: 32000 - 32000 % 400].reshape(-1, 400)
        assert np.mean(np.abs(frame).max(axis=1) > 1e-3) > 0.8

    def test_deterministic(self):
        words, py = _vocab_py()
        a = make_babble_track(words, py, 0.5, n_talkers=2, seed=7)
        b = make_babble_track(words, py, 0.5, n_talkers=2, seed=7)
        assert np.array_equal(a, b)


class TestMixAtSnr:
    def _speech(self, seed=0):
        rng = np.random.default_rng(seed)
        spk = Speaker.random(rng)
        return synth_utterance([["n", "i3"], ["h", "ao3"]], spk, rng)

    def test_achieved_snr(self):
        sig = self._speech()
        words, py = _vocab_py()
        babble = make_babble_track(words, py, 3.0, n_talkers=3, seed=1)
        for target in (0.0, 10.0, 20.0):
            rng = np.random.default_rng(42)
            noisy = mix_at_snr(sig, babble, target, rng)
            added = noisy.astype(np.float64) - np.asarray(sig, np.float64)
            active = np.abs(sig) > 0.02 * np.max(np.abs(sig))
            p_s = np.mean(np.asarray(sig, np.float64)[active] ** 2)
            p_n = np.mean(added ** 2)
            achieved = 10 * np.log10(p_s / p_n)
            assert abs(achieved - target) < 1.0, (target, achieved)

    def test_short_noise_tiles(self):
        sig = self._speech()
        short = np.sin(np.arange(1000) * 0.3).astype(np.float32)
        noisy = mix_at_snr(sig, short, 15.0, np.random.default_rng(0))
        assert noisy.shape == np.shape(sig)
        assert np.isfinite(noisy).all()

    def test_int16_input_survives_pipeline(self, tmp_path):
        """int16 WAV round trip + frontend + VAD on babble-mixed audio."""
        from poccala_tpu.config import Config
        from poccala_tpu.io import wav as wav_io
        from poccala_tpu.ops import vad as vad_ops
        from poccala_tpu.ops.frontend import Frontend

        sig = self._speech()
        words, py = _vocab_py()
        babble = make_babble_track(words, py, 2.0, n_talkers=3, seed=2)
        noisy = mix_at_snr(sig, babble, 10.0, np.random.default_rng(3))
        p = str(tmp_path / "noisy.wav")
        wav_io.write_wav(p, noisy, 16000)
        data, rate = wav_io.load_wav(p)
        assert rate == 16000 and data.dtype == np.int16
        cfg = Config()
        fe = Frontend(cfg.frontend)
        feats, mask = fe.mfcc(wav_io.preprocess_signal(data))
        keep = vad_ops.vad_mask(feats, mask)
        packed, n = vad_ops.apply_mask(feats, keep)
        # VAD keeps a sane speech fraction despite babble in its
        # noise-estimation window
        assert 0 < int(n) <= int(np.asarray(mask).sum())
        assert np.isfinite(np.asarray(packed)[: int(n)]).all()


class TestSpectralSubtraction:
    """Boll-style magnitude spectral subtraction
    (frontend.spectral_subtraction): noise estimated from the VAD
    lead-in window, over-subtracted, floored."""

    def _feats(self, sig, ss, **kw):
        import dataclasses

        from poccala_tpu.config import FrontendConfig
        from poccala_tpu.ops.frontend import Frontend

        cfg = FrontendConfig(vad=False, spectral_subtraction=ss, **kw)
        fe = Frontend(cfg)
        f, m = fe.mfcc(sig.astype(np.float32))
        return np.asarray(f), np.asarray(m)

    def _tone_plus_noise(self, rng, f0=1000.0, n=16000, snr_amp=0.25):
        t = np.arange(n) / 16000.0
        noise = rng.normal(size=n) * 400.0
        sig = np.zeros(n)
        # lead-in: noise only (the estimation window), then tone+noise
        sig[:4000] = noise[:4000]
        sig[4000:] = 4000.0 * np.sin(2 * np.pi * f0 * t[4000:]) \
            + noise[4000:]
        return sig

    def test_flag_off_is_unchanged(self, rng):
        sig = self._tone_plus_noise(rng)
        f_off, _ = self._feats(sig, ss=False)
        f_off2, _ = self._feats(sig, ss=False)
        assert np.allclose(f_off, f_off2)

    def test_noise_energy_drops_speech_survives(self, rng):
        """After subtraction the noise-only region's frame energy (c0)
        drops by nats while the tone region's drops far less — the
        SNR-improvement property the flag exists for."""
        sig = self._tone_plus_noise(rng)
        f_off, m = self._feats(sig, ss=False)
        f_on, _ = self._feats(sig, ss=True)
        t_true = int(m.sum())
        # frames after the estimation window but before the tone starts
        # (lead-in is 4000 samples = 19 frames at 25ms/50%): noise-only
        noise_frames = slice(16, 19)
        tone_frames = slice(30, t_true - 2)
        d_noise = (f_off[noise_frames, 0] - f_on[noise_frames, 0]).mean()
        d_tone = (f_off[tone_frames, 0] - f_on[tone_frames, 0]).mean()
        assert d_noise > 1.0, d_noise          # nats of c0 removed
        assert d_tone < d_noise * 0.5, (d_tone, d_noise)

    def test_numpy_oracle_static_cepstra(self, rng):
        """Exact NumPy re-computation of the textbook frontend WITH
        spectral subtraction (pre-emphasis -> frames -> hamming ->
        |DFT| -> SS -> mel -> log -> DCT -> energy c0), compared on the
        static cepstra — the repo's new-kernel oracle rule.  A sign /
        axis / broadcast regression in the noise average or the floor
        would fail here, unlike the property tests."""
        from poccala_tpu.config import FrontendConfig
        from poccala_tpu.ops.frontend import Frontend, num_frames

        cfg = FrontendConfig(vad=False, spectral_subtraction=True,
                             ss_alpha=1.5, ss_floor=0.05)
        fe = Frontend(cfg)
        sig = self._tone_plus_noise(rng).astype(np.float32)
        f_dev, m = fe.mfcc(sig)
        f_dev = np.asarray(f_dev, np.float64)
        t_true = int(np.asarray(m).sum())

        # ---- independent numpy pipeline (float64)
        pe = np.append(sig[1:] - cfg.pre_emphasis * sig[:-1],
                       0.0).astype(np.float64)
        pe[len(sig) - 1] = 0.0
        fs, st = cfg.frame_size, cfg.frame_step
        t_pad = num_frames(len(sig), fs, st)
        pad = (t_pad - 1) * st + fs - len(pe)
        pe = np.pad(pe, (0, max(pad, 0)))
        frames = np.stack([pe[i * st: i * st + fs]
                           for i in range(t_pad)])
        n = np.arange(fs)
        win = frames * ((1 - cfg.hamming_alpha) - cfg.hamming_alpha
                        * np.cos(2 * np.pi * n / (fs - 1)))[None, :]
        spec = np.abs(np.fft.rfft(win, n=cfg.nfft, axis=-1))
        n_noise = min(cfg.vad_sample_size, t_true)
        noise = spec[:n_noise].mean(axis=0)
        spec = np.maximum(spec - cfg.ss_alpha * noise[None, :],
                          cfg.ss_floor * spec)
        energy = np.sum(spec * spec, axis=-1)
        from poccala_tpu.ops.frontend import (dct_matrix,
                                              mel_filterbank_matrix)

        fbank = spec @ mel_filterbank_matrix(cfg).astype(np.float64)
        ceps = np.log(np.maximum(fbank, 1e-10)) \
            @ dct_matrix(cfg).astype(np.float64)
        ceps[:, 0] = np.log(np.maximum(energy, 1e-10))

        err = np.abs(f_dev[:t_true, : cfg.dct_num]
                     - ceps[:t_true]).max()
        assert err < 2e-3, err

    def test_floor_bounds_subtraction(self, rng):
        """With a huge over-subtraction factor the floor keeps the
        magnitude at ss_floor of the noisy one: features stay finite
        and bounded below."""
        sig = self._tone_plus_noise(rng)
        f_on, m = self._feats(sig, ss=True, ss_alpha=100.0,
                              ss_floor=0.02)
        t_true = int(m.sum())
        assert np.isfinite(f_on[:t_true]).all()
