"""Fused Pallas frontend kernel vs the XLA pipeline and the oracle.

Runs in Pallas interpreter mode on the CPU test mesh; the compiled path
is exercised on the real chip by bench.py / benchmarks/scaling.py.
"""

import numpy as np
import pytest

from poccala_tpu.config import FrontendConfig
from poccala_tpu.ops.frontend import Frontend

from . import oracles
from .test_frontend import synth_speechlike


def _batch(b=3, n=16000):
    sigs = np.stack([synth_speechlike(n, seed=s) for s in range(b)])
    ns = np.full((b,), n, np.int64)
    return sigs, ns


@pytest.mark.parametrize("quirks", [True, False])
def test_matches_xla_pipeline(quirks):
    cfg = FrontendConfig(reference_quirks=quirks)
    fe = Frontend(cfg)
    sigs, ns = _batch()
    want, wmask = fe.mfcc_batch(sigs, ns)            # XLA path on CPU
    got, gmask = fe.batch_impl(sigs, ns, interpret=True)
    assert np.array_equal(np.asarray(gmask), np.asarray(wmask))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-4
    )


def test_matches_reference_oracle_quirks():
    cfg = FrontendConfig(reference_quirks=True)
    fe = Frontend(cfg)
    sigs, ns = _batch(b=2)
    got, mask = fe.batch_impl(sigs, ns, interpret=True)
    for i in range(2):
        want = oracles.mfcc_quirk(sigs[i].astype(np.float64), log_eps=1e-10)
        assert np.allclose(np.asarray(got[i]), want, rtol=2e-3, atol=2e-3)


def test_ragged_lengths_padding_invariance():
    """Padded entries must match their unpadded single-utterance run."""
    cfg = FrontendConfig(reference_quirks=True)
    fe = Frontend(cfg)
    n_full, n_short = 16000, 11000
    sig = synth_speechlike(n_short, seed=7)
    padded = np.zeros((1, n_full), np.float32)
    padded[0, :n_short] = sig
    got, gmask = fe.batch_impl(padded, np.array([n_short]), interpret=True)
    want, wmask = fe.mfcc(sig)
    t = int(np.asarray(wmask).sum())
    assert int(np.asarray(gmask)[0].sum()) == t
    np.testing.assert_allclose(
        np.asarray(got)[0, :t], np.asarray(want)[:t], rtol=2e-5, atol=2e-4
    )
    # padding region zeroed
    assert np.all(np.asarray(got)[0, t:] == 0.0)


def test_non_tile_multiple_frame_count():
    """T not a multiple of t_tile exercises the tail-tile padding."""
    cfg = FrontendConfig(reference_quirks=False)
    fe = Frontend(cfg)
    sigs, ns = _batch(b=2, n=9000)   # 44 frames << 128
    want, _ = fe.mfcc_batch(sigs, ns)
    got, _ = fe.batch_impl(sigs, ns, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-4
    )


def test_auto_gating_off_on_cpu():
    fe = Frontend(FrontendConfig())
    assert not fe.pallas_enabled()
    fe2 = Frontend(FrontendConfig(use_pallas=True))
    assert fe2.pallas_enabled()
