"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from poccala_tpu.ops.gmm_score import gmm_log_scores
from poccala_tpu.ops.pallas.gmm_score_tpu import (
    gmm_log_scores_fast,
    gmm_log_scores_pallas,
)


def make_inputs(rng, s=20, m=4, d=13, t=100):
    means = jnp.asarray(rng.normal(size=(s, m, d)).astype(np.float32))
    log_var = jnp.asarray(rng.uniform(-1, 1, size=(s, m, d)).astype(np.float32))
    w = rng.uniform(0.1, 1, size=(s, m))
    w /= w.sum(1, keepdims=True)
    log_w = jnp.log(jnp.asarray(w.astype(np.float32)))
    x = jnp.asarray(rng.normal(size=(t, d)).astype(np.float32))
    return x, means, log_var, log_w


class TestPallasGmmScore:
    def test_matches_xla_interpret(self, rng):
        """Interpret mode validates the kernel logic off-TPU, including
        padding of non-tile-aligned T and S."""
        x, means, log_var, log_w = make_inputs(rng, s=20, m=4, d=13, t=100)
        want = np.asarray(gmm_log_scores(x, means, log_var, log_w))
        got = np.asarray(
            gmm_log_scores_pallas(
                x, means, log_var, log_w, t_tile=64, s_tile=16,
                interpret=True,
            )
        )
        assert got.shape == want.shape
        assert np.allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_reference_normalizer_interpret(self, rng):
        x, means, log_var, log_w = make_inputs(rng, s=8, m=2, d=7, t=32)
        want = np.asarray(
            gmm_log_scores(x, means, log_var, log_w, normalizer="reference")
        )
        got = np.asarray(
            gmm_log_scores_pallas(
                x, means, log_var, log_w, normalizer="reference",
                t_tile=32, s_tile=8, interpret=True,
            )
        )
        assert np.allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_fast_dispatch_cpu_fallback(self, rng):
        """On CPU the fast path must route to the XLA implementation."""
        assert jax.default_backend() == "cpu"
        x, means, log_var, log_w = make_inputs(rng)
        want = np.asarray(gmm_log_scores(x, means, log_var, log_w))
        got = np.asarray(gmm_log_scores_fast(x, means, log_var, log_w))
        assert np.allclose(got, want, rtol=1e-5)
