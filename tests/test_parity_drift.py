"""Diagnosis of the round-3 flagship parity drift (VERDICT r3 weak #4).

``WER_r03.json`` reported ``max_rel_loglik_diff = 1.1e-2`` against the
executed reference LHMM while its siblings hit 5e-6/8e-7 with the same
machinery.  Cause, pinned here: **f32 forward accumulation error scales
with the magnitude of the running alphas**.  The flagship's aggressively
tied bank (312 of 365 target senones) had more floor-variance mixtures,
whose log-densities reach 1e2–1e4 per frame; over a 512-frame utterance
the alphas grow to ~1e5 and the naive f32 recursion loses
``eps_f32 · |alpha|`` per step — whole nats, i.e. 1e-2 relative to a
small final loglik.  The algorithm itself is exact: a float64 oracle of
the identical recursion matches the executed reference to ~1e-12 at any
magnitude.

The production ``forward_log`` now renormalizes the carried alpha per
step and accumulates the shift with Kahan compensation, cutting the
drift 8–20× at flagship-like magnitudes; the WER harness
(``benchmarks/wer_run.py``) reports algorithmic parity (f64 oracle vs
reference) and f32 precision drift as separate fields."""

import numpy as np
import pytest
import sys

import jax.numpy as jnp

from poccala_tpu.ops import hmm
from poccala_tpu.utils.logmath import NEG_INF

from .oracles import forward_oracle, np_logsumexp

REF = "/root/reference"


def _ltr_problem(n, t, scale, seed=0):
    """Left-to-right chain with log_b magnitudes ~``scale`` (the
    floor-variance regime when scale is hundreds)."""
    rng = np.random.default_rng(seed)
    log_a = np.full((n, n), NEG_INF)
    for i in range(n):
        log_a[i, i] = np.log(0.5)
        if i + 1 < n:
            log_a[i, i + 1] = np.log(0.5)
        else:
            log_a[i, i] = 0.0
    log_pi = np.full(n, NEG_INF)
    log_pi[0] = 0.0
    log_b = (rng.normal(size=(t, n)) * scale).astype(np.float32)
    return log_a, log_pi, log_b.astype(np.float64)


def _naive_f32_forward(log_a, log_pi, log_b):
    """The pre-fix recursion: f32, no renormalization."""
    alpha = (log_pi + log_b[0]).astype(np.float32)
    a32 = log_a.astype(np.float32)
    for bt in log_b[1:].astype(np.float32):
        alpha = np.maximum(
            np_logsumexp(alpha[:, None] + a32, axis=0) + bt, NEG_INF
        ).astype(np.float32)
    return float(np_logsumexp(alpha))


class TestParityDrift:
    def test_f64_oracle_matches_reference_at_any_magnitude(self):
        """Algorithmic parity: our recursion in f64 == the executed
        reference forward, even in the floor-variance regime."""
        if not __import__("os").path.isdir(f"{REF}/StatisticalModel"):
            pytest.skip("reference absent")
        sys.path.insert(0, REF)
        from StatisticalModel import util as ref_util
        from StatisticalModel.LHMM import LHMM as RefLHMM

        class _Log:
            def note(self, *a, **k):
                pass

        for scale in (5.0, 270.0):
            log_a, log_pi, log_b = _ltr_problem(40, 200, scale)
            ll64 = np_logsumexp(
                forward_oracle(log_a, log_pi, log_b.T)[:, -1])
            n = len(log_pi)
            states = {i: i for i in range(n)}
            a_lin = np.where(log_a > NEG_INF / 2, np.exp(log_a), 0.0)
            pi_lin = np.where(log_pi > NEG_INF / 2, np.exp(log_pi), 0.0)
            ref = RefLHMM(states, n, _Log(), t=[len(log_b)],
                          transmat=a_lin, probmat=[log_b.T], pi=pi_lin)
            ref.add_data([np.zeros((len(log_b), 1))])
            ref._LHMM__generate_result()
            ref_ll = ref_util.log_sum_exp(ref._LHMM__result_f[0][:, -1])
            assert abs(ll64 - ref_ll) <= 1e-8 * max(abs(ref_ll), 1.0), scale

    def test_f32_drift_scales_with_magnitude_and_renorm_fixes_it(self):
        """The measured mechanism: naive f32 drifts ~eps·|alpha| per
        step (whole nats in the floor-variance regime); the production
        renormalized+Kahan kernel stays an order of magnitude closer to
        the f64 oracle."""
        log_a, log_pi, log_b = _ltr_problem(60, 500, 270.0)
        ll64 = np_logsumexp(forward_oracle(log_a, log_pi, log_b.T)[:, -1])
        naive = _naive_f32_forward(log_a, log_pi, log_b)
        naive_err = abs(naive - ll64)
        _, ll_prod = hmm.forward_log(
            jnp.asarray(log_a, jnp.float32), jnp.asarray(log_pi, jnp.float32),
            jnp.asarray(log_b, jnp.float32), jnp.ones(len(log_b), bool))
        prod_err = abs(float(ll_prod) - ll64)
        # the naive recursion loses a visible fraction of a nat here
        assert naive_err > 0.05, naive_err
        assert prod_err < naive_err / 3, (prod_err, naive_err)
        assert prod_err < 0.1, prod_err

    def test_renormalized_alphas_still_absolute(self):
        """forward_log's returned log_alpha rows are the absolute
        values (callers build posteriors from them), bit-comparable to
        the f64 oracle at moderate magnitudes."""
        log_a, log_pi, log_b = _ltr_problem(12, 40, 2.0)
        alphas64 = forward_oracle(log_a, log_pi, log_b.T).T  # [T, N]
        ll64 = np_logsumexp(alphas64[-1])
        la, ll = hmm.forward_log(
            jnp.asarray(log_a, jnp.float32), jnp.asarray(log_pi, jnp.float32),
            jnp.asarray(log_b, jnp.float32), jnp.ones(len(log_b), bool))
        la = np.asarray(la)
        live = alphas64 > NEG_INF / 2
        assert np.allclose(la[live], alphas64[live], atol=5e-4)
        assert np.all(la[~live] <= NEG_INF / 2)
        assert np.isclose(float(ll), ll64, atol=1e-4)
