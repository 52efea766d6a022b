"""True parity tests against the *actual reference implementation*.

The reference's statistical core (``StatisticalModel/util.py``,
``LHMM.py``, ``Clustering.py``) is pure NumPy and imports cleanly without
the audio-device dependencies, so these tests execute the reference code
itself (read-only, from /root/reference) and require allclose
log-likelihoods and identical Viterbi paths — the BASELINE.json parity
criterion, not just oracle reimplementations.

Skipped automatically when the reference tree is not present.
"""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "StatisticalModel")),
    reason="reference tree not available",
)

if os.path.isdir(os.path.join(REF, "StatisticalModel")):
    sys.path.insert(0, REF)
    from StatisticalModel import util as ref_util  # noqa: E402
    from StatisticalModel.LHMM import LHMM as RefLHMM  # noqa: E402
    from StatisticalModel.Clustering import Clustering as RefClustering  # noqa: E402

from poccala_tpu.ops import gmm_score, hmm  # noqa: E402
from poccala_tpu.utils import logmath  # noqa: E402


class _Log:
    def note(self, *a, **k):
        pass


class TestUtilParity:
    def test_gaussian_function(self, rng):
        d = 13
        y = rng.normal(size=d)
        mean = rng.normal(size=d)
        var = rng.uniform(0.5, 2.0, size=d)
        want = ref_util.gaussian_function(
            y.copy(), mean, np.diag(var), d, log=True
        )
        got = float(logmath.diag_gaussian_logpdf(
            jnp.asarray(y), jnp.asarray(mean), jnp.log(jnp.asarray(var)),
            normalizer="reference",
        ))
        assert np.allclose(got, want, rtol=1e-5)

    def test_log_sum_exp(self, rng):
        v = rng.normal(size=32) * 5
        assert np.allclose(
            float(logmath.logsumexp(jnp.asarray(v))),
            ref_util.log_sum_exp(v),
            rtol=1e-6,
        )


class TestGmmScoreParity:
    def test_point_matches(self, rng):
        """Our batched scorer vs the reference GMM.point on real
        reference objects (Clustering.py:740-767)."""
        d, m = 7, 3
        mean = rng.normal(size=(m, d))
        var = rng.uniform(0.5, 2.0, size=(m, d))
        cov = np.stack([np.diag(var[i]) for i in range(m)])
        alpha = rng.uniform(0.2, 1.0, size=m)
        alpha /= alpha.sum()
        g = RefClustering.GMM(log=_Log(), dimension=d, mix_level=m,
                              mean=mean, covariance=cov, alpha=alpha)
        xs = rng.normal(size=(9, d))
        want = np.array([g.point(x, log=True) for x in xs])
        got = np.asarray(gmm_score.gmm_log_scores(
            jnp.asarray(xs.astype(np.float32)),
            jnp.asarray(mean.astype(np.float32))[None],
            jnp.log(jnp.asarray(var.astype(np.float32)))[None],
            jnp.log(jnp.asarray(alpha.astype(np.float32)))[None],
            normalizer="reference",
        ))[:, 0]
        assert np.allclose(got, want, rtol=1e-4, atol=1e-4)


class TestLhmmParity:
    def _model(self, rng, n=5, t=12):
        A = rng.uniform(0.1, 1.0, size=(n, n))
        A /= A.sum(1, keepdims=True)
        pi = rng.uniform(0.1, 1.0, size=n)
        pi /= pi.sum()
        prob = rng.normal(size=(n, t))  # log observation matrix
        return A, pi, prob

    def test_forward_backward_vs_reference(self, rng):
        """Run the reference's private forward/backward (LHMM.py:335-366)
        and compare log-alphas/betas and the total log-likelihood."""
        n, t = 5, 12
        A, pi, prob = self._model(rng, n, t)
        states = {i: "s" for i in range(n)}
        ref = RefLHMM(states, n, _Log(), t=[t], transmat=A,
                      probmat=[prob], pi=pi)
        ref.add_data([np.zeros((t, 1))])
        ref._LHMM__generate_result()
        ref_alpha = ref._LHMM__result_f[0]   # [N, T]
        ref_beta = ref._LHMM__result_b[0]
        ref_ll = ref_util.log_sum_exp(ref_alpha[:, -1])

        la, ll = hmm.forward_log(
            jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi)),
            jnp.asarray(prob.T), jnp.ones(t, bool),
        )
        lb = hmm.backward_log(
            jnp.log(jnp.asarray(A)), jnp.asarray(prob.T), jnp.ones(t, bool)
        )
        assert np.allclose(np.asarray(la).T, ref_alpha, rtol=1e-4, atol=1e-4)
        assert np.allclose(np.asarray(lb).T, ref_beta, rtol=1e-4, atol=1e-4)
        assert np.allclose(float(ll), ref_ll, rtol=1e-6)

    def test_viterbi_path_identical(self, rng):
        """LHMM.viterbi (LHMM.py:546-609) run directly; paths must be
        identical and scores allclose."""
        for seed in range(5):
            r = np.random.default_rng(seed)
            n, t = 6, 15
            A, pi, prob = self._model(r, n, t)
            states = {i: i for i in range(n)}
            want_point, want_path = RefLHMM.viterbi(
                _Log(), states, A, prob, pi
            )
            score, path, _ = hmm.viterbi_log(
                jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi)),
                jnp.asarray(prob.T), jnp.ones(t, bool),
            )
            assert np.allclose(float(score), want_point, rtol=1e-5), seed
            assert np.array_equal(np.asarray(path), want_path.astype(int)), seed

    def test_viterbi_left_to_right(self, rng):
        """Parity on the reference's actual unit topology (zero-prob
        transitions -> -inf handling)."""
        from poccala_tpu.models.senone_bank import unit_transmat

        n, t = 5, 20
        A = unit_transmat(n)
        pi = np.full(n, 1.0 / n)
        prob = rng.normal(size=(n, t))
        prob[0] = 0.0
        prob[-1] = -np.inf
        states = {i: i for i in range(n)}
        want_point, want_path = RefLHMM.viterbi(_Log(), states, A, prob, pi)
        from poccala_tpu.utils.logmath import NEG_INF

        logA = jnp.asarray(np.where(A > 0, np.log(np.maximum(A, 1e-300)), NEG_INF))
        log_pi = jnp.log(jnp.asarray(pi))
        prob_j = jnp.asarray(np.where(np.isfinite(prob), prob, NEG_INF).T)
        score, path, _ = hmm.viterbi_log(logA, log_pi, prob_j,
                                         jnp.ones(t, bool))
        assert np.array_equal(np.asarray(path), want_path.astype(int))
        assert np.allclose(float(score), want_point, rtol=1e-5)
