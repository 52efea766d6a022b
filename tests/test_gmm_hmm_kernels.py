"""GMM scoring and HMM DP kernels vs NumPy oracles."""

import numpy as np
import pytest
import jax.numpy as jnp

from poccala_tpu.ops import gmm_score, hmm
from poccala_tpu.utils.logmath import NEG_INF

from . import oracles


def random_gmm(rng, s=6, m=4, d=13):
    means = rng.normal(size=(s, m, d)) * 3
    var = rng.uniform(0.5, 2.0, size=(s, m, d))
    w = rng.uniform(0.2, 1.0, size=(s, m))
    w /= w.sum(axis=1, keepdims=True)
    return means, var, w


class TestGmmScore:
    @pytest.mark.parametrize("normalizer", ["textbook", "reference"])
    def test_matches_pointwise_oracle(self, rng, normalizer):
        """Oracle: GMM.point(x, log=True) = LSE_m(log α_m + log N_m(x))
        (Clustering.py:740-767) with util.gaussian_function numerics."""
        t, s, m, d = 11, 6, 4, 13
        means, var, w = random_gmm(rng, s, m, d)
        x = rng.normal(size=(t, d)) * 3
        got = np.asarray(
            gmm_score.gmm_log_scores(
                jnp.asarray(x), jnp.asarray(means), jnp.log(jnp.asarray(var)),
                jnp.log(jnp.asarray(w)), normalizer=normalizer,
            )
        )
        want = np.zeros((t, s))
        for ti in range(t):
            for si in range(s):
                comps = [
                    np.log(w[si, mi])
                    + oracles.np_logsumexp([0.0])  # no-op, keep fp64 path
                    + _gauss_oracle(x[ti], means[si, mi], var[si, mi], normalizer)
                    for mi in range(m)
                ]
                want[ti, si] = oracles.np_logsumexp(np.array(comps))
        assert np.allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_component_scores_and_weights_mask(self, rng):
        t, s, m, d = 5, 3, 4, 7
        means, var, w = random_gmm(rng, s, m, d)
        logw = gmm_score.masked_log_w(
            jnp.log(jnp.asarray(w)), jnp.array([4, 2, 1])
        )
        scores, comp = gmm_score.gmm_log_scores(
            jnp.asarray(rng.normal(size=(t, d))),
            jnp.asarray(means), jnp.log(jnp.asarray(var)), logw,
            return_components=True,
        )
        assert comp.shape == (t, s, m)
        # padded mixture slots must not contribute
        assert np.all(np.asarray(comp[:, 1, 2:]) <= NEG_INF / 2)
        # scores equal LSE of active components only
        want = oracles.np_logsumexp(np.asarray(comp[:, 1, :2]), axis=-1)
        assert np.allclose(np.asarray(scores[:, 1]), want, rtol=1e-5)


def _gauss_oracle(x, mean, var, normalizer):
    d = len(x)
    diff = x - mean
    quad = -0.5 * np.sum(diff * diff / var)
    if normalizer == "reference":
        return quad - 0.5 * d * np.log(2 * np.pi) - 0.5 * np.sum(var)
    return quad - 0.5 * d * np.log(2 * np.pi) - 0.5 * np.sum(np.log(var))


def random_hmm(rng, n=5, left_to_right=False):
    if left_to_right:
        A = np.zeros((n, n))
        A[0, 1] = 1.0
        for j in range(1, n - 1):
            A[j, j] = 0.5
            A[j, j + 1] = 0.5
        pi = np.zeros(n)
        pi[0] = 1.0
    else:
        A = rng.uniform(0.1, 1.0, size=(n, n))
        A /= A.sum(axis=1, keepdims=True)
        pi = rng.uniform(0.1, 1.0, size=n)
        pi /= pi.sum()
    return A, pi


class TestDenseKernels:
    def test_forward_matches_oracle(self, rng):
        n, t = 5, 9
        A, pi = random_hmm(rng)
        log_b = rng.normal(size=(t, n))
        la, ll = hmm.forward_log(
            jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi)),
            jnp.asarray(log_b), jnp.ones(t, bool),
        )
        want = oracles.forward_oracle(np.log(A), np.log(pi), log_b.T)
        assert np.allclose(np.asarray(la), want.T, rtol=1e-5, atol=1e-5)
        assert np.allclose(float(ll), oracles.np_logsumexp(want[:, -1]), rtol=1e-6)

    def test_backward_matches_oracle(self, rng):
        n, t = 4, 7
        A, _ = random_hmm(rng, n)
        log_b = rng.normal(size=(t, n))
        lb = hmm.backward_log(
            jnp.log(jnp.asarray(A)), jnp.asarray(log_b), jnp.ones(t, bool)
        )
        want = oracles.backward_oracle(np.log(A), log_b.T)
        assert np.allclose(np.asarray(lb), want.T, rtol=1e-5, atol=1e-5)

    def test_forward_backward_consistency(self, rng):
        """LSE(alpha_t + beta_t) must equal the total loglik at every t."""
        n, t = 6, 12
        A, pi = random_hmm(rng, n)
        log_b = rng.normal(size=(t, n))
        mask = jnp.ones(t, bool)
        la, ll = hmm.forward_log(
            jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi)),
            jnp.asarray(log_b), mask)
        lb = hmm.backward_log(jnp.log(jnp.asarray(A)), jnp.asarray(log_b), mask)
        per_t = oracles.np_logsumexp(np.asarray(la + lb), axis=1)
        assert np.allclose(per_t, float(ll), rtol=1e-5)

    def test_viterbi_matches_oracle(self, rng):
        n, t = 5, 10
        A, pi = random_hmm(rng)
        log_b = rng.normal(size=(t, n))
        score, path, _ = hmm.viterbi_log(
            jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi)),
            jnp.asarray(log_b), jnp.ones(t, bool),
        )
        want_score, want_path = oracles.viterbi_oracle(A, log_b.T, pi)
        assert np.allclose(float(score), want_score, rtol=1e-5)
        assert np.array_equal(np.asarray(path), want_path)

    def test_masking_equals_truncation(self, rng):
        n, t_true, t_pad = 5, 7, 12
        A, pi = random_hmm(rng)
        log_b = rng.normal(size=(t_pad, n))
        mask = np.arange(t_pad) < t_true
        la_p, ll_p = hmm.forward_log(
            jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi)),
            jnp.asarray(log_b), jnp.asarray(mask))
        la_s, ll_s = hmm.forward_log(
            jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi)),
            jnp.asarray(log_b[:t_true]), jnp.ones(t_true, bool))
        assert np.allclose(float(ll_p), float(ll_s), rtol=1e-6)
        assert np.allclose(np.asarray(la_p)[:t_true], np.asarray(la_s), rtol=1e-5)
        lb_p = hmm.backward_log(jnp.log(jnp.asarray(A)), jnp.asarray(log_b),
                                jnp.asarray(mask))
        lb_s = hmm.backward_log(jnp.log(jnp.asarray(A)),
                                jnp.asarray(log_b[:t_true]), jnp.ones(t_true, bool))
        assert np.allclose(np.asarray(lb_p)[:t_true], np.asarray(lb_s), rtol=1e-5)
        sc_p, path_p, _ = hmm.viterbi_log(
            jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi)),
            jnp.asarray(log_b), jnp.asarray(mask))
        sc_s, path_s, _ = hmm.viterbi_log(
            jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi)),
            jnp.asarray(log_b[:t_true]), jnp.ones(t_true, bool))
        assert np.allclose(float(sc_p), float(sc_s), rtol=1e-6)
        assert np.array_equal(np.asarray(path_p)[:t_true], np.asarray(path_s))


class TestBandedKernels:
    def _lr_model(self, rng, n_units=3, state_num=5):
        """Random left-to-right embedded-style transmat with bandwidth
        state_num-1 (upper-triangular per-unit rows)."""
        n = 2 + n_units * (state_num - 2)
        A = np.zeros((n, n))
        A[0, 1] = 1.0
        w = state_num - 1
        for j in range(1, n - 1):
            width = min(w, n - j)
            row = rng.uniform(0.1, 1.0, size=width)
            A[j, j: j + width] = row / row.sum()
        pi = rng.uniform(0.1, 1.0, size=n)
        pi /= pi.sum()
        return A, pi, w

    def test_band_roundtrip(self, rng):
        A, _, w = self._lr_model(rng)
        logA = np.where(A > 0, np.log(A, where=A > 0), NEG_INF)
        band = hmm.dense_to_band(jnp.asarray(logA), w)
        dense = np.asarray(hmm.band_to_dense(band))
        assert np.allclose(dense, logA, atol=1e-6)

    def test_banded_matches_dense(self, rng):
        A, pi, w = self._lr_model(rng)
        n = A.shape[0]
        t = 20
        log_b = rng.normal(size=(t, n))
        mask = jnp.ones(t, bool)
        logA = jnp.asarray(np.where(A > 0, np.log(A, where=A > 0), NEG_INF))
        band = hmm.dense_to_band(logA, w)
        log_pi = jnp.log(jnp.asarray(pi))

        la_d, ll_d = hmm.forward_log(logA, log_pi, jnp.asarray(log_b), mask)
        la_b, ll_b = hmm.forward_log_banded(band, log_pi, jnp.asarray(log_b), mask, w)
        assert np.allclose(float(ll_d), float(ll_b), rtol=1e-5)
        assert np.allclose(np.asarray(la_d), np.asarray(la_b), rtol=1e-4, atol=1e-4)

        lb_d = hmm.backward_log(logA, jnp.asarray(log_b), mask)
        lb_b = hmm.backward_log_banded(band, jnp.asarray(log_b), mask, w)
        assert np.allclose(np.asarray(lb_d), np.asarray(lb_b), rtol=1e-4, atol=1e-4)

        sc_d, p_d, _ = hmm.viterbi_log(logA, log_pi, jnp.asarray(log_b), mask)
        sc_b, p_b, _ = hmm.viterbi_log_banded(band, log_pi, jnp.asarray(log_b), mask, w)
        assert np.allclose(float(sc_d), float(sc_b), rtol=1e-5)
        assert np.array_equal(np.asarray(p_d), np.asarray(p_b))

    def test_end_state_back(self, rng):
        """end_states restricts the final argmax to the tail (the
        reference's end_state_back picks among the last 4, LHMM.py:586-589)."""
        A, pi, w = self._lr_model(rng)
        n = A.shape[0]
        log_b = rng.normal(size=(6, n))
        logA = jnp.asarray(np.where(A > 0, np.log(A, where=A > 0), NEG_INF))
        band = hmm.dense_to_band(logA, w)
        sc, path, delta = hmm.viterbi_log_banded(
            band, jnp.log(jnp.asarray(pi)), jnp.asarray(log_b),
            jnp.ones(6, bool), w, end_states=4)
        assert int(path[-1]) >= n - 4
        assert np.allclose(float(sc), float(delta[int(path[-1])]))

    def test_batched_banded(self, rng):
        A, pi, w = self._lr_model(rng)
        n = A.shape[0]
        b, t = 3, 15
        logA = jnp.asarray(np.where(A > 0, np.log(A, where=A > 0), NEG_INF))
        band = jnp.tile(hmm.dense_to_band(logA, w)[None], (b, 1, 1))
        log_pi = jnp.tile(jnp.log(jnp.asarray(pi))[None], (b, 1))
        log_bs = jnp.asarray(rng.normal(size=(b, t, n)))
        masks = jnp.asarray(np.arange(t)[None, :] < np.array([15, 9, 4])[:, None])
        la, ll = hmm.forward_log_banded_batch(band, log_pi, log_bs, masks, w)
        la1, ll1 = hmm.forward_log_banded(band[1], log_pi[1], log_bs[1], masks[1], w)
        assert np.allclose(float(ll[1]), float(ll1), rtol=1e-6)
        assert np.allclose(np.asarray(la[1]), np.asarray(la1), rtol=1e-5)


class TestAssociativeScanForward:
    def test_matches_sequential(self, rng):
        n, t = 6, 40
        A = rng.uniform(0.1, 1.0, size=(n, n)); A /= A.sum(1, keepdims=True)
        pi = rng.uniform(0.1, 1.0, size=n); pi /= pi.sum()
        log_b = jnp.asarray(rng.normal(size=(t, n)))
        la_s, ll_s = hmm.forward_log(
            jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi)), log_b,
            jnp.ones(t, bool))
        la_a, ll_a = hmm.forward_log_assoc(
            jnp.log(jnp.asarray(A)), jnp.log(jnp.asarray(pi)), log_b)
        assert np.allclose(float(ll_s), float(ll_a), rtol=1e-5)
        assert np.allclose(np.asarray(la_s), np.asarray(la_a),
                           rtol=1e-4, atol=1e-4)

    def test_left_to_right_with_neg_inf(self, rng):
        """Sentinel-heavy banded topologies must not poison the scan."""
        from poccala_tpu.utils.logmath import NEG_INF
        n, t = 8, 25
        A = np.zeros((n, n)); A[0, 1] = 1.0
        for j in range(1, n - 1):
            A[j, j] = 0.5; A[j, j + 1] = 0.5
        logA = jnp.asarray(np.where(A > 0, np.log(A, where=A > 0), NEG_INF))
        pi = np.zeros(n); pi[0] = 1.0
        log_pi = jnp.asarray(np.where(pi > 0, 0.0, NEG_INF))
        log_b = jnp.asarray(rng.normal(size=(t, n)))
        la_s, ll_s = hmm.forward_log(logA, log_pi, log_b, jnp.ones(t, bool))
        la_a, ll_a = hmm.forward_log_assoc(logA, log_pi, log_b)
        assert np.allclose(float(ll_s), float(ll_a), rtol=1e-5)
        fin = np.asarray(la_s) > NEG_INF / 2
        assert np.allclose(np.asarray(la_a)[fin], np.asarray(la_s)[fin],
                           rtol=1e-4, atol=1e-3)
