"""k-means and GMM-EM kernels: recovery + convergence tests."""

import jax
import jax.numpy as jnp
import numpy as np

from poccala_tpu.ops import em, kmeans
from poccala_tpu.utils.logmath import NEG_INF, masked_log


def blobs(rng, centers, n_per, scale=0.3):
    pts = []
    for c in centers:
        pts.append(rng.normal(size=(n_per, len(c))) * scale + np.asarray(c))
    x = np.concatenate(pts).astype(np.float32)
    rng.shuffle(x)
    return x


class TestKmeans:
    def test_recovers_separated_clusters(self, rng):
        true = [[0, 0], [10, 0], [0, 10]]
        x = blobs(rng, true, 50)
        out = kmeans.kmeans(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.ones(len(x), bool), k=3
        )
        means = np.sort(np.asarray(out["means"]), axis=0)
        want = np.sort(np.asarray(true, dtype=np.float32), axis=0)
        assert np.allclose(means, want, atol=0.3)
        assert np.allclose(np.asarray(out["alpha"]).sum(), 1.0, atol=1e-5)
        assert np.all(np.asarray(out["variances"]) >= 1e-4)

    def test_mask_respected(self, rng):
        x = blobs(rng, [[0, 0], [10, 10]], 30)
        pad = np.concatenate([x, np.full((40, 2), 100.0, np.float32)])
        mask = np.arange(len(pad)) < len(x)
        out = kmeans.kmeans(
            jax.random.PRNGKey(1), jnp.asarray(pad), jnp.asarray(mask), k=2
        )
        means = np.asarray(out["means"])
        # no center should be pulled to the padding at (100, 100)
        assert means.max() < 20
        assert np.array_equal(np.asarray(out["assign"])[~mask], -np.ones(40))

    def test_degenerate_identical_points(self):
        x = jnp.ones((20, 3))
        out = kmeans.kmeans(jax.random.PRNGKey(2), x, jnp.ones(20, bool), k=2)
        assert np.allclose(np.asarray(out["means"]), 1.0, atol=1e-5)
        assert np.allclose(np.asarray(out["variances"]), 1e-4)

    def test_grouped(self, rng):
        g = 4
        xs = np.stack([blobs(rng, [[0, 0], [5, 5]], 25) for _ in range(g)])
        masks = np.ones(xs.shape[:2], bool)
        out = kmeans.kmeans_grouped(
            jax.random.PRNGKey(3), jnp.asarray(xs), jnp.asarray(masks), k=2
        )
        assert out["means"].shape == (g, 2, 2)
        m = np.sort(np.asarray(out["means"]), axis=1)
        assert np.allclose(m[:, 0], 0, atol=0.4)
        assert np.allclose(m[:, 1], 5, atol=0.4)


class TestEm:
    def _init_from_kmeans(self, x, k, key):
        out = kmeans.kmeans(key, jnp.asarray(x), jnp.ones(len(x), bool), k=k)
        return em.GmmParams(
            means=out["means"],
            log_var=jnp.log(out["variances"]),
            log_w=masked_log(out["alpha"]),
        )

    def test_q_increases_and_fits(self, rng):
        true_means = [[-4.0, 0.0], [4.0, 2.0]]
        x = blobs(rng, true_means, 200, scale=0.5)
        params = self._init_from_kmeans(x, 2, jax.random.PRNGKey(0))
        mask = jnp.ones(len(x), bool)
        mix_mask = jnp.ones(2, bool)
        p1, q1, it1 = em.em_fit(params, jnp.asarray(x), mask, mix_mask,
                                max_iters=1)
        p2, q2, it2 = em.em_fit(params, jnp.asarray(x), mask, mix_mask,
                                max_iters=20)
        assert float(q2) >= float(q1) - 1e-3
        got = np.sort(np.asarray(p2.means), axis=0)
        want = np.sort(np.asarray(true_means, dtype=np.float32), axis=0)
        assert np.allclose(got, want, atol=0.3)
        w = np.exp(np.asarray(p2.log_w))
        assert np.allclose(w.sum(), 1.0, atol=1e-4)

    def test_covariance_floor(self, rng):
        x = np.zeros((50, 3), np.float32)  # zero variance data
        params = em.GmmParams(
            means=jnp.zeros((2, 3)), log_var=jnp.zeros((2, 3)),
            log_w=jnp.log(jnp.full((2,), 0.5)),
        )
        p, q, _ = em.em_fit(params, jnp.asarray(x), jnp.ones(50, bool),
                            jnp.ones(2, bool), c_covariance=1e-6, max_iters=3)
        assert np.all(np.asarray(p.log_var) >= np.log(1e-6) - 1e-5)

    def test_grouped_em(self, rng):
        g = 3
        xs = np.stack([
            blobs(rng, [[-3, 0], [3, 0]], 100, scale=0.4) for _ in range(g)
        ])
        masks = np.ones(xs.shape[:2], bool)
        means0 = jnp.asarray(
            np.stack([[[-1, 0], [1, 0]]] * g, dtype=np.float32)
        )
        p, q, iters = em.em_fit_grouped(
            means0, jnp.zeros((g, 2, 2)),
            jnp.log(jnp.full((g, 2), 0.5)),
            jnp.asarray(xs), jnp.asarray(masks), jnp.ones((g, 2), bool),
        )
        got = np.sort(np.asarray(p.means), axis=1)
        assert np.allclose(got[:, 0], [-3, 0], atol=0.3)
        assert np.allclose(got[:, 1], [3, 0], atol=0.3)
        # padded-frames invariance
        xs_pad = np.concatenate([xs, np.zeros((g, 37, 2), np.float32)], axis=1)
        masks_pad = np.concatenate([masks, np.zeros((g, 37), bool)], axis=1)
        p2, _, _ = em.em_fit_grouped(
            means0, jnp.zeros((g, 2, 2)), jnp.log(jnp.full((g, 2), 0.5)),
            jnp.asarray(xs_pad), jnp.asarray(masks_pad), jnp.ones((g, 2), bool),
        )
        assert np.allclose(np.asarray(p.means), np.asarray(p2.means), atol=1e-4)
