"""Leaf components: distances, SOM, PSO, hierarchical clustering, binning,
experiment-dataset loader, audio-device gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poccala_tpu.ops import distance, hierarchical, som


class TestDistance:
    def test_euclidean_and_manhattan(self):
        a = jnp.asarray([3.0, 0.0])
        b = jnp.asarray([0.0, 4.0])
        assert float(distance.euclidean(a, b)) == pytest.approx(5.0)
        assert float(distance.manhattan(a, b)) == pytest.approx(7.0)
        assert float(distance.minkowski(a, b, 2.0)) == pytest.approx(5.0)

    def test_cosine(self):
        a = jnp.asarray([1.0, 0.0])
        assert float(distance.cosine_similarity(a, a)) == pytest.approx(1.0)
        assert float(
            distance.cosine_similarity(a, jnp.asarray([0.0, 1.0]))
        ) == pytest.approx(0.0)

    def test_mahalanobis(self):
        a = jnp.asarray([2.0, 0.0])
        b = jnp.zeros(2)
        prec = jnp.asarray([0.25, 1.0])  # var 4 on dim 0
        assert float(distance.mahalanobis(a, b, prec)) == pytest.approx(1.0)
        full = jnp.diag(prec)
        assert float(distance.mahalanobis(a, b, full)) == pytest.approx(1.0)

    def test_pairwise(self, rng):
        x = rng.normal(size=(5, 3))
        y = rng.normal(size=(4, 3))
        d = np.asarray(distance.pairwise_euclidean(jnp.asarray(x), jnp.asarray(y)))
        want = np.linalg.norm(x[:, None] - y[None, :], axis=-1)
        assert np.allclose(d, want, atol=1e-5)


class TestSomPso:
    def test_som_clusters_blobs(self, rng):
        x = np.concatenate([
            rng.normal(size=(60, 2)) * 0.2 + [0, 0],
            rng.normal(size=(60, 2)) * 0.2 + [5, 5],
        ]).astype(np.float32)
        w, assign = som.som(jax.random.PRNGKey(0), jnp.asarray(x), 2,
                            steps=400)
        w = np.asarray(w)
        got = np.sort(w, axis=0)
        assert np.allclose(got[0], [0, 0], atol=0.8)
        assert np.allclose(got[1], [5, 5], atol=0.8)
        # assignments split the blobs
        a = np.asarray(assign)
        assert len(set(a[:60])) == 1 and len(set(a[60:])) == 1
        assert a[0] != a[-1]

    def test_pso_minimizes_quadratic(self):
        target = jnp.asarray([0.3, -0.2, 0.5])

        def objective(p):
            return jnp.sum((p - target) ** 2)

        best, val = som.pso(jax.random.PRNGKey(1), objective,
                            num_particles=24, dim=3, iters=120)
        assert float(val) < 1e-3
        assert np.allclose(np.asarray(best), np.asarray(target), atol=0.05)

    def test_p_som(self, rng):
        x = np.concatenate([
            rng.normal(size=(40, 2)) * 0.2,
            rng.normal(size=(40, 2)) * 0.2 + [4, 0],
        ]).astype(np.float32)
        w, assign = som.p_som(jax.random.PRNGKey(2), jnp.asarray(x), 2,
                              steps=200)
        q = float(som.quantization_error(w, jnp.asarray(x)))
        assert q < 1.0


class TestHierarchical:
    def test_layercluster_and_theta(self, rng):
        x = np.concatenate([
            rng.normal(size=(20, 2)) * 0.2 + [0, 0],
            rng.normal(size=(20, 2)) * 0.2 + [8, 8],
            rng.normal(size=(20, 2)) * 0.2 + [0, 8],
        ])
        tree, clusters = hierarchical.layercluster(x, 3)
        assert len(clusters) == 3
        sizes = sorted(len(v) for v in clusters.values())
        assert sizes == [20, 20, 20]
        means, variances, alpha = hierarchical.theta(x, clusters)
        got = np.sort(means, axis=0)
        want = np.sort(np.array([[0, 0], [8, 8], [0, 8]], float), axis=0)
        assert np.allclose(got, want, atol=0.5)
        assert np.allclose(alpha.sum(), 1.0)
        # merge tree recorded sizes
        assert all(t[1] == 20 for t in tree)

    def test_randomcenter(self, rng):
        x = rng.normal(size=(50, 3))
        means, variances, alpha = hierarchical.randomcenter(rng, x, 4)
        assert means.shape == (4, 3)
        assert np.allclose(alpha.sum(), 1.0)
        assert (variances >= 1e-4).all()

    def test_binning(self, rng):
        x = np.concatenate([
            rng.normal(size=(100, 2)) * 0.1 + [0, 0],
            rng.normal(size=(100, 2)) * 0.1 + [5, 5],
        ])
        means, variances, alpha = hierarchical.binning(x, 2, bins_per_dim=4)
        got = np.sort(means, axis=0)
        assert np.allclose(got[0], [0, 0], atol=0.5)
        assert np.allclose(got[1], [5, 5], atol=0.5)


class TestExperimentDataset:
    def test_load_discrete_fixture(self, tmp_path):
        """The toy discrete-HMM fixture format
        (HiddenMarkovModelDataSet.csv:1-2)."""
        p = tmp_path / "toy.csv"
        p.write_text(
            "toy set (count dim classes)\n"
            "3 4 2 -1 -1\n"
            "red,red,white,white\n"
            "white,red,white,red\n"
            "white,red,red,red\n"
        )
        from poccala_tpu.io.dataset import load_experiment_csv

        ds = load_experiment_csv(str(p))
        assert ds.count == 3 and ds.dim == 4 and ds.classes == 2
        assert ds.vocabulary == ["red", "white"]
        enc = ds.encoded()
        assert enc.shape == (3, 4)
        assert enc[0].tolist() == [0, 0, 1, 1]

    def test_load_continuous(self, tmp_path):
        p = tmp_path / "c.csv"
        p.write_text("t\n2 3 1 -1 -1\n1.0,2.0,3.0\n4.0,5.0,6.0\n")
        from poccala_tpu.io.dataset import load_experiment_csv

        ds = load_experiment_csv(str(p))
        assert ds.vocabulary == []
        assert ds.data[1] == [4.0, 5.0, 6.0]


class TestAudioDevice:
    def test_graceful_without_pyaudio(self):
        from poccala_tpu.io import audio_device

        try:
            import pyaudio  # noqa: F401
            pytest.skip("pyaudio present; device test not applicable")
        except ImportError:
            pass
        with pytest.raises(RuntimeError, match="pyaudio"):
            audio_device.play("/nonexistent.wav")
        with pytest.raises(RuntimeError, match="pyaudio"):
            audio_device.record(0.1, "/tmp/x.wav")
