"""Unit tests for the log-math core against NumPy oracles.

Oracle semantics: reference ``StatisticalModel/util.py:20-92``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from poccala_tpu.utils import logmath


def np_logsumexp(v):
    """Oracle for ``util.log_sum_exp`` (util.py:54-77)."""
    m = np.max(v)
    if abs(m) == float("inf"):
        return m
    return m + np.log(np.sum(np.exp(v - m)))


class TestLogsumexp:
    def test_matches_oracle(self, rng):
        x = rng.normal(size=(64,)) * 10
        got = float(logmath.logsumexp(jnp.asarray(x)))
        assert np.allclose(got, np_logsumexp(x), rtol=1e-6)

    def test_all_neg_inf(self):
        x = jnp.full((8,), -jnp.inf)
        assert float(logmath.logsumexp(x)) == -np.inf

    def test_rowwise(self, rng):
        x = rng.normal(size=(5, 7))
        got = np.asarray(logmath.logsumexp(jnp.asarray(x), axis=-1))
        want = np.array([np_logsumexp(r) for r in x])
        assert np.allclose(got, want, rtol=1e-6)


class TestLogMatvec:
    def test_matches_matrix_dot_oracle(self, rng):
        """Oracle: util.matrix_dot(data1, data2, axis=1) (util.py:39-51)."""
        log_x = rng.normal(size=(6,))
        log_A = rng.normal(size=(6, 4))
        want = np.array([np_logsumexp(log_x + log_A[:, j]) for j in range(4)])
        got = np.asarray(logmath.log_matvec(jnp.asarray(log_A), jnp.asarray(log_x)))
        assert np.allclose(got, want, rtol=1e-6)


def np_gaussian_log(y, mean, diag, reference=False):
    """Oracle for ``util.gaussian_function(..., log=True)`` (util.py:20-31)."""
    d = len(y)
    x = y - mean
    if reference:
        func = -d / 2 * np.log(2 * np.pi) - 0.5 * np.sum(diag)
    else:
        func = -d / 2 * np.log(2 * np.pi) - 0.5 * np.sum(np.log(diag))
    return func - 0.5 * np.dot(x * (1.0 / diag), x)


class TestDiagGaussian:
    @pytest.mark.parametrize("normalizer", ["textbook", "reference"])
    def test_matches_oracle(self, rng, normalizer):
        d = 13
        y = rng.normal(size=(d,))
        mean = rng.normal(size=(d,))
        var = rng.uniform(0.5, 2.0, size=(d,))
        want = np_gaussian_log(y, mean, var, reference=(normalizer == "reference"))
        got = float(
            logmath.diag_gaussian_logpdf(
                jnp.asarray(y), jnp.asarray(mean), jnp.log(jnp.asarray(var)),
                normalizer=normalizer,
            )
        )
        assert np.allclose(got, want, rtol=1e-5)

    def test_batched(self, rng):
        t, m, d = 17, 4, 13
        x = rng.normal(size=(t, 1, d))
        mean = rng.normal(size=(1, m, d))
        var = rng.uniform(0.5, 2.0, size=(1, m, d))
        got = logmath.diag_gaussian_logpdf(
            jnp.asarray(x), jnp.asarray(mean), jnp.log(jnp.asarray(var))
        )
        assert got.shape == (t, m)
        want = np_gaussian_log(x[3, 0], mean[0, 2], var[0, 2])
        assert np.allclose(float(got[3, 2]), want, rtol=1e-5)


class TestSafeOps:
    def test_masked_log(self):
        x = jnp.array([0.0, 1.0, np.e])
        out = np.asarray(logmath.masked_log(x))
        assert out[0] <= logmath.NEG_INF
        assert np.allclose(out[1:], [0.0, 1.0], atol=1e-6)

    def test_safe_exp_sub_empty_denominator(self):
        num = jnp.array([0.0, 0.0])
        den = jnp.array([logmath.NEG_INF, 1.0])
        out = np.asarray(logmath.safe_exp_sub(num, den))
        assert out[0] == 0.0
        assert np.allclose(out[1], np.exp(-1.0), rtol=1e-6)


class TestConfig:
    def test_roundtrip_overrides(self):
        from poccala_tpu import Config

        cfg = Config()
        cfg.apply_overrides(["model.mix_level=8", "frontend.delta_2=false", "epochs=3"])
        assert cfg.model.mix_level == 8
        assert cfg.frontend.delta_2 is False
        assert cfg.train.epochs == 3
        assert cfg.frontend.feat_dim == 26  # dct_num * 2 with delta_2 off

    def test_ini_loading(self, tmp_path):
        from poccala_tpu import Config

        ini = tmp_path / "config.ini"
        ini.write_text(
            "[UnitFile]\nUNIT_FILE_PATH=/tmp/units\n"
            "[Environment]\nENV_ID=3\n"
        )
        cfg = Config.from_ini(str(ini))
        assert cfg.paths.unit_file_path == "/tmp/units"
        assert cfg.paths.env_id == 3

    def test_unknown_key_rejected(self):
        from poccala_tpu import Config

        with pytest.raises(KeyError):
            Config().apply_overrides(["nonexistent_key=1"])
