"""Senone bank + embedded sentence-HMM tests vs the dense reference oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from poccala_tpu.config import ModelConfig
from poccala_tpu.models import senone_bank as sb
from poccala_tpu.models import topology as topo
from poccala_tpu.ops import gmm_score, hmm
from poccala_tpu.utils.logmath import NEG_INF

from . import oracles


def make_bank(rng, num_units=4, state_num=5, mix=2, max_mix=3, dim=7):
    cfg = ModelConfig(state_num=state_num, mix_level=mix, max_mix_level=max_mix)
    bank = sb.create_bank(num_units, cfg, dim, key=jax.random.PRNGKey(1))
    # randomize GMMs a bit for nondegenerate scores
    s = bank.num_states
    means = rng.normal(size=(s, max_mix, dim)).astype(np.float32)
    log_var = np.log(rng.uniform(0.5, 2.0, size=(s, max_mix, dim))).astype(np.float32)
    w = rng.uniform(0.2, 1.0, size=(s, max_mix))
    w[:, mix:] = 0.0
    w[:, :mix] /= w[:, :mix].sum(axis=1, keepdims=True)
    import dataclasses
    from poccala_tpu.utils.logmath import masked_log
    bank = dataclasses.replace(
        bank,
        means=jnp.asarray(means),
        log_var=jnp.asarray(log_var),
        log_w=masked_log(jnp.asarray(w)),
    )
    return cfg, bank


class TestBankInit:
    def test_create_bank_shapes_and_topology(self):
        cfg = ModelConfig(state_num=5, mix_level=4, max_mix_level=13)
        bank = sb.create_bank(10, cfg, 39)
        assert bank.num_states == 30 and bank.max_mix == 13 and bank.dim == 39
        A = np.exp(np.asarray(bank.log_A[3]))
        assert np.allclose(A[0, 1], 1.0)
        assert np.allclose(A[2, 2], 0.5) and np.allclose(A[2, 3], 0.5)
        assert np.allclose(A[4], 0.0, atol=1e-30)  # absorbing exit
        # padded mixtures dead
        w = np.exp(np.asarray(bank.log_w))
        assert np.allclose(w[:, :4].sum(-1), 1.0, atol=1e-6)
        assert np.allclose(w[:, 4:], 0.0)

    def test_flat_start_shared_differentiation(self):
        """AcousticModel.py:504-516: one diff vector shared by all senones."""
        cfg = ModelConfig(state_num=5, mix_level=3, max_mix_level=3)
        bank = sb.create_bank(4, cfg, 6)
        gm = jnp.arange(6, dtype=jnp.float32)
        gv = jnp.full((6,), 2.0)
        out = sb.flat_start(bank, gm, gv, jax.random.PRNGKey(0), coefficient=0.25)
        m = np.asarray(out.means)
        # same mixture means across all senones
        assert np.allclose(m[0], m[5]) and np.allclose(m[1], m[3])
        # offsets proportional to the variance diagonal
        off = m[0] - np.asarray(gm)[None, :]
        ratio = off / np.asarray(gv)[None, :]
        assert np.allclose(ratio, ratio[:, :1], atol=1e-6)
        assert np.abs(ratio).max() <= 0.25 + 1e-6
        assert np.allclose(np.asarray(out.log_var), np.log(2.0), atol=1e-6)


class TestEmbedded:
    def test_matches_dense_oracle(self, rng):
        """Forward loglik + Viterbi path of the banded embedded HMM must
        equal the reference's dense sentence HMM (AcousticModel.py:957-1014
        + LHMM DP)."""
        cfg, bank = make_bank(rng)
        state_num = cfg.state_num
        emit = state_num - 2
        label = np.array([2, 0, 3, 0], dtype=np.int32)  # repeated unit too
        L = len(label)
        t = 25
        x = rng.normal(size=(t, bank.dim)).astype(np.float32)
        scores = gmm_score.gmm_log_scores(
            jnp.asarray(x), bank.means, bank.log_var, bank.log_w
        )  # [T, S]

        # --- ours (banded, padded to max_label_len=6)
        max_l = 6
        label_pad = np.zeros(max_l, np.int32)
        label_pad[:L] = label
        ehmm = topo.build_embedded(
            bank, jnp.asarray(label_pad), jnp.asarray(L), state_num, max_l
        )
        log_b = topo.embedded_log_b(scores, ehmm)
        n_true = int(ehmm.n_states)
        assert n_true == 2 + L * emit
        la, ll = hmm.forward_log_banded(
            ehmm.band, ehmm.log_pi, log_b, jnp.ones(t, bool), state_num
        )
        sc, path, _ = hmm.viterbi_log_banded(
            ehmm.band, ehmm.log_pi, log_b, jnp.ones(t, bool), state_num
        )

        # --- oracle (dense, reference construction)
        A_np = np.exp(np.asarray(bank.log_A))
        A_np[A_np < 1e-20] = 0.0
        unit_A = [A_np[u] for u in label]
        scores_np = np.asarray(scores)
        unit_scores = [
            np.stack([scores_np[:, u * emit + e] for e in range(emit)])
            for u in label
        ]
        Ad, prob, pi = oracles.embedded_oracle(unit_A, unit_scores, state_num)
        # forward loglik
        with np.errstate(divide="ignore"):
            want_alpha = oracles.forward_oracle(np.log(Ad), np.log(pi), prob)
        want_ll = oracles.np_logsumexp(want_alpha[:, -1])
        assert np.allclose(float(ll), want_ll, rtol=1e-4)
        # valid-state alphas match
        got_alpha = np.asarray(la)[:, :n_true]
        finite = np.isfinite(want_alpha.T) & (got_alpha > NEG_INF / 2)
        assert np.allclose(
            got_alpha[finite], want_alpha.T[finite], rtol=1e-3, atol=1e-3
        )
        # viterbi
        want_sc, want_path = oracles.viterbi_oracle(Ad, prob, pi)
        assert np.allclose(float(sc), want_sc, rtol=1e-4)
        assert np.array_equal(np.asarray(path), want_path)

    def test_states_to_labels(self, rng):
        cfg, bank = make_bank(rng)
        label = np.array([1, 3], dtype=np.int32)
        ehmm = topo.build_embedded(
            bank, jnp.asarray(np.pad(label, (0, 2))), jnp.asarray(2),
            cfg.state_num, 4,
        )
        # path through: entry(0), unit0 states 1..3, unit1 states 4..6
        path = jnp.asarray([0, 1, 1, 2, 3, 4, 5, 6], dtype=jnp.int32)
        lp, uid = topo.states_to_labels(path, ehmm, jnp.asarray(np.pad(label, (0, 2))), cfg.state_num)
        assert np.array_equal(np.asarray(lp), [-1, 0, 0, 0, 0, 1, 1, 1])
        assert np.array_equal(np.asarray(uid), [-1, 1, 1, 1, 1, 3, 3, 3])

    def test_batched_build(self, rng):
        cfg, bank = make_bank(rng)
        labels = jnp.asarray([[2, 0, 0, 0], [1, 3, 2, 0]], dtype=jnp.int32)
        lens = jnp.asarray([1, 3])
        eb = topo.build_embedded_batch(bank, labels, lens, cfg.state_num, 4)
        assert eb.band.shape == (2, 2 + 4 * 3, cfg.state_num)
        e0 = topo.build_embedded(bank, labels[0], lens[0], cfg.state_num, 4)
        assert np.allclose(np.asarray(eb.band[0]), np.asarray(e0.band))
        assert int(eb.n_states[1]) == 2 + 3 * 3
