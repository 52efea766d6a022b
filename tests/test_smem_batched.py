"""Batched SMEM (whole-bank, O(1) device programs) vs the serial oracle.

``smem_pass_batched`` must make the same accept/reject decisions as the
per-senone host loop on separable mixtures (the RNG streams differ — the
split 2-means sees masked instead of compacted points — so only
borderline proposals may diverge; these fixtures are far from the
border).  Reference semantics under test: ``Clustering.__SMEM``
(``/root/reference/StatisticalModel/Clustering.py:483-577``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poccala_tpu.config import Config
from poccala_tpu.models import senone_bank as sb
from poccala_tpu.ops import em as em_ops
from poccala_tpu.train import smem


class _Tr:
    """Minimal trainer facade for smem_pass_* (bank + cfg + key chain)."""

    def __init__(self, bank, cfg, mix_level=3):
        self.bank = bank
        self.cfg = cfg
        self.mix_level = mix_level
        self._k = jax.random.PRNGKey(7)

    def _next_key(self):
        self._k, sub = jax.random.split(self._k)
        return sub


def _world(rng, cap=360, d=2):
    """6 senones, mix 3: even senones start EM in the classic SMEM local
    optimum (two components on one blob, one straddling two), odd
    senones are well-fit; EM-converge all of them first."""
    cfg = Config()
    cfg.model.state_num = 5
    cfg.model.mix_level = 3
    cfg.model.max_mix_level = 4
    bank = sb.create_bank(2, cfg.model, d, differentiation=False)
    s = bank.num_states
    assert s == 6

    frames = np.zeros((s, cap, d), np.float32)
    mask = np.ones((s, cap), bool)
    means0 = np.zeros((s, bank.max_mix, d), np.float32)
    for i in range(s):
        blob = rng.normal(size=(cap // 3, d)) * 0.3
        pts = np.concatenate([
            blob + [0, 0], blob + [6, 0], blob + [0, 6]])
        frames[i] = pts[rng.permutation(cap)]
        if i % 2 == 0:
            means0[i, :3] = [[0.1, 0.0], [-0.1, 0.0], [3.0, 3.0]]
        else:
            means0[i, :3] = [[0, 0], [6, 0], [0, 6]]
    log_var0 = np.zeros((s, bank.max_mix, d), np.float32)
    log_w0 = np.full((s, bank.max_mix), -1e30, np.float32)
    log_w0[:, :3] = np.log(1 / 3)
    mix_mask = np.zeros((s, bank.max_mix), bool)
    mix_mask[:, :3] = True
    params, q, _ = em_ops.em_fit_grouped(
        jnp.asarray(means0), jnp.asarray(log_var0), jnp.asarray(log_w0),
        jnp.asarray(frames), jnp.asarray(mask), jnp.asarray(mix_mask),
        max_iters=30,
    )
    bank = dataclasses.replace(
        bank, means=params.means, log_var=params.log_var, log_w=params.log_w)
    return bank, cfg, frames, mask, np.asarray(q)


def _bank_q(bank, frames, mask, mix):
    qs = []
    for i in range(bank.num_states):
        p = em_ops.GmmParams(bank.means[i], bank.log_var[i], bank.log_w[i])
        lg, comp = em_ops.e_step(p, jnp.asarray(frames[i]),
                                 jnp.asarray(mask[i]))
        qs.append(float(em_ops.q_value(lg, comp, p.log_w)))
    return np.asarray(qs)


class TestBatchedSmem:
    def test_matches_serial_decisions(self, rng):
        bank, cfg, frames, mask, _ = _world(rng)
        enough = np.ones(bank.num_states, bool)

        cfg.train.smem_impl = "serial"
        tr_s = _Tr(bank, cfg)
        bank_s, n_s = smem.smem_pass(tr_s, frames, mask, enough)

        cfg.train.smem_impl = "batched"
        tr_b = _Tr(bank, cfg)
        bank_b, n_b = smem.smem_pass(tr_b, frames, mask, enough)

        # the degenerate even senones get fixed by both, the well-fit
        # odd ones are left alone by both
        ch_s = np.any(np.asarray(bank_s.means) != np.asarray(bank.means),
                      axis=(1, 2))
        ch_b = np.any(np.asarray(bank_b.means) != np.asarray(bank.means),
                      axis=(1, 2))
        assert n_s == n_b == 3
        assert np.array_equal(ch_s, ch_b)
        assert np.array_equal(ch_b, np.asarray([1, 0, 1, 0, 1, 0], bool))

        # both land on the true centers for the fixed senones
        want = np.sort(np.array([[0, 0], [6, 0], [0, 6]], np.float32),
                       axis=0)
        for i in (0, 2, 4):
            for b in (bank_s, bank_b):
                got = np.sort(np.asarray(b.means[i, :3]), axis=0)
                assert np.allclose(got, want, atol=0.5), (i, got)

    def test_accepted_q_improves(self, rng):
        bank, cfg, frames, mask, _ = _world(rng)
        q0 = _bank_q(bank, frames, mask, 3)
        tr = _Tr(bank, cfg)
        bank2, n = smem.smem_pass_batched(
            tr, frames, mask, np.ones(bank.num_states, bool))
        assert n == 3
        q1 = _bank_q(bank2, frames, mask, 3)
        changed = np.any(
            np.asarray(bank2.means) != np.asarray(bank.means), axis=(1, 2))
        assert np.all(q1[changed] > q0[changed])
        assert np.allclose(q1[~changed], q0[~changed])

    def test_noop_guards(self, rng):
        bank, cfg, frames, mask, _ = _world(rng)
        tr = _Tr(bank, cfg, mix_level=2)  # SMEM needs mix >= 3
        bank2, n = smem.smem_pass_batched(
            tr, frames, mask, np.ones(bank.num_states, bool))
        assert n == 0 and bank2 is bank

        tr = _Tr(bank, cfg)
        bank3, n = smem.smem_pass_batched(
            tr, frames, mask, np.zeros(bank.num_states, bool))
        assert n == 0 and bank3 is bank

    def test_single_program_count(self, rng):
        """The batched pass must not scale device dispatches with S:
        count jit calls via a trace hook on the two program entries."""
        bank, cfg, frames, mask, _ = _world(rng)
        tr = _Tr(bank, cfg)
        calls = []
        orig_stats, orig_prop = smem._smem_stats, smem._smem_propose

        def wrap(name, fn):
            def inner(*a, **k):
                calls.append(name)
                return fn(*a, **k)
            return inner

        smem._smem_stats = wrap("stats", orig_stats)
        smem._smem_propose = wrap("propose", orig_prop)
        try:
            smem.smem_pass_batched(tr, frames, mask,
                                   np.ones(bank.num_states, bool))
        finally:
            smem._smem_stats, smem._smem_propose = orig_stats, orig_prop
        assert calls == ["stats", "propose"]
