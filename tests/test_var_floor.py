"""Relative variance floor (``ModelConfig.var_floor_scale``).

The reference floors covariance at an absolute ``c_covariance = 1e-6``
(``/root/reference/init.py:30``, ``Clustering.py:641-645``); senones
starved of data collapse onto it, producing ``1/sigma^2 = 1e6``
coefficients and per-frame log-densities of magnitude ~1e7 — where f32
ULP is 1.0 nat, so forward log-likelihoods become ill-conditioned in
BOTH pipelines (the reference's own t=0 forward line, ``LHMM.py:342``,
is f32-contaminated).  The flag-gated relative floor — the standard
LVCSR remedy — raises the per-dimension floor to
``var_floor_scale * corpus_diag_var[d]``.

These tests pin: (1) the computed floor vector against a NumPy oracle;
(2) EM updates respecting a vector floor exactly on degenerate data;
(3) end-to-end training with the flag: no trained log-variance below
the floor, and the flag OFF reproduces reference behavior bit-for-bit.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from poccala_tpu.config import Config
from poccala_tpu.io.corpus import Batch, UnitInventory
from poccala_tpu.ops import em as em_ops
from poccala_tpu.train.trainer import Trainer


def _toy_batch(rng, d, n_utts=6, t_max=40, n_units=3, collapse_dim=2):
    """Batch whose frames are near-constant along ``collapse_dim`` so an
    absolute 1e-6 floor would collapse that dimension's variance."""
    feats = rng.normal(size=(n_utts, t_max, d)).astype(np.float32) * 2.0
    feats[..., collapse_dim] = 3.0 + 1e-4 * rng.normal(
        size=(n_utts, t_max)).astype(np.float32)
    t_masks = np.ones((n_utts, t_max), bool)
    labels = np.tile(np.arange(n_units, dtype=np.int32), (n_utts, 1))
    label_lens = np.full((n_utts,), n_units, np.int32)
    return Batch(feats=feats, t_masks=t_masks, labels=labels,
                 label_lens=label_lens)


def _cfg(scale=0.0):
    cfg = Config()
    cfg.model.state_num = 4
    cfg.model.mix_level = 2
    cfg.model.max_mix_level = 2
    cfg.model.var_floor_scale = scale
    cfg.train.max_label_len = 4
    return cfg


class TestFloorVector:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        cfg = _cfg(scale=0.05)
        batch = _toy_batch(rng, cfg.frontend.feat_dim)
        inv = UnitInventory([f"u{i}" for i in range(3)])
        tr = Trainer(cfg, inv)
        tr._ensure_var_floor([batch])

        tcfg = cfg.train
        frames = batch.feats[batch.t_masks][:: tcfg.step]
        gv = np.maximum(frames.var(axis=0), 1e-8)
        want = np.maximum(0.05 * gv, cfg.model.c_covariance)
        np.testing.assert_allclose(
            np.asarray(tr.var_floor), want.astype(np.float32), rtol=1e-6)
        # the collapsed dim's floor comes from c_covariance side or the
        # tiny variance — either way far below the healthy dims' floor
        assert tr.var_floor[2] < tr.var_floor[0]

    def test_flag_off_is_reference_scalar(self):
        rng = np.random.default_rng(0)
        cfg = _cfg(scale=0.0)
        batch = _toy_batch(rng, cfg.frontend.feat_dim)
        inv = UnitInventory([f"u{i}" for i in range(3)])
        tr = Trainer(cfg, inv)
        tr._ensure_var_floor([batch])
        assert tr.var_floor == cfg.model.c_covariance

    def test_computed_once(self):
        rng = np.random.default_rng(1)
        cfg = _cfg(scale=0.01)
        inv = UnitInventory([f"u{i}" for i in range(3)])
        tr = Trainer(cfg, inv)
        tr._ensure_var_floor([_toy_batch(rng, cfg.frontend.feat_dim)])
        first = np.asarray(tr.var_floor).copy()
        tr._ensure_var_floor([_toy_batch(rng, cfg.frontend.feat_dim)])  # different data
        np.testing.assert_array_equal(np.asarray(tr.var_floor), first)


class TestEmRespectsVectorFloor:
    def test_degenerate_data_lands_on_floor(self):
        """All points identical -> variance would be 0; the m-step must
        produce exactly the per-dim floor."""
        d, m, f = 4, 2, 32
        x = jnp.ones((f, d)) * 2.5
        mask = jnp.ones((f,), bool)
        log_gamma = jnp.log(jnp.full((f, m), 0.5))
        floor = np.array([1e-6, 0.01, 0.5, 1e-3], np.float32)
        params = em_ops.m_step(log_gamma, x, mask, floor,
                               jnp.ones((m,), bool))
        np.testing.assert_allclose(
            np.exp(np.asarray(params.log_var)),
            np.tile(floor, (m, 1)), rtol=1e-5)


class TestEndToEnd:
    def test_trained_vars_respect_floor(self):
        rng = np.random.default_rng(2)
        cfg = _cfg(scale=0.05)
        batch = _toy_batch(rng, cfg.frontend.feat_dim)
        inv = UnitInventory([f"u{i}" for i in range(3)])
        tr = Trainer(cfg, inv)
        tr.auto([batch], t=2, mode=2)
        floor = np.asarray(tr.var_floor)
        var = np.exp(np.asarray(tr.bank.log_var))
        assert (var >= floor * (1 - 1e-5)).all(), (
            var.min(axis=(0, 1)), floor)
        # the collapsed dim would have hit ~1e-8 variance under the
        # absolute floor; the relative floor keeps 1/sigma^2 sane
        assert var[..., 2].min() >= floor[2] * (1 - 1e-5)

    def test_flag_off_bit_identical_to_before(self):
        """var_floor_scale=0 must leave the training path untouched."""
        rng = np.random.default_rng(3)
        cfg0 = _cfg(scale=0.0)
        batch = _toy_batch(rng, cfg0.frontend.feat_dim)
        inv = UnitInventory([f"u{i}" for i in range(3)])
        banks = []
        for _ in range(2):
            tr = Trainer(_cfg(scale=0.0), inv)
            tr.auto([batch], t=1, mode=2)
            banks.append(tr.bank)
        np.testing.assert_array_equal(np.asarray(banks[0].log_var),
                                      np.asarray(banks[1].log_var))
