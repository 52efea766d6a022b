"""State tying: map plumbing + data-driven tie + training on tied banks."""

import numpy as np
import jax.numpy as jnp
import pytest

from poccala_tpu.models import tying
from poccala_tpu.train import accumulators as acc

from .test_senone_topology import make_bank


class TestTying:
    def test_tie_by_kmeans_shapes(self, rng):
        cfg, bank = make_bank(rng, num_units=6, state_num=5, mix=2,
                              max_mix=2, dim=5)
        assert bank.num_states == 18
        tied = tying.tie_by_kmeans(bank, target_senones=9)
        assert tied.num_states <= 9
        assert tied.senone_map.shape == (6, 3)
        m = np.asarray(tied.senone_map)
        assert m.min() >= 0 and m.max() < tied.num_states
        # same-position constraint: position-0 states only map into the
        # position-0 senone block etc.
        blocks = [set(m[:, e].tolist()) for e in range(3)]
        assert blocks[0].isdisjoint(blocks[1])
        assert blocks[1].isdisjoint(blocks[2])
        # weights normalized
        w = np.exp(np.asarray(tied.log_w)).sum(-1)
        assert np.allclose(w, 1.0, atol=1e-4)

    def test_identical_units_tie_together(self, rng):
        """Units with identical GMMs must share senones after tying."""
        import dataclasses

        cfg, bank = make_bank(rng, num_units=4, state_num=5, mix=2,
                              max_mix=2, dim=5)
        means = np.array(bank.means)  # writable copy
        # make unit 2 a clone of unit 0, unit 3 a clone of unit 1
        for e in range(3):
            means[2 * 3 + e] = means[0 * 3 + e]
            means[3 * 3 + e] = means[1 * 3 + e]
        bank = dataclasses.replace(bank, means=jnp.asarray(means))
        tied = tying.tie_by_kmeans(bank, target_senones=6)
        m = np.asarray(tied.senone_map)
        assert np.array_equal(m[2], m[0])
        assert np.array_equal(m[3], m[1])
        assert not np.array_equal(m[0], m[1])

    def test_stats_accumulate_onto_shared_senones(self, rng):
        """With units tied together, their BW statistics land on the
        same senones (the scatter keys on senone_map)."""
        import dataclasses

        cfg, bank = make_bank(rng, num_units=3, state_num=5, mix=2,
                              max_mix=2, dim=5)
        # manually tie unit 2 onto unit 0's senones
        m = np.array(bank.senone_map)
        m[2] = m[0]
        bank = dataclasses.replace(bank, senone_map=jnp.asarray(m))
        t = 20
        x = jnp.asarray(rng.normal(size=(t, 5)).astype(np.float32))
        mask = jnp.ones(t, bool)
        s_u0, _ = acc.utterance_stats(
            bank, jnp.asarray([0, 0, 0, 0], jnp.int32), jnp.asarray(1),
            x, mask, cfg.state_num, 4)
        s_u2, _ = acc.utterance_stats(
            bank, jnp.asarray([2, 0, 0, 0], jnp.int32), jnp.asarray(1),
            x, mask, cfg.state_num, 4)
        # both utterances deposit GMM stats on unit-0's senones
        assert np.allclose(np.asarray(s_u0.occ), np.asarray(s_u2.occ),
                           rtol=1e-5)
        # but transition stats stay per-unit
        assert float(np.abs(np.asarray(s_u2.trans[2])).sum()) > 0
        assert float(np.abs(np.asarray(s_u0.trans[2])).sum()) == 0

    def test_training_on_tied_bank_improves(self, rng):
        import dataclasses

        cfg, bank = make_bank(rng, num_units=4, state_num=5, mix=2,
                              max_mix=2, dim=5)
        tied = tying.tie_by_kmeans(bank, target_senones=6)
        labels = jnp.asarray(rng.integers(0, 4, size=(8, 3)).astype(np.int32))
        lens = jnp.asarray(rng.integers(1, 4, size=(8,)).astype(np.int32))
        xs = jnp.asarray(rng.normal(size=(8, 20, 5)).astype(np.float32))
        masks = jnp.ones((8, 20), bool)
        lls = []
        for _ in range(3):
            stats, _ = acc.batch_stats(tied, labels, lens, xs, masks,
                                       cfg.state_num, 3)
            lls.append(float(stats.loglik))
            tied = acc.apply_update(tied, stats)
        assert lls[1] > lls[0]
        assert lls[2] >= lls[1] - 1e-3

class TestTreeTying:
    def _bank_for_units(self, rng, units, state_num=5, mix=2, dim=5):
        cfg, bank = make_bank(rng, num_units=len(units),
                              state_num=state_num, mix=mix, max_mix=mix,
                              dim=dim)
        return cfg, bank

    def test_questions_cover_standard_inventories(self):
        from poccala_tpu.io.corpus import standard_inventory
        from poccala_tpu.models import questions as q_mod

        for kind in ("IF", "XIF", "XIF_tone"):
            units = standard_inventory(kind)
            qs = q_mod.default_questions(units)
            assert len(qs) > 20
            n = len(units)
            for q in qs:  # every question splits the inventory
                assert 0 < len(q.members) < n
        # tone questions only exist for the toned inventory
        names_xif = {q.name for q in
                     q_mod.default_questions(standard_inventory("XIF"))}
        names_tone = {q.name for q in
                      q_mod.default_questions(standard_inventory("XIF_tone"))}
        assert "tone_1" not in names_xif
        assert "tone_1" in names_tone

    def test_tree_tie_shapes_and_position_blocks(self, rng):
        from poccala_tpu.io.corpus import standard_inventory

        units = standard_inventory("IF")[:12]
        cfg, bank = self._bank_for_units(rng, units)
        tied = tying.tie_by_tree(bank, units, target_senones=18)
        assert tied.num_states <= 18
        m = np.asarray(tied.senone_map)
        assert m.shape == (12, 3)
        assert m.min() >= 0 and m.max() < tied.num_states
        blocks = [set(m[:, e].tolist()) for e in range(3)]
        assert blocks[0].isdisjoint(blocks[1])
        assert blocks[1].isdisjoint(blocks[2])
        w = np.exp(np.asarray(tied.log_w)).sum(-1)
        assert np.allclose(w, 1.0, atol=1e-4)

    def test_tree_splits_by_informative_question(self, rng):
        """Give nasals one acoustic signature and stops another: the
        first split must use a question separating them, and the tied
        map must keep the classes apart."""
        import dataclasses

        units = ["m", "n", "b", "d"]  # nasals vs unaspirated stops
        cfg, bank = self._bank_for_units(rng, units)
        means = np.array(bank.means)
        for u in range(4):
            sig = 5.0 if u < 2 else -5.0
            for e in range(3):
                means[u * 3 + e] = sig + 0.01 * rng.normal(size=means.shape[1:])
        bank = dataclasses.replace(bank, means=jnp.asarray(means))
        tied, trees = tying.tie_by_tree(bank, units, target_senones=6,
                                        return_trees=True)
        m = np.asarray(tied.senone_map)
        for e in range(3):
            assert m[0, e] == m[1, e], "nasals must tie together"
            assert m[2, e] == m[3, e], "stops must tie together"
            assert m[0, e] != m[2, e], "classes must stay apart"
        # the winning questions separate {m, n} from {b, d}
        for e, splits in trees.items():
            assert len(splits) == 1
            assert {frozenset(splits[0].yes_units),
                    frozenset(splits[0].no_units)} == {
                        frozenset({"m", "n"}), frozenset({"b", "d"})}

    def test_tree_tie_respects_occupancy(self, rng):
        """Zero-occupancy senones must not drag the merge: with all
        weight on unit 0, merged leaf params equal unit 0's."""
        units = ["m", "n"]
        cfg, bank = self._bank_for_units(rng, units)
        occ = np.zeros(bank.num_states)
        occ[0:3] = 100.0  # unit 0's senones (identity map: u*3+e)
        tied = tying.tie_by_tree(bank, units, target_senones=3,
                                 occupancy=occ, min_gain=np.inf)
        # min_gain=inf forces zero splits: one leaf per position
        assert tied.num_states == 3
        old = np.asarray(bank.means)
        new = np.asarray(tied.means)
        m = np.asarray(tied.senone_map)
        for e in range(3):
            assert np.allclose(new[m[0, e]], old[e], atol=1e-4)

    def test_training_on_tree_tied_bank_improves(self, rng):
        from poccala_tpu.io.corpus import standard_inventory

        units = standard_inventory("IF")[:6]
        cfg, bank = self._bank_for_units(rng, units)
        tied = tying.tie_by_tree(bank, units, target_senones=9)
        labels = jnp.asarray(rng.integers(0, 6, size=(8, 3)).astype(np.int32))
        lens = jnp.asarray(rng.integers(1, 4, size=(8,)).astype(np.int32))
        xs = jnp.asarray(rng.normal(size=(8, 20, 5)).astype(np.float32))
        masks = jnp.ones((8, 20), bool)
        lls = []
        for _ in range(3):
            stats, _ = acc.batch_stats(tied, labels, lens, xs, masks,
                                       cfg.state_num, 3)
            lls.append(float(stats.loglik))
            tied = acc.apply_update(tied, stats)
        assert lls[1] > lls[0]
