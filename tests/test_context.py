"""Context-dependent (triphone-style) units: expansion, stats, trees,
bank cloning, CD lexicon, and CI-equivalence of the fresh clone.

BASELINE config 3's "tied-state triphone-style units" clause; the
reference has no CD machinery (its units are the bare initial/final
inventory, ``AcousticModel.py:151-161``), so oracles here are
first-principles (brute-force stats, hand-built trees) plus the
clone-equivalence property: a just-cloned CD system must decode
identically to its CI parent.
"""

import dataclasses

import numpy as np
import pytest

from poccala_tpu.config import Config, ModelConfig
from poccala_tpu.io.corpus import Batch, UnitInventory
from poccala_tpu.models import context as ctx
from poccala_tpu.models import senone_bank as sb


@pytest.fixture
def base_inv():
    return UnitInventory(["b", "a1", "d", "e4", "m", "sil"])


def _word_entries(inv):
    """ba, bade, de as (word, per-syllable unit ids)."""
    i = inv.id_of
    return [
        ("ba", [[i["b"], i["a1"]]]),
        ("bade", [[i["b"], i["a1"]], [i["d"], i["e4"]]]),
        ("de", [[i["d"], i["e4"]]]),
        ("ma", [[i["m"], i["a1"]]]),
    ]


def _cd_inv(inv):
    entries = _word_entries(inv)
    seqs = [[u for s in syls for u in s] for _, syls in entries]
    return ctx.CDInventory.from_words(seqs, inv,
                                      context_free=[inv.id_of["sil"]])


class TestExpansion:
    def test_word_triples(self):
        assert ctx.word_triples([7]) == [(-1, 7, -1)]
        assert ctx.word_triples([1, 2, 3]) == [
            (-1, 1, 2), (1, 2, 3), (2, 3, -1)]

    def test_from_words_registers_all_and_sil(self, base_inv):
        cd = _cd_inv(base_inv)
        i = base_inv.id_of
        # bade interior context differs from ba's word-final "a1"
        assert (i["b"], i["a1"], i["d"]) in cd.id_of
        assert (i["b"], i["a1"], -1) in cd.id_of
        assert (-1, i["sil"], -1) in cd.id_of
        # sil never appears as context
        for l, u, r in cd.triples:
            assert l != i["sil"] and r != i["sil"]

    def test_context_free_inside_word_rejected(self, base_inv):
        i = base_inv.id_of
        with pytest.raises(ValueError):
            ctx.CDInventory.from_words(
                [[i["b"], i["sil"], i["a1"]]], base_inv,
                context_free=[i["sil"]])

    def test_expand_labels_with_sil_and_abutting_words(self, base_inv):
        i = base_inv.id_of
        cd = _cd_inv(base_inv)
        # label: sil b a1 b a1 d e4 sil  (words: "ba", "bade"; the two
        # words abut without a pause -> still boundary context)
        lab = np.array(
            [[i["sil"], i["b"], i["a1"], i["b"], i["a1"], i["d"],
              i["e4"], i["sil"]]], np.int32)
        seqs = [[[i["b"], i["a1"]], [i["b"], i["a1"], i["d"], i["e4"]]]]
        out = ctx.expand_labels(lab, np.array([8]), seqs, cd)
        want = [
            cd.id_of[(-1, i["sil"], -1)],
            cd.id_of[(-1, i["b"], i["a1"])],
            cd.id_of[(i["b"], i["a1"], -1)],
            cd.id_of[(-1, i["b"], i["a1"])],
            cd.id_of[(i["b"], i["a1"], i["d"])],
            cd.id_of[(i["a1"], i["d"], i["e4"])],
            cd.id_of[(i["d"], i["e4"], -1)],
            cd.id_of[(-1, i["sil"], -1)],
        ]
        assert out[0].tolist() == want

    def test_expand_labels_truncated_last_word(self, base_inv):
        """max_label_len clipping mid-word: contexts come from the full
        word, assignment stops at the label edge."""
        i = base_inv.id_of
        cd = _cd_inv(base_inv)
        # "bade" truncated after 3 of its 4 units
        lab = np.array([[i["b"], i["a1"], i["d"]]], np.int32)
        seqs = [[[i["b"], i["a1"], i["d"], i["e4"]]]]
        out = ctx.expand_labels(lab, np.array([3]), seqs, cd)
        assert out[0].tolist() == [
            cd.id_of[(-1, i["b"], i["a1"])],
            cd.id_of[(i["b"], i["a1"], i["d"])],
            cd.id_of[(i["a1"], i["d"], i["e4"])],
        ]

    def test_expand_labels_mismatch_raises(self, base_inv):
        i = base_inv.id_of
        cd = _cd_inv(base_inv)
        lab = np.array([[i["b"], i["e4"]]], np.int32)
        with pytest.raises(ValueError):
            ctx.expand_labels(lab, np.array([2]),
                              [[[i["b"], i["a1"]]]], cd)


class TestTripleStats:
    def test_matches_bruteforce(self, base_inv, rng):
        cd = _cd_inv(base_inv)
        n_cd, emit, d = len(cd), 3, 4
        b, t = 3, 24
        xs = rng.normal(size=(b, t, d)).astype(np.float32)
        cd_labels = rng.integers(0, n_cd, size=(b, 6)).astype(np.int32)
        label_pos = np.full((b, t), -1, np.int32)
        for u in range(b):
            # runs of 4/5/3 frames over positions 0..3 with gaps
            runs = [(2, 6, 0), (6, 11, 1), (13, 16, 2), (16, 22, 3)]
            for s, e_, p in runs:
                label_pos[u, s:e_] = p
        occ, mean, ex2 = ctx.collect_triple_stats(
            xs, cd_labels, label_pos, n_cd, emit)
        # brute force
        occ_b = np.zeros((n_cd, emit))
        s1 = np.zeros((n_cd, emit, d))
        s2 = np.zeros((n_cd, emit, d))
        for u in range(b):
            for s, e_, p in [(2, 6, 0), (6, 11, 1), (13, 16, 2),
                             (16, 22, 3)]:
                frames = list(range(s, e_))
                n = len(frames)
                chunk = n // emit
                for j, t_i in enumerate(frames):
                    st = emit - 1 if chunk == 0 else min(j // chunk,
                                                         emit - 1)
                    cid = cd_labels[u, p]
                    occ_b[cid, st] += 1
                    s1[cid, st] += xs[u, t_i]
                    s2[cid, st] += xs[u, t_i] ** 2
        assert np.allclose(occ, occ_b)
        nz = occ_b > 0
        assert np.allclose(mean[nz], s1[nz] / occ_b[nz][:, None],
                           atol=1e-5)
        assert np.allclose(ex2[nz], s2[nz] / occ_b[nz][:, None],
                           atol=1e-5)


class TestTrees:
    def _grown(self, base_inv, rng, target=24):
        cd = _cd_inv(base_inv)
        n_cd, emit, d = len(cd), 3, 4
        occ = np.full((n_cd, emit), 40.0)
        # make contexts acoustically distinct so splits pay
        mean = rng.normal(size=(n_cd, emit, d)) * 3
        ex2 = mean**2 + 1.0
        trees = ctx.grow_context_trees(cd, occ, mean, ex2,
                                       target_senones=target,
                                       min_occ=4.0)
        return cd, trees

    def test_budget_and_consistency(self, base_inv, rng):
        cd, trees = self._grown(base_inv, rng)
        assert trees.n_senones <= 24
        assert trees.senone_of.max() == trees.n_senones - 1
        # routing table matches route() for every registered triple
        for i in range(len(cd)):
            for e in range(3):
                assert trees.senone_of[i, e] == trees.route(
                    cd.triples[i], e)

    def test_no_split_budget_one_leaf_per_base_position(
            self, base_inv, rng):
        cd = _cd_inv(base_inv)
        n_cd, emit, d = len(cd), 3, 4
        occ = np.full((n_cd, emit), 40.0)
        mean = rng.normal(size=(n_cd, emit, d))
        ex2 = mean**2 + 1.0
        n_bases = len(np.unique(cd.triples[:, 1]))
        trees = ctx.grow_context_trees(cd, occ, mean, ex2,
                                       target_senones=1)
        assert trees.n_senones == n_bases * emit
        # every triple of one base at one position shares the leaf
        for b_id in np.unique(cd.triples[:, 1]):
            rows = np.nonzero(cd.triples[:, 1] == b_id)[0]
            for e in range(emit):
                assert len(set(trees.senone_of[rows, e].tolist())) == 1

    def test_save_load_roundtrip(self, base_inv, rng, tmp_path):
        """CD sidecar persistence: routing (registered AND unseen
        triples) must survive a save/load cycle."""
        cd, trees = self._grown(base_inv, rng)
        p = str(tmp_path / "cd.json")
        ctx.save_cd(p, cd, trees)
        cd2, trees2 = ctx.load_cd(p)
        assert np.array_equal(cd2.triples, cd.triples)
        assert trees2.n_senones == trees.n_senones
        assert np.array_equal(trees2.senone_of, trees.senone_of)
        i = base_inv.id_of
        unseen = (i["m"], i["a1"], i["m"])
        for e in range(3):
            assert trees2.route(unseen, e) == trees.route(unseen, e)

    def test_unseen_triple_routes(self, base_inv, rng):
        cd, trees = self._grown(base_inv, rng)
        i = base_inv.id_of
        # (m, a1, m) never occurs in any word entry
        unseen = (i["m"], i["a1"], i["m"])
        assert unseen not in cd.id_of
        for e in range(3):
            s = trees.route(unseen, e)
            assert 0 <= s < trees.n_senones

    def test_distinct_contexts_split_when_data_demands(self, base_inv):
        """Two contexts of one base unit with very different stats must
        end in different leaves once the budget allows."""
        cd = _cd_inv(base_inv)
        i = base_inv.id_of
        a_of = {tuple(t): k for k, t in enumerate(cd.triples)}
        t1 = a_of[(i["b"], i["a1"], -1)]      # "ba" word-final a1
        t2 = a_of[(i["b"], i["a1"], i["d"])]  # "bade" interior a1
        n_cd, emit, d = len(cd), 3, 2
        occ = np.zeros((n_cd, emit))
        mean = np.zeros((n_cd, emit, d))
        occ[[t1, t2]] = 100.0
        mean[t1] = 5.0
        mean[t2] = -5.0
        ex2 = mean**2 + 0.5
        trees = ctx.grow_context_trees(cd, occ, mean, ex2,
                                       target_senones=len(cd) * emit,
                                       min_occ=4.0)
        for e in range(emit):
            assert trees.senone_of[t1, e] != trees.senone_of[t2, e]


def _ci_world(rng, inv, d=8):
    """CI bank with distinct per-unit emitting-state means."""
    cfg = ModelConfig(state_num=5, mix_level=1, max_mix_level=1)
    bank = sb.create_bank(len(inv), cfg, d, differentiation=False)
    emb = rng.normal(size=(len(inv) * 3, d)).astype(np.float32) * 4
    import jax.numpy as jnp

    bank = dataclasses.replace(bank, means=jnp.asarray(emb[:, None, :]))
    return bank, emb


class TestCloneEquivalence:
    def test_cd_clone_decodes_identically_to_ci(self, base_inv, rng):
        """Fresh CD clone + CD lexicon vs the CI parent + CI lexicon:
        identical hypotheses and scores (the clone property that makes
        retraining differentiation, not re-initialization)."""
        from poccala_tpu.decoder.device import DeviceBeamDecoder
        from poccala_tpu.lexicon.lexicon import FlatLexicon

        inv = base_inv
        i = inv.id_of
        bank, emb = _ci_world(rng, inv)
        cd = _cd_inv(inv)
        n_cd, emit, d = len(cd), 3, 8
        occ = np.full((n_cd, emit), 30.0)
        mean = rng.normal(size=(n_cd, emit, d))
        ex2 = mean**2 + 1.0
        trees = ctx.grow_context_trees(cd, occ, mean, ex2,
                                       target_senones=n_cd * emit,
                                       min_occ=1.0)
        cd_bank = ctx.build_cd_bank(bank, cd, trees)
        assert cd_bank.num_units == n_cd

        entries = _word_entries(inv)
        cd_flat = ctx.build_cd_lexicon(entries, cd,
                                       sil_word=("<sil>", i["sil"]))
        ci_tree = {
            "b": {"b,a1": {"word": ["ba"],
                           "d,e4": {"word": ["bade"]}}},
            "d": {"d,e4": {"word": ["de"]}},
            "m": {"m,a1": {"word": ["ma"]}},
            "sil": {"sil,sil": {"word": ["<sil>"]}},
        }
        ci_flat = FlatLexicon.from_tree(ci_tree, inv)

        dec_ci = DeviceBeamDecoder(bank, ci_flat)
        dec_cd = DeviceBeamDecoder(cd_bank, cd_flat)

        def feats_for(seq, fp=7):
            return np.concatenate([
                emb[u * 3 + 1] + rng.normal(size=(fp, 8)) * 0.4
                for u in seq
            ]).astype(np.float32)

        for seq in ([i["b"], i["a1"]],
                    [i["b"], i["a1"], i["d"], i["e4"]],
                    [i["d"], i["e4"], i["m"], i["a1"]],
                    [i["sil"], i["b"], i["a1"], i["sil"]]):
            x = feats_for(seq)
            h_ci = dec_ci.decode(x, return_nbest=3)
            h_cd = dec_cd.decode(x, return_nbest=3)
            assert [h.words for h in h_ci] == [h.words for h in h_cd], seq
            assert np.allclose([h.score for h in h_ci],
                               [h.score for h in h_cd], rtol=1e-5,
                               atol=1e-4), seq

    def test_cd_lexicon_shares_only_matching_context(self, base_inv):
        cd = _cd_inv(base_inv)
        i = base_inv.id_of
        entries = _word_entries(base_inv)
        flat = ctx.build_cd_lexicon(entries, cd)
        # "ba" and "bade" share the first syllable string but with
        # different right context on a1 -> two distinct first-level
        # nodes, both labeled "b,a1"
        roots = flat.children(0)
        labels = [flat.node_syllable[c] for c in roots]
        assert labels.count("b,a1") == 2
        # words attach where they should
        all_words = [w for ws in flat.node_words for w in ws]
        assert sorted(all_words) == ["ba", "bade", "de", "ma"]


class TestMapSmoothing:
    def _world(self, base_inv, rng):
        ci_bank, _ = _ci_world(rng, base_inv)
        cd = _cd_inv(base_inv)
        n_cd, emit, d = len(cd), 3, 8
        occ_stats = np.full((n_cd, emit), 30.0)
        mean = rng.normal(size=(n_cd, emit, d))
        trees = ctx.grow_context_trees(cd, occ_stats, mean,
                                       mean**2 + 1.0,
                                       target_senones=n_cd * emit,
                                       min_occ=1.0)
        cd_bank = ctx.build_cd_bank(ci_bank, cd, trees)
        # simulate a retrain drift so smoothing has something to blend
        import dataclasses as dc
        import jax.numpy as jnp

        drifted = dc.replace(
            cd_bank,
            means=cd_bank.means + 2.0,
            log_var=cd_bank.log_var + 0.5,
        )
        return ci_bank, cd, trees, cd_bank, drifted

    def test_tau_limits(self, base_inv, rng):
        """tau -> 0 keeps the retrained leaves; huge tau (or a leaf
        with zero occupancy) shrinks to the CI parent exactly (the
        clone's parameters)."""
        ci_bank, cd, trees, clone, drifted = self._world(base_inv, rng)
        occ = np.full((len(cd), 3), 100.0)
        out0 = ctx.map_smooth_bank(drifted, ci_bank, cd, trees, occ,
                                   tau=1e-9)
        assert np.allclose(np.asarray(out0.means),
                           np.asarray(drifted.means), atol=1e-4)
        out_inf = ctx.map_smooth_bank(drifted, ci_bank, cd, trees, occ,
                                      tau=1e12)
        assert np.allclose(np.asarray(out_inf.means),
                           np.asarray(clone.means), atol=1e-3)
        # zero-occupancy leaves shrink fully regardless of tau
        out_z = ctx.map_smooth_bank(drifted, ci_bank, cd, trees,
                                    np.zeros((len(cd), 3)), tau=8.0)
        assert np.allclose(np.asarray(out_z.means),
                           np.asarray(clone.means), atol=1e-3)

    def test_interpolation_is_monotone_and_moment_consistent(
            self, base_inv, rng):
        ci_bank, cd, trees, clone, drifted = self._world(base_inv, rng)
        occ = np.full((len(cd), 3), 16.0)
        out = ctx.map_smooth_bank(drifted, ci_bank, cd, trees, occ,
                                  tau=16.0)  # w = 0.5
        m = np.asarray(out.means)
        lo = np.minimum(np.asarray(drifted.means),
                        np.asarray(clone.means))
        hi = np.maximum(np.asarray(drifted.means),
                        np.asarray(clone.means))
        assert (m >= lo - 1e-4).all() and (m <= hi + 1e-4).all()
        # blended variance >= blend of variances (moment form adds the
        # between-mean spread)
        v = np.exp(np.asarray(out.log_var))
        v_mix = 0.5 * np.exp(np.asarray(drifted.log_var)) \
            + 0.5 * np.exp(np.asarray(clone.log_var))
        assert (v >= v_mix - 1e-4).all()
        # mixture weights stay normalized over active slots
        w = np.exp(np.asarray(out.log_w)).sum(-1)
        assert np.allclose(w, 1.0, atol=1e-4)


class TestLexiconExtension:
    def test_extend_for_lexicon_registers_unseen_word(self, base_inv,
                                                      rng):
        """decode --cd on a lexicon with words outside the training
        expansion: new triples get bank rows (transitions borrowed from
        a same-base CD unit, senones from tree routing) and the graph
        compiles and decodes."""
        from poccala_tpu.decoder.device import DeviceBeamDecoder

        inv = base_inv
        i = inv.id_of
        bank, emb = _ci_world(rng, inv)
        cd = _cd_inv(inv)
        n_cd, emit = len(cd), 3
        occ = np.full((n_cd, emit), 30.0)
        mean = rng.normal(size=(n_cd, emit, 8))
        ex2 = mean**2 + 1.0
        trees = ctx.grow_context_trees(cd, occ, mean, ex2,
                                       target_senones=40, min_occ=1.0)
        cd_bank = ctx.build_cd_bank(bank, cd, trees)
        # "made" = m,a1 + d,e4 — the cross-syllable triples (a1 with
        # right context d; m with left boundary ok) are NOT in the
        # training expansion ("ma" and "de" exist but not compounded)
        entries = _word_entries(inv) + [
            ("made", [[i["m"], i["a1"]], [i["d"], i["e4"]]])]
        n_before = len(cd)
        cd2, trees2, bank2 = ctx.extend_for_lexicon(cd, trees, cd_bank,
                                                    entries)
        assert len(cd2) > n_before
        assert bank2.num_units == len(cd2)
        assert bank2.num_states == cd_bank.num_states  # GMMs untouched
        flat = ctx.build_cd_lexicon(entries, cd2)
        dec = DeviceBeamDecoder(bank2, flat)
        x = np.concatenate([
            emb[u * 3 + 1] + rng.normal(size=(7, 8)) * 0.4
            for u in (i["m"], i["a1"], i["d"], i["e4"])
        ]).astype(np.float32)
        hyps = dec.decode(x, return_nbest=3)
        assert hyps and any("made" in h.words for h in hyps)

    def test_unroutable_words_filtered_not_crashed(self, base_inv, rng):
        """A lexicon word using a base unit absent from the expansion
        vocabulary has no tying tree; it must be droppable up front
        (filter_routable_entries) instead of crashing decode startup."""
        cd, trees = TestTrees()._grown(base_inv, rng)
        i = base_inv.id_of
        entries = _word_entries(base_inv)
        # fabricate an unknown base by removing its trees: "ma" (the
        # only word using m) becomes unroutable
        trees.nodes.pop((i["m"], 0), None)
        trees.nodes.pop((i["m"], 1), None)
        trees.nodes.pop((i["m"], 2), None)
        good, skipped = ctx.filter_routable_entries(cd, trees, entries)
        assert "ma" in skipped
        assert all(w != "ma" for w, _ in good)
        from poccala_tpu.lexicon.lexicon import FlatLexicon

        inv = base_inv
        ci_tree = {
            "b": {"b,a1": {"word": ["ba"],
                           "d,e4": {"word": ["bade"]}}},
            "d": {"d,e4": {"word": ["de"]}},
        }
        flat = FlatLexicon.from_tree(ci_tree, inv)
        entries = ctx.cd_entries_from_flat(flat)
        got = {w: syls for w, syls in entries}
        i = inv.id_of
        assert got["ba"] == [[i["b"], i["a1"]]]
        assert got["bade"] == [[i["b"], i["a1"]], [i["d"], i["e4"]]]
        assert got["de"] == [[i["d"], i["e4"]]]


class TestEndToEnd:
    def test_train_expand_retrain_decode(self, base_inv, rng):
        """Mini pipeline: CI embedded-BW training, alignment-driven CD
        stats, tree tying, clone, one CD retrain epoch, CD decode —
        the wer_run --cd recipe in miniature."""
        import jax.numpy as jnp

        from poccala_tpu.decoder.device import DeviceBeamDecoder
        from poccala_tpu.train import alignment as align
        from poccala_tpu.train.trainer import Trainer

        inv = base_inv
        i = inv.id_of
        entries = _word_entries(inv)
        cfg = Config()
        cfg.model.state_num = 5
        cfg.model.mix_level = 1
        cfg.model.max_mix_level = 2
        cfg.model.var_floor_scale = 0.01
        cfg.train.max_frames = 96
        cfg.train.max_label_len = 12
        d = cfg.frontend.feat_dim

        emb = rng.normal(size=(len(inv), d)).astype(np.float32) * 3

        def make_batch(n_utts):
            feats = np.zeros((n_utts, 96, d), np.float32)
            masks = np.zeros((n_utts, 96), bool)
            labels = np.zeros((n_utts, 12), np.int32)
            lens = np.zeros(n_utts, np.int32)
            seqs = []
            for u in range(n_utts):
                k = int(rng.integers(1, 3))
                words = [entries[int(rng.integers(len(entries)))]
                         for _ in range(k)]
                units = [i["sil"]] + \
                    [x for _, syls in words for s in syls for x in s] + \
                    [i["sil"]]
                t = 0
                for x in units:
                    fp = int(rng.integers(4, 7))
                    feats[u, t: t + fp] = emb[x] + rng.normal(
                        size=(fp, d)).astype(np.float32) * 0.3
                    t += fp
                masks[u, :t] = True
                labels[u, : len(units)] = units
                lens[u] = len(units)
                seqs.append([[x for s in syls for x in s]
                             for _, syls in words])
            return Batch(feats=feats, t_masks=masks, labels=labels,
                         label_lens=lens), seqs

        batch, word_seqs = make_batch(16)
        tr = Trainer(cfg, inv)
        tr.flat_start([batch])
        tr.auto([batch], t=2, mode=2, init=False)
        ci_bank = tr.export_bank()

        cd = ctx.CDInventory.from_words(
            [[u for s in syls for u in s] for _, syls in entries],
            inv, context_free=[i["sil"]])
        cd_labels = ctx.expand_labels(batch.labels, batch.label_lens,
                                      word_seqs, cd)
        _, lp = align.align_batch(
            ci_bank, jnp.asarray(batch.labels),
            jnp.asarray(batch.label_lens), jnp.asarray(batch.feats),
            jnp.asarray(batch.t_masks), cfg.model.state_num,
            cfg.train.max_label_len)
        occ, mean, ex2 = ctx.collect_triple_stats(
            batch.feats, cd_labels, np.asarray(lp), len(cd),
            cfg.model.emit_states)
        assert occ.sum() > 0
        trees = ctx.grow_context_trees(cd, occ, mean, ex2,
                                       target_senones=3 * ci_bank.num_states,
                                       min_occ=4.0)
        cd_bank = ctx.build_cd_bank(ci_bank, cd, trees)
        assert cd_bank.num_states >= ci_bank.num_states

        # CD retrain: same Trainer machinery on CD labels
        tr2 = Trainer(cfg, UnitInventory(
            [f"cd{k}" for k in range(len(cd))]))
        tr2.bank = cd_bank
        tr2._var_floor_vec = tr._var_floor_vec
        cd_batch = dataclasses.replace(batch, labels=cd_labels)
        ll = tr2.scheme2_epoch([cd_batch])
        assert np.isfinite(ll)

        flat = ctx.build_cd_lexicon(entries, cd,
                                    sil_word=("<sil>", i["sil"]))
        dec = DeviceBeamDecoder(tr2.export_bank(), flat)
        nf = batch.t_masks[:4].sum(axis=1).astype(np.int32)
        out = dec.decode_batch(batch.feats[:4], nf)
        assert all(len(h) >= 1 for h in out)
