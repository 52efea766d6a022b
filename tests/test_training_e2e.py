"""End-to-end training tests on a synthetic corpus.

This is SURVEY.md §7 step 4's "minimum end-to-end slice": synthetic
WAVs → MFCC+VAD → flat-start → embedded Baum-Welch → Viterbi alignment,
plus the scheme-1 path (uniform segmentation → k-means/EM → realign).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from poccala_tpu.config import Config
from poccala_tpu.io import corpus as corpus_io
from poccala_tpu.train import alignment as align
from poccala_tpu.train.trainer import Trainer


UNITS = ["aa", "bb", "cc", "dd"]


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    """Small synthetic corpus + config shared by the tests in this module."""
    root = str(tmp_path_factory.mktemp("corpus"))
    inv = corpus_io.UnitInventory(UNITS)
    audio_dir, label_dir = corpus_io.generate_synthetic_corpus(
        root, inv, num_utts=16, units_per_utt=(2, 4), unit_seconds=0.3, seed=7
    )
    cfg = Config()
    cfg.paths.audio_file_path = audio_dir
    cfg.paths.label_file_path = label_dir
    cfg.frontend.vad = False  # keep all frames: synthetic units are loud
    cfg.model.state_num = 5
    cfg.model.mix_level = 2
    cfg.model.max_mix_level = 3
    cfg.train.batch_size = 8
    cfg.train.max_frames = 256
    cfg.train.max_label_len = 4
    cfg.train.load_line = 0
    cfg.train.step = 2
    cfg.train.proportion = 1.0
    cfg.train.max_em_iters = 8
    corpus = corpus_io.Corpus(cfg, inv)
    batches = list(corpus.batches())
    return cfg, inv, batches


class TestCorpus:
    def test_inventories(self):
        inv = corpus_io.UnitInventory.standard("IF")
        assert len(inv) == 57  # 21 initials + '#' + 35 finals
        inv2 = corpus_io.UnitInventory.standard("XIF")
        assert len(inv2) == 62
        inv3 = corpus_io.UnitInventory.standard("XIF_tone")
        assert len(inv3) == 27 + 35 * 5

    def test_unit_file_roundtrip(self, tmp_path):
        inv = corpus_io.UnitInventory(["a", "b", "cc"])
        p = str(tmp_path / "units")
        inv.save(p)
        inv2 = corpus_io.UnitInventory.from_file(p)
        assert inv2.units == inv.units
        assert inv2.encode(["cc", "a"]) == [2, 0]

    def test_batches_shapes(self, tiny_setup):
        cfg, inv, batches = tiny_setup
        assert len(batches) == 2
        b = batches[0]
        assert b.feats.shape == (8, 256, 39)
        assert b.labels.shape == (8, 4)
        assert (b.label_lens >= 2).all() and (b.label_lens <= 4).all()
        assert b.t_masks.any(axis=1).all()

    def test_sharding(self):
        pairs = [(f"a{i}", f"l{i}") for i in range(10)]
        s0 = corpus_io.shard_pairs(pairs, 0, 3)
        s1 = corpus_io.shard_pairs(pairs, 1, 3)
        s2 = corpus_io.shard_pairs(pairs, 2, 3)
        assert len(s0) == 3 and len(s1) == 3 and len(s2) == 4
        assert s0 + s1 + s2 == pairs


class TestScheme2:
    def test_flat_start_plus_bw_improves_and_aligns(self, tiny_setup):
        cfg, inv, batches = tiny_setup
        tr = Trainer(cfg, inv)
        lls = tr.auto(batches, t=3, mode=2, init=True)
        # monotone improvement across full EM steps
        assert lls[1] > lls[0]
        assert lls[2] >= lls[1] - 1e-2
        # alignment should now track the synthetic unit boundaries:
        # each utterance's frames divide roughly equally among its units
        b = batches[0]
        _, lp = align.align_batch(
            tr.bank, jnp.asarray(b.labels), jnp.asarray(b.label_lens),
            jnp.asarray(b.feats), jnp.asarray(b.t_masks),
            cfg.model.state_num, cfg.train.max_label_len,
        )
        lp = np.asarray(lp)
        ok = align.check_alignment(lp, b.labels, b.label_lens)
        assert ok.mean() >= 0.7
        # monotone non-decreasing label positions per utterance
        for i in range(len(lp)):
            v = lp[i][lp[i] >= 0]
            assert (np.diff(v) >= 0).all()


class TestScheme1:
    def test_uniform_init_then_realign(self, tiny_setup):
        cfg, inv, batches = tiny_setup
        tr = Trainer(cfg, inv)
        lls = tr.auto(batches, t=2, mode=1, init=True)
        assert np.isfinite(lls).all()
        assert lls[1] > lls[0]  # realignment round improves
        # transition matrices stay stochastic on emitting rows
        a = np.exp(np.asarray(tr.bank.log_A))
        assert np.allclose(a[:, 1:-1, :].sum(-1), 1.0, atol=1e-3)

    def test_mix_growth_reclusters(self, tiny_setup):
        cfg, inv, batches = tiny_setup
        tr = Trainer(cfg, inv)
        tr.auto(batches, t=1, mode=1, init=True)
        assert int(np.asarray(tr.bank.mix_counts).max()) == 2
        tr.add_mix_level()
        tr.auto(batches, t=1, mode=1, init=False)
        counts = np.asarray(tr.bank.mix_counts)
        assert counts.max() == 3  # grew where data sufficed
        w = np.exp(np.asarray(tr.bank.log_w))
        grown = counts == 3
        assert np.all(w[grown, 2] > 0)


class TestSmem:
    def test_smem_fixes_bad_assignment(self, rng):
        """Start EM in a local optimum (two components on one blob, one
        straddling two); SMEM should accept a move and raise Q."""
        from poccala_tpu.ops import em as em_ops
        from poccala_tpu.train import smem
        import jax

        x = np.concatenate([
            rng.normal(size=(120, 2)) * 0.3 + [0, 0],
            rng.normal(size=(120, 2)) * 0.3 + [6, 0],
            rng.normal(size=(120, 2)) * 0.3 + [0, 6],
        ]).astype(np.float32)
        mask = np.ones(len(x), bool)
        # degenerate init: two comps at [0,0], one between the others
        params = em_ops.GmmParams(
            means=jnp.asarray([[0.1, 0.0], [-0.1, 0.0], [3.0, 3.0]]),
            log_var=jnp.zeros((3, 2)),
            log_w=jnp.log(jnp.full((3,), 1 / 3)),
        )
        fitted, q0, _ = em_ops.em_fit(
            params, jnp.asarray(x), jnp.asarray(mask), jnp.ones(3, bool),
            max_iters=30,
        )
        new_params, accepted = smem.smem_step(
            fitted, x, mask, jax.random.PRNGKey(0), mix_level=3
        )
        assert accepted
        lg, comp = em_ops.e_step(new_params, jnp.asarray(x), jnp.asarray(mask))
        q1 = float(em_ops.q_value(lg, comp, new_params.log_w))
        assert q1 > float(q0)
        got = np.sort(np.asarray(new_params.means), axis=0)
        want = np.sort(np.array([[0, 0], [6, 0], [0, 6]], np.float32), axis=0)
        assert np.allclose(got, want, atol=0.5)


class TestCorpusVariants:
    def test_vad_and_quirks_paths(self, tmp_path):
        """Corpus loading with VAD enabled and reference-quirks mode."""
        from poccala_tpu.config import Config
        from poccala_tpu.io import corpus as corpus_io

        inv = corpus_io.UnitInventory(["qa", "qb"])
        audio, label = corpus_io.generate_synthetic_corpus(
            str(tmp_path), inv, num_utts=4, units_per_utt=(2, 3),
            unit_seconds=0.5, seed=5)
        for quirks in (False, True):
            cfg = Config()
            cfg.paths.audio_file_path = audio
            cfg.paths.label_file_path = label
            cfg.train.load_line = 0
            cfg.train.batch_size = 4
            cfg.train.max_frames = 200
            cfg.train.max_label_len = 3
            cfg.frontend.vad = True
            cfg.frontend.reference_quirks = quirks
            corpus = corpus_io.Corpus(cfg, inv)
            batches = list(corpus.batches(use_native=False))
            assert len(batches) == 1
            b = batches[0]
            # VAD keeps most frames of the loud synthetic units
            assert b.t_masks.sum() > 0
            assert np.isfinite(b.feats).all()
