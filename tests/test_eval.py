"""WER harness, profiling utils, and mesh-backed Trainer."""

import numpy as np
import pytest

from poccala_tpu.eval import edit_distance, wer


class TestWer:
    def test_edit_distance(self):
        s, d, i, dist = edit_distance(list("kitten"), list("sitting"))
        assert dist == 3
        assert s == 2 and i == 1 and d == 0

    def test_identical(self):
        s, d, i, dist = edit_distance(["a", "b"], ["a", "b"])
        assert (s, d, i, dist) == (0, 0, 0, 0)

    def test_corpus_wer(self):
        refs = [["你", "好"], ["马"]]
        hyps = [["你", "好"], ["你"]]
        r = wer(refs, hyps)
        assert r.wer == pytest.approx(1 / 3)
        assert r.substitutions == 1
        assert r.sentences == 2 and r.sentence_errors == 1
        assert r.ser == 0.5

    def test_empty_hypothesis(self):
        r = wer([["a", "b", "c"]], [[]])
        assert r.deletions == 3 and r.wer == 1.0


class TestProfiling:
    def test_op_timer(self):
        import jax.numpy as jnp

        from poccala_tpu.utils.profiling import OpTimer

        t = OpTimer()
        x = jnp.ones((64, 64))
        import jax

        f = jax.jit(lambda a: a @ a)
        out, dt = t.timeit("matmul", f, x, iters=3,
                           flops=2 * 64 ** 3)
        assert dt > 0
        rep = t.report()
        assert "matmul" in rep and "TFLOP" in rep

    def test_measure_context(self):
        from poccala_tpu.utils.profiling import OpTimer

        t = OpTimer()
        with t.measure("block"):
            sum(range(1000))
        assert t.records["block"]["calls"] == 1


class TestTrainerWithMesh:
    def test_scheme2_on_mesh_matches_single(self, rng):
        """Trainer with a data-parallel mesh must train to (near-)the
        same bank as the sequential path."""
        import jax.numpy as jnp

        from poccala_tpu.config import Config
        from poccala_tpu.io.corpus import Batch, UnitInventory
        from poccala_tpu.parallel import make_mesh
        from poccala_tpu.train.trainer import Trainer

        inv = UnitInventory(["u0", "u1", "u2"])
        cfg = Config()
        cfg.model.state_num = 5
        cfg.model.mix_level = 1
        cfg.model.max_mix_level = 1
        cfg.frontend.dct_num = 6
        cfg.frontend.delta_1 = False
        cfg.frontend.delta_2 = False
        cfg.train.max_label_len = 3
        cfg.train.proportion = 1.0
        cfg.train.step = 1

        b, t, d = 12, 20, 6
        feats = rng.normal(size=(b, t, d)).astype(np.float32)
        masks = np.ones((b, t), bool)
        labels = rng.integers(0, 3, size=(b, 3)).astype(np.int32)
        lens = rng.integers(1, 4, size=(b,)).astype(np.int32)
        batch = Batch(feats=feats, t_masks=masks, labels=labels,
                      label_lens=lens)

        mesh = make_mesh(data_axis=8, state_axis=1)
        tr_m = Trainer(cfg, inv, mesh=mesh)
        tr_s = Trainer(cfg, inv)
        tr_m.flat_start([batch])
        tr_s.flat_start([batch])
        ll_m = tr_m.scheme2_epoch([batch])
        ll_s = tr_s.scheme2_epoch([batch])
        assert np.isclose(ll_m, ll_s, rtol=1e-5)
        assert np.allclose(np.asarray(tr_m.bank.means),
                           np.asarray(tr_s.bank.means), atol=1e-4)
