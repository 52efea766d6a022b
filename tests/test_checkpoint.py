"""Checkpoint round-trips: native format + reference-layout interop."""

import numpy as np

from poccala_tpu.io.corpus import UnitInventory
from poccala_tpu.train import checkpoint as ckpt

from .test_senone_topology import make_bank


FIELDS = ("means", "log_var", "log_w", "log_A", "log_pi", "mix_counts")


class TestNativeCheckpoint:
    def test_roundtrip(self, rng, tmp_path):
        _, bank = make_bank(rng)
        man = {"round": 3, "mode": 2, "mix_level": 2}
        ckpt.save_checkpoint(str(tmp_path / "ck"), bank, man,
                             units=["a", "b", "c", "d"])
        bank2, man2 = ckpt.load_checkpoint(str(tmp_path / "ck"))
        for f in FIELDS:
            assert np.array_equal(
                np.asarray(getattr(bank, f)), np.asarray(getattr(bank2, f))
            ), f
        assert man2["round"] == 3 and man2["units"] == ["a", "b", "c", "d"]

    def test_missing_checkpoint_raises(self, tmp_path):
        import pytest
        from poccala_tpu.utils.errors import ParameterFileError

        with pytest.raises(ParameterFileError):
            ckpt.load_checkpoint(str(tmp_path / "nope"))


class TestReferenceLayout:
    def test_export_import_roundtrip(self, rng, tmp_path):
        cfg, bank = make_bank(rng, num_units=3, state_num=5, mix=2,
                              max_mix=3, dim=4)
        inv = UnitInventory(["x", "y", "z"])
        root = str(tmp_path / "params")
        ckpt.export_reference_layout(root, bank, inv, unit_type="TEST")
        # the reference directory shape exists
        import os
        assert os.path.exists(root + "/TEST/y/HMM/transmat.npy")
        assert os.path.exists(root + "/TEST/z/GMM_2/GMM_covariance.npy")
        assert os.path.exists(root + "/TEST/x/GMM_0/GMM_config.ini")

        bank2 = ckpt.import_reference_layout(
            root, inv, "TEST", state_num=5, max_mix=3
        )
        m = np.asarray(bank.mix_counts)
        for s in range(bank.num_states):
            k = int(m[s])
            assert np.allclose(
                np.asarray(bank.means)[s, :k], np.asarray(bank2.means)[s, :k],
                atol=1e-6,
            )
            assert np.allclose(
                np.asarray(bank.log_var)[s, :k],
                np.asarray(bank2.log_var)[s, :k], atol=1e-5,
            )
            assert np.allclose(
                np.exp(np.asarray(bank.log_w))[s, :k],
                np.exp(np.asarray(bank2.log_w))[s, :k], atol=1e-6,
            )
        assert np.allclose(
            np.exp(np.asarray(bank.log_A)), np.exp(np.asarray(bank2.log_A)),
            atol=1e-6,
        )
        assert np.array_equal(np.asarray(bank.mix_counts),
                              np.asarray(bank2.mix_counts))
