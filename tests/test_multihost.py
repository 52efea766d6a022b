"""Multi-host (2-process) distributed E-step equivalence.

Replaces the reference's shared-directory multi-machine simulation
(SURVEY.md §4: N jobs with different ENV_ID on one box,
``Controller.py:22-32``) with real ``jax.distributed`` process groups
over CPU devices: two processes, 4 virtual devices each, one global
(data=8) mesh; statistics must match the single-process run.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def run_workers(nproc: int, tmp_path, mode: str = "estep") -> list[dict]:
    procs, outs = [], []
    env = {k: v for k, v in os.environ.items()}
    for pid in range(nproc):
        out = str(tmp_path / f"result_{mode}_{nproc}_{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), out, mode,
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        ))
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
    return [json.load(open(o)) for o in outs]


@pytest.mark.slow
class TestMultiHost:
    def test_two_process_psum_matches_single(self, tmp_path):
        single = run_workers(1, tmp_path)[0]
        double = run_workers(2, tmp_path)
        assert double[0]["global_devices"] == 8
        for key in ("loglik", "occ_sum", "trans_sum", "cx_checksum", "n_utts"):
            assert np.isclose(double[0][key], single[key], rtol=1e-4), key
            assert np.isclose(double[1][key], single[key], rtol=1e-4), key

    def test_two_process_distributed_decode(self, tmp_path):
        """Distributed beam decode across a real process boundary
        (config 5's 'distributed beam decode, N >= 2 hosts'): global
        1-best summaries must equal the single-process run."""
        single = run_workers(1, tmp_path, mode="decode")[0]
        double = run_workers(2, tmp_path, mode="decode")
        assert double[0]["global_devices"] == 8
        # both runs decode the same 16 utterances (seeded identically)
        for r in double:
            assert np.isclose(r["best_scores_sum"],
                              single["best_scores_sum"], rtol=1e-4)
            assert r["best_word_count"] == single["best_word_count"]
            # every utterance decodes at least one word
            assert r["best_word_count"] >= r["global_batch"]

    def test_two_process_sharded_checkpoint_roundtrip(self, tmp_path):
        """Both processes write only their shards of a state-sharded
        bank into one orbax checkpoint, then restore it straight onto
        the sharding — the multi-host checkpoint story of VERDICT
        round-1 item 7."""
        results = run_workers(2, tmp_path, mode="ckpt")
        for r in results:
            assert r["format"] == "orbax" and r["round"] == 7
            assert r["global_devices"] == 8
            assert np.isclose(r["restored_checksum"], r["means_checksum"],
                              rtol=1e-6)
            assert r["shard_rows"] * r["state_axis"] == r["total_rows"]
