"""Worker process for the multi-host E-step test (run via subprocess).

Usage: python multihost_worker.py <process_id> <num_processes> <out_json>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def synth(rng, num_units, emit, dim, b, t, max_l):
    labels = rng.integers(0, num_units, size=(b, max_l)).astype(np.int32)
    lens = rng.integers(1, max_l + 1, size=(b,)).astype(np.int32)
    xs = rng.normal(size=(b, t, dim)).astype(np.float32)
    masks = np.ones((b, t), bool)
    return labels, lens, xs, masks


def main():
    pid, nproc, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    if nproc > 1:
        jax.distributed.initialize(
            "localhost:12757", num_processes=nproc, process_id=pid
        )

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from poccala_tpu.config import ModelConfig
    from poccala_tpu.models import senone_bank as sb
    from poccala_tpu.parallel import mesh as pmesh

    cfg = ModelConfig(state_num=5, mix_level=2, max_mix_level=2)
    bank = sb.create_bank(3, cfg, 5, key=jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    global_b, t, max_l = 8, 12, 3
    labels, lens, xs, masks = synth(rng, 3, 3, 5, global_b, t, max_l)

    mesh = pmesh.make_mesh(data_axis=len(jax.devices()), state_axis=1)
    estep = pmesh.make_parallel_estep(mesh, cfg.state_num, max_l)
    if nproc > 1:
        local = slice(pid * (global_b // nproc), (pid + 1) * (global_b // nproc))
        arrays = pmesh.distribute_batch(
            mesh, (labels[local], lens[local], xs[local], masks[local]),
            global_b,
        )
        bank = pmesh.replicate_bank(bank, mesh)
    else:
        arrays = tuple(jnp.asarray(a) for a in (labels, lens, xs, masks))
        bank = pmesh.replicate_bank(bank, mesh)
    stats, _ = estep(bank, *arrays)

    result = {
        "loglik": float(stats.loglik),
        "occ_sum": float(np.asarray(stats.occ).sum()),
        "trans_sum": float(np.asarray(stats.trans).sum()),
        "cx_checksum": float(np.abs(np.asarray(stats.cx)).sum()),
        "n_utts": float(stats.n_utts),
        "global_devices": jax.device_count(),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
