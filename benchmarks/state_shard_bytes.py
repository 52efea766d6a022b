"""Per-device memory of the state-sharded vs replicated train step.

The config-4 claim (senone banks beyond one chip's HBM) is about
compiled per-device memory, which is backend-agnostic — this study runs
on the 8-virtual-device CPU mesh and records ``memory_analysis``
argument/output/temp bytes for the replicated (data=8) and the
state-sharded (data=4 × state=2) full EM step at a config-4-shaped
bank.  Writes ``benchmarks/state_shard_bytes.json``.

Usage (forced CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \\
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
  python benchmarks/state_shard_bytes.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from poccala_tpu.config import ModelConfig
    from poccala_tpu.models import senone_bank as sb
    from poccala_tpu.parallel import mesh as pmesh

    assert jax.device_count() >= 8, "run with 8 virtual CPU devices"

    # config-4 shape: 2048 units x 3 emitting = 6144 senones, 32 mix
    cfg = ModelConfig(state_num=5, mix_level=32, max_mix_level=32)
    units, dim, b, t, max_l = 2048, 39, 32, 64, 8
    bank = sb.create_bank(units, cfg, dim, key=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    labels = jnp.asarray(
        rng.integers(0, units, size=(b, max_l)).astype(np.int32))
    lens = jnp.asarray(
        rng.integers(1, max_l + 1, size=(b,)).astype(np.int32))
    xs = jnp.asarray(rng.normal(size=(b, t, dim)).astype(np.float32))
    masks = jnp.asarray(np.ones((b, t), bool))

    def analyze(comp):
        ma = comp.memory_analysis()
        if ma is None:
            return None
        return {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
        }

    mesh_r = pmesh.make_mesh(data_axis=8, state_axis=1)
    step_r = pmesh.make_parallel_train_step(mesh_r, cfg.state_num, max_l)
    comp_r = step_r.lower(
        pmesh.replicate_bank(bank, mesh_r), labels, lens, xs, masks
    ).compile()

    mesh_s = pmesh.make_mesh(data_axis=4, state_axis=2)
    bank_p, _ = pmesh.pad_bank_states(bank, 2)
    bank_s = pmesh.shard_bank_states(bank_p, mesh_s)
    step_s = pmesh.make_state_sharded_train_step(mesh_s, cfg.state_num, max_l)
    comp_s = step_s.lower(bank_s, labels, lens, xs, masks).compile()

    gmm_bytes = int(sum(
        np.prod(a.shape) * 4 for a in (bank.means, bank.log_var, bank.log_w)
    ))
    out = {
        "bank": {"senones": int(bank.num_states), "mix": 32, "dim": dim,
                 "gmm_tensor_bytes": gmm_bytes},
        "replicated_data8": analyze(comp_r),
        "state_sharded_data4x2": analyze(comp_s),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "state_shard_bytes.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
