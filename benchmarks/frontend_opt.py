"""Frontend dot-precision study: attack the 0.36 frontend roofline row.

VERDICT r04 weak #5: the frontend was the worst roofline row and its
Pallas kernel lost to XLA at production shapes (retired in r05 — see
ROADMAP negative results).  What remains on the table is the matmul
precision: the frontend's dots run HIGHEST (6-pass f32) for
correctness, but the DFT/mel/DCT operands are O(1)-magnitude
trigonometric bases — nothing like the 1e6 covariance-floor
coefficients that force HIGHEST in GMM scoring — so bf16_3x
(``Precision.HIGH``, ~2x the pass rate) may be oracle-tight here.

Measures, per production config (batch x 4 s):

* full batched frontend ms at dot_precision in {highest, high,
  default};
* max |feature error| vs the HIGHEST baseline (the r04 correctness
  bar was <= 3e-4 abs for the whole pipeline);
* the throughput-per-error trade that decides the default.

Writes ``benchmarks/frontend_opt.json``; run on the chip.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_poccala"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from poccala_tpu.config import Config
    from poccala_tpu.ops.frontend import Frontend

    cfg = Config()
    rate = cfg.frontend.sample_rate
    rng = np.random.default_rng(0)

    rows = []
    for name, batch in (("config2_b256", 256), ("config3_b512", 512)):
        n_samples = 4 * rate
        signals = jnp.asarray(
            (rng.normal(size=(batch, n_samples)) * 2000).astype(np.float32))
        n_samp = jnp.asarray(np.full((batch,), n_samples, np.int64))

        outs = {}
        times = {}
        for prec in ("highest", "high", "default"):
            fe = Frontend(dataclasses.replace(cfg.frontend,
                                              dot_precision=prec))
            impl = jax.jit(fe.batch_impl)

            @jax.jit
            def run(sig=signals, impl=impl):
                def step(c, _):
                    s = jnp.where(c == 1.2345e30, sig + 1.0, sig)
                    f, m = impl(s, n_samp)
                    return c + jnp.sum(f), None
                tot, _ = jax.lax.scan(step, 0.0, None, length=8)
                return tot

            _ = float(run())          # compile + warm
            t0 = time.time()
            _ = float(run())
            times[prec] = (time.time() - t0) / 8 * 1000
            f, _ = jax.jit(fe.batch_impl)(signals, n_samp)
            outs[prec] = np.asarray(f)
            log(f"{name} {prec}: {times[prec]:.2f} ms")

        base = outs["highest"]
        row = {
            "config": name,
            "batch": batch,
            "utt_seconds": 4.0,
            "frontend_ms": {k: round(v, 3) for k, v in times.items()},
            "speedup_high_vs_highest": round(
                times["highest"] / times["high"], 3),
            "max_abs_err_high": float(np.abs(outs["high"] - base).max()),
            "max_abs_err_default": float(
                np.abs(outs["default"] - base).max()),
            "audio_s_per_s_high": round(
                batch * 4.0 / (times["high"] / 1e3), 1),
            "audio_s_per_s_highest": round(
                batch * 4.0 / (times["highest"] / 1e3), 1),
        }
        rows.append(row)
        log(str(row))

    out = {
        "artifact": "frontend_opt",
        "note": (
            "Pallas frontend kernel retired r05 (lost to XLA at every "
            "production shape, scaling.json r04).  This decides the "
            "XLA path's dot precision: bf16_3x ('high') is adopted as "
            "a default only if its max feature error stays within the "
            "3e-4 whole-pipeline bar; 'default' (1-pass bf16) is "
            "recorded as the known-bad control (~0.15 abs)."),
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "frontend_opt.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "frontend_high_speedup",
                      "value": rows[0]["speedup_high_vs_highest"],
                      "max_abs_err": rows[0]["max_abs_err_high"]}))


if __name__ == "__main__":
    main()
