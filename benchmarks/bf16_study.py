"""bf16 scoring study: throughput gain vs accuracy drift on the chip.

ROADMAP "bf16 scoring option" (VERDICT round-1 item 6): run the fused
GMM scorer (Pallas on TPU) in fp32 and bf16 at BASELINE config-3/4
scales and record

* scoring TFLOP/s for both dtypes (and the speedup ratio),
* state-score drift (mean/max nats) bf16 vs fp32,
* Viterbi forced-alignment path flip rate on a trained-by-construction
  bank,
* full-pipeline (E+M+align) audio-s/s with ``score_dtype`` flipped.

Writes ``benchmarks/bf16_study.json`` and prints a markdown table.
Accuracy gates are enforced continuously in tests/test_bf16_scoring.py;
this script produces the committed TPU evidence.

Usage: python benchmarks/bf16_study.py   (on the TPU)
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    # name, units, mixtures, batch (dim=39, state_num=5)
    ("config3_2k_senones", 683, 16, 256),
    ("config4_6k_senones", 2048, 32, 128),
]


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
    from poccala_tpu.models import senone_bank as sb
    from poccala_tpu.ops.frontend import Frontend
    from poccala_tpu.ops.pallas.gmm_score_tpu import gmm_log_scores_fast
    from poccala_tpu.train import accumulators as acc
    from poccala_tpu.train import alignment as align

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rows = []
    for name, units, mix, batch in CONFIGS:
        cfg = Config()
        cfg.model.state_num = 5
        cfg.model.mix_level = mix
        cfg.model.max_mix_level = mix
        d = cfg.frontend.feat_dim
        max_l, utt_seconds = 16, 4.0
        n_samples = int(utt_seconds * cfg.frontend.sample_rate)

        rng = np.random.default_rng(0)
        signals = jnp.asarray(
            (rng.normal(size=(batch, n_samples)) * 2000).astype(np.float32))
        n_samp = jnp.asarray(np.full((batch,), n_samples, np.int64))
        labels = jnp.asarray(
            rng.integers(0, units, size=(batch, max_l)).astype(np.int32))
        lens = jnp.asarray(
            rng.integers(max_l // 2, max_l + 1, size=(batch,)).astype(np.int32))
        fe = Frontend(cfg.frontend)
        bank = sb.create_bank(units, cfg.model, d, key=jax.random.PRNGKey(0))
        feats, masks = fe.mfcc_batch(signals, n_samp)
        x = feats.reshape(-1, d)

        # ---- scoring kernel fp32 vs bf16
        def score8(dtype):
            @jax.jit
            def run(x):
                def step(c, _):
                    xi = jnp.where(c == 1.2345e30, x + 1.0, x)
                    out = gmm_log_scores_fast(
                        xi, bank.means, bank.log_var, bank.log_w,
                        score_dtype=dtype)
                    return c + jnp.sum(out), None
                tot, _ = jax.lax.scan(step, 0.0, None, length=8)
                return tot
            _ = float(run(x))
            t0 = time.time()
            _ = float(run(x))
            return (time.time() - t0) / 8

        dt32 = score8("float32")
        dt16 = score8("bfloat16")
        s_total = bank.num_states
        flops = 2 * x.shape[0] * 2 * d * s_total * mix
        tf32, tf16 = flops / dt32 / 1e12, flops / dt16 / 1e12

        # ---- accuracy drift on-chip (same kernels the bench uses),
        # in two regimes:
        # (a) trained-like bank: means drawn from the data (what k-means
        #     init / EM produce — the deployment regime, where the
        #     centered residuals are small);
        # (b) random-init bank scoring real features — the worst case
        #     (bank means sit ~|x̄| away from the data, so the bf16
        #     rounding of the cross-term operand μ'p is amplified).
        def drift_of(b):
            f32 = np.asarray(gmm_log_scores_fast(
                x[:4096], b.means, b.log_var, b.log_w))
            b16 = np.asarray(gmm_log_scores_fast(
                x[:4096], b.means, b.log_var, b.log_w,
                score_dtype="bfloat16"))
            return np.abs(b16 - f32)

        xs_np = np.asarray(x)
        sampled = xs_np[rng.integers(0, len(xs_np),
                                     size=(s_total, mix))]  # [S, M, D]
        trained_bank = dataclasses.replace(
            bank,
            means=jnp.asarray(sampled + rng.normal(size=sampled.shape)
                              .astype(np.float32) * 0.5),
            log_var=jnp.log(jnp.asarray(
                np.var(xs_np, axis=0) + 0 * sampled + 0.1)),
        )
        drift = drift_of(trained_bank)
        drift_worst = drift_of(bank)

        # ---- Viterbi flip rate on a separable trained bank
        emb = rng.normal(size=(units, d)).astype(np.float32) * 4
        tb = dataclasses.replace(
            bank,
            means=jnp.asarray(
                np.repeat(emb, 3, 0)[:, None, :]
                + np.zeros((1, bank.max_mix, 1), np.float32)
            ),
        )
        tl = rng.integers(0, units, size=(32, 4)).astype(np.int32)
        tn = np.full((32,), 4, np.int32)
        tx = np.zeros((32, 96, d), np.float32)
        for i in range(32):
            for j in range(4):
                tx[i, j * 24:(j + 1) * 24] = (
                    emb[tl[i, j]] + rng.normal(size=(24, d)) * 1.5)
        tm = np.ones((32, 96), bool)
        _, lp32 = align.align_batch(
            tb, jnp.asarray(tl), jnp.asarray(tn), jnp.asarray(tx),
            jnp.asarray(tm), 5, 4)
        _, lp16 = align.align_batch(
            tb, jnp.asarray(tl), jnp.asarray(tn), jnp.asarray(tx),
            jnp.asarray(tm), 5, 4, score_dtype="bfloat16")
        flips = float(np.mean(np.asarray(lp32) != np.asarray(lp16)))

        # ---- full pipeline audio-s/s with score_dtype flipped
        def pipeline(dtype):
            def one_epoch(bk, _):
                f, m = jax.vmap(fe._mfcc_impl)(signals, n_samp)
                st, _ = acc.batch_stats(
                    bk, labels, lens, f, m, 5, max_l, score_dtype=dtype)
                nb = acc.apply_update(bk, st)
                sc, lp = align.align_batch(
                    nb, labels, lens, f, m, 5, max_l, score_dtype=dtype)
                return nb, st.loglik + jnp.sum(sc) + jnp.sum(lp)

            @jax.jit
            def run(bk):
                nb, probes = jax.lax.scan(one_epoch, bk, None, length=4)
                return nb, jnp.sum(probes)
            _, probe = run(bank)
            _ = float(probe)
            t0 = time.time()
            _, probe = run(bank)
            _ = float(probe)
            return batch * utt_seconds / ((time.time() - t0) / 4)

        pipe32 = pipeline("float32")
        pipe16 = pipeline("bfloat16")

        row = {
            "config": name,
            "senones": int(s_total), "mix": mix, "batch": batch,
            "score_tflops_f32": round(tf32, 2),
            "score_tflops_bf16": round(tf16, 2),
            "score_speedup": round(dt32 / dt16, 2),
            "drift_mean_nats": round(float(drift.mean()), 4),
            "drift_max_nats": round(float(drift.max()), 4),
            "drift_untrained_mean_nats": round(float(drift_worst.mean()), 4),
            "viterbi_flip_rate": flips,
            "pipeline_audio_sps_f32": round(pipe32, 1),
            "pipeline_audio_sps_bf16": round(pipe16, 1),
        }
        rows.append(row)
        print(row, file=sys.stderr)

    out = {"rows": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bf16_study.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}", file=sys.stderr)

    hdr = ("| config | f32 TFLOP/s | bf16 TFLOP/s | speedup | drift mean "
           "| drift max | flip rate | pipe f32 | pipe bf16 |")
    print(hdr)
    print("|" + "---|" * 9)
    for r in rows:
        print(f"| {r['config']} | {r['score_tflops_f32']} "
              f"| {r['score_tflops_bf16']} | {r['score_speedup']}x "
              f"| {r['drift_mean_nats']} | {r['drift_max_nats']} "
              f"| {r['viterbi_flip_rate']:.2e} "
              f"| {r['pipeline_audio_sps_f32']} "
              f"| {r['pipeline_audio_sps_bf16']} |")


if __name__ == "__main__":
    main()
