"""Scaling study across BASELINE.json config scales on one chip.

Runs the training-pipeline stages (frontend, embedded-BW E+M, Viterbi
alignment) and the fused scoring kernel at the four single-chip config
scales, with in-jit iteration loops and scalar-fetch synchronization
(see CLAUDE.md on tunnel timing).  Writes ``benchmarks/scaling.json``
and prints a markdown table.

Usage: python benchmarks/scaling.py  (on the TPU)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    # name, units, emitting states per unit via state_num, mixtures, dim, batch
    ("config1_toy", 10, 5, 1, 13, 8),
    ("config2_monophone", 62, 5, 8, 39, 256),
    ("config3_2k_senones", 683, 5, 16, 39, 256),
    ("config4_6k_senones", 2048, 5, 32, 39, 128),
]


def main():
    import jax
    import jax.numpy as jnp

    from poccala_tpu.config import Config
    from poccala_tpu.models import senone_bank as sb
    from poccala_tpu.ops.frontend import Frontend
    from poccala_tpu.ops.pallas.gmm_score_tpu import gmm_log_scores_fast
    from poccala_tpu.train import accumulators as acc
    from poccala_tpu.train import alignment as align

    rows = []
    iters = 4
    for name, units, state_num, mix, dim, batch in CONFIGS:
        cfg = Config()
        cfg.model.state_num = state_num
        cfg.model.mix_level = mix
        cfg.model.max_mix_level = mix
        cfg.frontend.dct_num = dim // 3 if dim >= 39 else dim
        cfg.frontend.delta_1 = dim >= 26
        cfg.frontend.delta_2 = dim >= 39
        max_l = 16
        utt_seconds = 4.0
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
        bank = sb.create_bank(units, cfg.model, cfg.frontend.feat_dim,
                              key=jax.random.PRNGKey(0))

        def one_epoch(bank, _):
            feats, masks = jax.vmap(fe._mfcc_impl)(signals, n_samp)
            stats, _ = acc.batch_stats(
                bank, labels, lens, feats, masks, state_num, max_l)
            new_bank = acc.apply_update(bank, stats)
            sc, lp = align.align_batch(
                new_bank, labels, lens, feats, masks, state_num, max_l)
            return new_bank, stats.loglik + jnp.sum(sc) + jnp.sum(lp)

        @jax.jit
        def run(bank):
            nb, probes = jax.lax.scan(one_epoch, bank, None, length=iters)
            return nb, jnp.sum(probes)

        t0 = time.time()
        _, probe = run(bank)
        compile_s = time.time() - t0
        _ = float(probe)
        t0 = time.time()
        _, probe = run(bank)
        _ = float(probe)
        dt = (time.time() - t0) / iters
        audio = batch * utt_seconds
        pipeline = audio / dt

        # scoring kernel alone
        feats, _ = fe.mfcc_batch(signals, n_samp)
        x = feats.reshape(-1, cfg.frontend.feat_dim)

        @jax.jit
        def score8(x):
            def step(c, _):
                # carry-dependent input perturbation prevents XLA from
                # hoisting the loop-invariant computation out of the scan
                xi = jnp.where(c == 1.2345e30, x + 1.0, x)
                out = gmm_log_scores_fast(
                    xi, bank.means, bank.log_var, bank.log_w)
                return c + jnp.sum(out), None
            tot, _ = jax.lax.scan(step, 0.0, None, length=8)
            return tot

        _ = float(score8(x))
        t0 = time.time()
        _ = float(score8(x))
        sdt = (time.time() - t0) / 8
        s_total = bank.num_states
        flops = 2 * x.shape[0] * 2 * cfg.frontend.feat_dim * s_total * mix

        # frontend alone: XLA path at both dot precisions (the Pallas
        # frontend kernel was retired r05; ROADMAP negative results)
        def time_frontend(impl):
            @jax.jit
            def run():
                def step(c, _):
                    s = jnp.where(c == 1.2345e30, signals + 1.0, signals)
                    f, m = impl(s, n_samp)
                    return c + jnp.sum(f), None
                tot, _ = jax.lax.scan(step, 0.0, None, length=8)
                return tot
            _ = float(run())
            t0 = time.time()
            _ = float(run())
            return (time.time() - t0) / 8 * 1000

        fe_ms = time_frontend(fe.batch_impl)
        # (the Pallas frontend arm was retired in r05 — measured slower
        # than the XLA path at every production shape; ROADMAP negative
        # results.)  The bf16_3x precision arm replaces it:
        try:
            from dataclasses import replace as dc_replace
            fe_hi = Frontend(dc_replace(cfg.frontend,
                                        dot_precision="high"))
            fe_hi_ms = time_frontend(fe_hi.batch_impl)
        except Exception:
            fe_hi_ms = None

        row = {
            "config": name,
            "senones": int(s_total),
            "mixtures": mix,
            "batch": batch,
            "pipeline_audio_s_per_s": round(pipeline, 1),
            "epoch_ms": round(dt * 1000, 2),
            "frontend_ms": round(fe_ms, 2),
            "frontend_bf16x3_ms": (round(fe_hi_ms, 2)
                                   if fe_hi_ms is not None else None),
            "scoring_ms": round(sdt * 1000, 2),
            "scoring_tflops": round(flops / sdt / 1e12, 2),
            "compile_s": round(compile_s, 1),
        }
        rows.append(row)
        print(row, file=sys.stderr, flush=True)

    # ---- serving: device-tier decode at the reference-scale lexicon
    # (dense graph Viterbi; end-to-end incl. frontend + host id->word)
    decode_rows = []
    try:
        from poccala_tpu.decoder.device import DeviceBeamDecoder
        from poccala_tpu.io.corpus import UnitInventory
        from poccala_tpu.lexicon.build import build_reference_lexicon

        cfg = Config()
        fe = Frontend(cfg.frontend)
        inv = UnitInventory.standard("XIF_tone")
        flat, words, _ = build_reference_lexicon(inv)
        bank = sb.create_bank(len(inv), cfg.model, cfg.frontend.feat_dim,
                              key=jax.random.PRNGKey(1))
        dec = DeviceBeamDecoder(bank, flat)
        rng = np.random.default_rng(0)
        utt_seconds = 4.0
        n_samples = int(utt_seconds * cfg.frontend.sample_rate)
        mfcc = jax.jit(jax.vmap(fe._mfcc_impl))
        for batch in (128, 512):
            signals = jnp.asarray(
                (rng.normal(size=(batch, n_samples)) * 2000)
                .astype(np.float32))
            n_samp = jnp.asarray(np.full((batch,), n_samples, np.int64))
            feats, masks = mfcc(signals, n_samp)
            nf = np.asarray(masks.sum(axis=1), np.int32)
            dec.decode_batch(feats, nf)          # warm
            t0 = time.time()
            n_it = 3
            for _ in range(n_it):
                feats, masks = mfcc(signals, n_samp)
                nf = np.asarray(masks.sum(axis=1), np.int32)
                dec.decode_batch(feats, nf)
            dt = (time.time() - t0) / n_it
            row = {
                "config": f"decode_b{batch}",
                "lexicon_nodes": int(flat.n_nodes),
                "senones": int(bank.num_states),
                "batch": batch,
                "decode_audio_s_per_s": round(batch * utt_seconds / dt, 1),
                "decode_ms": round(dt * 1000, 1),
            }
            decode_rows.append(row)
            print(row, file=sys.stderr, flush=True)
    except Exception as e:  # decode rows must not cost the study
        print(f"decode rows failed: {e}", file=sys.stderr)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scaling.json")
    with open(out, "w") as f:
        json.dump({"train": rows, "decode": decode_rows}, f, indent=2)
    print("| config | senones | mix | batch | pipeline audio-s/s | scoring TFLOP/s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['senones']} | {r['mixtures']} "
              f"| {r['batch']} | {r['pipeline_audio_s_per_s']} "
              f"| {r['scoring_tflops']} |")
    for r in decode_rows:
        print(f"| {r['config']} | {r['senones']} | — | {r['batch']} "
              f"| decode {r['decode_audio_s_per_s']} | — |")


if __name__ == "__main__":
    main()
