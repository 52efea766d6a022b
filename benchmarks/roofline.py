"""Roofline study of the hot kernels against *measured* machine peaks.

BASELINE.json's north star asks for STFT/frontend, GMM scoring and the
HMM DP scans "at speed-of-light per chip".  This benchmark turns that
clause into numbers: for each hot kernel it reports achieved FLOP/s and
bytes/s against the **binding limit** — the measured MXU matmul peak
(bf16 and f32-HIGHEST) or the measured HBM copy bandwidth — and the
fraction of that limit achieved.  Peaks are measured on the same chip in
the same session (no datasheet numbers), so fractions are honest even
through the axon tunnel.

Flop/byte accounting per kernel is written next to each row builder;
"bound" is whichever of compute-time vs memory-time dominates under the
measured peaks.  Timings follow CLAUDE.md tunnel rules: timed loops live
inside one jitted ``lax.scan`` whose inputs depend on the carry, and
every measurement fetches a scalar that data-depends on the work.

Writes ``benchmarks/roofline.json``.  Run on the TPU:
``python benchmarks/roofline.py``
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed_scan(make_step, iters=8, warm=True):
    """Time ``iters`` repetitions of a jitted op inside one scan; the
    carry-dependent input perturbation stops XLA loop-hoisting.  Returns
    seconds per iteration."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run():
        def step(c, _):
            out = make_step(c)
            return c + jnp.sum(out), None

        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                              length=iters)
        return tot

    _ = float(run())  # compile + warm
    t0 = time.time()
    _ = float(run())
    return (time.time() - t0) / iters


# ----------------------------------------------------------------------
# measured peaks
# ----------------------------------------------------------------------

def measure_peaks():
    import jax
    import jax.numpy as jnp

    peaks = {}
    n = 4096
    rng = np.random.default_rng(0)
    a32 = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    b32 = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    a16 = a32.astype(jnp.bfloat16)
    b16 = b32.astype(jnp.bfloat16)
    flops = 2 * n * n * n

    dt = timed_scan(lambda c: jnp.dot(
        a16 + c.astype(jnp.bfloat16), b16,
        preferred_element_type=jnp.float32))
    peaks["mxu_bf16_tflops"] = flops / dt / 1e12

    dt = timed_scan(lambda c: jnp.dot(
        a32 + c, b32, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST))
    peaks["mxu_f32_highest_tflops"] = flops / dt / 1e12

    # HBM bandwidth: elementwise add over an array far larger than VMEM
    # (read + write = 2 x size)
    m = 192 * 1024 * 1024  # 768 MB f32
    big = jnp.asarray(np.zeros((m,), np.float32))
    dt = timed_scan(lambda c: big + c, iters=4)
    peaks["hbm_gbs"] = 2 * m * 4 / dt / 1e9

    # VPU elementwise peak: a 64-deep fused fma chain holds the data in
    # registers, so the chain is compute-bound
    k = 64
    v = jnp.asarray(np.ones((8 * 1024 * 1024,), np.float32))

    def chain(c):
        x = v + c
        for _ in range(k):
            x = x * 1.000001 + 0.000001
        return x

    dt = timed_scan(chain, iters=4)
    peaks["vpu_fma_tflops"] = 2 * k * v.size / dt / 1e12
    return peaks


# ----------------------------------------------------------------------
# kernel rows
# ----------------------------------------------------------------------

def row(name, shape, seconds, flops, bytes_, peaks, compute_peak_key):
    """Achieved rates + binding-limit fraction under the measured peaks.

    bound = compute if flops/compute_peak > bytes/hbm_peak else memory
    (the larger lower-bound time is the binding wall)."""
    t_compute = flops / (peaks[compute_peak_key] * 1e12)
    t_memory = bytes_ / (peaks["hbm_gbs"] * 1e9)
    bound = compute_peak_key if t_compute >= t_memory else "hbm"
    t_bound = max(t_compute, t_memory)
    return {
        "kernel": name,
        "shape": shape,
        "ms": round(seconds * 1e3, 3),
        "achieved_tflops": round(flops / seconds / 1e12, 3),
        "achieved_gbs": round(bytes_ / seconds / 1e9, 2),
        "bound": bound,
        "bound_ms": round(t_bound * 1e3, 3),
        "fraction_of_bound": round(t_bound / seconds, 3),
    }


def main():
    import jax
    import jax.numpy as jnp

    from poccala_tpu.config import Config
    from poccala_tpu.models import senone_bank as sb
    from poccala_tpu.ops import hmm
    from poccala_tpu.ops.frontend import Frontend
    from poccala_tpu.ops.pallas.gmm_score_tpu import gmm_log_scores_fast

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_poccala"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    log("measuring machine peaks ...")
    peaks = measure_peaks()
    log(f"peaks: {json.dumps({k: round(v, 1) for k, v in peaks.items()})}")

    rows = []
    rng = np.random.default_rng(0)
    cfg = Config()

    # ---- frontend (XLA path), config-2 shape: batch 256 x 4 s.
    # FLOPs: the four MXU matmuls per utterance — DFT cos+sin
    # [T, 400]x[400, 257] x2, mel [T, 257]x[257, 26], DCT [T, 26]x[26,13],
    # delta [T, T]x[T, 13] x2 (dominant terms; elementwise ignored).
    # Bytes: signal in + feats out + spec/fbank/ceps HBM round trips
    # (4 intermediate [T, 257]/[T, 26] materializations upper-bounded
    # as 2x the spec array; XLA fuses most elementwise into them).
    fe = Frontend(cfg.frontend)
    b, secs = 256, 4.0
    n_samp_i = int(secs * cfg.frontend.sample_rate)
    sigs = jnp.asarray(
        (rng.normal(size=(b, n_samp_i)) * 2000).astype(np.float32))
    ns = jnp.asarray(np.full((b,), n_samp_i, np.int64))
    t_frames = 1 + -(-(n_samp_i - fe.frame_size) // fe.frame_step)
    nb = cfg.frontend.nfft // 2 + 1

    def fe_step(c):
        f, _ = fe.batch_impl(sigs + c, ns)
        return f

    dt = timed_scan(fe_step)
    fl = b * (2 * t_frames * fe.frame_size * nb * 2
              + 2 * t_frames * nb * 26 + 2 * t_frames * 26 * 13
              + 2 * 2 * t_frames * t_frames * 13)
    by = (b * n_samp_i * 4 + b * t_frames * 39 * 4
          + 2 * b * t_frames * nb * 4)
    rows.append(row("frontend_xla_b256x4s",
                    f"[{b}, {n_samp_i}] -> [{b}, {t_frames}, 39]",
                    dt, fl, by, peaks, "mxu_f32_highest_tflops"))
    log(str(rows[-1]))

    # ---- GMM scoring, config-3 and config-4 shapes, f32 and bf16.
    # FLOPs: matmul form of ||x - mu||^2 / sigma^2 — two [F, D]x[D, S*M]
    # matmuls (x*x and x against precomputed mu/var tables):
    # 2 * F * D * S*M * 2.  Bytes: frames + two [S*M, D] tables (+ the
    # x2 expansion) + [F, S] output.
    for s_units, mix, batch, name in ((683, 16, 256, "config3"),
                                      (2048, 32, 128, "config4")):
        mcfg = Config()
        mcfg.model.mix_level = mix
        mcfg.model.max_mix_level = mix
        bank = sb.create_bank(s_units, mcfg.model, 39,
                              key=jax.random.PRNGKey(0))
        s_tot = bank.num_states
        f_frames = batch * 401
        x = jnp.asarray(rng.normal(size=(f_frames, 39)).astype(np.float32))
        for dtype in ("float32", "bfloat16"):
            def sc_step(c, dtype=dtype):
                return gmm_log_scores_fast(
                    x + c, bank.means, bank.log_var, bank.log_w,
                    score_dtype=dtype)

            dt = timed_scan(sc_step)
            fl = 2 * f_frames * 2 * 39 * s_tot * mix
            by = (f_frames * 39 * 4 + 2 * s_tot * mix * 39 * 4
                  + f_frames * s_tot * 4)
            key = ("mxu_bf16_tflops" if dtype == "bfloat16"
                   else "mxu_f32_highest_tflops")
            rows.append(row(
                f"gmm_score_{name}_{dtype}",
                f"[{f_frames}, 39] x [{s_tot}, {mix}, 39]",
                dt, fl, by, peaks, key))
            log(str(rows[-1]))

    # ---- banded forward+backward, config-3 embedded-sentence shape:
    # batch 256, 16-unit labels (N = 2 + 16*3 = 50 states), T = 401,
    # W = 5.  FLOPs: per cell per band step ~6 VPU ops (shift-add + lse
    # chain) for fwd and the same for bwd.  Bytes: log_b read twice
    # [B, T, N] + alphas/betas written once each.
    b2, t2, n_lab = 256, 401, 16
    n_states = 2 + n_lab * (cfg.model.state_num - 2)
    w = cfg.model.state_num
    band = np.full((n_states, w), np.log(0.5), np.float32)
    log_pi = np.full((n_states,), -1e30, np.float32)
    log_pi[0] = 0.0
    log_b = jnp.asarray(
        rng.normal(size=(b2, t2, n_states)).astype(np.float32))
    bandj = jnp.asarray(band)
    pij = jnp.asarray(log_pi)
    tmask = jnp.ones((b2, t2), bool)

    def fb_step(c):
        la, ll = jax.vmap(
            lambda lb, tm: hmm.forward_log_banded(bandj, pij, lb, tm, w=w)
        )(log_b + c, tmask)
        be = jax.vmap(
            lambda lb, tm: hmm.backward_log_banded(bandj, lb, tm, w=w)
        )(log_b + c, tmask)
        return ll + jnp.sum(la[:, -1]) + jnp.sum(be[:, 0])

    dt = timed_scan(fb_step)
    cells = b2 * t2 * n_states * w
    fl = 2 * 6 * cells
    by = 2 * (b2 * t2 * n_states * 4) * 2
    rows.append(row("banded_fwd_bwd_config3",
                    f"[{b2}, {t2}, {n_states}] W={w}",
                    dt, fl, by, peaks, "vpu_fma_tflops"))
    log(str(rows[-1]))

    # ---- decode scan step at the FULL 25,569-entry vocabulary
    # (21.6k nodes).  Bytes per frame per utterance: deltas+ctx carried
    # through HBM (read+write, [N, Ns] f32+i32), bands [N, Ns, W_eff],
    # per-node senone score gather [N, Ns]; emission/top-k terms are
    # O(Q) and folded into the 10% slop.  FLOPs are trivial (compare-
    # select chains) — this kernel is bandwidth-bound by design.
    try:
        import dataclasses as _dc

        from poccala_tpu.decoder.device import DeviceBeamDecoder
        from poccala_tpu.io.corpus import UnitInventory
        from poccala_tpu.lexicon.build import build_reference_lexicon

        inv = UnitInventory.standard("XIF_tone")
        flat, words, _ = build_reference_lexicon(
            inv, n_single=26000, n_multi=12000)
        dcfg = Config()
        bank = sb.create_bank(len(inv), dcfg.model, 39,
                              key=jax.random.PRNGKey(1))
        dec = DeviceBeamDecoder(bank, flat)
        b3, t3 = 128, 401
        feats = rng.normal(size=(b3, t3, 39)).astype(np.float32)
        nf = np.full((b3,), t3, np.int32)
        dec.decode_batch(feats, nf)  # warm/compile
        t0 = time.time()
        reps = 2
        for _ in range(reps):
            out = dec.decode_batch(feats, nf)
        dt = (time.time() - t0) / reps
        dec._prep_device()
        n_p, n_s2, w_eff = np.asarray(dec._j_bands).shape
        per_frame = (2 * 2 * n_p * n_s2 * 4    # deltas+ctx read+write
                     + n_p * n_s2 * w_eff * 4  # bands
                     + n_p * n_s2 * 4)         # senone score rows
        by = int(b3 * t3 * per_frame * 1.1)
        fl = b3 * t3 * n_p * n_s2 * (2 * w_eff + 4)
        rows.append(row("decode_full_vocab_b128",
                        f"{n_p} nodes x {n_s2} states, T={t3}",
                        dt, fl, by, peaks, "vpu_fma_tflops"))
        log(str(rows[-1]))
    except Exception as e:
        log(f"decode roofline row failed: {e}")

    out = {
        "peaks": {k: round(v, 2) for k, v in peaks.items()},
        "note": ("peaks measured on-chip this session (4096^3 matmuls, "
                 "768MB elementwise copy, 64-deep fma chain); "
                 "fraction_of_bound = binding-limit time / achieved "
                 "time under the documented flop/byte models"),
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("| kernel | ms | TFLOP/s | GB/s | bound | frac |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['kernel']} | {r['ms']} | {r['achieved_tflops']} "
              f"| {r['achieved_gbs']} | {r['bound']} "
              f"| {r['fraction_of_bound']} |")


if __name__ == "__main__":
    main()
