"""Benchmark: audio-seconds per second per chip for the full pipeline.

Measures the BASELINE.json metric — training (embedded Baum-Welch EM
E+M step) plus Viterbi forced alignment, including the MFCC frontend —
on synthetic Mandarin-shaped data at roughly BASELINE config 2 scale
(3 emitting states, 8-mixture 39-dim GMMs, the full XIF pinyin unit set,
batch-64 utterances).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "audio-s/s", "vs_baseline": N}
vs_baseline is value / 100 — the reference publishes no numbers
(BASELINE.md), so the yardstick is its north-star target of 100x
real-time per chip.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from poccala_tpu.config import Config
    from poccala_tpu.io.corpus import UnitInventory
    from poccala_tpu.models import senone_bank as sb
    from poccala_tpu.ops.frontend import Frontend
    from poccala_tpu.train import accumulators as acc
    from poccala_tpu.train import alignment as align

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # ---- BASELINE config-2-shaped workload
    cfg = Config()
    cfg.model.state_num = 5
    cfg.model.mix_level = 8
    cfg.model.max_mix_level = 8
    inv = UnitInventory.standard("XIF")  # 62 units
    num_units = len(inv)

    batch = 256
    utt_seconds = 4.0
    rate = cfg.frontend.sample_rate
    n_samples = int(utt_seconds * rate)
    max_label_len = 16
    state_num = cfg.model.state_num

    rng = np.random.default_rng(0)
    signals = (rng.normal(size=(batch, n_samples)) * 2000).astype(np.float32)
    n_samp = np.full((batch,), n_samples, np.int64)
    labels = rng.integers(0, num_units, size=(batch, max_label_len)).astype(np.int32)
    lens = rng.integers(max_label_len // 2, max_label_len + 1,
                        size=(batch,)).astype(np.int32)

    fe = Frontend(cfg.frontend)
    bank = sb.create_bank(num_units, cfg.model, cfg.frontend.feat_dim,
                          key=jax.random.PRNGKey(0))
    log(f"bank: {bank.num_states} senones x {bank.max_mix} mix x {bank.dim} dim")

    # ---- build the jitted pipeline pieces
    signals_j = jnp.asarray(signals)
    n_samp_j = jnp.asarray(n_samp)
    labels_j = jnp.asarray(labels)
    lens_j = jnp.asarray(lens)

    def train_align_step(bank, feats, masks):
        stats, _ = acc.batch_stats(
            bank, labels_j, lens_j, feats, masks, state_num, max_label_len
        )
        new_bank = acc.apply_update(bank, stats)
        _, label_pos = align.align_batch(
            new_bank, labels_j, lens_j, feats, masks, state_num, max_label_len
        )
        return new_bank, stats.loglik, label_pos

    step = jax.jit(train_align_step)

    # ---- warmup (compile)
    t0 = time.time()
    feats, masks = fe.mfcc_batch(signals_j, n_samp_j)
    feats.block_until_ready()
    log(f"frontend compile+run: {time.time()-t0:.1f}s  feats {feats.shape}")
    t0 = time.time()
    bank, ll, lp = step(bank, feats, masks)
    jax.block_until_ready((bank, ll, lp))
    log(f"train+align compile+run: {time.time()-t0:.1f}s loglik={float(ll):.1f}")

    # ---- timed runs
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        feats, masks = fe.mfcc_batch(signals_j, n_samp_j)
        bank, ll, lp = step(bank, feats, masks)
    jax.block_until_ready((bank, ll, lp))
    elapsed = time.time() - t0

    audio_seconds = batch * utt_seconds * iters
    value = audio_seconds / elapsed
    log(f"{audio_seconds:.0f} audio-s in {elapsed:.2f}s")
    print(json.dumps({
        "metric": "train_em_plus_viterbi_audio_throughput",
        "value": round(value, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(value / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
