"""Full-vocabulary decode study: the complete 25,569-entry
``Mandarin.dat`` table (37.5k words / ~21.6k tree nodes), exact dense
graph-Viterbi vs the block-pruned search (``active_blocks``).

Two measurements, one artifact (``benchmarks/decode_fullvocab.json``):

1. **Throughput** (production shapes): 4-s utterances through the real
   MFCC frontend and the default 606-senone bank, batch 128/512, decode
   audio-s/s for the exact search and for ``active_blocks`` in {4, 8}
   at ``block_size=1024`` (~22 blocks total).  These rows are also
   merged into ``benchmarks/scaling.json``'s ``decode`` section so the
   README table quotes one artifact.

2. **Search accuracy** (controlled, separable bank): utterances are
   synthesized directly in feature space from known word sequences
   (per-unit embedding + noise, the ``tests/test_block_pruned.py``
   construction) so ground truth exists at full scale without training
   a 37.5k-word acoustic model.  Records exact-vs-pruned 1-best
   agreement, token error rate vs ground truth for both searches, and
   the mean Viterbi score gap, at noise 0.3 (clean) and 0.8 (hard).

Reference intent: ``/root/reference/Decoder.py:34,159-167`` (beam
pruning), ``/root/reference/Lexicon/PinYin.py:39-56`` (the full table
is the vocabulary the reference means to serve).

Usage: python benchmarks/decode_fullvocab.py   (on the TPU; CPU works
for the accuracy half but the throughput rows will not be comparable).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (block_size, active_blocks) pruning variants; None = exact search.
# POCCALA_FV_VARIANTS="512:4,256:8" overrides (exact row always kept);
# POCCALA_FV_THROUGHPUT_ONLY=1 skips the accuracy half (sweep mode)
VARIANTS = (None, (1024, 4), (1024, 8), (512, 4), (512, 8))
if os.environ.get("POCCALA_FV_VARIANTS"):
    VARIANTS = (None,) + tuple(
        tuple(int(x) for x in v.split(":"))
        for v in os.environ["POCCALA_FV_VARIANTS"].split(","))
THROUGHPUT_ONLY = bool(os.environ.get("POCCALA_FV_THROUGHPUT_ONLY"))
SMALL = bool(os.environ.get("POCCALA_FV_SMALL"))  # CPU smoke mode
if SMALL:
    VARIANTS = (None, (64, 2))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def edit_distance(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def main():
    import jax
    import jax.numpy as jnp

    from poccala_tpu.config import Config
    from poccala_tpu.decoder.device import DeviceBeamDecoder
    from poccala_tpu.io.corpus import UnitInventory
    from poccala_tpu.lexicon.build import build_reference_lexicon
    from poccala_tpu.models import senone_bank as sb
    from poccala_tpu.ops.frontend import Frontend

    out = {"artifact": "decode_fullvocab",
           "platform": jax.devices()[0].platform}

    inv = UnitInventory.standard("XIF_tone")
    t0 = time.time()
    flat, words, py = build_reference_lexicon(
        inv, n_single=420 if SMALL else 26000,
        n_multi=160 if SMALL else 12000)
    log(f"lexicon: {len(words)} words, {flat.n_nodes} nodes "
        f"({time.time() - t0:.1f}s)")
    out["vocab_words"] = len(words)
    out["lexicon_nodes"] = int(flat.n_nodes)

    # ---- 1. throughput at production shapes --------------------------
    cfg = Config()
    fe = Frontend(cfg.frontend)
    bank = sb.create_bank(len(inv), cfg.model, cfg.frontend.feat_dim,
                          key=jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    utt_seconds = 4.0
    n_samples = int(utt_seconds * cfg.frontend.sample_rate)
    mfcc = jax.jit(jax.vmap(fe._mfcc_impl))

    thr_rows = []
    for batch in (8,) if SMALL else (128, 512):
        signals = jnp.asarray(
            (rng.normal(size=(batch, n_samples)) * 2000)
            .astype(np.float32))
        n_samp = jnp.asarray(np.full((batch,), n_samples, np.int64))
        feats, masks = mfcc(signals, n_samp)
        nf = np.asarray(masks.sum(axis=1), np.int32)
        for var in VARIANTS:
            blk, active = var if var else (1024, None)
            dec = DeviceBeamDecoder(
                bank, flat, block_size=blk,
                active_blocks=active)
            tag = ("exact" if active is None
                   else f"pruned{active}x{blk}")
            tc = time.time()
            dec.decode_batch(feats, nf)          # warm/compile
            compile_s = time.time() - tc
            n_it = 3
            t1 = time.time()
            for _ in range(n_it):
                f2, m2 = mfcc(signals, n_samp)
                nf2 = np.asarray(m2.sum(axis=1), np.int32)
                dec.decode_batch(f2, nf2)
            dt = (time.time() - t1) / n_it
            if active is not None:
                dec._prep_device()
                assert dec._prune_on
            row = {
                "config": f"decode_full_b{batch}_{tag}",
                "lexicon_nodes": int(flat.n_nodes),
                "senones": int(bank.num_states),
                "batch": batch,
                "block_size": blk if active else None,
                "active_blocks": active,
                "decode_audio_s_per_s": round(
                    batch * utt_seconds / dt, 1),
                "decode_ms": round(dt * 1000, 1),
                "compile_s": round(compile_s, 1),
            }
            thr_rows.append(row)
            log(str(row))
    out["throughput"] = thr_rows
    if THROUGHPUT_ONLY:
        log("THROUGHPUT_ONLY sweep: not writing artifacts")
        print(json.dumps(thr_rows))
        return

    # ---- 2. search accuracy with a separable bank --------------------
    d = 8
    mcfg = dataclasses.replace(cfg.model, state_num=5, mix_level=1,
                               max_mix_level=1)
    sbank = sb.create_bank(len(inv), mcfg, d, differentiation=False)
    arng = np.random.default_rng(11)
    emb = arng.normal(size=(len(inv), d)).astype(np.float32) * 4
    means = np.repeat(emb, mcfg.state_num - 2, axis=0)[:, None, :]
    sbank = dataclasses.replace(sbank, means=jnp.asarray(means))

    # sample decodable 1-2 syllable words, build 3-word sentences
    def decodable(n):
        got, order = [], arng.permutation(len(words))
        for i in order:
            w = words[i]
            us = py.units_of(w)
            if us is None or len(us) > 2:
                continue
            units = [u for ch in us for u in ch[0]]
            if all(u in inv.id_of for u in units):
                got.append((w, [inv.id_of[u] for u in units]))
            if len(got) >= n:
                break
        return got

    pool = decodable(24 if SMALL else 192)
    n_utts, n_words_per = (8 if SMALL else 96), 3
    fp = 8
    acc_rows = []
    for noise in (0.3, 0.8):
        refs, feats_l = [], []
        for _ in range(n_utts):
            sent = [pool[arng.integers(len(pool))]
                    for _ in range(n_words_per)]
            refs.append([w for w, _ in sent])
            uids = [u for _, us in sent for u in us]
            x = np.concatenate(
                [emb[u] + arng.normal(size=(fp, d)) * noise
                 for u in uids]).astype(np.float32)
            feats_l.append(x)
        t_pad = max(len(x) for x in feats_l)
        fb = np.zeros((n_utts, t_pad, d), np.float32)
        nf = np.zeros(n_utts, np.int32)
        for i, x in enumerate(feats_l):
            fb[i, : len(x)] = x
            nf[i] = len(x)

        exact = DeviceBeamDecoder(sbank, flat)
        h_ex = exact.decode_batch(fb, nf)
        for var in VARIANTS:
            if var is None:
                continue
            blk, active = var
            pruned = DeviceBeamDecoder(sbank, flat, block_size=blk,
                                       active_blocks=active)
            h_pr = pruned.decode_batch(fb, nf)
            pruned._prep_device()
            assert pruned._prune_on
            agree = err_ex = err_pr = ntok = 0
            gaps = []
            for ref, he, hp in zip(refs, h_ex, h_pr):
                assert he and hp
                agree += he[0].words == hp[0].words
                err_ex += edit_distance(ref, he[0].words)
                err_pr += edit_distance(ref, hp[0].words)
                ntok += len(ref)
                gaps.append(he[0].score - hp[0].score)
            row = {
                "noise": noise,
                "active_blocks": active,
                "block_size": blk,
                "n_utts": n_utts,
                "agreement_rate": round(agree / n_utts, 4),
                "ter_exact": round(err_ex / ntok, 4),
                "ter_pruned": round(err_pr / ntok, 4),
                "mean_score_gap": round(float(np.mean(gaps)), 4),
                "max_score_gap": round(float(np.max(gaps)), 4),
            }
            acc_rows.append(row)
            log(str(row))
    out["accuracy"] = acc_rows
    out["accuracy_note"] = (
        "feature-space synthetic utterances (per-unit embedding + "
        "N(0, noise) jitter, 8 frames/unit) against a separable "
        "single-Gaussian bank; measures SEARCH accuracy at full "
        "lexicon scale, not acoustic-model accuracy.  ter_* vs ground "
        "truth is homophone-dominated at this vocabulary (25.6k hanzi "
        "share ~1.3k toned syllables; no LM is attached, so the "
        "1-best word among ~20 homophones is arbitrary) — the "
        "meaningful columns are agreement_rate and the ter/score "
        "deltas between exact and pruned, which isolate the pruning "
        "cost")

    here = os.path.dirname(os.path.abspath(__file__))
    if SMALL:
        log("SMALL smoke mode: not writing artifacts")
        log(json.dumps(out)[:800])
        return
    with open(os.path.join(here, "decode_fullvocab.json"), "w") as f:
        json.dump(out, f, indent=2)

    # merge throughput rows into scaling.json's decode table
    sp = os.path.join(here, "scaling.json")
    if os.path.exists(sp):
        with open(sp) as f:
            sc = json.load(f)
        dec_rows = [r for r in sc.get("decode", [])
                    if not r["config"].startswith("decode_full_")]
        dec_rows.extend(thr_rows)
        sc["decode"] = dec_rows
        with open(sp, "w") as f:
            json.dump(sc, f, indent=2)
    log("wrote decode_fullvocab.json (+ scaling.json decode rows)")


if __name__ == "__main__":
    main()
