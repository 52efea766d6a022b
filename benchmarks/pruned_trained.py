"""Block pruning vs a TRAINED bank at the full-vocabulary lexicon.

``WER_r05_cd.json``'s fullvocab rows exposed the round-4 blind spot:
with trained (non-separable) scores the (256, 8) pruned point that
showed 100% agreement on synthetic-separable utterances costs +58pp
WER at the 37.5k-word table.  This decode-only benchmark sweeps the
repair directions on the SAME trained system:

* wider active sets (16/32 blocks of 256);
* selection hysteresis (``prune_hysteresis`` — sticky active blocks so
  muddy one-step lookaheads stop thrashing live prefix paths);

against the exact search, reporting WER and decode throughput per
variant.  It consumes a ``wer_run.py`` workdir (trained checkpoint +
held-out corpus + transcripts), so all variants share one bank, one
LM, one operating point.

Run on the chip after a wer_run:
``python benchmarks/pruned_trained.py --workdir /tmp/wer_r05_cd``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/wer_r05_cd",
                    help="a benchmarks/wer_run.py workdir (ckpt/, "
                         "train/, test/)")
    ap.add_argument("--vocab", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lm-weight", type=float, default=12.0)
    ap.add_argument("--word-penalty", type=float, default=60.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_poccala"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from poccala_tpu.config import Config
    from poccala_tpu.decoder.device import DeviceBeamDecoder
    from poccala_tpu.eval.wer import wer as wer_fn
    from poccala_tpu.io.corpus import (Corpus, UnitInventory, read_label,
                                       scan_corpus, standard_inventory)
    from poccala_tpu.lexicon import FlatLexicon, PronunciationLexicon
    from poccala_tpu.lexicon.build import DEFAULT_DAT, reference_words
    from poccala_tpu.lm import Ngram
    from poccala_tpu.train import checkpoint as ckpt_mod

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from wer_run import build_vocab

    ckpt_dir = os.path.join(args.workdir, "ckpt")
    if not os.path.isdir(ckpt_dir):
        raise SystemExit(
            f"{ckpt_dir} missing — run benchmarks/wer_run.py with "
            f"--workdir {args.workdir} first")
    bank, _ = ckpt_mod.load_checkpoint(ckpt_dir)
    inv = UnitInventory(standard_inventory("XIF_tone") + ["sil"])
    log(f"bank: {bank.num_states} senones (trained, untied checkpoint "
        f"— the flagship artifact's post-tying WERs differ slightly)")

    vocab, py = build_vocab(args.vocab, args.seed)
    ref_ws, _ = reference_words(DEFAULT_DAT, n_single=26000,
                                n_multi=12000, seed=args.seed)
    have = set(vocab)
    words_big = list(vocab) + [w for w in ref_ws if w not in have]
    lex = PronunciationLexicon()
    lex.generate(words_big, py)
    lex.lexicon.setdefault("sil", {}).setdefault("sil,sil", {})["word"] \
        = ["<sil>"]
    flat = FlatLexicon.from_tree(lex.lexicon, inv)
    log(f"lexicon: {flat.n_nodes} nodes / {len(words_big)} words")

    # LM: bigram over the train transcripts (word line 0)
    tr_pairs = scan_corpus(os.path.join(args.workdir, "train", "record"),
                           os.path.join(args.workdir, "train", "label"))
    sents = [read_label(l, 0) for _, l in tr_pairs]
    lm = Ngram(2)
    lm.train(sents)

    # held-out features
    cfg = Config()
    cfg.train.label_format = "pinyin"
    cfg.train.load_line = 1
    cfg.train.max_frames = 512
    cfg.train.max_label_len = 32
    cfg.train.batch_size = 64
    te_pairs = scan_corpus(os.path.join(args.workdir, "test", "record"),
                           os.path.join(args.workdir, "test", "label"))
    corpus = Corpus(cfg, inv, pairs=te_pairs)
    feats_l, nf_l = [], []
    for batch in corpus.batches():
        feats_l.append(batch.feats)
        nf_l.append(batch.t_masks.sum(axis=1).astype(np.int32))
    feats = np.concatenate(feats_l)
    nf = np.concatenate(nf_l)
    refs = [read_label(l, 0) for _, l in te_pairs]
    assert len(refs) == len(feats), (len(refs), len(feats))
    audio_s = float(nf.sum()) * 0.01
    log(f"test: {len(feats)} utts / {audio_s:.0f} audio-s")

    variants = [
        ("exact", {}),
        ("pruned_8x256", dict(block_size=256, active_blocks=8)),
        ("pruned_8x256_hyst8", dict(block_size=256, active_blocks=8,
                                    prune_hysteresis=8.0)),
        ("pruned_16x256", dict(block_size=256, active_blocks=16)),
        ("pruned_16x256_hyst8", dict(block_size=256, active_blocks=16,
                                     prune_hysteresis=8.0)),
        ("pruned_32x256", dict(block_size=256, active_blocks=32)),
        ("pruned_32x256_hyst8", dict(block_size=256, active_blocks=32,
                                     prune_hysteresis=8.0)),
    ]
    rows = []
    exact_wer = None
    for name, kw in variants:
        dec = DeviceBeamDecoder(bank, flat, lm=lm,
                                lm_weight=args.lm_weight,
                                word_penalty=args.word_penalty, **kw)
        # warm/compile outside the timed loop (wer_run's fullvocab rows
        # include compile; here throughput is clean)
        dec.decode_batch(feats[:128], nf[:128])
        t0 = time.time()
        hyps = []
        for lo in range(0, len(feats), 128):
            out = dec.decode_batch(feats[lo: lo + 128],
                                   nf[lo: lo + 128])
            hyps.extend([w for w in h[0].words if w != "<sil>"]
                        if h else [] for h in out)
        dt = time.time() - t0
        r = wer_fn(refs, hyps)
        if name == "exact":
            exact_wer = r.wer
        row = {
            "variant": name,
            "wer": round(r.wer, 4),
            "ser": round(r.ser, 4),
            "wer_delta_vs_exact": round(r.wer - exact_wer, 4),
            "decode_seconds": round(dt, 1),
            "audio_s_per_s": round(audio_s / dt, 1),
            **{k: v for k, v in kw.items()},
        }
        rows.append(row)
        log(str(row))

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "pruned_trained.json")
    with open(out_path, "w") as f:
        json.dump({
            "artifact": "pruned_trained",
            "provenance": {
                "workdir": args.workdir,
                "bank_senones": int(bank.num_states),
                "lexicon_nodes": int(flat.n_nodes),
                "vocab_words": len(words_big),
                "test_utts": len(feats),
                "lm": "bigram on train transcripts",
                "lm_weight": args.lm_weight,
                "word_penalty": args.word_penalty,
            },
            "proxy_disclosure": (
                "NOT real speech: the corpus is the formant-synthesized "
                "Mandarin proxy (poccala_tpu/io/synth_formant.py; no "
                "speech corpus / network egress exists in this "
                "environment) — WER rows are PROXY evidence, as in "
                "every WER_r0*.json artifact."),
            "note": (
                "Trained-bank pruning sweep at the full Mandarin.dat "
                "vocabulary — the repair study for WER_r05_cd.json's "
                "fullvocab collapse rows.  All variants share one "
                "bank/LM/operating point; the bank is the pre-tying "
                "checkpoint wer_run saves, so absolute WERs differ "
                "slightly from the flagship artifact's tied bank."),
            "rows": rows,
        }, f, indent=1)
    print(json.dumps({"metric": "pruned_trained_exact_wer",
                      "value": exact_wer}))


if __name__ == "__main__":
    main()
