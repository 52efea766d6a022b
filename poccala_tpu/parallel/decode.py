"""Distributed beam decode over a device mesh (BASELINE config 5).

The reference's serving path (``Decoder.py:91-167``) is a per-frame
token-passing loop on one machine; its scaled-out form here is
data-parallel: utterance batches shard over the ``data`` mesh axis, the
senone bank and lexicon/LM tables replicate, and every device runs the
same on-device scan (``decoder.device.DeviceBeamDecoder``) on its shard.
Per-utterance decode is independent, so the shard program contains zero
collectives — scaling is linear by construction and the only cost is
the batch scatter / lattice gather.

``decode_sharded`` is the library entry; ``dryrun`` is a tiny
self-contained end-to-end used by ``__graft_entry__.dryrun_multichip``
to prove the sharded decode path compiles and runs on an N-device mesh.
"""

from __future__ import annotations

import numpy as np


def decode_sharded(decoder, feats, n_frames, mesh, return_nbest: int = 1):
    """Decode ``[B, T, D]`` with utterances sharded over ``mesh``'s
    ``data`` axis.  Thin alias of
    ``DeviceBeamDecoder.decode_batch(..., mesh=mesh)``."""
    return decoder.decode_batch(
        feats, n_frames, return_nbest=return_nbest, mesh=mesh
    )


def decode_sharded_global(decoder, feats_global, n_frames_global, mesh,
                          return_nbest: int = 1):
    """Multi-host distributed decode (BASELINE config 5, N ≥ 2 hosts):
    run the sharded decode program on **globally sharded** device arrays
    (built per process with ``parallel.mesh.distribute_batch`` from each
    host's pathInfo slice, ``Controller.py:79-106``) and return the
    global ``(seqs [B, C, L], scores [B, C])`` arrays — nothing is
    fetched, so this is safe when no single process can address the full
    batch.  Each host converts its addressable rows (or jit-reduces
    replicated summaries) itself."""
    decoder._prep_device()
    t_pad = int(feats_global.shape[1])
    run = decoder._sharded_run_fn(
        t_pad, decoder._n_cand(return_nbest), mesh
    )
    return run(feats_global, n_frames_global)


def _toy_world(seed: int = 0):
    """A tiny trained-by-construction decode world: 6 units whose senone
    means are separable embeddings, 3 words over them."""
    import dataclasses

    import jax.numpy as jnp

    from poccala_tpu.config import ModelConfig
    from poccala_tpu.decoder.device import DeviceBeamDecoder
    from poccala_tpu.io.corpus import UnitInventory
    from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
    from poccala_tpu.models import senone_bank as sb

    rng = np.random.default_rng(seed)
    units = ["n", "i3", "h", "ao3", "m", "a1"]
    inv = UnitInventory(units)
    d = 8
    cfg = ModelConfig(state_num=5, mix_level=1, max_mix_level=1)
    bank = sb.create_bank(len(units), cfg, d, differentiation=False)
    emb = rng.normal(size=(len(units), d)).astype(np.float32) * 4
    means = np.repeat(emb, cfg.state_num - 2, axis=0)[:, None, :]
    bank = dataclasses.replace(bank, means=jnp.asarray(means))

    table = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"]}
    lex = PronunciationLexicon()
    lex.generate(["你好", "你", "马"], PinYin(table))
    flat = FlatLexicon.from_tree(lex.lexicon, inv)
    dec = DeviceBeamDecoder(bank, flat, candidate=3)

    def utt(unit_ids, frames_per_unit=8):
        xs = [
            emb[u] + rng.normal(size=(frames_per_unit, d)) * 0.3
            for u in unit_ids
        ]
        return np.concatenate(xs).astype(np.float32)

    return dec, utt


def dryrun(mesh, batch_per_device: int = 2):
    """Run a sharded decode of ``data_axis * batch_per_device`` toy
    utterances over ``mesh``; returns (per-utterance word counts,
    per-utterance best scores) or None when the mesh has no data axis."""
    shape = dict(mesh.shape)
    if "data" not in shape:
        return None
    b = shape["data"] * batch_per_device
    dec, utt = _toy_world()
    seqs = [[0, 1, 2, 3], [4, 5], [0, 1], [4, 5, 0, 1]]
    t_max = 48
    feats = np.zeros((b, t_max, 8), np.float32)
    n_frames = np.zeros((b,), np.int32)
    for i in range(b):
        x = utt(seqs[i % len(seqs)])
        feats[i, : len(x)] = x
        n_frames[i] = len(x)
    out = dec.decode_batch(feats, n_frames, mesh=mesh)
    words = np.asarray([len(h[0].words) if h else 0 for h in out])
    scores = np.asarray([h[0].score if h else np.nan for h in out])
    return words, scores
