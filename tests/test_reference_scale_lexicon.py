"""Decode against a reference-scale lexicon built from the actual
25,569-entry ``Mandarin.dat`` (``/root/reference/Lexicon/Mandarin.dat``,
loaded read-only — ``PinYin.py:39-56``): tree build, ``FlatLexicon``
flattening, device-decoder tables and traceback-pointer headroom at
10³⁺ nodes, and device-vs-vector 1-best agreement at that scale."""

import os

import numpy as np
import pytest

from poccala_tpu.io.corpus import UnitInventory
from poccala_tpu.lexicon.build import DEFAULT_DAT, build_reference_lexicon

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEFAULT_DAT), reason="reference Mandarin.dat absent"
)


def _readings(py, word):
    """All unit-tuple pronunciations of a word (cartesian product over
    the per-character polyphone readings)."""
    import itertools

    us = py.units_of(word)
    if us is None:
        return set()
    out = set()
    for combo in itertools.product(*us):
        out.add(tuple(u for r in combo for u in r))
    return out


@pytest.fixture(scope="module")
def big_world():
    import dataclasses

    import jax.numpy as jnp

    from poccala_tpu.config import ModelConfig
    from poccala_tpu.models import senone_bank as sb

    rng = np.random.default_rng(7)
    inv = UnitInventory.standard("XIF_tone")
    flat, words, py = build_reference_lexicon(inv)
    d = 8
    cfg = ModelConfig(state_num=5, mix_level=1, max_mix_level=1)
    bank = sb.create_bank(len(inv), cfg, d, differentiation=False)
    emb = rng.normal(size=(len(inv), d)).astype(np.float32) * 4
    means = np.repeat(emb, cfg.state_num - 2, axis=0)[:, None, :]
    bank = dataclasses.replace(bank, means=jnp.asarray(means))
    return inv, flat, words, py, bank, emb, rng


class TestReferenceScaleLexicon:
    def test_tree_scale(self, big_world):
        inv, flat, words, py, bank, emb, rng = big_world
        assert flat.n_nodes >= 2000, flat.n_nodes
        assert len(flat.children(0)) >= 500  # toned first syllables
        n_slots = int((np.asarray(
            [len(w) for w in flat.node_words])).sum())
        assert n_slots >= len(words) // 2

    def test_ctx_packing_headroom(self, big_world):
        """The packed (traceback ptr, LM context) int32 must hold the
        largest realistic decode: vocab-size+1 × (max_frames+1)."""
        inv, flat, words, py, bank, emb, rng = big_world
        vocab = {w for ws in flat.node_words for w in ws}
        vp1 = len(vocab) + 1
        max_frames = 4096
        assert (max_frames + 1) * vp1 < 2**31

    def test_device_matches_vector_at_scale(self, big_world):
        """1-best agreement device-vs-host on separable utterances over
        the full-scale tree, and both recover the spoken words."""
        from poccala_tpu.decoder.device import DeviceBeamDecoder
        from poccala_tpu.decoder.vector import VectorBeamDecoder

        inv, flat, words, py, bank, emb, rng = big_world

        # pick decodable words spread across the lexicon, resolve their
        # unit sequences through the same G2P used to build the tree
        chosen = []
        for w in words[:: max(1, len(words) // 40)]:
            us = py.units_of(w)
            if us is None:
                continue
            units = [u for ch in us for u in ch[0]]
            if all(u in inv.id_of for u in units) and len(us) <= 2:
                chosen.append((w, [inv.id_of[u] for u in units]))
            if len(chosen) >= 6:
                break
        assert len(chosen) >= 4

        dec_vec = VectorBeamDecoder(bank, flat, max_tokens=256, candidate=16)
        dec_dev = DeviceBeamDecoder(bank, flat)

        def feats_for(unit_ids, fp=8, noise=0.3):
            xs = [emb[u] + rng.normal(size=(fp, emb.shape[1])) * noise
                  for u in unit_ids]
            return np.concatenate(xs).astype(np.float32)

        for w, unit_ids in chosen:
            x = feats_for(unit_ids)
            h_dev = dec_dev.decode(x)
            h_vec = dec_vec.decode(x)
            assert h_dev and h_vec, w
            # the device tier searches the full tree exactly; the host
            # tier beam-prunes — on separable inputs both must recover
            # the spoken pronunciation as 1-best (a real vocabulary is
            # homophone/polyphone-dense, so compare pronunciations, not
            # hanzi — homophones tie exactly and the tie-break is
            # arbitrary)
            truth_units = tuple(inv.units[u] for u in unit_ids)
            assert len(h_dev[0].words) == 1
            assert truth_units in _readings(py, h_dev[0].words[0]), \
                (w, h_dev[0].words)
            # device-vs-host agreement: same best score, homophone-
            # equivalent word
            assert np.isclose(h_dev[0].score, h_vec[0].score, rtol=1e-4), w
            assert len(h_vec[0].words) == 1
            assert truth_units in _readings(py, h_vec[0].words[0]), \
                (w, h_dev[0].words, h_vec[0].words)

    def test_full_vocabulary_build_and_decode(self, big_world):
        """The FULL table: every transliterable Mandarin.dat hanzi plus
        12k compounds (≈ 37.5k words, ≈ 21.6k tree nodes) builds and
        decodes on the device tier (measured 477 audio-s/s on-chip at
        batch 128 — no dense LM table is materialized without an LM)."""
        import dataclasses

        import jax.numpy as jnp

        from poccala_tpu.config import ModelConfig
        from poccala_tpu.decoder.device import DeviceBeamDecoder
        from poccala_tpu.models import senone_bank as sb

        rng = np.random.default_rng(3)
        inv = UnitInventory.standard("XIF_tone")
        flat, words, py = build_reference_lexicon(
            inv, n_single=26000, n_multi=12000)
        assert flat.n_nodes >= 20000, flat.n_nodes
        assert len(words) >= 30000

        d = 8
        cfg = ModelConfig(state_num=5, mix_level=1, max_mix_level=1)
        bank = sb.create_bank(len(inv), cfg, d, differentiation=False)
        emb = rng.normal(size=(len(inv), d)).astype(np.float32) * 4
        means = np.repeat(emb, cfg.state_num - 2, axis=0)[:, None, :]
        bank = dataclasses.replace(bank, means=jnp.asarray(means))
        dec = DeviceBeamDecoder(bank, flat)

        # decode two single-syllable words spoken cleanly
        chosen = []
        for w in words[:200]:
            us = py.units_of(w)
            if us and len(us) == 1 and all(
                    u in inv.id_of for u in us[0][0]):
                chosen.append((w, [inv.id_of[u] for u in us[0][0]]))
            if len(chosen) == 2:
                break
        feats = np.zeros((2, 16, d), np.float32)
        for i, (_, uids) in enumerate(chosen):
            x = np.concatenate([
                emb[u] + rng.normal(size=(8, d)).astype(np.float32) * 0.3
                for u in uids])
            feats[i, : len(x)] = x
        out = dec.decode_batch(feats, np.asarray([16, 16], np.int32))
        for i, (w, uids) in enumerate(chosen):
            assert out[i], (i, w)
            got = out[i][0].words
            assert len(got) == 1
            truth_units = tuple(inv.units[u] for u in uids)
            assert truth_units in _readings(py, got[0]), (w, got)

    def test_device_batch_multiword(self, big_world):
        """Batched multi-word utterances at scale decode to the spoken
        word sequences on the device tier."""
        from poccala_tpu.decoder.device import DeviceBeamDecoder

        inv, flat, words, py, bank, emb, rng = big_world
        singles = []
        for w in words[: 3000: 37]:
            us = py.units_of(w)
            if us is None or len(us) != 1:
                continue
            units = us[0][0]
            if all(u in inv.id_of for u in units):
                singles.append((w, [inv.id_of[u] for u in units]))
            if len(singles) >= 6:
                break
        assert len(singles) >= 4

        def feats_for(unit_ids, fp=8, noise=0.3):
            xs = [emb[u] + rng.normal(size=(fp, emb.shape[1])) * noise
                  for u in unit_ids]
            return np.concatenate(xs).astype(np.float32)

        seqs = [[0, 1], [1, 2], [2, 3], [0, 3]]
        utts, truths = [], []
        for s in seqs:
            ws = [singles[i] for i in s]
            utts.append(np.concatenate([feats_for(u) for _, u in ws]))
            truths.append(tuple(w for w, _ in ws))
        t_max = max(len(x) for x in utts)
        feats = np.zeros((len(utts), t_max, emb.shape[1]), np.float32)
        nf = np.zeros(len(utts), np.int32)
        for i, x in enumerate(utts):
            feats[i, : len(x)] = x
            nf[i] = len(x)

        dec = DeviceBeamDecoder(bank, flat)
        out = dec.decode_batch(feats, nf)
        truth_units = {w: [inv.units[u] for u in us]
                       for w, us in singles}
        for i, truth in enumerate(truths):
            assert out[i], i
            got = out[i][0].words
            assert len(got) == len(truth), (i, truth, got)
            # homophones/polyphones tie exactly — compare pronunciations
            for gw, tw in zip(got, truth):
                assert tuple(truth_units[tw]) in _readings(py, gw), \
                    (i, truth, got)
