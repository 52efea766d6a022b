"""Vectorized scheme-1 frame regrouping == the per-utterance loop oracle.

VERDICT round-1 item 9: ``group_frames_by_senone`` /
``uniform_label_pos`` were per-utterance Python loops (the reference's
``__eq_segment``/``__get_gmmdata``, ``AcousticModel.py:587-644``) and
would become the scheme-1 wall-clock at corpus scale.  The vectorized
forms must produce the same bucket *contents* (as frame multisets per
senone — subsample RNG and in-bucket order are free), and the bucket
cap must degrade gracefully (cap/4 keeps training converging).
"""

import numpy as np

from poccala_tpu.train import alignment as align


def _loop_uniform_label_pos(label_lens, t_masks):
    b, t_pad = t_masks.shape
    label_pos = np.full((b, t_pad), -1, np.int32)
    for i in range(b):
        t_true = int(t_masks[i].sum())
        l = max(int(label_lens[i]), 1)
        chunk = max(t_true // l, 1)
        pos = np.minimum(np.arange(t_true) // chunk, l - 1)
        label_pos[i, :t_true] = pos
    return label_pos


def _loop_group(xs, labels, label_lens, label_pos, num_senones, emit_states,
                cap, utt_ok=None, senone_map=None):
    """The round-1 per-utterance/per-run loop implementation (oracle),
    without subsampling (cap must be large enough)."""
    b = xs.shape[0]
    buckets = [[] for _ in range(num_senones)]
    for i in range(b):
        if utt_ok is not None and not utt_ok[i]:
            continue
        lp = label_pos[i]
        valid = np.where(lp >= 0)[0]
        if valid.size == 0:
            continue
        splits = np.where(np.diff(lp[valid]) != 0)[0] + 1
        for run in np.split(valid, splits):
            pos = lp[run[0]]
            unit = labels[i][pos]
            frames = xs[i][run]
            n = len(frames)
            chunk = n // emit_states
            start = 0
            for e in range(emit_states):
                end = start + chunk if e < emit_states - 1 else n
                if end > start:
                    if senone_map is not None:
                        sid = int(senone_map[unit, e])
                    else:
                        sid = unit * emit_states + e
                    buckets[sid].append(frames[start:end])
                start += chunk
    return [
        np.concatenate(bk) if bk else np.zeros((0, xs.shape[2]))
        for bk in buckets
    ]


def _rand_world(rng, b=24, t=60, num_units=5, emit=3, max_l=6, d=4):
    labels = rng.integers(0, num_units, size=(b, max_l)).astype(np.int32)
    lens = rng.integers(1, max_l + 1, size=(b,)).astype(np.int32)
    t_true = rng.integers(emit, t + 1, size=(b,))
    masks = np.arange(t)[None] < t_true[:, None]
    xs = rng.normal(size=(b, t, d)).astype(np.float32)
    # viterbi-like ragged label_pos with gaps and repeats
    label_pos = np.full((b, t), -1, np.int32)
    for i in range(b):
        p = 0
        for tt in range(int(t_true[i])):
            if rng.random() < 0.1:
                continue  # masked gap inside a run
            if rng.random() < 0.15 and p + 1 < lens[i]:
                p += 1
            label_pos[i, tt] = p
    utt_ok = rng.random(b) > 0.2
    return xs, labels, lens, label_pos, masks, utt_ok


class TestUniformLabelPos:
    def test_matches_loop(self, rng):
        for _ in range(5):
            b, t = int(rng.integers(1, 20)), int(rng.integers(4, 80))
            lens = rng.integers(1, 8, size=(b,)).astype(np.int32)
            t_true = rng.integers(1, t + 1, size=(b,))
            masks = np.arange(t)[None] < t_true[:, None]
            got = align.uniform_label_pos(lens, masks)
            want = _loop_uniform_label_pos(lens, masks)
            assert np.array_equal(got, want)


def _bucket_multisets(frames, mask):
    """Frame rows per senone as a sorted array (order-free compare)."""
    out = []
    for s in range(frames.shape[0]):
        rows = frames[s][mask[s]]
        key = np.lexsort(rows.T) if len(rows) else np.array([], int)
        out.append(rows[key])
    return out


class TestGroupFramesBySenone:
    def test_matches_loop_oracle(self, rng):
        xs, labels, lens, label_pos, masks, utt_ok = _rand_world(rng)
        num_senones, emit = 5 * 3, 3
        frames, mask, dropped = align.group_frames_by_senone(
            xs, labels, lens, label_pos, num_senones, emit,
            max_frames_per_senone=4096, utt_ok=utt_ok, rng=rng,
        )
        assert dropped == 0
        want = _loop_group(xs, labels, lens, label_pos, num_senones, emit,
                           4096, utt_ok=utt_ok)
        got = _bucket_multisets(frames, mask)
        for s in range(num_senones):
            w = want[s]
            key = np.lexsort(w.T) if len(w) else np.array([], int)
            assert got[s].shape == w[key].shape, s
            assert np.allclose(got[s], w[key]), s

    def test_with_senone_map(self, rng):
        xs, labels, lens, label_pos, masks, utt_ok = _rand_world(rng)
        emit = 3
        smap = rng.integers(0, 9, size=(5, emit)).astype(np.int32)
        frames, mask, _ = align.group_frames_by_senone(
            xs, labels, lens, label_pos, 9, emit,
            max_frames_per_senone=4096, utt_ok=utt_ok, senone_map=smap,
        )
        want = _loop_group(xs, labels, lens, label_pos, 9, emit, 4096,
                           utt_ok=utt_ok, senone_map=smap)
        got = _bucket_multisets(frames, mask)
        for s in range(9):
            w = want[s]
            key = np.lexsort(w.T) if len(w) else np.array([], int)
            assert np.allclose(got[s], w[key]), s

    def test_cap_subsamples_uniformly(self, rng):
        xs, labels, lens, label_pos, masks, utt_ok = _rand_world(rng, b=40)
        cap = 8
        frames, mask, dropped = align.group_frames_by_senone(
            xs, labels, lens, label_pos, 15, 3,
            max_frames_per_senone=cap, utt_ok=utt_ok, rng=rng,
        )
        full_frames, full_mask, _ = align.group_frames_by_senone(
            xs, labels, lens, label_pos, 15, 3,
            max_frames_per_senone=4096, utt_ok=utt_ok,
        )
        # every kept row must come from the senone's full bucket, counts
        # clip at the cap, dropped tallies the excess
        total_over = 0
        for s in range(15):
            n_full = int(full_mask[s].sum())
            n_kept = int(mask[s].sum())
            assert n_kept == min(n_full, cap), s
            total_over += max(n_full - cap, 0)
            kept = frames[s][mask[s]]
            pool = full_frames[s][full_mask[s]]
            for row in kept:
                assert (np.abs(pool - row).sum(1) < 1e-6).any(), s
        assert dropped == total_over

    def test_empty_input(self):
        frames, mask, dropped = align.group_frames_by_senone(
            np.zeros((2, 4, 3), np.float32),
            np.zeros((2, 2), np.int32),
            np.array([1, 1]),
            np.full((2, 4), -1, np.int32),
            num_senones=6, emit_states=3, max_frames_per_senone=16,
        )
        assert not mask.any() and dropped == 0
