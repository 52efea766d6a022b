"""Viterbi forced alignment and frame grouping for scheme-1 training.

Replaces the reference's per-utterance alignment path
(``multi_process_data``, ``AcousticModel.py:723-768``): build the
sentence HMM, Viterbi-align, drop failed utterances, and collect each
unit's frames — plus the per-state equal splitting that feeds GMM
training (``__eq_segment``/``__get_gmmdata``, ``AcousticModel.py:587-644``).

Alignment runs batched on device; the ragged regrouping of frames into
per-senone buckets is host-side numpy (inherently data-dependent), done
once per epoch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from poccala_tpu.models.senone_bank import SenoneBank
from poccala_tpu.models.topology import build_embedded, embedded_log_b
from poccala_tpu.ops import hmm as hmm_ops
from poccala_tpu.ops.gmm_score import gmm_component_logpdf
from poccala_tpu.utils.logmath import NEG_INF


@functools.partial(
    jax.jit,
    static_argnames=("state_num", "max_label_len", "normalizer",
                     "score_dtype", "state_axis_name"),
)
def align_utterance(
    bank: SenoneBank,
    label: jax.Array,
    label_len: jax.Array,
    x: jax.Array,
    t_mask: jax.Array,
    state_num: int,
    max_label_len: int,
    normalizer: str = "textbook",
    score_dtype: str = "float32",
    state_axis_name: str | None = None,
    s_offset: jax.Array | int = 0,
):
    """Viterbi-align one utterance against its sentence HMM.

    ``state_axis_name``: when set (inside a ``shard_map``), the bank's
    GMM tensors are the local senone shard (rows ``[s_offset,
    s_offset + S_local)``); each shard scores only the sentence states
    whose senone it owns and the per-utterance ``[T, N_s]`` lattice is
    assembled with a ``pmax`` — the same exchange as the state-sharded
    E-step (``accumulators.utterance_stats``).

    :returns: (score, label_pos ``[T]`` — per-frame index into the label
        sequence (-1 on virtual states / padding), loglik-style score)
    """
    s_local = bank.means.shape[0]
    ehmm = build_embedded(bank, label, label_len, state_num, max_label_len)
    if state_axis_name is None:
        sen = jnp.clip(ehmm.senone_idx, 0, s_local - 1)
        comp = gmm_component_logpdf(
            x, bank.means[sen], bank.log_var[sen], normalizer=normalizer,
            score_dtype=score_dtype,
        ) + bank.log_w[sen][None]
        scores = jax.nn.logsumexp(comp, axis=-1)
    else:
        lsen_raw = ehmm.senone_idx - s_offset
        owned = (lsen_raw >= 0) & (lsen_raw < s_local) & (ehmm.senone_idx >= 0)
        sen = jnp.clip(lsen_raw, 0, s_local - 1)
        comp = gmm_component_logpdf(
            x, bank.means[sen], bank.log_var[sen], normalizer=normalizer,
            score_dtype=score_dtype,
        ) + bank.log_w[sen][None]
        comp = jnp.where(owned[None, :, None], comp, NEG_INF)
        scores = jax.lax.pmax(
            jax.nn.logsumexp(comp, axis=-1), state_axis_name
        )
    r = jnp.arange(ehmm.senone_idx.shape[0])
    log_b = jnp.where((ehmm.senone_idx >= 0)[None, :], scores, NEG_INF)
    log_b = jnp.where((r == 0)[None, :], 0.0, log_b)
    log_b = jnp.where(
        ((r == ehmm.n_states - 1) | ~ehmm.state_mask)[None, :], NEG_INF, log_b
    )
    score, path, _ = hmm_ops.viterbi_log_banded(
        ehmm.band, ehmm.log_pi, log_b, t_mask, state_num
    )
    emit = state_num - 2
    pos = (path - 1) // emit
    is_emit = (path >= 1) & (path < ehmm.n_states - 1) & t_mask
    label_pos = jnp.where(is_emit, pos, -1).astype(jnp.int32)
    return score, label_pos


def align_batch(bank, labels, label_lens, xs, t_masks, state_num,
                max_label_len, normalizer: str = "textbook",
                score_dtype: str = "float32",
                state_axis_name: str | None = None,
                s_offset: jax.Array | int = 0):
    """vmap of :func:`align_utterance`."""
    fn = functools.partial(
        align_utterance,
        state_num=state_num,
        max_label_len=max_label_len,
        normalizer=normalizer,
        score_dtype=score_dtype,
        state_axis_name=state_axis_name,
    )
    return jax.vmap(lambda l, n, x, m: fn(bank, l, n, x, m,
                                          s_offset=s_offset))(
        labels, label_lens, xs, t_masks
    )


# ----------------------------------------------------------------------
# Host-side frame grouping
# ----------------------------------------------------------------------

def uniform_label_pos(label_lens: np.ndarray, t_masks: np.ndarray) -> np.ndarray:
    """Uniform segmentation (``__eq_segment`` mode 'e',
    ``AcousticModel.py:605-612``): frame t of an utterance with L label
    units and T frames maps to label position ``min(t // (T // L), L-1)``
    — the reference gives ``T // L`` frames to each unit and drops the
    remainder; we assign the remainder to the last unit instead of
    discarding frames.  Fully vectorized over the batch."""
    b, t_pad = t_masks.shape
    t_true = t_masks.sum(axis=1).astype(np.int64)             # [B]
    l = np.maximum(np.asarray(label_lens, np.int64), 1)       # [B]
    chunk = np.maximum(t_true // l, 1)                        # [B]
    t = np.arange(t_pad, dtype=np.int64)[None, :]             # [1, T]
    pos = np.minimum(t // chunk[:, None], (l - 1)[:, None])
    return np.where(t < t_true[:, None], pos, -1).astype(np.int32)


def check_alignment(label_pos: np.ndarray, labels: np.ndarray,
                    label_lens: np.ndarray) -> np.ndarray:
    """Per-utterance alignment sanity (``AcousticModel.py:751-757``): the
    aligned path must visit at least as many distinct units as the label
    contains; failures are dropped with a warning upstream.  Vectorized
    over the batch (one ``unique`` per side, no per-utterance Python —
    this runs every scheme-1 epoch)."""
    lp = np.asarray(label_pos)
    labels = np.asarray(labels)
    lens = np.asarray(label_lens)
    b = lp.shape[0]
    ui, ti = np.nonzero(lp >= 0)
    vis = np.unique(np.stack(
        [ui, labels[ui, lp[ui, ti]]], axis=1), axis=0) if len(ui) else \
        np.zeros((0, 2), np.int64)
    n_seen = np.bincount(vis[:, 0], minlength=b)
    wi, wj = np.nonzero(np.arange(labels.shape[1])[None] < lens[:, None])
    want = np.unique(np.stack([wi, labels[wi, wj]], axis=1), axis=0) \
        if len(wi) else np.zeros((0, 2), np.int64)
    n_want = np.bincount(want[:, 0], minlength=b)
    return n_seen >= n_want


def group_frames_by_senone(
    xs: np.ndarray,
    labels: np.ndarray,
    label_lens: np.ndarray,
    label_pos: np.ndarray,
    num_senones: int,
    emit_states: int,
    max_frames_per_senone: int,
    utt_ok: np.ndarray | None = None,
    rng: np.random.Generator | None = None,
    senone_map: np.ndarray | None = None,
):
    """Build fixed-shape per-senone frame buckets for grouped k-means/EM.

    For each utterance and each contiguous run of one label position (one
    unit occurrence), the run's frames are split equally across the
    unit's emitting states (``__eq_segment`` mode 'g' + ``__get_gmmdata``,
    ``AcousticModel.py:613-644``) and appended to the owning senone's
    bucket.  Buckets overflowing ``max_frames_per_senone`` are subsampled
    uniformly (a capacity cap the Python reference does not need; flagged
    per the no-silent-caps rule by the returned ``n_dropped``).

    Fully vectorized (run-length encoding over the whole batch + one
    stable sort by senone id): the host cost is O(N log N) numpy on the
    total valid-frame count N, not Python loops per utterance/run —
    the reference's per-utterance ``__eq_segment`` loops
    (``AcousticModel.py:587-644``) were the scheme-1 wall-clock at
    corpus scale (VERDICT round-1 item 9).

    :returns: (frames ``[S, F, D]`` float32, mask ``[S, F]`` bool,
        n_dropped int)
    """
    b, t_pad, d = xs.shape
    cap = max_frames_per_senone
    if rng is None:
        rng = np.random.default_rng(0)
    out = np.zeros((num_senones, cap, d), np.float32)
    mask = np.zeros((num_senones, cap), bool)

    lp = np.asarray(label_pos)
    ok = np.ones(b, bool) if utt_ok is None else np.asarray(utt_ok, bool)
    ui, ti = np.nonzero((lp >= 0) & ok[:, None])  # valid frames, time order
    if ui.size == 0:
        return out, mask, 0
    pos = lp[ui, ti]

    # contiguous runs of equal label position within one utterance = unit
    # occurrences (gaps of masked frames do NOT split a run, matching the
    # reference's split on diff(lp[valid]))
    new_run = np.ones(len(ui), bool)
    new_run[1:] = (ui[1:] != ui[:-1]) | (pos[1:] != pos[:-1])
    run_id = np.cumsum(new_run) - 1
    run_len = np.bincount(run_id)
    run_start = np.concatenate([[0], np.cumsum(run_len)[:-1]])
    pos_in_run = np.arange(len(ui)) - run_start[run_id]

    # per-run equal split over emitting states; runs shorter than the
    # state count give every frame to the last state (__get_gmmdata)
    chunk = (run_len // emit_states)[run_id]
    e = np.where(
        chunk == 0,
        emit_states - 1,
        np.minimum(pos_in_run // np.maximum(chunk, 1), emit_states - 1),
    )
    unit = np.asarray(labels)[ui, pos]
    if senone_map is not None:
        sid = np.asarray(senone_map)[unit, e]
    else:
        sid = unit * emit_states + e

    # bucket fill: random permutation + stable sort by senone id groups
    # frames per senone with a uniform-random order inside each group,
    # so truncating at the cap IS the uniform subsample
    perm = rng.permutation(len(sid))
    sel = perm[np.argsort(sid[perm], kind="stable")]
    sid_s = sid[sel]
    counts = np.bincount(sid_s, minlength=num_senones)[:num_senones]
    seg_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos_in_seg = np.arange(len(sel)) - seg_start[sid_s]
    keep = pos_in_seg < cap
    out[sid_s[keep], pos_in_seg[keep]] = xs[ui[sel[keep]], ti[sel[keep]]]
    mask[sid_s[keep], pos_in_seg[keep]] = True
    n_dropped = int(np.maximum(counts - cap, 0).sum())
    return out, mask, n_dropped
