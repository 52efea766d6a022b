"""Embedded sentence-HMM construction as index tables.

Replaces the reference's ``AcousticModel.embedded``
(``AcousticModel.py:957-1014``), which materializes a dense
``[N_s, N_s]`` sentence transmat by concatenating per-unit transmats,
with a *banded gather*: sentence state ``r`` maps to (unit index in the
label, local state), and its outgoing band row is read straight from the
bank's ``log_A``.  The sentence HMM is never materialized as a dense
matrix (SURVEY.md §7 hard part (d)).

Layout (matching ``AcousticModel.py:966-1006``):

* ``n_states = 2 + L * (state_num - 2)``: one global entry virtual state,
  the emitting states of each label unit in order, one global exit
  virtual state;
* unit i's local exit column lands on unit i+1's first emitting state
  (the HTK-style concatenation implied by ``AcousticModel.py:978-988``);
* observation rows: entry scores 0, exit scores -inf (the reference's
  ``VirtualState(1.)`` / ``VirtualState(0.)``, ``AcousticModel.py:217-222,
  1029-1043``);
* sentence pi is uniform over all sentence states
  (``AcousticModel.py:1003-1006``).

Everything is padded to a static ``max_label_len`` and masked, so one
jitted builder serves ragged label lengths.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from poccala_tpu.models.senone_bank import SenoneBank
from poccala_tpu.utils.logmath import NEG_INF


@jax.tree_util.register_dataclass
@dataclass
class EmbeddedHMM:
    """A (batch of) sentence-level HMM(s) in banded form."""

    band: jax.Array        # [..., N_s, W] outgoing log-transitions (W = state_num)
    log_pi: jax.Array      # [..., N_s]
    senone_idx: jax.Array  # [..., N_s] int32; -1 for virtual/padded states
    state_mask: jax.Array  # [..., N_s] bool
    n_states: jax.Array    # [...] int32 true sentence-state count

    @property
    def width(self) -> int:
        return self.band.shape[-1]


def max_states(max_label_len: int, state_num: int) -> int:
    return 2 + max_label_len * (state_num - 2)


@functools.partial(jax.jit, static_argnames=("state_num", "max_label_len"))
def build_embedded(
    bank: SenoneBank,
    label: jax.Array,
    label_len: jax.Array,
    state_num: int,
    max_label_len: int,
) -> EmbeddedHMM:
    """Build one sentence HMM from a padded label.

    :param label: ``[max_label_len] int32`` unit ids (padding arbitrary)
    :param label_len: scalar int — number of valid label units
    """
    emit = state_num - 2
    n_s = max_states(max_label_len, state_num)
    n_true = 2 + label_len * emit

    r = jnp.arange(n_s)
    is_entry = r == 0
    is_exit = r == n_true - 1
    # emitting rows: r in [1, n_true-1)
    pos = jnp.clip(r - 1, 0, None)
    label_pos = pos // emit              # index into the label sequence
    local = pos % emit + 1               # local state in [1, state_num-2]
    unit = label[jnp.clip(label_pos, 0, max_label_len - 1)]
    is_emit = (r >= 1) & (r < n_true - 1)
    state_mask = r < n_true

    senone = bank.senone_map[
        jnp.clip(unit, 0, bank.num_units - 1), local - 1
    ]
    senone_idx = jnp.where(is_emit, senone, -1).astype(jnp.int32)

    # --- band assembly --------------------------------------------------
    # offsets k in [0, state_num): band[r, k] = sentence log A[r, r+k]
    k = jnp.arange(state_num)[None, :]
    # emitting row (unit u, local l): log_A[u, l, l+k] while l+k < N
    local_col = local[:, None] + k
    emit_band = jnp.where(
        (local_col < state_num) & is_emit[:, None],
        bank.log_A[
            jnp.clip(unit, 0, bank.num_units - 1)[:, None],
            local[:, None],
            jnp.clip(local_col, 0, state_num - 1),
        ],
        NEG_INF,
    )
    # entry row: sentence row 0 takes the first unit's virtual-entry row
    # (AcousticModel.py:981: complex_transmat[:statenum-1,:statenum] =
    #  hmm_list[0].transmat[:-1]) -> band[0, k] = log_A[label[0], 0, k]
    entry_band = bank.log_A[label[0], 0, :]
    band = jnp.where(is_entry[:, None], entry_band[None, :], emit_band)
    # exit row: absorbing, and padded rows: dead
    band = jnp.where((is_exit | ~state_mask)[:, None], NEG_INF, band)
    # transitions may not cross the true exit state
    col = r[:, None] + k
    band = jnp.where(col >= n_true, NEG_INF, band)

    # --- pi: uniform over true sentence states (AcousticModel.py:1003-1006)
    log_pi = jnp.where(state_mask, -jnp.log(n_true.astype(jnp.float32)), NEG_INF)

    return EmbeddedHMM(
        band=band,
        log_pi=log_pi,
        senone_idx=senone_idx,
        state_mask=state_mask,
        n_states=n_true.astype(jnp.int32),
    )


def build_embedded_batch(bank, labels, label_lens, state_num, max_label_len):
    """vmap of :func:`build_embedded` over a label batch ``[B, L_max]``."""
    fn = functools.partial(
        build_embedded, state_num=state_num, max_label_len=max_label_len
    )
    return jax.vmap(lambda l, n: fn(bank, l, n))(labels, label_lens)


@jax.jit
def embedded_log_b(scores: jax.Array, ehmm: EmbeddedHMM) -> jax.Array:
    """Gather sentence observation log-probs from bank-level GMM scores.

    Replaces ``AcousticModel.embedded``'s ``embedded_prob`` concatenation
    (``AcousticModel.py:990-1001``): ``log_b[t, r] = scores[t, senone(r)]``
    for emitting states, 0 for the entry virtual state and NEG_INF for
    the exit virtual state (``VirtualState`` semantics,
    ``AcousticModel.py:1029-1043``) and for padded states.

    :param scores: ``[T, S]`` state-level GMM scores from
        :func:`poccala_tpu.ops.gmm_score.gmm_log_scores`
    :returns: ``[T, N_s]``
    """
    n_s = ehmm.senone_idx.shape[-1]
    r = jnp.arange(n_s)
    is_entry = r == 0
    is_exit = r == ehmm.n_states - 1
    gathered = scores[:, jnp.clip(ehmm.senone_idx, 0, None)]  # [T, N_s]
    log_b = jnp.where(ehmm.senone_idx[None, :] >= 0, gathered, NEG_INF)
    log_b = jnp.where(is_entry[None, :], 0.0, log_b)
    log_b = jnp.where(is_exit[None, :], NEG_INF, log_b)
    log_b = jnp.where(ehmm.state_mask[None, :], log_b, NEG_INF)
    return log_b


embedded_log_b_batch = jax.jit(jax.vmap(embedded_log_b))


def states_to_labels(path: jax.Array, ehmm: EmbeddedHMM, labels: jax.Array,
                     state_num: int):
    """Convert a sentence-state Viterbi path to per-frame label-position
    and unit ids (the reference's ``convert=True`` state→label mapping,
    ``LHMM.py:601-607``).

    :returns: (label_pos ``[T]`` int32 — index into the label sequence,
        -1 on virtual states; unit_id ``[T]`` int32, -1 on virtual)
    """
    emit = state_num - 2
    pos = (path - 1) // emit
    is_emit = (path >= 1) & (path < ehmm.n_states - 1)
    label_pos = jnp.where(is_emit, pos, -1).astype(jnp.int32)
    unit_id = jnp.where(
        is_emit, labels[jnp.clip(pos, 0, labels.shape[0] - 1)], -1
    ).astype(jnp.int32)
    return label_pos, unit_id
