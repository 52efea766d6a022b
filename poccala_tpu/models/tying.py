"""Data-driven state tying.

BASELINE.json config 3 calls for "tied-state triphone-style units,
~2k senones": many unit states sharing a smaller senone inventory.  The
bank supports tying structurally via ``senone_map`` (every statistics
scatter and parameter gather keys on it); this module builds the map.

:func:`tie_by_kmeans` is bottom-up data-driven tying: cluster the
current (untied) senone GMM parameters — mixture-weighted means plus
log-variances, the standard acoustic-similarity embedding — into the
target senone count with k-means, merge each cluster's members into one
shared senone (occupancy-weighted when occupancy statistics are given),
and emit the reduced bank + map.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from poccala_tpu.models.senone_bank import SenoneBank
from poccala_tpu.ops import kmeans as km_ops
from poccala_tpu.utils.logmath import masked_log


def senone_embedding(bank: SenoneBank) -> np.ndarray:
    """Per-senone embedding: weight-averaged mixture mean ++ mean
    log-variance — a compact acoustic signature for similarity tying."""
    w = np.exp(np.asarray(bank.log_w))            # [S, M]
    w = w / np.maximum(w.sum(-1, keepdims=True), 1e-10)
    means = np.asarray(bank.means)
    log_var = np.asarray(bank.log_var)
    avg_mean = np.einsum("sm,smd->sd", w, means)
    avg_lv = np.einsum("sm,smd->sd", w, log_var)
    return np.concatenate([avg_mean, avg_lv], axis=-1).astype(np.float32)


def tie_by_kmeans(
    bank: SenoneBank,
    target_senones: int,
    occupancy: np.ndarray | None = None,
    key=None,
    same_position_only: bool = True,
) -> SenoneBank:
    """Tie the bank down to ``target_senones`` shared states.

    :param occupancy: optional ``[S]`` state occupancies (e.g.
        ``BwStats.occ``) used as merge weights; uniform otherwise.
    :param same_position_only: only tie states at the same emitting
        position (the usual phonetic constraint: first states with first
        states, etc.); the per-position budget splits evenly.
    :returns: a new bank with ``S = target_senones`` (at most) and an
        updated ``senone_map``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    emit = bank.emit_states
    u_total = bank.num_units
    s_old = bank.num_states
    emb = senone_embedding(bank)
    occ = (np.ones(s_old) if occupancy is None
           else np.maximum(np.asarray(occupancy, np.float64), 1e-6))
    old_map = np.asarray(bank.senone_map)

    # group old senones by emitting position (or one global group)
    if same_position_only:
        groups = [np.unique(old_map[:, e]) for e in range(emit)]
        budgets = [max(1, target_senones // emit)] * emit
    else:
        groups = [np.unique(old_map)]
        budgets = [target_senones]

    assign_of = np.zeros(s_old, np.int64)
    next_id = 0
    for gi, (members, k) in enumerate(zip(groups, budgets)):
        k = min(k, len(members))
        res = km_ops.kmeans(
            jax.random.fold_in(key, gi),
            jnp.asarray(emb[members]),
            jnp.ones(len(members), bool),
            k=k, iters=25,
        )
        a = np.asarray(res["assign"])
        assign_of[members] = next_id + a
        next_id += k

    s_new = next_id
    m, d = bank.max_mix, bank.dim
    means = np.zeros((s_new, m, d), np.float32)
    log_var = np.zeros((s_new, m, d), np.float32)
    w = np.zeros((s_new, m), np.float32)
    mix_counts = np.zeros((s_new,), np.int32)
    old_means = np.asarray(bank.means)
    old_lv = np.asarray(bank.log_var)
    old_w = np.exp(np.asarray(bank.log_w))
    for s in range(s_new):
        members = np.where(assign_of == s)[0]
        wts = occ[members] / occ[members].sum()
        # occupancy-weighted merge of the members' GMMs (same slot-wise
        # mixture structure; a post-tie EM round re-fits properly)
        means[s] = np.einsum("u,umd->md", wts, old_means[members])
        log_var[s] = np.einsum("u,umd->md", wts, old_lv[members])
        w[s] = np.einsum("u,um->m", wts, old_w[members])
        mix_counts[s] = int(np.asarray(bank.mix_counts)[members].max())
    w = w / np.maximum(w.sum(-1, keepdims=True), 1e-10)

    new_map = assign_of[old_map.reshape(-1)].reshape(u_total, emit)
    return dataclasses.replace(
        bank,
        means=jnp.asarray(means),
        log_var=jnp.asarray(log_var),
        log_w=masked_log(jnp.asarray(w)),
        mix_counts=jnp.asarray(mix_counts),
        senone_map=jnp.asarray(new_map.astype(np.int32)),
    )
