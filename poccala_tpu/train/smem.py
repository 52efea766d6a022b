"""Split-and-Merge EM (SMEM) for GMM mixture management.

Replaces ``Clustering.GMM.__SMEM`` and its helpers
(``StatisticalModel/Clustering.py:373-577``): after EM converges, propose
merging the two most-correlated components and splitting the worst-fit
one, partially re-estimate the affected triple, and accept iff the total
Q improves.

Kept from the reference:

* merge criterion = cosine similarity of responsibility vectors
  (``__J_merge``, ``Clustering.py:373-386``);
* split construction = 2-means on the component's argmax-assigned points,
  centers jittered by 1e-2, isotropic covariance from the old
  component's generalized variance, weight halved (``__split``,
  ``Clustering.py:442-467``);
* candidate list capped at ``c_max`` (``Clustering.py:483-517``), with
  the reference's behavior of deciding on the first evaluable candidate
  (``Clustering.py:521-577``);
* partial re-estimation of the triple with responsibilities renormalized
  within it (``__reestimate``, ``Clustering.py:469-481``);
* acceptance by total-Q comparison; skip entirely when mix < 3
  (``Clustering.py:491-493``).

Deviation (documented): the reference's split criterion ``__J_split``
(``Clustering.py:388-429``) ranks components by an O(F²) rank-weighted
local-density KL estimate; we rank by per-component average
log-likelihood deficit (the component whose own points it explains
worst), which targets the same "locally poor fit" signal at O(F·M).
Data-dependent reclustering fights XLA's static shapes (SURVEY.md §7
hard part (e)), so the candidate loop is host-driven around fixed-shape
device kernels.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from poccala_tpu.ops import em as em_ops
from poccala_tpu.ops import kmeans as km_ops
from poccala_tpu.utils.logmath import NEG_INF, masked_log


def _posteriors(params, x, mask, normalizer):
    log_gamma, comp = em_ops.e_step(params, x, mask, normalizer)
    gamma = np.asarray(jnp.exp(log_gamma)) * np.asarray(mask)[:, None]
    return gamma, np.asarray(comp)


def merge_scores(gamma: np.ndarray) -> list[tuple[int, int, float]]:
    """``__J_merge`` (Clustering.py:373-386): cosine similarity between
    responsibility columns, sorted descending."""
    m = gamma.shape[1]
    norms = np.linalg.norm(gamma, axis=0) + 1e-30
    out = []
    for i in range(m):
        for j in range(i + 1, m):
            out.append((i, j, float(gamma[:, i] @ gamma[:, j] / (norms[i] * norms[j]))))
    out.sort(key=lambda r: r[2], reverse=True)
    return out


def split_scores(gamma: np.ndarray, comp: np.ndarray) -> list[tuple[int, float]]:
    """Rank components by average own-point log-likelihood deficit (see
    module docstring for the deviation from ``__J_split``)."""
    m = gamma.shape[1]
    out = []
    for k in range(m):
        nk = gamma[:, k].sum()
        if nk <= 1e-6:
            out.append((k, np.inf))  # empty components split first
            continue
        avg_ll = float((gamma[:, k] * comp[:, k]).sum() / nk)
        out.append((k, -avg_ll))
    out.sort(key=lambda r: r[1], reverse=True)
    return out


def _merge_params(params, i, j):
    """``__merge`` (Clustering.py:431-440)."""
    w = np.exp(np.asarray(params.log_w, np.float64))
    mu = np.asarray(params.means, np.float64)
    var = np.exp(np.asarray(params.log_var, np.float64))
    a = w[i] + w[j]
    mean = (mu[i] * w[i] + mu[j] * w[j]) / a
    v = (var[i] * w[i] + var[j] * w[j]) / a
    return mean, v, a


def _split_params(params, k, x, mask, gamma, key, mix_level):
    """``__split`` (Clustering.py:442-467): 2-means over the component's
    argmax points; None when the component owns too few points."""
    assign = np.argmax(gamma, axis=1)
    sel = (assign == k) & np.asarray(mask)
    if sel.sum() < mix_level:
        return None
    pts = np.asarray(x)[sel]
    res = km_ops.kmeans(
        key, jnp.asarray(pts), jnp.ones(len(pts), bool), k=2, iters=10
    )
    centers = np.asarray(res["means"], np.float64)
    jitter = np.random.default_rng(int(key[0])).random(centers.shape) * 1e-2
    centers = centers + jitter
    # isotropic covariance from the generalized variance (det^(1/D))
    old_var = np.exp(np.asarray(params.log_var[k], np.float64))
    iso = float(np.exp(np.mean(np.log(old_var))))
    var = np.full_like(centers, iso)
    a = float(np.exp(params.log_w[k])) * 0.5
    return centers, var, (a, a)


def _partial_em(x, mask, gamma_sum, means3, var3, w3, c_covariance,
                normalizer, iters=5):
    """``__reestimate`` + one maximization (Clustering.py:469-481,
    541-552): EM restricted to the triple, responsibilities scaled by the
    triple's old total responsibility per point."""
    x = np.asarray(x, np.float64)
    maskf = np.asarray(mask, np.float64)
    for _ in range(iters):
        logn = np.zeros((len(x), 3))
        for c in range(3):
            diff = x - means3[c]
            logn[:, c] = (
                -0.5 * x.shape[1] * np.log(2 * np.pi)
                - 0.5 * np.sum(np.log(var3[c]))
                - 0.5 * (diff * diff / var3[c]).sum(-1)
            ) + np.log(max(w3[c], 1e-30))
        mx = logn.max(axis=1, keepdims=True)
        post = np.exp(logn - mx)
        post /= post.sum(axis=1, keepdims=True)
        g = post * gamma_sum[:, None] * maskf[:, None]
        nk = g.sum(axis=0) + 1e-30
        means3 = (g.T @ x) / nk[:, None]
        var3 = np.maximum(
            (g.T @ (x * x)) / nk[:, None] - means3 ** 2, c_covariance
        )
        # within-triple weight fractions (the triple's total mass is
        # reattached by the caller)
        w3 = nk / nk.sum()
    return means3, var3, w3


def smem_step(params: em_ops.GmmParams, x, mask, key,
              mix_level: int, c_max: int = 5, c_covariance: float = 1e-6,
              normalizer: str = "textbook"):
    """One SMEM proposal for a single GMM.

    :returns: (new params, accepted: bool)
    """
    m_active = mix_level
    if m_active < 3:
        return params, False

    gamma, comp = _posteriors(params, x, mask, normalizer)
    gamma_a = gamma[:, :m_active]
    comp_a = comp[:, :m_active]
    q_old = float(em_ops.q_value(
        jnp.asarray(np.log(np.maximum(gamma_a, 1e-30))),  # 1e-300 underflows f32
        jnp.asarray(comp_a),
        params.log_w[:m_active],
    ))

    merges = merge_scores(gamma_a)
    splits = split_scores(gamma_a, comp_a)
    candidates = []
    for (i, j, _) in merges:
        for (k, _) in splits:
            if k in (i, j):
                continue
            candidates.append((i, j, k))
            break
        if len(candidates) >= c_max:
            break

    triple_w_old = np.exp(np.asarray(params.log_w, np.float64))
    for (i, j, k) in candidates:
        sp = _split_params(params, k, x, mask, gamma_a, key, mix_level)
        if sp is None:
            continue
        mean_m, var_m, a_m = _merge_params(params, i, j)
        centers, var_s, (a1, a2) = sp
        means3 = np.stack([mean_m, centers[0], centers[1]])
        var3 = np.stack([var_m, var_s[0], var_s[1]])
        w3 = np.array([a_m, a1, a2])
        gamma_sum = gamma_a[:, i] + gamma_a[:, j] + gamma_a[:, k]
        means3, var3, w3 = _partial_em(
            x, mask, gamma_sum, means3, var3, w3, c_covariance, normalizer
        )
        # rebuild the full mixture with (i, j, k) replaced by the triple
        new_means = np.asarray(params.means, np.float64).copy()
        new_var = np.exp(np.asarray(params.log_var, np.float64)).copy()
        new_w = triple_w_old.copy()
        triple_mass = triple_w_old[i] + triple_w_old[j] + triple_w_old[k]
        for slot, c in zip((i, j, k), range(3)):
            new_means[slot] = means3[c]
            new_var[slot] = var3[c]
            new_w[slot] = w3[c] * triple_mass
        # renormalize active weights
        new_w[:m_active] = np.maximum(new_w[:m_active], 1e-10)
        new_w[:m_active] /= new_w[:m_active].sum()
        cand = em_ops.GmmParams(
            means=jnp.asarray(new_means, jnp.float32),
            log_var=jnp.asarray(np.log(np.maximum(new_var, c_covariance)),
                                jnp.float32),
            log_w=masked_log(jnp.asarray(
                np.where(np.arange(len(new_w)) < m_active, new_w, 0.0),
                jnp.float32,
            )),
        )
        lg, cmp_new = em_ops.e_step(cand, jnp.asarray(x), jnp.asarray(mask),
                                    normalizer)
        q_new = float(em_ops.q_value(lg, cmp_new, cand.log_w))
        if q_new > q_old:
            # post-accept EM polish (the reference continues its EM loop
            # after acceptance, Clustering.py:711-714)
            mix_mask = jnp.arange(params.means.shape[0]) < m_active
            polished, _, _ = em_ops.em_fit(
                cand, jnp.asarray(x), jnp.asarray(mask), mix_mask,
                c_covariance=c_covariance, max_iters=10,
                normalizer=normalizer,
            )
            return polished, True
        # first evaluable candidate decides (Clustering.py:565-577)
        return params, False
    return params, False


def smem_pass(trainer, frames: np.ndarray, mask: np.ndarray,
              enough: np.ndarray) -> tuple:
    """Run one SMEM proposal per eligible senone (host-driven loop around
    device kernels; runs on init rounds only, ``AcousticModel.py:835``)."""
    bank = trainer.bank
    mix = trainer.mix_level
    n_accepted = 0
    means = np.asarray(bank.means)
    log_var = np.asarray(bank.log_var)
    log_w = np.asarray(bank.log_w)
    for s in range(bank.num_states):
        if not enough[s] or mask[s].sum() < 3 * mix:
            continue
        params = em_ops.GmmParams(
            means=jnp.asarray(means[s]),
            log_var=jnp.asarray(log_var[s]),
            log_w=jnp.asarray(log_w[s]),
        )
        new_params, accepted = smem_step(
            params, frames[s], mask[s], trainer._next_key(), mix,
            c_max=trainer.cfg.train.smem_c_max,
            c_covariance=trainer.cfg.model.c_covariance,
            normalizer=trainer.cfg.model.gaussian_normalizer,
        )
        if accepted:
            n_accepted += 1
            means[s] = np.asarray(new_params.means)
            log_var[s] = np.asarray(new_params.log_var)
            log_w[s] = np.asarray(new_params.log_w)
    # re-place onto the bank's original shardings: on a state-sharded
    # mesh the full-S tensors must not land on one device (the per-
    # senone SMEM math itself runs on host-fetched [cap, D] slices)
    def put(arr, ref):
        return jax.device_put(jnp.asarray(arr), ref.sharding)

    bank = dataclasses.replace(
        bank,
        means=put(means, bank.means),
        log_var=put(log_var, bank.log_var),
        log_w=put(log_w, bank.log_w),
    )
    return bank, n_accepted
