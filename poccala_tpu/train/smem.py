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
import functools

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
    """One SMEM proposal per eligible senone.  Dispatches on
    ``cfg.train.smem_impl``: ``'batched'`` (default) runs the whole bank
    through three fixed-shape device programs; ``'serial'`` is the
    original host-driven per-senone loop (kept as the oracle — O(S)
    device dispatches, minutes at 2k senones under this environment's
    3-10 ms dispatch latency)."""
    impl = getattr(trainer.cfg.train, "smem_impl", "batched")
    if impl == "serial":
        return smem_pass_serial(trainer, frames, mask, enough)
    return smem_pass_batched(trainer, frames, mask, enough)


def smem_pass_serial(trainer, frames: np.ndarray, mask: np.ndarray,
                     enough: np.ndarray) -> tuple:
    """Run one SMEM proposal per eligible senone (host-driven loop around
    device kernels; runs on init rounds only, ``AcousticModel.py:835``)."""
    bank = trainer.bank
    mix = trainer.mix_level
    n_accepted = 0
    means = np.array(bank.means)      # writable copies (np.asarray of a
    log_var = np.array(bank.log_var)  # jax array is a read-only view)
    log_w = np.array(bank.log_w)
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
            c_covariance=getattr(trainer, 'var_floor',
                                 trainer.cfg.model.c_covariance),
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


# ----------------------------------------------------------------------
# Batched SMEM: the whole bank in O(1) device programs
# ----------------------------------------------------------------------
#
# Proposals are per-senone independent with fixed shapes (one merge pair
# + one split per senone, candidate list capped at c_max), so the serial
# loop's device work vectorizes over the senone axis:
#
#   program 1  vmapped e-step        -> q_old, responsibility Gram
#                                       matrix, ownership counts,
#                                       split-deficit scores
#   (host)     candidate selection   -> first evaluable (i, j, k) per
#                                       senone, exactly the serial order
#   program 2  vmapped propose       -> masked 2-means split, merge,
#                                       triple partial-EM, candidate
#                                       Q, post-accept polish
#   (host)     accept/reject         -> scatter accepted rows
#
# Deviations from the serial path (documented): the split 2-means sees
# the component's points as a masked [cap, D] array instead of a
# compacted copy (different RNG stream -> different seeding draws), the
# jitter comes from jax.random instead of np.random, and the triple
# partial-EM runs in f32 on device instead of f64 on host.  Accepted
# moves agree with the serial path on separable mixtures
# (tests/test_smem_batched.py); borderline proposals may differ in RNG.


@functools.partial(jax.jit, static_argnames=("mix", "normalizer"))
def _smem_stats(means, log_var, log_w, x, mask, mix, normalizer):
    """Program 1: per-senone responsibilities folded to the fixed-size
    statistics the host selector needs (never materializes [S, F, M] on
    host)."""

    def one(mn, lv, lw, xx, mm):
        p = em_ops.GmmParams(mn, lv, lw)
        lg, comp = em_ops.e_step(p, xx, mm, normalizer)
        lg_a = lg[:, :mix]
        comp_a = comp[:, :mix]
        gamma = jnp.exp(lg_a) * mm[:, None].astype(jnp.float32)
        q_old = em_ops.q_value(lg_a, comp_a, lw[:mix])
        gram = jnp.dot(gamma.T, gamma,
                       preferred_element_type=jnp.float32)      # [mix, mix]
        nk = gamma.sum(axis=0)                                  # [mix]
        wsum = jnp.sum(
            gamma * jnp.where(comp_a > NEG_INF / 2, comp_a, 0.0), axis=0)
        assign = jnp.argmax(gamma, axis=1)                      # [F]
        own = jnp.sum(
            jax.nn.one_hot(assign, mix, dtype=jnp.float32)
            * mm[:, None], axis=0)                              # [mix]
        return q_old, gram, nk, wsum, own

    return jax.vmap(one)(means, log_var, log_w, x, mask)


def _select_candidates(gram, nk, wsum, own, mix, c_max, mix_level):
    """Host candidate selection, the serial order vectorized over S:
    merge pairs by responsibility cosine (``__J_merge``), split ranks by
    own-point log-likelihood deficit, candidate list = per merge pair
    the best split not in the pair, capped at ``c_max``; the decided
    candidate is the first with enough owned points (``__split``'s
    eligibility)."""
    s = gram.shape[0]
    norms = np.sqrt(np.maximum(np.diagonal(gram, axis1=1, axis2=2), 0.0))
    pairs = [(i, j) for i in range(mix) for j in range(i + 1, mix)]
    pi = np.asarray([p[0] for p in pairs])
    pj = np.asarray([p[1] for p in pairs])
    sim = gram[:, pi, pj] / (norms[:, pi] * norms[:, pj] + 1e-30)  # [S, P]
    merge_order = np.argsort(-sim, axis=1, kind="stable")          # [S, P]

    deficit = np.where(nk <= 1e-6, np.inf,
                       -(wsum / np.maximum(nk, 1e-30)))            # [S, M]
    split_order = np.argsort(-deficit, axis=1, kind="stable")      # [S, M]

    # per merge pair: the first split component not in the pair
    # (mix >= 3 guarantees one of the top-3 qualifies)
    rows = np.arange(s)[:, None]
    top3 = split_order[:, :3]                                      # [S, 3]
    cand_i = pi[merge_order]                                       # [S, P]
    cand_j = pj[merge_order]
    k_of_pair = np.full(cand_i.shape, -1, np.int64)
    remaining = np.ones(cand_i.shape, bool)
    for t in range(3):
        kt = top3[:, t][:, None]                                   # [S, 1]
        ok = remaining & (kt != cand_i) & (kt != cand_j)
        k_of_pair = np.where(ok, kt, k_of_pair)
        remaining &= ~ok

    # first candidate (serial list order) whose split component owns
    # enough points; c_max caps how deep we look
    n_c = min(c_max, cand_i.shape[1])
    chosen = np.full((s, 3), -1, np.int64)
    undecided = np.ones(s, bool)
    for c in range(n_c):
        i_c, j_c, k_c = cand_i[:, c], cand_j[:, c], k_of_pair[:, c]
        ev = undecided & (k_c >= 0) & (
            own[rows[:, 0], np.clip(k_c, 0, None)] >= mix_level)
        chosen[ev] = np.stack(
            [i_c[ev], j_c[ev], k_c[ev]], axis=1)
        undecided &= ~ev
    return chosen  # [S, 3], -1 rows have no evaluable candidate


@functools.partial(
    jax.jit, static_argnames=("mix", "normalizer", "polish_iters"))
def _smem_propose(means, log_var, log_w, x, mask, ijk, keys, mix,
                  c_covariance, normalizer, polish_iters):
    """Program 2: vmapped proposal construction + evaluation + polish.
    Mirrors the serial ``smem_step`` math (merge ``Clustering.py:431-440``,
    split ``:442-467``, partial re-estimation ``:469-481``) with one-hot
    matmul selects in place of point gathers (TPU rule: dynamic
    minor-axis gathers scalarize)."""
    m_cap = means.shape[1]

    def one(mn, lv, lw, xx, mm, ijk_s, key):
        ii, jj, kk = ijk_s[0], ijk_s[1], ijk_s[2]
        p = em_ops.GmmParams(mn, lv, lw)
        lg, _ = em_ops.e_step(p, xx, mm, normalizer)
        gamma = jnp.exp(lg[:, :mix]) * mm[:, None].astype(jnp.float32)
        assign = jnp.argmax(gamma, axis=1)

        oh_i = jax.nn.one_hot(ii, m_cap, dtype=jnp.float32)
        oh_j = jax.nn.one_hot(jj, m_cap, dtype=jnp.float32)
        oh_k = jax.nn.one_hot(kk, m_cap, dtype=jnp.float32)
        w = jnp.exp(lw)           # [M] linear weights
        var = jnp.exp(lv)         # [M, D]

        def pick_vec(oh, a):   # [M, D] -> [D]
            return jnp.einsum("m,md->d", oh, a)

        wi = jnp.dot(oh_i, w)
        wj = jnp.dot(oh_j, w)
        wk = jnp.dot(oh_k, w)

        # merge (i, j) -> slot 0
        a_m = wi + wj
        mean_m = (pick_vec(oh_i, mn) * wi + pick_vec(oh_j, mn) * wj) \
            / jnp.maximum(a_m, 1e-30)
        var_m = (pick_vec(oh_i, var) * wi + pick_vec(oh_j, var) * wj) \
            / jnp.maximum(a_m, 1e-30)

        # split k -> slots 1, 2: masked 2-means over k's argmax points
        sel = (assign == kk) & mm
        res = km_ops.kmeans(key, xx, sel, k=2, iters=10)
        jit_key = jax.random.fold_in(key, 1)
        centers = res["means"] + jax.random.uniform(
            jit_key, res["means"].shape) * 1e-2
        iso = jnp.exp(jnp.mean(pick_vec(oh_k, lv)))
        var_s = jnp.full_like(centers, iso)
        a_s = wk * 0.5

        means3 = jnp.concatenate([mean_m[None], centers], axis=0)  # [3, D]
        var3 = jnp.concatenate([var_m[None], var_s], axis=0)
        w3 = jnp.stack([a_m, a_s, a_s])
        gamma_sum = jnp.einsum(
            "fm,m->f", gamma, (oh_i + oh_j + oh_k)[:mix])          # [F]

        # partial EM on the triple (f32 device form of __reestimate)
        d = xx.shape[1]
        maskf = mm.astype(jnp.float32)

        def pem(carry, _):
            m3, v3, w3 = carry
            diff = xx[:, None, :] - m3[None]                       # [F, 3, D]
            logn = (
                -0.5 * d * jnp.log(2 * jnp.pi)
                - 0.5 * jnp.sum(jnp.log(v3), axis=-1)[None]
                - 0.5 * jnp.sum(diff * diff / v3[None], axis=-1)
            ) + jnp.log(jnp.maximum(w3, 1e-30))[None]
            post = jax.nn.softmax(logn, axis=1)
            g = post * (gamma_sum * maskf)[:, None]
            nk3 = g.sum(axis=0) + 1e-30
            m3n = jnp.dot(g.T, xx,
                          preferred_element_type=jnp.float32) / nk3[:, None]
            v3n = jnp.maximum(
                jnp.dot(g.T, xx * xx, preferred_element_type=jnp.float32)
                / nk3[:, None] - m3n * m3n, c_covariance)
            return (m3n, v3n, nk3 / nk3.sum()), None

        (means3, var3, w3), _ = jax.lax.scan(
            pem, (means3, var3, w3), None, length=5)

        # rebuild the mixture with slots (i, j, k) <- triple
        oh3 = jnp.stack([oh_i, oh_j, oh_k])                        # [3, M]
        in_t = jnp.sum(oh3, axis=0)                                # [M]
        new_means = mn * (1 - in_t)[:, None] + jnp.einsum(
            "cm,cd->md", oh3, means3)
        new_var = var * (1 - in_t)[:, None] + jnp.einsum(
            "cm,cd->md", oh3, var3)
        triple_mass = wi + wj + wk
        new_w = w * (1 - in_t) + jnp.dot(w3 * triple_mass, oh3)
        active = jnp.arange(m_cap) < mix
        new_w = jnp.where(active, jnp.maximum(new_w, 1e-10), 0.0)
        new_w = new_w / new_w.sum()
        cand = em_ops.GmmParams(
            means=new_means,
            log_var=jnp.log(jnp.maximum(new_var, c_covariance)),
            log_w=jnp.where(active, jnp.log(jnp.maximum(new_w, 1e-30)),
                            NEG_INF),
        )
        lg_c, comp_c = em_ops.e_step(cand, xx, mm, normalizer)
        q_new = em_ops.q_value(lg_c, comp_c, cand.log_w)
        polished, _, _ = em_ops.em_fit(
            cand, xx, mm, active, c_covariance=c_covariance,
            max_iters=polish_iters, normalizer=normalizer)
        return polished.means, polished.log_var, polished.log_w, q_new

    return jax.vmap(one)(means, log_var, log_w, x, mask, ijk, keys)


def smem_pass_batched(trainer, frames: np.ndarray, mask: np.ndarray,
                      enough: np.ndarray) -> tuple:
    """Batched SMEM pass: the whole senone bank in two device programs
    plus host candidate selection and accept/reject (vs the serial
    path's O(S) sequential dispatches — VERDICT r3 weak #5)."""
    bank = trainer.bank
    mix = trainer.mix_level
    if mix < 3:
        return bank, 0
    cfg = trainer.cfg
    normalizer = cfg.model.gaussian_normalizer
    c_cov = getattr(trainer, 'var_floor', cfg.model.c_covariance)

    eligible = np.asarray(enough) & (
        np.asarray(mask).sum(axis=1) >= 3 * mix)
    if not eligible.any():
        return bank, 0

    x_j = jnp.asarray(frames)
    m_j = jnp.asarray(mask)
    q_old, gram, nk, wsum, own = _smem_stats(
        bank.means, bank.log_var, bank.log_w, x_j, m_j,
        mix=mix, normalizer=normalizer)
    q_old = np.asarray(q_old)

    chosen = _select_candidates(
        np.asarray(gram), np.asarray(nk), np.asarray(wsum),
        np.asarray(own), mix, cfg.train.smem_c_max, mix)
    has_cand = chosen[:, 0] >= 0
    eligible &= has_cand
    if not eligible.any():
        return bank, 0

    s = bank.num_states
    keys = jax.random.split(trainer._next_key(), s)
    ijk = jnp.asarray(np.where(chosen >= 0, chosen, 0).astype(np.int32))
    new_means, new_lv, new_lw, q_new = _smem_propose(
        bank.means, bank.log_var, bank.log_w, x_j, m_j, ijk, keys,
        mix=mix, c_covariance=c_cov, normalizer=normalizer,
        polish_iters=10)
    q_new = np.asarray(q_new)
    accept = eligible & np.isfinite(q_new) & (q_new > q_old)
    n_accepted = int(accept.sum())
    if not n_accepted:
        return bank, 0

    sel = jnp.asarray(accept)[:, None, None]

    def put(new, old):
        out = jnp.where(sel if new.ndim == 3 else sel[:, :, 0], new, old)
        return jax.device_put(out, old.sharding)

    bank = dataclasses.replace(
        bank,
        means=put(new_means, bank.means),
        log_var=put(new_lv, bank.log_var),
        log_w=put(new_lw, bank.log_w),
    )
    return bank, n_accepted
