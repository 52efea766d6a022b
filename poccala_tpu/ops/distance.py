"""Distance metrics, batched.

Replaces ``StatisticalModel/Distance.py:15-46`` (scalar
``euclidean_metric`` / ``cosine_similarity`` and an *unimplemented*
``mahalanobis_distance`` stub) and the per-pair ``cal_distance``
Minkowski helper (``Clustering.py:796-801``).  All functions accept
``[..., D]`` batches and broadcast.
"""

from __future__ import annotations

import jax.numpy as jnp


def euclidean(a, b):
    """``sqrt(Σ(a-b)²)`` (``Distance.py:23-26``)."""
    d = jnp.asarray(a) - jnp.asarray(b)
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def manhattan(a, b):
    d = jnp.abs(jnp.asarray(a) - jnp.asarray(b))
    return jnp.sum(d, axis=-1)


def minkowski(a, b, p: float = 2.0):
    """General Minkowski (``Clustering.cal_distance``'s ``arg`` parameter,
    ``Clustering.py:789-801``)."""
    d = jnp.abs(jnp.asarray(a) - jnp.asarray(b))
    return jnp.sum(d ** p, axis=-1) ** (1.0 / p)


def cosine_similarity(a, b):
    """``a·b / (|a||b|)`` (``Distance.py:33-36``)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, 1e-30)


def mahalanobis(a, b, precision):
    """``sqrt((a-b)ᵀ Σ⁻¹ (a-b))`` — implements the reference's declared
    but empty ``mahalanobis_distance`` (``Distance.py:44-46``).

    :param precision: ``[D, D]`` inverse covariance, or ``[D]`` diagonal
        precisions.
    """
    d = jnp.asarray(a) - jnp.asarray(b)
    precision = jnp.asarray(precision)
    if precision.ndim == 1:
        q = jnp.sum(d * d * precision, axis=-1)
    else:
        q = jnp.einsum("...i,ij,...j->...", d, precision, d)
    return jnp.sqrt(jnp.maximum(q, 0.0))


def pairwise_euclidean(x, y):
    """``[N, M]`` distance matrix in matmul form (the batched version of
    every per-pair distance loop in the reference's clustering code)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    x2 = jnp.sum(x * x, axis=-1)[:, None]
    y2 = jnp.sum(y * y, axis=-1)[None, :]
    xy = x @ y.T
    return jnp.sqrt(jnp.maximum(x2 - 2 * xy + y2, 0.0))
