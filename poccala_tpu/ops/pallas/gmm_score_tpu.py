"""Fused diagonal-GMM scoring kernel (Pallas/TPU).

The XLA path (:mod:`poccala_tpu.ops.gmm_score`) materializes the
``[T, S, M]`` weighted-component lattice in HBM before the mixture
logsumexp — for a 20k-frame batch against a 6k-senone bank that is
gigabytes of traffic.  This kernel keeps everything in VMEM: the grid's
innermost axis walks the mixture components, each contributing one
``[T_tile, 2D] @ [2D, S_tile]`` MXU matmul, folded into running
(max, sum) accumulators — an online (flash-style) logsumexp — so only
the final ``[T, S]`` state scores ever touch HBM.

Math (see ``ops/gmm_score.py``): with precision ``p = 1/σ²``,

    logp[t, s, m] = -0.5·Σx²p + Σx·(μp) + (-0.5·Σμ²p + const + log w)

i.e. rows ``[x², x]`` against columns ``[-0.5p ; μp]`` plus a per-(s, m)
bias.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poccala_tpu.utils.logmath import LOG_2PI, NEG_INF


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pack_params(means, log_var, log_w, normalizer: str,
                 score_dtype: str = "float32", center=None):
    """Per-mixture matmul weights ``[M, 2D, S]``, bias ``[M, S]`` and the
    per-dim centering offset ``[D]`` (zero in fp32; for bf16 the caller
    passes the frame/bank-midpoint shift — see ``ops/gmm_score.py`` on
    why centering makes bf16 operands safe)."""
    s, m, d = means.shape
    prec = jnp.exp(-log_var)                           # [S, M, D]
    if normalizer == "textbook":
        const = -0.5 * d * LOG_2PI - 0.5 * jnp.sum(log_var, axis=-1)
    elif normalizer == "reference":
        const = -0.5 * d * LOG_2PI - 0.5 * jnp.sum(jnp.exp(log_var), axis=-1)
    else:
        raise ValueError(normalizer)
    if score_dtype == "bfloat16":
        if center is None:
            center = jnp.mean(means.reshape(s * m, d), axis=0)  # [D]
        means = means - center[None, None]
        op = jnp.bfloat16
    elif score_dtype == "float32":
        center = jnp.zeros((d,), jnp.float32)
        op = jnp.float32
    else:
        raise ValueError(score_dtype)
    w_x2 = (-0.5 * prec).transpose(1, 2, 0)            # [M, D, S]
    w_x = (means * prec).transpose(1, 2, 0)            # [M, D, S]
    weight = jnp.concatenate([w_x2, w_x], axis=1).astype(op)  # [M, 2D, S]
    mu2p = jnp.sum(means * means * prec, axis=-1)      # [S, M]
    bias = (-0.5 * mu2p + const + jnp.maximum(log_w, NEG_INF)).T  # [M, S]
    return weight, bias, center


def _kernel(x_ref, w_ref, b_ref, o_ref, mx_ref, ss_ref, *, mix: int):
    m = pl.program_id(2)
    # HIGHEST on f32 operands: one bf16 MXU pass loses ~8 mantissa bits,
    # which floor-level precisions (1/σ² up to 1e6) amplify into huge
    # score errors (see ops/gmm_score.py); bf16 operands keep their
    # explicit single-pass semantics
    prec = (jax.lax.Precision.HIGHEST if x_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    v = (
        jnp.dot(x_ref[:], w_ref[0], preferred_element_type=jnp.float32,
                precision=prec)
        + b_ref[0]
    )  # [T_tile, S_tile]

    @pl.when(m == 0)
    def _():
        mx_ref[:] = v
        ss_ref[:] = jnp.ones_like(v)

    @pl.when(m > 0)
    def _():
        new_mx = jnp.maximum(mx_ref[:], v)
        ss_ref[:] = ss_ref[:] * jnp.exp(mx_ref[:] - new_mx) + jnp.exp(
            v - new_mx
        )
        mx_ref[:] = new_mx

    @pl.when(m == mix - 1)
    def _():
        o_ref[:] = mx_ref[:] + jnp.log(ss_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("normalizer", "t_tile", "s_tile", "interpret",
                     "score_dtype"),
)
def gmm_log_scores_pallas(
    x: jax.Array,
    means: jax.Array,
    log_var: jax.Array,
    log_w: jax.Array,
    normalizer: str = "textbook",
    t_tile: int = 512,
    s_tile: int = 256,
    interpret: bool = False,
    score_dtype: str = "float32",
):
    """Drop-in replacement for
    :func:`poccala_tpu.ops.gmm_score.gmm_log_scores` (state scores only).

    Pads T and S to tile multiples internally; returns ``[T, S]``.
    ``score_dtype='bfloat16'`` runs the MXU matmul single-pass on bf16
    operands with fp32 accumulation (centering as in
    ``ops/gmm_score.py``); the logsumexp state stays fp32.
    """
    t, d = x.shape
    s, m, _ = means.shape

    s_tile = min(s_tile, _ceil_to(s, 128))
    t_tile = min(t_tile, _ceil_to(t, 128))
    t_pad = _ceil_to(t, t_tile)
    s_pad = _ceil_to(s, s_tile)

    c_frames = jnp.mean(x, axis=0) if score_dtype == "bfloat16" else None
    weight, bias, center = _pack_params(means, log_var, log_w, normalizer,
                                        score_dtype, center=c_frames)
    if s_pad != s:
        weight = jnp.pad(weight, ((0, 0), (0, 0), (0, s_pad - s)))
        bias = jnp.pad(bias, ((0, 0), (0, s_pad - s)), constant_values=NEG_INF)
    xc = x - center[None]
    xa = jnp.concatenate([xc * xc, xc], axis=1).astype(weight.dtype)  # [T, 2D]
    if t_pad != t:
        xa = jnp.pad(xa, ((0, t_pad - t), (0, 0)))
    bias3d = bias[:, None, :]                          # [M, 1, S_pad]

    grid = (t_pad // t_tile, s_pad // s_tile, m)
    out = pl.pallas_call(
        functools.partial(_kernel, mix=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_tile, 2 * d), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * d, s_tile), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_tile), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_tile, s_tile), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, s_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_tile, s_tile), jnp.float32),
            pltpu.VMEM((t_tile, s_tile), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * 2 * d * s_pad * m,
            bytes_accessed=(
                xa.dtype.itemsize * (t_pad * 2 * d + 2 * d * s_pad * m)
                + 4 * t_pad * s_pad
            ),
            transcendentals=t_pad * s_pad * m,
        ),
        interpret=interpret,
    )(xa, weight, bias3d)
    return out[:t, :s]


def gmm_log_scores_fast(x, means, log_var, log_w, normalizer="textbook",
                        score_dtype="float32"):
    """Pallas kernel on TPU, XLA fallback elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return gmm_log_scores_pallas(x, means, log_var, log_w,
                                     normalizer=normalizer,
                                     score_dtype=score_dtype)
    from poccala_tpu.ops.gmm_score import gmm_log_scores

    return gmm_log_scores(x, means, log_var, log_w, normalizer=normalizer,
                          score_dtype=score_dtype)
