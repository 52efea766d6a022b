"""Fused MFCC frontend kernel (Pallas/TPU).

The XLA pipeline (:mod:`poccala_tpu.ops.frontend`) materializes the
pre-emphasized signal and the framed signal ``[T, frame_size]`` (2x the
audio, from the 50% overlap) and the spectrum ``[T, nfft//2+1]`` in HBM
between its matmuls.  This kernel takes the *raw* signal and keeps the
whole chain — pre-emphasis, framing, windowing, DFT, magnitude, frame
energy, mel filterbank, log, DCT, energy-c0 — in VMEM, writing only the
``[T, dct_num]`` cepstra back; the framing-gather HBM round trip and
the pre-emphasis pass disappear (the reference's hot loops:
``AudioProcessing.py:243-245`` window loop, ``:364-369`` triple-loop
DCT, ``:183-198`` pre-emphasis).

Framing trick: with the reference's fixed 50% overlap
(``frame_size == 2*frame_step``), frame ``t`` is the concatenation of
signal chunks ``t`` and ``t+1`` of length ``frame_step``.  The caller
reshapes the signal to ``[n_chunks, step]`` (free in XLA); the kernel
slices consecutive chunk rows, pre-emphasizes them in place (one
lane-shift against the next chunk's first sample), and feeds the two
frame halves through *split* DFT bases::

    frames @ B  ==  chunks[:-1] @ B[:step]  +  chunks[1:] @ B[step:]

so the frame matrix never exists and there is no in-kernel gather or
reshape.  The textbook per-sample Hamming window folds into the bases;
the quirks per-*frame* scalar window (``AudioProcessing.py:242-245``)
distributes over the dot and is applied to re/im directly.

Precision: Pallas f32 dots default to ONE bf16 MXU pass, which costs
~0.15 absolute in the final log-cepstra.  The default here is a manual
split-float ("bf16x3") — three single-pass dots recovering ~f32
accuracy (3e-4 vs the fp64 oracle) at half the cost of HIGHEST's six
passes; ``precision="highest"`` gives 1.5e-4 at ~25% more time.

Delta features and masking stay outside — they act on the tiny
``[T, dct_num]`` output and fuse into the consuming graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_EPS = 1e-10


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(sc_ref, ch_ref, ch1_ref, ca_ref, cb_ref, fb_ref,
            dct_ref, o_ref, *, step: int, t_tile: int, quirks: bool,
            energy_c0: bool, alpha: float, pre_alpha: float, log_eps: float,
            precision: str):
    if precision == "bf16x3":
        # manual split-float: x = hi + lo with hi = bf16(x); three
        # single-pass MXU dots recover ~f32 accuracy (the lo*lo term is
        # below f32 rounding) at half the cost of HIGHEST's six passes
        def dot(x, w):
            d = functools.partial(jnp.dot,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.DEFAULT)
            xh = x.astype(jnp.bfloat16).astype(jnp.float32)
            xl = x - xh
            wh = w.astype(jnp.bfloat16).astype(jnp.float32)
            wl = w - wh
            return d(xh, wh) + (d(xh, wl) + d(xl, wh))
    else:
        dot = functools.partial(
            jnp.dot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision(precision),
        )
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_samples = sc_ref[b, 0]
    # raw chunk rows [i*t_tile, i*t_tile + t_tile]; ch1 is the same view
    # shifted by ONE SAMPLE (built by the caller — a free XLA reshape),
    # so pre-emphasis needs no in-kernel lane shift
    body = ch_ref[0, pl.ds(i * t_tile, t_tile + 1), :]   # x_j
    nxt = ch1_ref[0, pl.ds(i * t_tile, t_tile + 1), :]   # x_{j+1}
    # pre-emphasis y_j = x_{j+1} - α x_j (AudioProcessing.py:183-198),
    # with y zero-filled at the last true sample (:196-197)
    pe = nxt - pre_alpha * body
    row = jax.lax.broadcasted_iota(jnp.int32, pe.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, pe.shape, 1)
    flat = (i * t_tile + row) * step + col
    pe = jnp.where(flat == n_samples - 1, 0.0, pe)

    e, o = pe[:-1], pe[1:]                              # frame halves
    # merged [step, 2*k_pad] basis (cos | sin, each zero-padded to a lane
    # multiple): one dot per half-frame, then aligned slices
    v = dot(e, ca_ref[:]) + dot(o, cb_ref[:])           # [t_tile, 2*k_pad]
    k_pad = v.shape[1] // 2
    re, im = v[:, :k_pad], v[:, k_pad:]
    if quirks:
        # per-frame scalar Hamming window over the *frame index* axis,
        # length = true frame count (AudioProcessing.py:242-245)
        tt = sc_ref[b, 1].astype(jnp.float32)
        gidx = (i * t_tile
                + jax.lax.broadcasted_iota(jnp.int32, (t_tile, 1), 0)
                ).astype(jnp.float32)
        denom = jnp.maximum(tt - 1.0, 1.0)
        w = (1.0 - alpha) - alpha * jnp.cos(2.0 * np.pi * gidx / denom)
        re = re * w
        im = im * w
    spec = jnp.sqrt(re * re + im * im)                  # |rFFT|
    fbank = dot(spec, fb_ref[:])
    ceps = dot(jnp.log(jnp.maximum(fbank, log_eps)), dct_ref[:])
    if energy_c0:
        # frame energy: sum of magnitudes in quirks mode
        # (AudioProcessing.py:338), power in textbook mode
        energy = jnp.sum(spec if quirks else spec * spec, axis=-1)
        log_e = jnp.log(jnp.maximum(energy, log_eps))
        cidx = jax.lax.broadcasted_iota(jnp.int32, ceps.shape, 1)
        ceps = jnp.where(cidx == 0, log_e[:, None], ceps)
    o_ref[0] = ceps


@functools.partial(
    jax.jit,
    static_argnames=("step", "quirks", "energy_c0", "alpha", "pre_alpha",
                     "log_eps", "t_tile", "precision", "interpret"),
)
def mfcc_core_pallas(
    signals: jax.Array,       # [B, N] raw zero-padded signals
    n_samples: jax.Array,     # [B] true sample counts
    t_true: jax.Array,        # [B] true frame counts (for the quirk window)
    dft_cos: jax.Array,       # [frame_size, K] (textbook window pre-folded)
    dft_sin: jax.Array,       # [frame_size, K]
    fbank: jax.Array,         # [K, M]
    dct: jax.Array,           # [M, C]
    *,
    step: int,
    quirks: bool,
    energy_c0: bool,
    alpha: float = 0.46,
    pre_alpha: float = 0.98,
    log_eps: float = _LOG_EPS,
    t_tile: int = 128,
    precision: str = "bf16x3",
    interpret: bool = False,
):
    """Batched fused cepstra: returns ``[B, T, C]`` with
    ``T = num_frames(N)``.  Requires ``frame_size == 2*step``."""
    b, n = signals.shape
    fsize, k = dft_cos.shape
    assert fsize == 2 * step, (fsize, step)
    c = dct.shape[1]
    t = 1 + -(-(n - fsize) // step)           # num_frames of padded buffer
    t_pad = _ceil_to(t, t_tile)
    # every tile slices chunk rows [i*t_tile, i*t_tile + t_tile]; pad the
    # chunk arrays so the last slice (and the +1-sample view) is in bounds
    n_chunks = t_pad + 1
    need = n_chunks * step
    if need + 1 > n:
        signals = jnp.pad(signals, ((0, 0), (0, need + 1 - n)))
    chunks = signals[:, :need].reshape(b, n_chunks, step)
    chunks1 = signals[:, 1:need + 1].reshape(b, n_chunks, step)
    scalars = jnp.stack(
        [n_samples.astype(jnp.int32), t_true.astype(jnp.int32)], axis=1
    )                                         # [B, 2] in SMEM

    # merged (cos | sin) bases, each half zero-padded to a lane multiple
    # so the kernel's re/im split lands on an aligned boundary; the zero
    # columns produce spec==0 lanes that are inert through mel and energy
    k_pad = _ceil_to(k, 128)
    def _merge(a, b):
        a = jnp.pad(a, ((0, 0), (0, k_pad - k)))
        b = jnp.pad(b, ((0, 0), (0, k_pad - k)))
        return jnp.concatenate([a, b], axis=1)          # [step, 2*k_pad]
    ca = _merge(dft_cos[:step], dft_sin[:step])
    cb = _merge(dft_cos[step:], dft_sin[step:])
    fbank = jnp.pad(fbank, ((0, k_pad - k), (0, 0)))    # [k_pad, M]

    grid = (b, t_pad // t_tile)
    out = pl.pallas_call(
        functools.partial(_kernel, step=step, t_tile=t_tile, quirks=quirks,
                          energy_c0=energy_c0, alpha=alpha,
                          pre_alpha=pre_alpha, log_eps=log_eps,
                          precision=precision),
        grid=grid,
        in_specs=[
            # whole [B, 2] scalar array in SMEM (SMEM blocks must equal
            # the array dims); indexed by program_id(0) in the kernel
            pl.BlockSpec((b, 2), lambda bi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_chunks, step), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, step), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((step, 2 * k_pad), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((step, 2 * k_pad), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, fbank.shape[1]), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fbank.shape[1], c), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_pad * fsize * k * 2      # DFT re+im
            + 2 * b * t_pad * k * fbank.shape[1]     # mel
            + 2 * b * t_pad * fbank.shape[1] * c,    # dct
            bytes_accessed=4 * (b * n_chunks * step + 4 * step * k
                                + b * t_pad * c),
            transcendentals=b * t_pad * (k + fbank.shape[1] + 2),
        ),
        interpret=interpret,
    )(scalars, chunks, chunks1, ca, cb, fbank, dct)
    return out[:, :t, :]
