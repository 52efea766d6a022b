"""Voice-activity detection as a vectorized frame *mask*.

Replaces the reference's mel-cepstral-distance VAD
(``StatisticalModel/AudioProcessing.py:450-543``), which *deletes*
non-speech frames (ragged output), with a mask-producing op (ragged →
masked, SURVEY.md §7 step 2).  Packing/repadding by the mask is a host
utility (:func:`apply_mask`).

Algorithm (reference semantics):

1. noise template = mean of the first ``sample_size`` frames, then an
   EMA sweep over those same frames with α=0.5
   (``AudioProcessing.py:462-472``);
2. per-frame Euclidean distance to the noise template (``:473-478``);
3. order-statistics filter: over a sliding window of ``2*sample_size``
   frames, the smoothed value is ``(1-β)·sorted[h] + β·sorted[h+1]``
   with ``h = int(β·(2·sample_size+1))`` (``:480-507``);
4. adaptive threshold ``d_mid·(max-min)/max`` where ``d_mid`` is the
   smoothed distance at frame ``sample_size//2`` (``:509-527``; note the
   reference sorts a copy of the first frames but then indexes the
   *unsorted* smoothed array — behavior reproduced);
5. speech = frames with smoothed distance strictly above threshold
   (``:527-536``).

Utterances shorter than one OSF window keep all (valid) frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("sample_size", "alpha", "beta"))
def vad_mask(
    feats: jax.Array,
    frame_mask: jax.Array,
    sample_size: int = 16,
    alpha: float = 0.5,
    beta: float = 0.93,
) -> jax.Array:
    """Compute the speech mask for one utterance.

    :param feats: ``[T, D]`` MFCC features (padded)
    :param frame_mask: ``[T]`` validity mask from the frontend
    :returns: ``[T]`` bool — True for frames kept as speech
    """
    t_pad, _ = feats.shape
    t_true = jnp.sum(frame_mask.astype(jnp.int32))

    # --- noise template (AudioProcessing.py:462-472)
    head = feats[:sample_size]  # assumes T >= sample_size for the VAD path
    noise = jnp.mean(head, axis=0)

    def ema(noise, frame):
        return alpha * noise + (1 - alpha) * frame, None

    noise, _ = jax.lax.scan(ema, noise, head)

    # --- mel distance (AudioProcessing.py:473-478)
    diff = noise[None, :] - feats
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))

    # --- order-statistics filter (AudioProcessing.py:480-507)
    w = 2 * sample_size
    h = int(beta * (2 * sample_size + 1))
    idx = jnp.arange(t_pad)[:, None] + jnp.arange(-sample_size, sample_size)[None, :]
    idx = jnp.clip(idx, 0, t_pad - 1)
    windows = jnp.sort(dist[idx], axis=-1)  # [T, w]
    smoothed_mid = (1 - beta) * windows[:, h] + beta * windows[:, h + 1]
    in_osf_range = (jnp.arange(t_pad) >= sample_size) & (
        jnp.arange(t_pad) < t_true - sample_size
    )
    smoothed = jnp.where(in_osf_range, smoothed_mid, dist)

    # --- adaptive threshold (AudioProcessing.py:509-527)
    valid = frame_mask.astype(bool)
    d_mid = smoothed[sample_size // 2]
    max_d = jnp.max(jnp.where(valid, smoothed, -jnp.inf))
    min_d = jnp.min(jnp.where(valid, smoothed, jnp.inf))
    thresh = d_mid * (max_d - min_d) / jnp.maximum(max_d, 1e-10)
    speech = (smoothed - thresh > 0.0) & valid

    # Too short for the VAD statistics: keep all valid frames
    # (the reference would misbehave here; SURVEY.md §5 "bad-data discard")
    return jnp.where(t_true < 2 * sample_size + 1, valid, speech)


def vad_mask_batch(feats, frame_mask, sample_size=16, alpha=0.5, beta=0.93):
    """Batched :func:`vad_mask` over ``[B, T, D]`` / ``[B, T]``."""
    fn = functools.partial(
        vad_mask, sample_size=sample_size, alpha=alpha, beta=beta
    )
    return jax.vmap(fn)(feats, frame_mask)


def apply_mask(feats, mask, max_frames: int | None = None):
    """Host-side pack: keep masked frames, left-aligned, zero right-pad.

    Converts the reference's ragged frame deletion
    (``AudioProcessing.py:536``) into fixed-shape (packed, length) pairs
    for batching.

    :param feats: ``[T, D]`` (numpy or jax array)
    :param mask: ``[T]`` bool
    :returns: (packed ``[max_frames, D]``, n_kept)
    """
    feats = np.asarray(feats)
    mask = np.asarray(mask).astype(bool)
    kept = feats[mask]
    n = kept.shape[0]
    out_len = max_frames if max_frames is not None else feats.shape[0]
    out = np.zeros((out_len, feats.shape[1]), dtype=feats.dtype)
    out[: min(n, out_len)] = kept[:out_len]
    return out, min(n, out_len)
