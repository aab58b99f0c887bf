"""On-device event voxelization: stacked-histogram representation.

The reference voxelizes offline with torch scatter-add
(reference: data/utils/representations.py:38-123, StackedHistogram):
2 polarities x `bins` temporal bins, uint8 counts clipped at 255,
dt=50ms windows, nbins=10 => 20 channels. Here it is a jittable XLA
scatter-add so raw events can be turned into network input on the TPU
itself (north-star item, SURVEY.md section 2.7) — batched over windows
with `vmap`, fixed event-buffer size with a validity mask.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("bins", "height", "width",
                                             "count_cutoff"))
def stacked_histogram(x: jnp.ndarray, y: jnp.ndarray, pol: jnp.ndarray,
                      time: jnp.ndarray, valid: jnp.ndarray,
                      bins: int, height: int, width: int,
                      count_cutoff: int = 255) -> jnp.ndarray:
    """Events -> [2*bins, H, W] uint8 stacked histogram.

    x, y, pol, time: int arrays [N] (N static; pad + mask with `valid`).
    Temporal binning matches the reference exactly: t normalized by the
    first/last VALID event time, scaled to `bins`, floored, clamped to
    bins-1 (representations.py:104-111). Channel layout: pol*bins + bin.
    """
    # int32-safe: event times within one window fit easily in 31 bits
    big = jnp.iinfo(jnp.int32).max
    t = time.astype(jnp.int32)
    t0 = jnp.min(jnp.where(valid, t, big))
    t1 = jnp.max(jnp.where(valid, t, -big))
    t0 = jnp.where(jnp.any(valid), t0, 0)
    t1 = jnp.where(jnp.any(valid), t1, 0)
    t_norm = (t - t0).astype(jnp.float32) / jnp.maximum(
        (t1 - t0).astype(jnp.float32), 1.0)
    t_idx = jnp.clip(jnp.floor(t_norm * bins).astype(jnp.int32), 0, bins - 1)

    # out-of-canvas coordinates must DROP, not alias: x >= width wraps
    # into row y+1 and y >= height into the next temporal-bin block
    # (the torch reference's scatter_add raises instead). Matters for
    # .npy imports where the sensor size is user-supplied.
    valid = (valid & (x >= 0) & (x < width) & (y >= 0) & (y < height))
    flat = (x.astype(jnp.int32)
            + width * y.astype(jnp.int32)
            + height * width * t_idx
            + bins * height * width * pol.astype(jnp.int32))
    size = 2 * bins * height * width
    # invalid events scatter out of range -> dropped by mode="drop"
    flat = jnp.where(valid, flat, size)
    hist = jnp.zeros((size,), jnp.int32).at[flat].add(
        1, mode="drop", indices_are_sorted=False, unique_indices=False)
    hist = jnp.minimum(hist, count_cutoff).astype(jnp.uint8)
    return hist.reshape(2 * bins, height, width)


def stacked_histogram_batch(x, y, pol, time, valid, bins: int, height: int,
                            width: int, count_cutoff: int = 255):
    """vmap over leading window axis: [B, N] inputs -> [B, 2*bins, H, W]."""
    fn = functools.partial(stacked_histogram, bins=bins, height=height,
                           width=width, count_cutoff=count_cutoff)
    return jax.vmap(fn)(x, y, pol, time, valid)


def mixed_density_stack(x: jnp.ndarray, y: jnp.ndarray, pol: jnp.ndarray,
                        time: jnp.ndarray, valid: jnp.ndarray,
                        bins: int, height: int, width: int,
                        count_cutoff: Optional[int] = None) -> jnp.ndarray:
    """MixedDensityEventStack (reference: representations.py:167-221).

    Log-spaced temporal bins anchored at the window START: an event at
    normalized time t lands in raw bin floor(bins + log2(t)) (clamped),
    so the earliest sliver fills bin 0 and the latest events bin N-1;
    the cumulative sum makes channel i hold ALL events up to its
    exponential time cutoff 2^(i-bins). Values are signed polarity
    (+1/-1), output [bins, H, W], optionally clipped.
    """
    big = jnp.iinfo(jnp.int32).max
    t = time.astype(jnp.int32)
    t0 = jnp.min(jnp.where(valid, t, big))
    t1 = jnp.max(jnp.where(valid, t, -big))
    # all-padding window: t1-t0 would overflow int32 (big - (-big));
    # same guard as stacked_histogram
    t0 = jnp.where(jnp.any(valid), t0, 0)
    t1 = jnp.where(jnp.any(valid), t1, 0)
    t_norm = (t - t0).astype(jnp.float32) / jnp.maximum(
        (t1 - t0).astype(jnp.float32), 1.0)
    t_norm = jnp.clip(t_norm, 1e-6, 1.0 - 1e-6)
    bin_f = jnp.floor(bins + jnp.log2(t_norm))
    bin_idx = jnp.clip(bin_f.astype(jnp.int32), 0, bins - 1)
    val = jnp.where(pol > 0, 1, -1).astype(jnp.int32)
    # drop out-of-canvas coordinates (see stacked_histogram)
    valid = (valid & (x >= 0) & (x < width) & (y >= 0) & (y < height))
    flat = (x.astype(jnp.int32) + width * y.astype(jnp.int32)
            + height * width * bin_idx)
    size = bins * height * width
    flat = jnp.where(valid, flat, size)
    hist = jnp.zeros((size,), jnp.int32).at[flat].add(val, mode="drop")
    hist = hist.reshape(bins, height, width)
    # channel i accumulates bins 0..i (reference cumsum_channel,
    # representations.py:126-129)
    hist = jnp.cumsum(hist, axis=0)
    if count_cutoff is not None:
        hist = jnp.clip(hist, -count_cutoff, count_cutoff)
    return hist
