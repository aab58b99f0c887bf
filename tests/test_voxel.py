"""On-device stacked histogram vs a straightforward numpy reference."""
import numpy as np
import jax.numpy as jnp

from leod_tpu.ops.voxel import stacked_histogram, stacked_histogram_batch


def numpy_stacked_histogram(x, y, pol, t, bins, h, w, cutoff=255):
    out = np.zeros((2, bins, h, w), np.int64)
    if len(t) == 0:
        return out.reshape(2 * bins, h, w).astype(np.uint8)
    t0, t1 = t[0], t[-1]
    tn = (t - t0) / max(t1 - t0, 1)
    ti = np.clip(np.floor(tn * bins).astype(int), 0, bins - 1)
    np.add.at(out, (pol, ti, y, x), 1)
    return np.minimum(out, cutoff).reshape(2 * bins, h, w).astype(np.uint8)


def test_matches_numpy():
    rng = np.random.default_rng(0)
    n, h, w, bins = 5000, 48, 64, 10
    x = rng.integers(0, w, n)
    y = rng.integers(0, h, n)
    pol = rng.integers(0, 2, n)
    t = np.sort(rng.integers(0, 50_000, n))
    got = np.asarray(stacked_histogram(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(pol), jnp.asarray(t),
        jnp.ones(n, bool), bins=bins, height=h, width=w))
    want = numpy_stacked_histogram(x, y, pol, t, bins, h, w)
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.uint8


def test_padding_mask():
    n, h, w, bins = 64, 16, 16, 2
    x = np.zeros(n, np.int32)
    y = np.zeros(n, np.int32)
    pol = np.zeros(n, np.int32)
    t = np.arange(n)
    valid = np.zeros(n, bool)
    valid[:10] = True
    got = np.asarray(stacked_histogram(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(pol), jnp.asarray(t),
        jnp.asarray(valid), bins=bins, height=h, width=w))
    # only the 10 valid events counted, all at pixel (0,0)
    assert got.sum() == 10


def test_count_cutoff():
    n, h, w, bins = 300, 4, 4, 1
    z = np.zeros(n, np.int32)
    got = np.asarray(stacked_histogram(
        jnp.asarray(z), jnp.asarray(z), jnp.asarray(z),
        jnp.asarray(np.arange(n)), jnp.ones(n, bool),
        bins=bins, height=h, width=w))
    assert got.max() == 255      # clipped, not wrapped


def test_batch_vmap():
    rng = np.random.default_rng(1)
    B, n, h, w, bins = 3, 256, 16, 20, 5
    x = rng.integers(0, w, (B, n))
    y = rng.integers(0, h, (B, n))
    pol = rng.integers(0, 2, (B, n))
    t = np.sort(rng.integers(0, 1000, (B, n)), axis=1)
    out = np.asarray(stacked_histogram_batch(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(pol), jnp.asarray(t),
        jnp.ones((B, n), bool), bins=bins, height=h, width=w))
    assert out.shape == (B, 2 * bins, h, w)
    for b in range(B):
        want = numpy_stacked_histogram(x[b], y[b], pol[b], t[b], bins, h, w)
        np.testing.assert_array_equal(out[b], want)


def test_mixed_density_matches_reference_math():
    from leod_tpu.ops.voxel import mixed_density_stack
    rng = np.random.default_rng(2)
    n, h, w, bins = 2000, 24, 32, 4
    x = rng.integers(0, w, n)
    y = rng.integers(0, h, n)
    pol = rng.integers(0, 2, n)
    t = np.sort(rng.integers(0, 100_000, n))

    # straightforward numpy version of representations.py:167-221
    out = np.zeros((bins, h, w), np.int64)
    tn = np.clip((t - t[0]) / max(t[-1] - t[0], 1), 1e-6, 1 - 1e-6)
    bi = np.clip(np.floor(bins + np.log2(tn)).astype(int), 0, bins - 1)
    np.add.at(out, (bi, y, x), np.where(pol > 0, 1, -1))
    want = np.cumsum(out, axis=0)

    got = np.asarray(mixed_density_stack(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(pol), jnp.asarray(t),
        jnp.ones(n, bool), bins=bins, height=h, width=w))
    np.testing.assert_array_equal(got, want)
    # earliest events live in channel 0; last channel holds everything
    assert np.abs(got[0]).sum() <= np.abs(got[-1]).sum()
    assert got[-1].sum() == np.where(pol > 0, 1, -1).sum()


def test_out_of_canvas_events_dropped():
    """x >= W / y >= H must DROP (the torch reference raises), not alias
    into the next row/temporal block — e.g. gen4 coordinates voxelized
    at wrong user-supplied gen1 dims via cli/import_raw.py."""
    from leod_tpu.ops.voxel import mixed_density_stack

    H, W, bins = 4, 6, 2
    x = jnp.asarray([2, W, 99, 2], jnp.int32)      # only idx 0 and 3 valid
    y = jnp.asarray([1, 1, 1, H], jnp.int32)
    pol = jnp.asarray([1, 1, 1, 1], jnp.int32)
    t = jnp.asarray([0, 10, 20, 30], jnp.int32)
    valid = jnp.ones(4, bool)
    out = stacked_histogram(x, y, pol, t, valid, bins=bins, height=H,
                            width=W)
    assert int(out.sum()) == 1 and int(out[bins + 0, 1, 2]) == 1
    out2 = mixed_density_stack(x, y, pol, t, valid, bins=bins, height=H,
                               width=W)
    assert int(jnp.abs(out2).max()) <= 2  # only the in-canvas event lands


def test_mixed_density_all_padding_window():
    """Zero valid events: the t1-t0 int32 overflow guard (same as
    stacked_histogram) keeps the output all-zero without wraparound."""
    from leod_tpu.ops.voxel import mixed_density_stack

    z = jnp.zeros(8, jnp.int32)
    out = mixed_density_stack(z, z, z, z, jnp.zeros(8, bool), bins=3,
                              height=4, width=4)
    assert int(jnp.abs(out).sum()) == 0
