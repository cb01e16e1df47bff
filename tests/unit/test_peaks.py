import numpy as np

from alphadia_tpu.ops.peaks import (
    find_peaks_profile,
    suppress_close_peaks,
    symmetric_limits_profile,
)


def ref_find_peaks_1d(a, top_n):
    """Direct port of the reference stencil definition for testing."""
    idx, inten = [], []
    for p in range(2, len(a) - 2):
        if a[p - 2] < a[p - 1] < a[p] > a[p + 1] > a[p + 2]:
            idx.append(p)
            inten.append(a[p])
    order = np.argsort(inten)[::-1][:top_n]
    return [idx[i] for i in order]


def ref_symmetric_limits_1d(a, center, f, center_fraction, min_size, max_size):
    center_intensity = a[center]
    trailing = center_intensity
    limit = min_size
    for s in range(min_size + 1, max_size):
        inten = (a[max(center - s, 0)] + a[min(center + s, len(a) - 1)]) / 2
        if inten < f * trailing:
            if inten > center_intensity * center_fraction:
                limit = s
                trailing = inten
            else:
                break
        else:
            break
    return max(center - limit, 0), min(center + limit + 1, len(a))


def test_find_peaks_matches_reference(rng):
    W = 96
    score = rng.normal(0, 1, (16, W)).astype(np.float32)
    # add some clear peaks
    for b in range(16):
        for c in rng.integers(5, W - 5, 3):
            score[b, c - 2 : c + 3] += np.array([1, 2, 4, 2, 1]) * rng.uniform(1, 3)
    idx, sc, valid = find_peaks_profile(score, top_n=4)
    idx, sc, valid = np.asarray(idx), np.asarray(sc), np.asarray(valid)
    for b in range(16):
        want = ref_find_peaks_1d(score[b], 4)
        got = [int(i) for i, v in zip(idx[b], valid[b]) if v]
        assert got == want


def test_suppress_close_peaks():
    import jax.numpy as jnp

    peak_idx = jnp.array([[10, 12, 30, 31]])
    peak_score = jnp.array([[5.0, 4.0, 3.0, 2.0]])
    valid = jnp.ones((1, 4), dtype=bool)
    keep = np.asarray(suppress_close_peaks(peak_idx, valid, 3))
    assert keep.tolist() == [[True, False, True, False]]


def test_symmetric_limits_matches_reference(rng):
    W = 64
    score = np.abs(rng.normal(0, 1, (8, W))).astype(np.float32)
    centers = rng.integers(5, W - 5, (8, 3)).astype(np.int32)
    start, stop = symmetric_limits_profile(
        score, centers, f=0.99, center_fraction=0.5, min_size=3, max_size=15
    )
    start, stop = np.asarray(start), np.asarray(stop)
    for b in range(8):
        for c in range(3):
            w_start, w_stop = ref_symmetric_limits_1d(
                score[b], int(centers[b, c]), 0.99, 0.5, 3, 15
            )
            assert (start[b, c], stop[b, c]) == (w_start, w_stop)


def test_convolution_alignment(rng):
    from alphadia_tpu.ops.smooth import convolve_profiles, gaussian_kernel_1d

    x = np.zeros((1, 64), np.float32)
    x[0, 30] = 1.0
    k = gaussian_kernel_1d(30, 2.0)
    out = np.asarray(convolve_profiles(x, k, kernel_size=30))[0]
    # impulse response: peak of the smoothed profile stays at the impulse
    assert abs(int(np.argmax(out)) - 30) <= 1
    # direct correlation cross-check
    ref = np.zeros(64)
    for i in range(64):
        for t in range(30):
            j = i + t - 15
            if 0 <= j < 64:
                ref[i] += x[0, j] * k[t]
    # our definition: out[i] = sum_t k[t] x[i + t - 15]
    ref2 = np.zeros(64)
    for i in range(64):
        for t in range(30):
            j = i + t - 15
            if 0 <= j < 64:
                ref2[i] += k[t] * x[0, j]
    np.testing.assert_allclose(out, ref2, rtol=1e-5, atol=1e-7)
