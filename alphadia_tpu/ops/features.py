"""Vectorized feature primitives for candidate scoring.

Each helper is the batched, masked, static-shape analogue of a numba
kernel in the reference:

- masked_corrcoef        <- save_corrcoeff (scoring/utils.py:479)
- or_envelope            <- or_envelope_1d/2d (scoring/utils.py:47-68)
- center_envelope_odd    <- _odd_center_envelope (features/fragment_features.py:72)
- weighted_center_mean   <- weighted_center_mean (features/features_utils.py:10)
- weighted_center_of_mass<- weighted_center_of_mass (features/fragment_features.py:21)
- logistic_rectangle     <- quadrupole.py:13-44
- masked_median          (for the experimental-XIC median profile)

Conventions: profiles are [..., W] along the cycle axis with the candidate
apex re-centered at W // 2; `mask` marks real (non-padding) entries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logistic_rectangle(mu1, mu2, sigma1, sigma2, x):
    """Quadrupole transmission: rising logistic at mu1 minus one at mu2."""
    return jax.nn.sigmoid((x - mu1) / sigma1) - jax.nn.sigmoid((x - mu2) / sigma2)


def masked_corrcoef(x, y, mask, axis=-1, eps=1e-12):
    """Pearson correlation over masked entries along `axis`."""
    m = mask.astype(x.dtype)
    n = jnp.maximum(m.sum(axis=axis, keepdims=True), 1.0)
    xm = (x * m).sum(axis=axis, keepdims=True) / n
    ym = (y * m).sum(axis=axis, keepdims=True) / n
    xc = (x - xm) * m
    yc = (y - ym) * m
    num = (xc * yc).sum(axis=axis)
    den = jnp.sqrt((xc**2).sum(axis=axis) * (yc**2).sum(axis=axis))
    return num / (den + eps)


def cosine_rows(x, template, eps=1e-4):
    """Cosine similarity of [..., W] rows against a broadcastable template
    (reference features_utils.py:41-47 cosine_similarity_a1, incl. its
    1e-4 denominator epsilon)."""
    x_norm = jnp.sqrt((x**2).sum(axis=-1))
    t_norm = jnp.sqrt((template**2).sum(axis=-1))
    return (x * template).sum(axis=-1) / (x_norm * t_norm + eps)


def pearson_rows(x, y, eps=1e-12):
    """Row-wise Pearson between matching [..., W] profiles (no mask)."""
    xm = x.mean(axis=-1, keepdims=True)
    ym = y.mean(axis=-1, keepdims=True)
    xc = x - xm
    yc = y - ym
    num = (xc * yc).sum(axis=-1)
    den = jnp.sqrt((xc**2).sum(axis=-1) * (yc**2).sum(axis=-1))
    return num / (den + eps)


def pearson_rows_masked(x, y, mask, eps=1e-12):
    """Row-wise Pearson over the `mask`-selected positions of matching
    [..., W] profiles. Entries outside the mask must already be zero —
    moments are computed over the masked count, matching the reference's
    correlations over candidate-length dense profiles (reference:
    profile_features.py operates on profiles spanning exactly
    frame_start..frame_stop, not a padded window)."""
    m = mask.astype(x.dtype)
    cnt = jnp.maximum(m.sum(axis=-1, keepdims=True), 1.0)
    xm = x.sum(axis=-1, keepdims=True) / cnt
    ym = y.sum(axis=-1, keepdims=True) / cnt
    xc = (x - xm) * m
    yc = (y - ym) * m
    num = (xc * yc).sum(axis=-1)
    den = jnp.sqrt((xc**2).sum(axis=-1) * (yc**2).sum(axis=-1))
    return num / (den + eps)


def or_envelope(x):
    """Replace local dips with the mean of their neighbours ([..., W])."""
    left = x[..., :-2]
    right = x[..., 2:]
    mid = x[..., 1:-1]
    dip = (mid < left) | (mid < right)
    repaired = jnp.where(dip, (left + right) * 0.5, mid)
    return jnp.concatenate([x[..., :1], repaired, x[..., -1:]], axis=-1)


def center_envelope_odd(x, center: int):
    """Interference-correction envelope walking outwards from `center`
    (static index). x: [..., W]; returns corrected copy."""
    W = x.shape[-1]
    left_int = (x[..., center - 1] + x[..., center]) * 0.5
    right_int = (x[..., center + 1] + x[..., center]) * 0.5
    out = x
    for i in range(1, center + 1):
        li = center - i
        ri = center + i
        if li < 0 or ri >= W:
            break
        new_l = jnp.minimum(left_int, out[..., li])
        out = out.at[..., li].set(new_l)
        left_int = (new_l + out[..., li + 1]) * 0.5
        new_r = jnp.minimum(right_int, out[..., ri])
        out = out.at[..., ri].set(new_r)
        right_int = (new_r + out[..., ri - 1]) * 0.5
    return out


def weighted_center_of_mass(profile, mask):
    """Intensity-weighted frame mean over [..., W] profiles.

    Returns (com, total). Zero entries carry no weight (matches reference
    nonzero-only accumulation).
    """
    W = profile.shape[-1]
    frames = jnp.arange(W, dtype=profile.dtype)
    w = jnp.where(mask, profile, 0.0)
    total = w.sum(axis=-1)
    com = jnp.where(total > 0, (w * frames).sum(axis=-1) / jnp.maximum(total, 1e-12), 0.0)
    return com, total


def weighted_center_mean(values, center, mask, scan_dist_sq=(0.25, 0.25), nonzero=None):
    """exp(-0.1 * distance)-weighted mean of nonzero values.

    values: [..., W], center: [...] (broadcast), mask: [..., W].

    Matches the reference's weighted_center_mean
    (features/features_utils.py:10-25) on 3D data exactly: the dense
    tensors there carry a dummy 2-row scan dim with identical values, so
    each nonzero frame contributes two terms whose distances are
    sqrt(s0 + df^2) and sqrt(s1 + df^2) with (s0, s1) = the squared scan
    offsets of rows {0, 1} from the scan center.  Call sites pass
    - fragments: scan center-of-mass = 0.5 -> (0.25, 0.25)
    - precursors: scan "center" = dense.shape[3] = 2 (a tile(shape)
      artifact in precursor_features, precursor_features.py:52-67) ->
      (4.0, 1.0), and the frame center = shape[2] = 1 relative to the
      candidate window START, which the caller converts to buffer coords.

    ``nonzero`` overrides the presence test (default ``values > 0``) —
    required when ``values`` is a signed m/z-delta plane whose presence is
    defined by the intensity plane.
    """
    W = values.shape[-1]
    frames = jnp.arange(W, dtype=values.dtype)
    nz = ((values > 0) if nonzero is None else nonzero) & mask
    dsq = jnp.square(frames - center[..., None])
    w = jnp.exp(-0.1 * jnp.sqrt(scan_dist_sq[0] + dsq)) + jnp.exp(
        -0.1 * jnp.sqrt(scan_dist_sq[1] + dsq)
    )
    w = jnp.where(nz, w, 0.0)
    wsum = w.sum(axis=-1)
    return jnp.where(wsum > 0, (values * w).sum(axis=-1) / jnp.maximum(wsum, 1e-12), 0.0)


def masked_median(x, mask, axis=0):
    """Median over masked entries (NaN-propagation trick)."""
    filled = jnp.where(mask, x, jnp.nan)
    med = jnp.nanmedian(filled, axis=axis)
    return jnp.nan_to_num(med)


def masked_mean(x, mask, axis=-1):
    m = mask.astype(x.dtype)
    n = jnp.maximum(m.sum(axis=axis), 1.0)
    return (x * m).sum(axis=axis) / n


def ref_top3_ion_correlation(values, frag_mz, frag_int, mask, is_type):
    """Replicate the reference's top3_{b,y}_ion_correlation pick EXACTLY
    (reference profile_features.py:36,97-112):

        fragment_idx_sorted = np.argsort(intensity)[::-1]
        sel = fragment_idx_sorted[type_mask][:3]      # note: MASK IS IN
        feature = correlation_list[sel].mean()        # m/z ORDER, the
                                                      # INDEX LIST IS NOT
    i.e. the positions of the candidate's b (or y) ions in the container's
    m/z-sorted order select entries of the intensity-descending index
    list — a reference quirk that usually does NOT pick b ions at all.
    Ties in the argsort resolve like numpy's stable ascending sort
    reversed (later position wins), matched here with a stable argsort +
    flip. Invalid slots sort to the tail of both orders.
    """
    inf = jnp.float32(jnp.inf)
    # container order = ascending m/z over valid fragments
    perm = jnp.argsort(jnp.where(mask, frag_mz, inf), axis=1, stable=True)
    g = lambda a: jnp.take_along_axis(a, perm, axis=1)  # noqa: E731
    vals_m, int_m, valid_m, type_m = g(values), g(frag_int), g(mask), g(is_type)
    # fragment_idx_sorted: intensity descending, numpy [::-1] tie order
    idx_sorted = jnp.flip(
        jnp.argsort(jnp.where(valid_m, int_m, -inf), axis=1, stable=True),
        axis=1,
    )
    corr_at = jnp.take_along_axis(vals_m, idx_sorted, axis=1)  # [B, KF]
    hit = type_m & valid_m  # positions in m/z order
    rank = jnp.cumsum(hit.astype(jnp.int32), axis=1) - 1
    n = hit.sum(axis=1)
    limit = jnp.minimum(n, 3)
    total = jnp.zeros(values.shape[0], values.dtype)
    for r in range(3):
        sel = hit & (rank == r)
        total = total + jnp.where(
            r < limit, (sel * corr_at).sum(axis=1), 0.0
        )
    return jnp.where(limit > 0, total / jnp.maximum(limit, 1), 0.0)


def topk_mean_by(values, keys, mask, k=3):
    """Mean of `values` at the k largest `keys` among masked entries."""
    masked_keys = jnp.where(mask, keys, -jnp.inf)
    _, idx = jax.lax.top_k(masked_keys, k)
    v = jnp.take_along_axis(values, idx, axis=-1)
    valid = jnp.take_along_axis(mask, idx, axis=-1)
    return masked_mean(v, valid)
