"""Dense XIC extraction as a static-shape gather.

TPU-native replacement of the reference's per-peak binary search
(reference: alphadia/search/jitclasses/alpharaw_jit.py:208-425
``get_dense``/``get_dense_intensity``): the DiaData layer pre-computes a
slot-major CSR peak store with a coarse m/z bin index, so one XIC probe is

    bin lookup -> gather `slab` consecutive peaks -> ppm mask -> masked sum

with fully static shapes, batched as [B, Q, W] (batch, query-row, cycle).
Accumulation semantics match the reference: intensities summed per
(query, cycle); observed m/z is the intensity-weighted mean of matched
peak m/z (ratio of sums instead of running mean — same value, fused order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.jit,
    static_argnames=(
        "n_cycles",
        "n_bins",
        "slab",
        "window_len",
        "with_mz",
    ),
)
def extract_xic(
    peak_mz: jax.Array,  # f32[N+pad]
    peak_intensity: jax.Array,  # f32[N+pad]
    bin_start: jax.Array,  # i32[n_slots, n_cycles, n_bins+1]
    slot_idx: jax.Array,  # i32[B, Q] (-1 = masked query row)
    query_mz: jax.Array,  # f32[B, Q]
    tol_ppm: jax.Array,  # f32 scalar
    cycle_start: jax.Array,  # i32[B]
    *,
    n_cycles: int,
    n_bins: int,
    bin_mz_min: float,
    bin_width: float,
    slab: int = 32,
    window_len: int = 64,
    with_mz: bool = False,
):
    """Extract dense XIC tensors.

    Returns
    -------
    intensity : f32[B, Q, window_len]
        Summed peak intensity per (query row, cycle).
    mz_obs : f32[B, Q, window_len] (only when ``with_mz``)
        Intensity-weighted observed m/z (0 where nothing matched).
    """
    B, Q = slot_idx.shape
    W = window_len

    cyc = cycle_start[:, None, None] + jnp.arange(W, dtype=jnp.int32)[None, None, :]
    valid_c = (cyc >= 0) & (cyc < n_cycles)
    cyc_c = jnp.clip(cyc, 0, n_cycles - 1)  # [B, 1, W]

    slot = slot_idx[:, :, None]  # [B, Q, 1]
    valid_q = slot >= 0
    slot_c = jnp.clip(slot, 0, bin_start.shape[0] - 1)

    tol = tol_ppm * 1e-6
    q_lo = query_mz * (1.0 - tol)  # [B, Q]
    q_hi = query_mz * (1.0 + tol)
    b_lo = jnp.clip(
        jnp.floor((q_lo - bin_mz_min) / bin_width).astype(jnp.int32), 0, n_bins - 1
    )
    b_hi = jnp.clip(
        jnp.floor((q_hi - bin_mz_min) / bin_width).astype(jnp.int32) + 1, 1, n_bins
    )

    flat_bins = bin_start.reshape(-1, n_bins + 1)

    # start/end flat-peak offsets per (B, Q, W)
    spec = slot_c * n_cycles + cyc_c  # [B, Q, W]
    start = flat_bins[spec, jnp.broadcast_to(b_lo[:, :, None], spec.shape)]
    end = flat_bins[spec, jnp.broadcast_to(b_hi[:, :, None], spec.shape)]

    idx = start[..., None] + jnp.arange(slab, dtype=jnp.int32)  # [B, Q, W, K]
    in_range = idx < end[..., None]
    idx = jnp.clip(idx, 0, peak_mz.shape[0] - 1)

    g_mz = peak_mz[idx]
    g_int = peak_intensity[idx]
    mask = (
        in_range
        & (g_mz >= q_lo[:, :, None, None])
        & (g_mz <= q_hi[:, :, None, None])
        & valid_c[..., None]
        & valid_q[..., None]
    )
    w = jnp.where(mask, g_int, 0.0)
    intensity = w.sum(axis=-1)
    if not with_mz:
        return intensity
    mz_sum = (w * g_mz).sum(axis=-1)
    mz_obs = jnp.where(intensity > 0, mz_sum / jnp.maximum(intensity, 1e-12), 0.0)
    return intensity, mz_obs


# ----------------------------------------------------------------------
# numpy reference for unit tests
# ----------------------------------------------------------------------
def ref_extract_xic_numpy(
    dia, slot_idx, query_mz, tol_ppm, cycle_start, window_len, with_mz=False
):
    """Slow direct search over the original spectra; ground truth for tests."""
    B, Q = np.asarray(slot_idx).shape
    inten = np.zeros((B, Q, window_len), np.float32)
    mzo = np.zeros((B, Q, window_len), np.float32)
    flat_bins = dia.bin_start.reshape(-1, dia.bin_start.shape[-1])
    for b in range(B):
        for q in range(Q):
            s = slot_idx[b][q]
            if s < 0:
                continue
            lo = query_mz[b][q] * (1 - tol_ppm * 1e-6)
            hi = query_mz[b][q] * (1 + tol_ppm * 1e-6)
            for w in range(window_len):
                c = cycle_start[b] + w
                if c < 0 or c >= dia.n_cycles:
                    continue
                spec = s * dia.n_cycles + c
                a, z = flat_bins[spec, 0], flat_bins[spec, -1]
                mzs = dia.peak_mz[a:z]
                ints = dia.peak_intensity[a:z]
                m = (mzs >= lo) & (mzs <= hi)
                tot = float(ints[m].sum())
                inten[b, q, w] = tot
                if tot > 0:
                    mzo[b, q, w] = float((ints[m] * mzs[m]).sum()) / tot
    return (inten, mzo) if with_mz else inten
