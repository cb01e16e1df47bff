"""Dense XIC extraction via contiguous slab gather + prefix sums.

TPU-native replacement of the reference's per-peak binary search
(reference: alphadia/search/jitclasses/alpharaw_jit.py:208-425
``get_dense``/``get_dense_intensity``).

The DiaData peak store is sorted by (slot, coarse m/z bin, cycle, m/z)
with a per-cell offset index, so one XIC probe (slot, query m/z ± ppm,
cycle window [c0, c0+W)) touches ONE contiguous slab of at most ``slab``
peaks per coarse bin (the tolerance window spans <= 2 bins). Per-cycle
intensities then fall out of prefix sums sliced at the per-cycle cell
boundaries — no per-element random gather, no data-dependent shapes:

    boundaries r[w] = cell_start[slot, bin, c0+w]          (W+1 values)
    slab       = peaks[r[0] : r[0]+slab]                   (one gather run)
    v          = intensity * (mz within +-ppm)             (mask)
    P          = exclusive cumsum(v)
    XIC[w]     = P[r[w+1]-r[0]] - P[r[w]-r[0]]

Accumulation semantics match the reference: intensities summed per
(query, cycle); observed m/z = intensity-weighted mean of matched peaks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _one_bin(
    peak_mz, peak_intensity, cs_flat, row, c0, q_lo, q_hi, valid, *,
    n_cycles, slab, W, with_mz,
    peak_scanbin=None, s_lo=None, s_hi=None,
):
    """XIC contribution of one coarse bin. Shapes: row/q_lo/q_hi/valid
    [B, Q]; c0 [B, 1]. Returns ([B, Q, W], [B, Q, W] or None).

    ``peak_scanbin``/``s_lo``/``s_hi`` restrict peaks to a per-query scan
    (ion-mobility) window [s_lo, s_hi) — the 4D candidate crop (reference
    bruker_jit.py _assemble_push honours scan_limits)."""
    B, Q = row.shape
    # per-cycle boundaries within this (slot, bin) row: [B, Q, W+1]
    w_idx = jnp.arange(W + 1, dtype=jnp.int32)
    cyc = jnp.clip(c0[:, :, None] + w_idx[None, None, :], 0, n_cycles)
    # NOTE: a flat jnp.take with mode='clip' instead of fancy
    # cs_flat[row, cyc] indexing: indices are in-bounds by
    # construction, and the default OOB-fill gather lowering
    # miscompiles on XLA:CPU at some shapes (observed jax 0.9.0,
    # W=128/B>=4 on a 25-slot store: every element came back as
    # the int32 fill value -2^23, zeroing all XICs; eager mode and
    # clip-mode gathers are correct)
    r = jnp.take(
        cs_flat.reshape(-1),
        row[:, :, None] * (cs_flat.shape[1]) + cyc,
        mode="clip",
    )  # [B, Q, W+1]

    slab_start = r[:, :, 0]  # [B, Q]
    rel = jnp.clip(r - slab_start[:, :, None], 0, slab)  # [B, Q, W+1]
    slab_len = rel[:, :, -1]

    k = jnp.arange(slab, dtype=jnp.int32)
    g_idx = jnp.clip(slab_start[:, :, None] + k, 0, peak_mz.shape[0] - 1)
    g_mz = jnp.take(peak_mz, g_idx, mode="clip")  # [B, Q, slab]
    g_int = jnp.take(peak_intensity, g_idx, mode="clip")

    vmask = (
        (k[None, None, :] < slab_len[:, :, None])
        & (g_mz >= q_lo[:, :, None])
        & (g_mz <= q_hi[:, :, None])
        & valid[:, :, None]
    )
    if peak_scanbin is not None:
        g_scan = jnp.take(peak_scanbin, g_idx, mode="clip")
        vmask = (
            vmask
            & (g_scan >= s_lo[:, :, None])
            & (g_scan < s_hi[:, :, None])
        )
    v = jnp.where(vmask, g_int, 0.0)
    P = jnp.concatenate(
        [jnp.zeros((B, Q, 1), v.dtype), jnp.cumsum(v, axis=-1)], axis=-1
    )  # [B, Q, slab+1]
    Pr = jnp.take_along_axis(P, rel, axis=-1)  # [B, Q, W+1]
    intensity = Pr[:, :, 1:] - Pr[:, :, :-1]

    if not with_mz:
        return intensity, None
    # accumulate m/z relative to the query center: prefix sums of
    # intensity * (mz - center) stay small, avoiding cancellation noise
    qc = (q_lo + q_hi) * 0.5
    vm = jnp.where(vmask, g_int * (g_mz - qc[:, :, None]), 0.0)
    Pm = jnp.concatenate(
        [jnp.zeros((B, Q, 1), vm.dtype), jnp.cumsum(vm, axis=-1)], axis=-1
    )
    Pmr = jnp.take_along_axis(Pm, rel, axis=-1)
    dmz_sum = Pmr[:, :, 1:] - Pmr[:, :, :-1]
    return intensity, dmz_sum


@partial(
    jax.jit,
    static_argnames=(
        "n_cycles", "n_bins", "slab", "window_len", "with_mz", "mz_as_delta",
    ),
)
def extract_xic(
    peak_mz: jax.Array,  # f32[N+pad]
    peak_intensity: jax.Array,  # f32[N+pad]
    cell_start: jax.Array,  # i32[n_slots, n_bins, n_cycles+1]
    slot_idx: jax.Array,  # i32[B, Q] (-1 = masked query row)
    query_mz: jax.Array,  # f32[B, Q]
    tol_ppm: jax.Array,  # f32 scalar
    cycle_start: jax.Array,  # i32[B]
    *,
    n_cycles: int,
    n_bins: int,
    bin_mz_min: float,
    bin_width: float,
    slab: int = 256,
    window_len: int = 64,
    with_mz: bool = False,
    mz_as_delta: bool = False,
    peak_scanbin: jax.Array | None = None,  # i32[N+pad]
    scan_lo: jax.Array | None = None,  # i32[B] candidate scan window start
    scan_hi: jax.Array | None = None,  # i32[B] exclusive
):
    """Extract dense XIC tensors.

    Returns
    -------
    intensity : f32[B, Q, window_len]
    mz_obs : f32[B, Q, window_len] (only when ``with_mz``; 0 where empty).
        With ``mz_as_delta`` the plane holds (observed - query) m/z deltas
        instead of absolute m/z (full f32 precision at ppm scale).
    """
    B, Q = slot_idx.shape
    W = window_len
    n_slots = cell_start.shape[0]
    cs_flat = cell_start.reshape(n_slots * n_bins, -1)  # cycle dim may be bucket-padded

    valid_q = slot_idx >= 0
    slot_c = jnp.clip(slot_idx, 0, n_slots - 1)

    tol = tol_ppm * 1e-6
    q_lo = query_mz * (1.0 - tol)
    q_hi = query_mz * (1.0 + tol)
    # ghost peaks near bin edges guarantee the full ppm window lives in the
    # query center's bin — exactly ONE slab per query
    b_c = jnp.clip(
        jnp.floor((query_mz - bin_mz_min) / bin_width).astype(jnp.int32),
        0,
        n_bins - 1,
    )

    c0 = cycle_start[:, None]
    row = slot_c * n_bins + b_c
    scan_kw = {}
    if peak_scanbin is not None:
        scan_kw = dict(
            peak_scanbin=peak_scanbin,
            s_lo=jnp.broadcast_to(scan_lo[:, None], row.shape),
            s_hi=jnp.broadcast_to(scan_hi[:, None], row.shape),
        )
    intensity, dmz_sum = _one_bin(
        peak_mz, peak_intensity, cs_flat, row, c0, q_lo, q_hi, valid_q,
        n_cycles=n_cycles, slab=slab, W=W, with_mz=with_mz, **scan_kw,
    )

    if not with_mz:
        return intensity
    if mz_as_delta:
        # intensity-weighted mean m/z RELATIVE to the query center — keeps
        # the full f32 mantissa on the ppm-scale quantity instead of
        # burning it on the ~1e2 absolute m/z (weighted_mass_* parity)
        dmz = jnp.where(
            intensity > 0, dmz_sum / jnp.maximum(intensity, 1e-12), 0.0
        )
        return intensity, dmz
    qc = (q_lo + q_hi) * 0.5
    mz_obs = jnp.where(
        intensity > 0,
        qc[:, :, None] + dmz_sum / jnp.maximum(intensity, 1e-12),
        0.0,
    )
    return intensity, mz_obs


# ----------------------------------------------------------------------
# 4D (ion mobility) extraction: per-(scan bin, cycle) intensities
# ----------------------------------------------------------------------
@partial(
    jax.jit,
    static_argnames=(
        "n_cycles", "n_bins", "n_scan_bins", "slab", "window_len", "with_mz",
    ),
)
def extract_xic_4d(
    peak_mz: jax.Array,  # f32[N+pad]
    peak_intensity: jax.Array,  # f32[N+pad]
    peak_scanbin: jax.Array,  # i32[N+pad]
    cell_start: jax.Array,  # i32[n_slots, n_bins, n_cycles+1]
    slot_idx: jax.Array,  # i32[B, Q]
    query_mz: jax.Array,  # f32[B, Q]
    tol_ppm: jax.Array,
    cycle_start: jax.Array,  # i32[B]
    *,
    n_cycles: int,
    n_bins: int,
    bin_mz_min: float,
    bin_width: float,
    n_scan_bins: int,
    slab: int = 256,
    window_len: int = 64,
    with_mz: bool = False,
):
    """Dense 4D XIC: intensity[B, Q, S, W] resolved per mobility scan bin
    (and, with ``with_mz``, the per-cell m/z delta plane).

    Same slab-gather layout as ``extract_xic`` (one contiguous slab per
    query, reference get_dense's 4D output alpharaw_jit.py:208-425), with
    the per-cycle prefix-sum trick vectorized over scan bins: the slab
    values are split into S masked channels before the cumsum, so each
    (scan, cycle) intensity still falls out of two boundary lookups.
    """
    B, Q = slot_idx.shape
    W, S = window_len, n_scan_bins
    n_slots = cell_start.shape[0]
    cs_flat = cell_start.reshape(n_slots * n_bins, -1)  # cycle dim may be bucket-padded

    valid_q = slot_idx >= 0
    slot_c = jnp.clip(slot_idx, 0, n_slots - 1)
    tol = tol_ppm * 1e-6
    q_lo = query_mz * (1.0 - tol)
    q_hi = query_mz * (1.0 + tol)
    b_c = jnp.clip(
        jnp.floor((query_mz - bin_mz_min) / bin_width).astype(jnp.int32),
        0, n_bins - 1,
    )
    row = slot_c * n_bins + b_c

    w_idx = jnp.arange(W + 1, dtype=jnp.int32)
    cyc = jnp.clip(cycle_start[:, None, None] + w_idx[None, None, :], 0, n_cycles)
    # NOTE: a flat jnp.take with mode='clip' instead of fancy
    # cs_flat[row, cyc] indexing: indices are in-bounds by
    # construction, and the default OOB-fill gather lowering
    # miscompiles on XLA:CPU at some shapes (observed jax 0.9.0,
    # W=128/B>=4 on a 25-slot store: every element came back as
    # the int32 fill value -2^23, zeroing all XICs; eager mode and
    # clip-mode gathers are correct)
    r = jnp.take(
        cs_flat.reshape(-1),
        row[:, :, None] * (cs_flat.shape[1]) + cyc,
        mode="clip",
    )  # [B, Q, W+1]
    slab_start = r[:, :, 0]
    rel = jnp.clip(r - slab_start[:, :, None], 0, slab)  # [B, Q, W+1]
    slab_len = rel[:, :, -1]

    k = jnp.arange(slab, dtype=jnp.int32)
    g_idx = jnp.clip(slab_start[:, :, None] + k, 0, peak_mz.shape[0] - 1)
    g_mz = jnp.take(peak_mz, g_idx, mode="clip")  # [B, Q, K]
    g_int = jnp.take(peak_intensity, g_idx, mode="clip")
    g_sb = jnp.take(peak_scanbin, g_idx, mode="clip")

    vmask = (
        (k[None, None, :] < slab_len[:, :, None])
        & (g_mz >= q_lo[:, :, None])
        & (g_mz <= q_hi[:, :, None])
        & valid_q[:, :, None]
    )
    v = jnp.where(vmask, g_int, 0.0)  # [B, Q, K]
    onehot = (
        g_sb[:, :, :, None] == jnp.arange(S, dtype=jnp.int32)[None, None, None, :]
    )
    vS = v[:, :, :, None] * onehot  # [B, Q, K, S]
    P = jnp.concatenate(
        [jnp.zeros((B, Q, 1, S), vS.dtype), jnp.cumsum(vS, axis=2)], axis=2
    )  # [B, Q, K+1, S]
    Pr = jnp.take_along_axis(
        P, rel[:, :, :, None].astype(jnp.int32), axis=2
    )  # [B, Q, W+1, S]
    intensity = Pr[:, :, 1:, :] - Pr[:, :, :-1, :]  # [B, Q, W, S]
    intensity = jnp.transpose(intensity, (0, 1, 3, 2))  # [B, Q, S, W]
    if not with_mz:
        return intensity
    # per-(scan, cycle) intensity-weighted m/z delta from the query center
    # (same prefix-sum trick on intensity * (mz - qc); full f32 precision
    # at ppm scale) — the exact 4D input of the reference's 2D
    # scan x frame weighted-center-mean (precursor_features.py:52-67)
    qc = (q_lo + q_hi) * 0.5
    vmS = jnp.where(vmask, g_int * (g_mz - qc[:, :, None]), 0.0)[
        :, :, :, None
    ] * onehot
    Pm = jnp.concatenate(
        [jnp.zeros((B, Q, 1, S), vmS.dtype), jnp.cumsum(vmS, axis=2)], axis=2
    )
    Pmr = jnp.take_along_axis(Pm, rel[:, :, :, None].astype(jnp.int32), axis=2)
    dmz_sum = jnp.transpose(Pmr[:, :, 1:, :] - Pmr[:, :, :-1, :], (0, 1, 3, 2))
    dmz = jnp.where(intensity > 0, dmz_sum / jnp.maximum(intensity, 1e-12), 0.0)
    return intensity, dmz


@partial(
    jax.jit,
    static_argnames=("n_cycles", "n_bins", "n_scan_bins", "slab"),
)
def extract_scan_profile(
    peak_mz: jax.Array,  # f32[N+pad]
    peak_intensity: jax.Array,  # f32[N+pad]
    peak_scanbin: jax.Array,  # i32[N+pad]
    cell_start: jax.Array,  # i32[n_slots, n_bins, n_cycles+1]
    slot_idx: jax.Array,  # i32[B, Q]
    query_mz: jax.Array,  # f32[B, Q]
    tol_ppm: jax.Array,
    cycle_lo: jax.Array,  # i32[B] window start (inclusive)
    cycle_hi: jax.Array,  # i32[B] window stop (exclusive)
    *,
    n_cycles: int,
    n_bins: int,
    bin_mz_min: float,
    bin_width: float,
    n_scan_bins: int,
    slab: int = 256,
):
    """Mobility scan profile: intensity[B, Q, S] summed over the cycle
    window, resolved per scan bin.

    The cycle axis is integrated out (reference scan profiles:
    bruker_jit.py:352-645 sum the dense 4D over frames), so only the two
    window boundaries are gathered and the scan one-hot contracts the slab
    axis directly — XLA fuses it into the reduction, nothing 4D is
    materialized.
    """
    B, Q = slot_idx.shape
    S = n_scan_bins
    n_slots = cell_start.shape[0]
    cs_flat = cell_start.reshape(n_slots * n_bins, -1)  # cycle dim may be bucket-padded

    valid_q = slot_idx >= 0
    slot_c = jnp.clip(slot_idx, 0, n_slots - 1)
    tol = tol_ppm * 1e-6
    q_lo = query_mz * (1.0 - tol)
    q_hi = query_mz * (1.0 + tol)
    b_c = jnp.clip(
        jnp.floor((query_mz - bin_mz_min) / bin_width).astype(jnp.int32),
        0, n_bins - 1,
    )
    row = slot_c * n_bins + b_c  # [B, Q]

    c_lo = jnp.clip(cycle_lo, 0, n_cycles)[:, None]
    c_hi = jnp.clip(cycle_hi, 0, n_cycles)[:, None]
    # flat clip-mode takes (see note in _one_bin: OOB-fill gather
    # lowering miscompiles on XLA:CPU at some shapes)
    r_lo = jnp.take(
        cs_flat.reshape(-1),
        row * cs_flat.shape[1] + jnp.broadcast_to(c_lo, row.shape),
        mode="clip",
    )  # [B, Q]
    r_hi = jnp.take(
        cs_flat.reshape(-1),
        row * cs_flat.shape[1] + jnp.broadcast_to(c_hi, row.shape),
        mode="clip",
    )
    slab_len = jnp.clip(r_hi - r_lo, 0, slab)

    k = jnp.arange(slab, dtype=jnp.int32)
    g_idx = jnp.clip(r_lo[:, :, None] + k, 0, peak_mz.shape[0] - 1)
    g_mz = jnp.take(peak_mz, g_idx, mode="clip")  # [B, Q, K]
    g_int = jnp.take(peak_intensity, g_idx, mode="clip")
    g_sb = jnp.take(peak_scanbin, g_idx, mode="clip")

    vmask = (
        (k[None, None, :] < slab_len[:, :, None])
        & (g_mz >= q_lo[:, :, None])
        & (g_mz <= q_hi[:, :, None])
        & valid_q[:, :, None]
    )
    v = jnp.where(vmask, g_int, 0.0)  # [B, Q, K]
    onehot = g_sb[:, :, :, None] == jnp.arange(S, dtype=jnp.int32)[None, None, None, :]
    return jnp.sum(v[:, :, :, None] * onehot, axis=2)  # [B, Q, S]


def ref_extract_xic_4d_numpy(
    dia, slot_idx, query_mz, tol_ppm, cycle_start, window_len
):
    """Slow direct 4D ground truth for tests."""
    B, Q = np.asarray(slot_idx).shape
    S = dia.n_scan_bins
    out = np.zeros((B, Q, S, window_len), np.float32)
    n_stored = dia.n_stored_peaks
    keep = ~dia.peak_is_ghost[:n_stored]
    mz = dia.peak_mz[:n_stored][keep]
    it = dia.peak_intensity[:n_stored][keep]
    sb = dia.peak_scanbin[:n_stored][keep]
    cs = dia.cell_start
    n_slots, n_bins = cs.shape[0], cs.shape[1]
    slot_all = np.zeros(n_stored, np.int32)
    cyc_all = np.zeros(n_stored, np.int32)
    for s in range(n_slots):
        for b in range(n_bins):
            for c in range(dia.n_cycles):
                a, z = cs[s, b, c], cs[s, b, c + 1]
                slot_all[a:z] = s
                cyc_all[a:z] = c
    slot_of = slot_all[keep]
    cyc_of = cyc_all[keep]
    for bb in range(B):
        for q in range(Q):
            s = slot_idx[bb][q]
            if s < 0:
                continue
            lo = query_mz[bb][q] * (1 - tol_ppm * 1e-6)
            hi = query_mz[bb][q] * (1 + tol_ppm * 1e-6)
            sel = (slot_of == s) & (mz >= lo) & (mz <= hi)
            for w in range(window_len):
                c = cycle_start[bb] + w
                if c < 0 or c >= dia.n_cycles:
                    continue
                m = sel & (cyc_of == c)
                for si in range(S):
                    out[bb, q, si, w] = float(it[m & (sb == si)].sum())
    return out


# ----------------------------------------------------------------------
# numpy reference for unit tests
# ----------------------------------------------------------------------
def ref_extract_xic_numpy(
    dia, slot_idx, query_mz, tol_ppm, cycle_start, window_len, with_mz=False
):
    """Slow direct search over all peaks; ground truth for tests."""
    B, Q = np.asarray(slot_idx).shape
    inten = np.zeros((B, Q, window_len), np.float32)
    mzo = np.zeros((B, Q, window_len), np.float32)
    n_stored = dia.n_stored_peaks
    keep = ~dia.peak_is_ghost[:n_stored]  # count each physical peak once
    mz = dia.peak_mz[:n_stored][keep]
    it = dia.peak_intensity[:n_stored][keep]
    # reconstruct per-peak (slot, cycle) from the cell index
    cs = dia.cell_start
    n_slots, n_bins = cs.shape[0], cs.shape[1]
    slot_all = np.zeros(n_stored, np.int32)
    cyc_all = np.zeros(n_stored, np.int32)
    for s in range(n_slots):
        for b in range(n_bins):
            for c in range(dia.n_cycles):
                a, z = cs[s, b, c], cs[s, b, c + 1]
                slot_all[a:z] = s
                cyc_all[a:z] = c
    slot_of = slot_all[keep]
    cyc_of = cyc_all[keep]
    for bb in range(B):
        for q in range(Q):
            s = slot_idx[bb][q]
            if s < 0:
                continue
            lo = query_mz[bb][q] * (1 - tol_ppm * 1e-6)
            hi = query_mz[bb][q] * (1 + tol_ppm * 1e-6)
            sel = (slot_of == s) & (mz >= lo) & (mz <= hi)
            for w in range(window_len):
                c = cycle_start[bb] + w
                if c < 0 or c >= dia.n_cycles:
                    continue
                m = sel & (cyc_of == c)
                tot = float(it[m].sum())
                inten[bb, q, w] = tot
                if tot > 0:
                    mzo[bb, q, w] = float((it[m] * mz[m]).sum()) / tot
    return (inten, mzo) if with_mz else inten
