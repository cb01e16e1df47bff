"""Pallas TPU kernel for XIC extraction.

Same contract as ops/xic.extract_xic (one contiguous ghost-augmented slab
per query), but the slab is moved HBM -> VMEM with explicit async DMAs
instead of an XLA gather — XLA lowers that gather to per-element loads on
TPU, which dominated the hot path.

Performance model (measured on v5e through the axon tunnel): the kernel is
DMA-LATENCY bound, not bandwidth bound — each query needs only a few KB,
so the design goals are (1) exactly ONE DMA per query and (2) many queries
in flight.  Hence:

- the peak store is PACKED: one f32[NR, 4, 128] array whose second axis
  interleaves (m/z, intensity, cycle, scanbin) per 128-lane row, so a
  query's whole slab — all fields — arrives with a single async copy of
  R contiguous (4, 128) rows;
- a QT-deep prefetch pipeline: all QT slab DMAs of a grid step are
  issued up front into QT scratch slots, then awaited one by one, keeping
  ~QT copies in flight instead of the classic double buffer's one.

Layout notes:
- Mosaic requires 128-aligned lane slices, so slabs are copied as whole
  128-wide rows starting at the row containing the slab start (sublane-dim
  dynamic starts are unrestricted); the in-row offset is corrected with an
  index grid.
- cycle/scanbin ride as f32 (exact for values < 2^24); matching
  ``cycle == c0 + w`` in-register removes the per-cycle boundary gather
  entirely (only the slab start/end, 2 values per query, are gathered in
  XLA).

Per query q (grid step processes QT queries, QT live DMA slots):
    r0, r_end    = cell_start at (row, c0) and (row, c0+W)   (XLA, [B,Q,2])
    packed       = DMA rows [r0//128 : r0//128+R) of the packed store
    ok           = mz within [q_lo, q_hi] and k within [0, r_end-r0)
    out_int[w]   = sum over peaks with cycle == c0+w of ok * intensity
    out_dmz[w]   = same with intensity * (mz - q_center)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# tunables (env-overridable for perf sweeps; defaults = measured best)
QT = int(os.environ.get("ALPHADIA_TPU_PALLAS_QT", 128))  # queries per grid step (output block lane width — must be 128k)
DEPTH = int(os.environ.get("ALPHADIA_TPU_PALLAS_DEPTH", 32))  # rolling DMA prefetch window (r4 sweeps: 32 edges 16; 48/64 flat-to-worse — device scoring 0.1775/0.1781/0.1786 s at 32/48/64, issue-sequencing bound, not depth bound)
# fail fast on sweep typos instead of an opaque Mosaic lane-tiling error
if QT <= 0 or QT % 128 != 0:
    raise ValueError(f"QT must be a positive multiple of 128, got {QT}")
if DEPTH < 1:
    raise ValueError(f"DEPTH must be >= 1, got {DEPTH}")
LANE = 128
FIELDS = 4  # mz, intensity, cycle, scanbin
F_MZ, F_INT, F_CYC, F_SCAN = range(FIELDS)


def pack_peak_store(peak_mz, peak_intensity, peak_cycle, peak_scanbin=None):
    """Build the packed f32[NR, 4, 128] peak store (host-side numpy)."""
    import numpy as np

    n = len(peak_mz)
    n_pad = ((n + LANE - 1) // LANE) * LANE

    def _pad(a, fill):
        a = np.asarray(a, np.float32)
        return np.concatenate([a, np.full(n_pad - len(a), fill, np.float32)])

    mz = _pad(peak_mz, np.inf)
    inten = _pad(peak_intensity, 0.0)
    cyc = _pad(peak_cycle, -1.0)  # may be shorter than the padded peak arrays
    scan = _pad(peak_scanbin if peak_scanbin is not None else np.zeros(0), 0.0)
    return np.stack(
        [
            mz.reshape(-1, LANE),
            inten.reshape(-1, LANE),
            cyc.reshape(-1, LANE),
            scan.reshape(-1, LANE),
        ],
        axis=1,
    ).astype(np.float32)


def _xic_kernel(
    r_ref,  # i32[QT, 6] (SMEM): r0, slab_len, c0, s_lo, s_hi, pad
    qlo_ref,  # f32[QT, 1] (SMEM)
    qhi_ref,  # f32[QT, 1] (SMEM)
    packed_hbm,  # f32[NR, 4, 128] (ANY/HBM)
    out_int_ref,  # f32[QT, W]
    out_dmz_ref,  # f32[QT, W]
    scratch,  # f32[QT, R, 4, 128]
    sems,  # DMA sems (QT,)
    *,
    W: int,
    R: int,
    n_rows: int,
    with_mz: bool,
    cycle_stride: int = 1,
):
    def row0_of(q):
        return jnp.minimum(jnp.maximum(r_ref[q, 0], 0) // LANE, n_rows - R)

    def dma(q):
        slot = q % DEPTH
        return pltpu.make_async_copy(
            packed_hbm.at[pl.ds(row0_of(q), R)], scratch.at[slot], sems.at[slot]
        )

    def nonempty(q):
        # 58% of production fragment queries have an empty slab (invalid
        # observation slot / no peaks in the m/z bin x cycle window) and
        # the gather is bound by per-query DMA issue + sequencing, so
        # skipping their copies AND their histogram compute cuts the
        # kernel ~32% (measured 17.8 -> 12.1 ms on the production batch;
        # the ok-mask already zeroes them, so skipping is purely an
        # optimization). start/wait/refill all branch on the SAME SMEM
        # scalar, so the DMA semaphore pairing stays exact. NOTE: do NOT
        # wrap the whole step in a nested pl.when — Mosaic miscompiles
        # the DMA pipeline under a second conditional level (zeros for
        # ~half the nonempty queries on hardware, interpret mode clean),
        # and host-side sorting of empties to the tail costs more in
        # gather/scatter than whole-step skipping saves.
        return r_ref[q, 1] > 0

    # rolling DEPTH-deep prefetch: DEPTH slab copies stay in flight
    for q in range(DEPTH):

        @pl.when(nonempty(q))
        def _(q=q):
            dma(q).start()

    # one whole-block zero store instead of 2*QT single-lane stores: empty
    # slots (58% in production) then cost only their scalar branch test
    out_int_ref[...] = jnp.zeros((W, QT), jnp.float32)
    out_dmz_ref[...] = jnp.zeros((W, QT), jnp.float32)

    for q in range(QT):

        @pl.when(nonempty(q))
        def _(q=q):
            dma(q).wait()
            buf = scratch[q % DEPTH]  # [R, 4, 128]
            mz = buf[:, F_MZ, :]  # [R, 128]
            inten = buf[:, F_INT, :]
            cyc = buf[:, F_CYC, :]
            qlo = qlo_ref[q, 0]
            qhi = qhi_ref[q, 0]
            r0 = jnp.maximum(r_ref[q, 0], 0)
            slab_len = r_ref[q, 1]
            c0 = r_ref[q, 2]
            # per-query scan (mobility) window [s_lo, s_hi); full range for 3D
            s_lo = r_ref[q, 3].astype(jnp.float32)
            s_hi = r_ref[q, 4].astype(jnp.float32)
            off = r0 - row0_of(q) * LANE

            # index of each VMEM element relative to the slab start
            k_abs = (
                jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0) * LANE
                + jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
                - off
            )
            scanb = buf[:, F_SCAN, :]  # [R, 128] (f32 bin index)
            ok = (
                (mz >= qlo)
                & (mz <= qhi)
                & (k_abs >= 0)
                & (k_abs < slab_len)
                & (scanb >= s_lo)
                & (scanb < s_hi)
            )
            v = jnp.where(ok, inten, 0.0)  # [R, 128]
            qc = (qlo + qhi) * 0.5
            vd = jnp.where(ok, inten * (mz - qc), 0.0) if with_mz else None

            # histogram over cycles in [W(sublanes), LANE] layout: every
            # broadcast below replicates rows/lanes in place — no cross-lane
            # relayout (the naive [R, 128, W] one-hot moves the 128-lane axis
            # onto sublanes, a per-query transpose that dominated the kernel).
            # cycle rides as f32 in the packed store (exact for < 2^24);
            # converts to i32 here because mosaic rejects f32 iota. A coarse
            # view (cycle_stride > 1, a power of two) maps fine per-peak
            # cycles onto merged cells: f32 multiply by the exact reciprocal
            # + floor (exact for pow2 strides); padding cycles (-1) stay < 0.
            if cycle_stride > 1:
                cyc = jnp.floor(cyc * (1.0 / cycle_stride))
            w_rel = cyc.astype(jnp.int32) - c0  # [R, 128]
            w_iota = jax.lax.broadcasted_iota(jnp.int32, (W, LANE), 0)
            acc_i = jnp.zeros((W, LANE), jnp.float32)
            acc_d = jnp.zeros((W, LANE), jnp.float32)
            for r in range(R):
                m = w_iota == jax.lax.broadcast_in_dim(
                    w_rel[r : r + 1, :], (W, LANE), (0, 1)
                )
                acc_i = acc_i + jnp.where(
                    m, jax.lax.broadcast_in_dim(v[r : r + 1, :], (W, LANE), (0, 1)), 0.0
                )
                if with_mz:
                    acc_d = acc_d + jnp.where(
                        m,
                        jax.lax.broadcast_in_dim(vd[r : r + 1, :], (W, LANE), (0, 1)),
                        0.0,
                    )
            # outputs are [W, QT] blocks (queries on lanes): one lane-reduction
            # and a static single-lane store per query; XLA transposes the
            # final [W, BQ] cheaply outside the kernel
            out_int_ref[:, q : q + 1] = jnp.sum(acc_i, axis=1, keepdims=True)
            if with_mz:
                out_dmz_ref[:, q : q + 1] = jnp.sum(acc_d, axis=1, keepdims=True)

        # refill the slot only after query q's reads are done (WAR hazard)
        if q + DEPTH < QT:

            @pl.when(nonempty(q + DEPTH))
            def _(q=q):
                dma(q + DEPTH).start()


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_cycles", "n_bins", "slab", "window_len", "with_mz", "mz_as_delta",
        "interpret", "cycle_stride",
    ),
)
def extract_xic_pallas(
    peak_packed: jax.Array,  # f32[NR, 4, 128]
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
    slab: int = 256,
    window_len: int = 64,
    with_mz: bool = False,
    mz_as_delta: bool = False,
    interpret: bool = False,
    cycle_stride: int = 1,
    scan_lo: jax.Array | None = None,  # i32[B] candidate scan window start
    scan_hi: jax.Array | None = None,  # i32[B] exclusive
):
    assert cycle_stride & (cycle_stride - 1) == 0, "stride must be pow2"
    B, Q = slot_idx.shape
    W = window_len
    n_slots = cell_start.shape[0]
    cs_flat = cell_start.reshape(n_slots * n_bins, -1)  # cycle dim may be bucket-padded
    # a slab window starting at any in-row offset (0..LANE-1) spans up to
    # ceil(slab/LANE)+1 rows; the old `slab // LANE + 1` silently dropped
    # trailing peaks for slab sizes that are not a multiple of LANE
    R = -(-slab // LANE) + 1
    n_rows = peak_packed.shape[0]

    valid_q = slot_idx >= 0
    slot_c = jnp.clip(slot_idx, 0, n_slots - 1)
    tol = tol_ppm * 1e-6
    q_lo = query_mz * (1.0 - tol)
    q_hi = query_mz * (1.0 + tol)
    b_c = jnp.clip(
        jnp.floor((query_mz - bin_mz_min) / bin_width).astype(jnp.int32), 0, n_bins - 1
    )
    row = slot_c * n_bins + b_c

    # slab start/end: only 2 gathered values per query
    c0c = jnp.clip(cycle_start, 0, n_cycles)[:, None]
    c1c = jnp.clip(cycle_start + W, 0, n_cycles)[:, None]
    # flat clip-mode takes (see ops/xic.py _one_bin note: OOB-fill
    # gather lowering miscompiles on XLA:CPU at some shapes)
    r0 = jnp.take(
        cs_flat.reshape(-1),
        row * cs_flat.shape[1] + jnp.broadcast_to(c0c, row.shape),
        mode="clip",
    )  # [B, Q]
    r_end = jnp.take(
        cs_flat.reshape(-1),
        row * cs_flat.shape[1] + jnp.broadcast_to(c1c, row.shape),
        mode="clip",
    )
    slab_len = jnp.clip(r_end - r0, 0, slab)
    slab_len = jnp.where(valid_q, slab_len, 0)

    # per-query scan (mobility) window; full range when not filtering
    if scan_lo is None:
        slo_q = jnp.zeros_like(r0)
        shi_q = jnp.full_like(r0, 1 << 24)
    else:
        slo_q = jnp.broadcast_to(scan_lo[:, None], row.shape)
        shi_q = jnp.broadcast_to(scan_hi[:, None], row.shape)

    # pack per-query scalars: r0, slab_len, c0, s_lo, s_hi, pad
    meta = jnp.stack(
        [
            r0,
            slab_len,
            jnp.broadcast_to(cycle_start[:, None], row.shape),
            slo_q,
            shi_q,
            jnp.zeros_like(r0),
        ],
        axis=-1,
    )  # [B, Q, 6]

    BQ = B * Q
    BQ_pad = ((BQ + QT - 1) // QT) * QT
    meta_flat = jnp.pad(meta.reshape(BQ, 6), ((0, BQ_pad - BQ), (0, 0)))
    qlo_flat = jnp.pad(q_lo.reshape(BQ, 1), ((0, BQ_pad - BQ), (0, 0)))
    qhi_flat = jnp.pad(q_hi.reshape(BQ, 1), ((0, BQ_pad - BQ), (0, 0)))

    grid = (BQ_pad // QT,)
    out_int, out_dmz = pl.pallas_call(
        functools.partial(
            _xic_kernel, W=W, R=R, n_rows=n_rows, with_mz=with_mz,
            cycle_stride=cycle_stride,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((QT, 6), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((QT, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((QT, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((W, QT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, QT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((W, BQ_pad), jnp.float32),
            jax.ShapeDtypeStruct((W, BQ_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, R, FIELDS, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
        interpret=interpret,
    )(meta_flat, qlo_flat, qhi_flat, peak_packed)

    intensity = out_int.T[:BQ].reshape(B, Q, W)
    if not with_mz:
        return intensity
    dmz = out_dmz.T[:BQ].reshape(B, Q, W)
    if mz_as_delta:
        # (observed - query) m/z delta: full f32 precision at ppm scale
        return intensity, jnp.where(
            intensity > 0, dmz / jnp.maximum(intensity, 1e-12), 0.0
        )
    qc = (q_lo + q_hi) * 0.5
    mz_obs = jnp.where(
        intensity > 0, qc[:, :, None] + dmz / jnp.maximum(intensity, 1e-12), 0.0
    )
    return intensity, mz_obs
