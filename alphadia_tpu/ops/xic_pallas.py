"""Pallas TPU kernel for XIC extraction.

Same contract as ops/xic.extract_xic (one contiguous ghost-augmented slab
per query), but the slab is moved HBM -> VMEM with explicit async DMAs
(double-buffered) instead of an XLA gather — XLA lowers that gather to
per-element loads on TPU, which dominated the hot path.

Layout notes:
- Mosaic requires 128-aligned lane slices, so peak arrays are stored 2D
  ``[N/128, 128]`` and a slab DMA copies whole 128-wide rows starting at
  the row containing the slab start (sublane-dim dynamic starts are
  unrestricted); the in-row offset is corrected with an index grid.
- per-cycle assignment comes from a third DMA'd array, the CYCLE of each
  stored peak — matching ``cycle == c0 + w`` in-register removes the
  per-cycle boundary gather entirely (only the slab start/end, 2 values
  per query, are gathered in XLA).

Per query q (grid step processes QT queries, two live DMA slots):
    r0, r_end    = cell_start at (row, c0) and (row, c0+W)   (XLA, [B,Q,2])
    mz/int/cyc   = DMA rows [r0//128 : r0//128+R) of the peak arrays
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

QT = 8  # queries per grid step
LANE = 128


def _xic_kernel(
    r_ref,  # i32[QT, 4] (SMEM): r0, slab_len, c0, valid
    qlo_ref,  # f32[QT, 1] (SMEM)
    qhi_ref,  # f32[QT, 1] (SMEM)
    mz_hbm,  # f32[NR, 128] (ANY/HBM)
    int_hbm,  # f32[NR, 128]
    cyc_hbm,  # i32[NR, 128]
    out_int_ref,  # f32[QT, W]
    out_dmz_ref,  # f32[QT, W]
    mz_scratch,  # f32[2, R, 128]
    int_scratch,  # f32[2, R, 128]
    cyc_scratch,  # i32[2, R, 128]
    sems,  # DMA sems (2, 3)
    *,
    W: int,
    R: int,
    n_rows: int,
    with_mz: bool,
):
    def row0_of(q):
        return jnp.minimum(jnp.maximum(r_ref[q, 0], 0) // LANE, n_rows - R)

    def start_dma(q, slot):
        row0 = row0_of(q)
        return (
            pltpu.make_async_copy(
                mz_hbm.at[pl.ds(row0, R), :], mz_scratch.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                int_hbm.at[pl.ds(row0, R), :], int_scratch.at[slot], sems.at[slot, 1]
            ),
            pltpu.make_async_copy(
                cyc_hbm.at[pl.ds(row0, R), :], cyc_scratch.at[slot], sems.at[slot, 2]
            ),
        )

    for c in start_dma(0, 0):
        c.start()
    for q in range(QT):
        slot = q % 2
        if q + 1 < QT:
            for c in start_dma(q + 1, (q + 1) % 2):
                c.start()
        for c in start_dma(q, slot):
            c.wait()

        mz = mz_scratch[slot]  # [R, 128]
        inten = int_scratch[slot]
        cyc = cyc_scratch[slot]
        qlo = qlo_ref[q, 0]
        qhi = qhi_ref[q, 0]
        r0 = jnp.maximum(r_ref[q, 0], 0)
        slab_len = r_ref[q, 1]
        c0 = r_ref[q, 2]
        off = r0 - row0_of(q) * LANE

        # index of each VMEM element relative to the slab start
        k_abs = (
            jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0) * LANE
            + jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
            - off
        )
        ok = (
            (mz >= qlo)
            & (mz <= qhi)
            & (k_abs >= 0)
            & (k_abs < slab_len)
        )
        v = jnp.where(ok, inten, 0.0)  # [R, 128]
        qc = (qlo + qhi) * 0.5
        vd = jnp.where(ok, inten * (mz - qc), 0.0)

        # per-cycle one-hot over a [R, 128, W] grid (broadcast_in_dim only —
        # cross-lane reshapes are rejected by mosaic)
        w_rel = cyc - c0  # [R, 128] window position of each peak
        w3 = jax.lax.broadcasted_iota(jnp.int32, (R, LANE, W), 2)
        wr3 = jax.lax.broadcast_in_dim(w_rel, (R, LANE, W), (0, 1))
        m3 = wr3 == w3
        v3 = jax.lax.broadcast_in_dim(v, (R, LANE, W), (0, 1))
        acc_i = jnp.sum(jnp.where(m3, v3, 0.0), axis=(0, 1))  # [W]
        out_int_ref[pl.ds(q, 1), :] = jax.lax.broadcast_in_dim(acc_i, (1, W), (1,))
        if with_mz:
            vd3 = jax.lax.broadcast_in_dim(vd, (R, LANE, W), (0, 1))
            acc_d = jnp.sum(jnp.where(m3, vd3, 0.0), axis=(0, 1))
            out_dmz_ref[pl.ds(q, 1), :] = jax.lax.broadcast_in_dim(acc_d, (1, W), (1,))
        else:
            out_dmz_ref[pl.ds(q, 1), :] = jnp.zeros((1, W), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n_cycles", "n_bins", "slab", "window_len", "with_mz", "interpret"),
)
def extract_xic_pallas(
    peak_mz_2d: jax.Array,  # f32[NR, 128]
    peak_int_2d: jax.Array,  # f32[NR, 128]
    peak_cycle_2d: jax.Array,  # i32[NR, 128]
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
    interpret: bool = False,
):
    B, Q = slot_idx.shape
    W = window_len
    n_slots = cell_start.shape[0]
    cs_flat = cell_start.reshape(n_slots * n_bins, n_cycles + 1)
    R = slab // LANE + 1
    n_rows = peak_mz_2d.shape[0]

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
    r0 = cs_flat[row, jnp.broadcast_to(c0c, row.shape)]  # [B, Q]
    r_end = cs_flat[row, jnp.broadcast_to(c1c, row.shape)]
    slab_len = jnp.clip(r_end - r0, 0, slab)
    slab_len = jnp.where(valid_q, slab_len, 0)

    # pack per-query scalars: r0, slab_len, c0, pad
    meta = jnp.stack(
        [
            r0,
            slab_len,
            jnp.broadcast_to(cycle_start[:, None], row.shape),
            jnp.zeros_like(r0),
        ],
        axis=-1,
    )  # [B, Q, 4]

    BQ = B * Q
    BQ_pad = ((BQ + QT - 1) // QT) * QT
    meta_flat = jnp.pad(meta.reshape(BQ, 4), ((0, BQ_pad - BQ), (0, 0)))
    qlo_flat = jnp.pad(q_lo.reshape(BQ, 1), ((0, BQ_pad - BQ), (0, 0)))
    qhi_flat = jnp.pad(q_hi.reshape(BQ, 1), ((0, BQ_pad - BQ), (0, 0)))

    grid = (BQ_pad // QT,)
    out_int, out_dmz = pl.pallas_call(
        functools.partial(_xic_kernel, W=W, R=R, n_rows=n_rows, with_mz=with_mz),
        grid=grid,
        in_specs=[
            pl.BlockSpec((QT, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((QT, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((QT, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((QT, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BQ_pad, W), jnp.float32),
            jax.ShapeDtypeStruct((BQ_pad, W), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R, LANE), jnp.float32),
            pltpu.VMEM((2, R, LANE), jnp.float32),
            pltpu.VMEM((2, R, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(meta_flat, qlo_flat, qhi_flat, peak_mz_2d, peak_int_2d, peak_cycle_2d)

    intensity = out_int[:BQ].reshape(B, Q, W)
    if not with_mz:
        return intensity
    qc = (q_lo + q_hi) * 0.5
    dmz = out_dmz[:BQ].reshape(B, Q, W)
    mz_obs = jnp.where(
        intensity > 0, qc[:, :, None] + dmz / jnp.maximum(intensity, 1e-12), 0.0
    )
    return intensity, mz_obs
