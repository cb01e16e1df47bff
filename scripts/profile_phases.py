"""Phase-level TPU profile of the bench workload.

Honest timing on the axon tunnel requires host materialization (pandas
outputs or float(scalar)) and varied inputs per iteration — see
utils/device.py notes.  Prints a JSON phase breakdown plus rough
FLOP/byte estimates for the scoring kernel.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from bench import _build_workload


def main() -> None:
    from alphadia_tpu.search.scoring import CandidateScoring, ScoringConfig
    from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig
    from alphadia_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    n_peptides = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    dia, prec, frag = _build_workload(n_peptides=n_peptides, n_cycles=600)
    rng = np.random.default_rng(1)

    def jittered():
        p = prec.copy()
        p["rt_library"] = p["rt_library"] + rng.uniform(-2, 2, len(p)).astype(np.float32)
        return p

    def run_once(collect=True):
        p = jittered()
        t0 = time.time()
        sel = CandidateSelection(
            dia, p, frag,
            SelectionConfig(rt_tolerance=60.0, candidate_count=3, batch_size=batch),
        )
        cands = sel()
        t1 = time.time()
        score = CandidateScoring(
            dia, p, frag, ScoringConfig(batch_size=batch, collect_fragments=collect)
        )
        psm, frag_out = score(cands)
        t2 = time.time()
        return {"selection_s": t1 - t0, "scoring_s": t2 - t1, "n_cand": len(cands),
                "n_psm": len(psm)}

    # warmups (compile)
    for _ in range(2):
        run_once()

    res = [run_once() for _ in range(3)]
    out = {
        "n_precursors": len(prec),
        "batch": batch,
        "selection_s": round(float(np.median([r["selection_s"] for r in res])), 3),
        "scoring_s": round(float(np.median([r["scoring_s"] for r in res])), 3),
        "n_cand": res[0]["n_cand"],
    }

    # scoring without fragment collection (isolates host-side frame build)
    res_nc = [run_once(collect=False) for _ in range(2)]
    out["scoring_nocollect_s"] = round(
        float(np.median([r["scoring_s"] for r in res_nc])), 3
    )

    # --- kernel-only timing: same candidate arrays, scalar materialization
    import jax
    import jax.numpy as jnp

    from alphadia_tpu.ops.scoring import score_candidates_batch_sliced
    from alphadia_tpu.ops.xic_pallas import extract_xic_pallas
    from alphadia_tpu.search.scoring import _pallas_available

    p = jittered()
    sel = CandidateSelection(
        dia, p, frag,
        SelectionConfig(rt_tolerance=60.0, candidate_count=3, batch_size=batch),
    )
    cands = sel()
    sc = CandidateScoring(dia, p, frag, ScoringConfig(batch_size=batch))
    arrays = sc._candidate_arrays(cands)
    W = arrays["window_len"]
    cfg = sc.config
    dev = dia.device_arrays()
    from alphadia_tpu.utils.device import effective_batch

    n = len(cands)
    Bsz = effective_batch(cfg.batch_size, n)
    n_padded = ((n + Bsz - 1) // Bsz) * Bsz
    keys = ("frag_mz", "frag_valid", "frag_intensity", "frag_type", "frag_position",
            "iso_mz", "iso_intensity", "ms2_slot", "ms1_slot", "win_lo", "win_hi",
            "frame_center", "frame_start", "frame_stop", "scan_lo", "scan_hi",
            "mobility_width")

    def _full(a):
        if n_padded > n:
            a = np.concatenate([a, np.repeat(a[-1:], n_padded - n, axis=0)], axis=0)
        return jax.device_put(a)

    bd = {k: _full(arrays[k]) for k in keys}
    static_kw = dict(
        n_cycles=dia.n_cycles, n_bins=dia.n_bins, bin_mz_min=dia.bin_mz_min,
        bin_width=dia.coarse_bin_width,
        n_scan_bins=dia.n_scan_bins if dia.has_mobility else 1,
        slab=cfg.gather_slab, window_len=W,
        quant_window=cfg.quant_window, quant_all=cfg.quant_all,
        experimental_xic=cfg.experimental_xic,
        use_pallas=_pallas_available() and cfg.use_pallas,
    )
    qs = np.asarray(cfg.quad_sigma, np.float32)
    qd = np.asarray(cfg.quad_delta_mu, np.float32)
    ftol = np.float32(cfg.fragment_mz_tolerance)
    ptol = np.float32(cfg.precursor_mz_tolerance)

    @jax.jit
    def _reduce(x):
        return jnp.sum(x)

    def kernel_once(b0):
        f, v, fo = score_candidates_batch_sliced(
            dev["peak_mz"], dev["peak_intensity"], dev["peak_packed"],
            dev["peak_scanbin"],
            dev["cell_start"],
            dev["cycle_rt"],
            bd["frag_mz"], bd["frag_valid"], bd["frag_intensity"], bd["frag_type"],
            bd["frag_position"], bd["iso_mz"], bd["iso_intensity"], bd["ms2_slot"],
            bd["ms1_slot"], bd["win_lo"], bd["win_hi"], qs, qd,
            bd["frame_center"], bd["frame_start"], bd["frame_stop"],
            bd["scan_lo"], bd["scan_hi"], bd["mobility_width"],
            np.int32(b0), ftol, ptol, bsz=Bsz, **static_kw,
        )
        return float(_reduce(f))

    offs = list(range(0, n_padded - Bsz + 1, Bsz)) or [0]
    kernel_once(offs[0])  # compile
    t0 = time.time()
    cnt = 0
    for _ in range(3):
        for b0 in offs:
            kernel_once(b0)
            cnt += 1
    kernel_s = (time.time() - t0) / cnt
    out["score_kernel_per_batch_s"] = round(kernel_s, 4)
    out["n_batches"] = len(offs)
    out["Bsz"] = Bsz
    out["W"] = W

    # XIC-only timing on fragment queries of one batch
    KF = arrays["frag_mz"].shape[1]
    O2 = arrays["ms2_slot"].shape[1]
    fslot = np.where(arrays["frag_valid"][:Bsz, :, None],
                     arrays["ms2_slot"][:Bsz, None, :], -1).astype(np.int32)
    fmzq = np.broadcast_to(arrays["frag_mz"][:Bsz, :, None], (Bsz, KF, O2)).copy()
    c0 = (arrays["frame_center"][:Bsz] - W // 2).astype(np.int32)
    fslot_d = jax.device_put(fslot.reshape(Bsz, KF * O2))
    fmzq_d = jax.device_put(fmzq.reshape(Bsz, KF * O2))
    c0_d = jax.device_put(c0)

    def xic_once(shift):
        i, m = extract_xic_pallas(
            dev["peak_packed"],
            dev["cell_start"], fslot_d, fmzq_d + shift, ftol, c0_d,
            n_cycles=dia.n_cycles, n_bins=dia.n_bins, bin_mz_min=dia.bin_mz_min,
            bin_width=dia.coarse_bin_width, slab=cfg.gather_slab, window_len=W,
            with_mz=True,
        )
        return float(_reduce(i))

    xic_once(np.float32(0.0))
    t0 = time.time()
    reps = 6
    for r in range(reps):
        xic_once(np.float32(1e-6 * r))
    xic_s = (time.time() - t0) / reps
    out["xic_frag_per_batch_s"] = round(xic_s, 4)

    # rough traffic estimate for the fragment XIC
    n_q = Bsz * KF * O2
    R = cfg.gather_slab // 128 + 1
    dma_bytes = n_q * 3 * R * 128 * 4
    out["xic_frag_dma_GB"] = round(dma_bytes / 1e9, 2)
    out["xic_frag_dma_GBps"] = round(dma_bytes / 1e9 / xic_s, 1)
    out["n_queries_per_batch"] = n_q

    print(json.dumps(out))


if __name__ == "__main__":
    main()
