"""Benchmark: precursors scored per second through the hot path.

Runs the full device hot path (candidate selection -> 46-feature scoring)
over a synthetic DIA run on the default JAX platform (the real TPU under
the driver), excluding compile time. ``vs_baseline`` is the ratio against
the same pipeline executed on the host CPU (all cores) — the stand-in for
the reference's CPU-bound numba/rust backends, which cannot run in this
environment (no numba/alphabase; see BASELINE.md: baseline must be
measured, reference publishes no absolute numbers).

Prints ONE JSON line:
{"metric": "precursors_scored_per_s", "value": N, "unit": "prec/s", "vs_baseline": R}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _build_workload(n_peptides=1500, n_cycles=600, n_windows=12, seed=5):
    from alphadia_tpu.rawdata import DiaData
    from alphadia_tpu.testing.synthetic import (
        SyntheticConfig,
        add_synthetic_decoys,
        make_synthetic_dia,
    )

    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(
            n_peptides=n_peptides,
            n_windows=n_windows,
            n_cycles=n_cycles,
            noise_peaks_per_spectrum=80,
            seed=seed,
        )
    )
    prec, frag = add_synthetic_decoys(prec, frag)
    dia = DiaData.from_spectra(spectra)
    return dia, prec, frag


def _run_pipeline(dia, prec, frag, rt_tol=60.0, batch_size=4096):
    from alphadia_tpu.search.scoring import CandidateScoring, ScoringConfig
    from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig

    sel = CandidateSelection(
        dia, prec, frag,
        SelectionConfig(rt_tolerance=rt_tol, candidate_count=3, batch_size=batch_size),
    )
    cands = sel()
    score = CandidateScoring(
        dia, prec, frag, ScoringConfig(batch_size=batch_size, collect_fragments=True)
    )
    psm, frag_out = score(cands)
    return psm


def measure(n_peptides=6000, n_cycles=600, batch_size=4096) -> float:
    """Return steady-state precursors/second (selection + scoring)."""
    from alphadia_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    dia, prec, frag = _build_workload(n_peptides=n_peptides, n_cycles=n_cycles)

    # jitter the library RT per run so no layer can serve memoized results
    # for byte-identical requests
    rng = np.random.default_rng(1)

    def jittered():
        p = prec.copy()
        p["rt_library"] = p["rt_library"] + rng.uniform(-2, 2, len(p)).astype(
            np.float32
        )
        return p

    # warmups: candidate extents vary slightly between jitters, which can
    # touch more than one scoring window bucket — compile them all first
    for _ in range(3):
        _run_pipeline(dia, jittered(), frag, batch_size=batch_size)

    t0 = time.time()
    n_runs = 3
    for _ in range(n_runs):
        _run_pipeline(dia, jittered(), frag, batch_size=batch_size)
    dt = (time.time() - t0) / n_runs
    return len(prec) / dt


def main() -> None:
    if "--cpu-baseline" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # the CPU baseline gets its own best configuration (smaller
        # batches are cache-friendlier on 4 cores)
        rate = measure(n_peptides=600, n_cycles=300, batch_size=1024)
        print(json.dumps({"cpu_rate": rate}))
        return

    rate = measure()

    baseline_rate = None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                baseline_rate = json.loads(line).get("cpu_rate")
    except Exception:
        pass

    vs_baseline = rate / baseline_rate if baseline_rate else 0.0
    print(
        json.dumps(
            {
                "metric": "precursors_scored_per_s",
                "value": round(rate, 1),
                "unit": "prec/s",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
