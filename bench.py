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


def measure(
    n_peptides=6000,
    n_cycles=600,
    batch_size=None,
    n_runs=3,
    n_warmup=3,
    with_device_time=True,
    workload=None,
):
    """Steady-state precursors/second plus a per-phase wall-clock profile.

    Returns (rate, phases, device) where phases maps phase name -> wall
    seconds per run and device maps phase -> pure device-compute seconds
    (inputs pre-staged, outputs left on device; bench_device_time mode).
    """
    from alphadia_tpu.search.scoring import CandidateScoring, ScoringConfig
    from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig
    from alphadia_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    dia, prec, frag = workload or _build_workload(
        n_peptides=n_peptides, n_cycles=n_cycles
    )

    # jitter the library RT per run so no layer can serve memoized results
    # for byte-identical requests
    rng = np.random.default_rng(1)

    def jittered():
        p = prec.copy()
        p["rt_library"] = p["rt_library"] + rng.uniform(-2, 2, len(p)).astype(
            np.float32
        )
        return p

    import jax

    # bf16 dense chains on accelerators (validated <2% feature deviation,
    # mass errors f32); CPU keeps f32 (its fastest path)
    cdt = "float32" if jax.default_backend() == "cpu" else "bfloat16"

    # batch caps: the drivers split these into a greedy pow2 schedule.
    # Round-5 sweep with the library-indexed scoring uploads (per-batch
    # host->device traffic is just a b0 scalar now): 8192 wins for
    # scoring (0.332 s vs 0.362 @4096 / 0.395 @16384 wall on the same
    # candidates) — fewer dispatch round trips, while downloads of early
    # batches still overlap later batches' compute. Selection uploads are
    # tiny (~0.6 MB), so its batch size is insensitive.
    sel_batch = batch_size or 16384
    score_batch = batch_size or 8192

    def _sel(p, device_time=False):
        return CandidateSelection(
            dia, p, frag,
            SelectionConfig(
                rt_tolerance=60.0, candidate_count=3, batch_size=sel_batch,
                bench_device_time=device_time,
            ),
        )

    def _score(p, device_time=False):
        return CandidateScoring(
            dia, p, frag,
            ScoringConfig(
                batch_size=score_batch, collect_fragments=True, compute_dtype=cdt,
                bench_device_time=device_time,
            ),
        )

    from alphadia_tpu.search.pipelined import PipelinedExtraction

    def run_once(p, phases=None):
        """One pipelined pass (production hot-path shape: selection
        batches feed scoring as they decode; search/pipelined.py)."""
        t0 = time.time()
        pipe = PipelinedExtraction(
            dia, p, frag,
            SelectionConfig(
                rt_tolerance=60.0, candidate_count=3, batch_size=sel_batch
            ),
            ScoringConfig(
                batch_size=score_batch, collect_fragments=True,
                compute_dtype=cdt,
            ),
        )
        cands, psm, _ = pipe()
        t1 = time.time()
        if phases is not None:
            phases["select+score"] = phases.get("select+score", 0.0) + (t1 - t0)
        return psm

    # warmups: candidate extents vary slightly between jitters, which can
    # touch more than one scoring window bucket — compile them all first
    for _ in range(n_warmup):
        run_once(jittered())

    # each timing pass is measured SEPARATELY: the headline reports the
    # median with min/max/n so a single tunnel hiccup can neither inflate
    # nor sink the round's number (r4 spread across identical code was
    # 14.9k-23.4k prec/s)
    phases: dict = {}
    pass_rates = []
    for _ in range(n_runs):
        t0 = time.time()
        run_once(jittered(), phases)
        pass_rates.append(len(prec) / (time.time() - t0))
    dt = len(prec) / float(np.median(pass_rates))
    phases = {k: round(v / n_runs, 3) for k, v in phases.items()}

    device = {}
    if with_device_time:
        # device-only pass: same workload, inputs pre-staged and blocked
        # before the clock, outputs blocked on-device, downloads skipped —
        # the kernel speed-of-light question, minus tunnel transport
        p = jittered()
        cands = _sel(p)()  # real candidates for the scoring device pass
        best = {}
        for _ in range(2):  # first pass may trace/compile a new tail bucket
            sel_dev = _sel(p, device_time=True)
            sel_dev()
            score_dev = _score(p, device_time=True)
            score_dev(cands)
            best["selection"] = min(
                best.get("selection", 1e9), sel_dev.last_device_seconds
            )
            best["scoring"] = min(
                best.get("scoring", 1e9), score_dev.last_device_seconds
            )
        device = {k: round(v, 4) for k, v in best.items()}
    spread = {
        "median": round(float(np.median(pass_rates)), 1),
        "min": round(float(np.min(pass_rates)), 1),
        "max": round(float(np.max(pass_rates)), 1),
        "n": len(pass_rates),
    }
    return len(prec) / dt, phases, device, spread


# TPU v5e peak: ~197 TFLOP/s bf16, ~98 f32 (per chip), ~819 GB/s HBM.
# The hot path is slab gather + vector math (VPU), so FLOP-side MFU is
# expected to be low; the roofline numbers show whether optimization
# should target compute, HBM traffic, or host transfers.
_PEAK_FLOPS_F32 = 98e12
_PEAK_HBM_BPS = 819e9


def _roofline(n_candidates: int, scoring_seconds: float) -> dict:
    """Analytic FLOP/byte estimate for the scoring phase (documented model,
    independent of XLA's cost analysis, which the relay backend does not
    expose).

    Per candidate (defaults KF=12 fragments, O2=2 quad obs, KI=3 isotopes,
    W=16-cycle window, slab=256 gathered peaks/query):
      - XIC gather: (KF*O2 + KI) * slab peaks * 8 B (mz+intensity reads).
        NOTE: since the r4 skip-empty kernel, ~58% of fragment queries
        issue no DMA at all, so this analytic byte count overstates the
        actual traffic ~2.4x — the model is kept as the workload's
        DEMAND-side roofline (what a gather with no skip would move)
      - dense pipeline: ~60 elementwise/reduction passes over [KF, O2, W]
        f32 plus the KFxKF frame/scan correlation einsums.
    """
    KF, O2, KI, W, SLAB = 12, 2, 3, 16, 256
    flops = n_candidates * (60 * KF * O2 * W + KF * KF * W * 3)
    gather_bytes = n_candidates * (KF * O2 + KI) * SLAB * 8
    dense_bytes = n_candidates * KF * O2 * W * 4 * 8  # ~8 materialized passes
    # packed result transport: ~105 u16 columns per candidate
    # (ops/scoring.py pack_scoring_output layout)
    download_bytes = n_candidates * 105 * 2
    t = max(scoring_seconds, 1e-9)
    return {
        "mfu": round(flops / t / _PEAK_FLOPS_F32, 5),
        "hbm_util": round((gather_bytes + dense_bytes) / t / _PEAK_HBM_BPS, 4),
        "gflops_per_s": round(flops / t / 1e9, 1),
        "hbm_gb_per_s": round((gather_bytes + dense_bytes) / t / 1e9, 1),
        # on the relay/tunnel backend the phase is transfer-bound: the
        # packed result download runs at the tunnel's ~28 MB/s ceiling
        # (measured; concurrent fetches do not multiplex). On directly
        # attached TPU hardware this term vanishes.
        "download_mb": round(download_bytes / 1e6, 1),
        "download_mb_per_s": round(download_bytes / t / 1e6, 1),
    }


def _backend_available(attempts: int = 3, probe_timeout_s: float = 60.0,
                       delay_s: float = 20.0) -> bool:
    """The remote-TPU tunnel can be transiently unavailable (observed:
    multi-hour outages where backend init hangs or raises UNAVAILABLE).
    Probe in a subprocess so a hung init cannot wedge the benchmark, with
    a TOTAL budget (<=3x60s + 2x20s ~ 220 s) far under any driver timeout:
    round 3 lost its entire perf capture to a 5x(300+120)s retry policy
    that ate the capture window and emitted nothing parseable."""
    probe = "import jax; jax.devices()"
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, timeout=probe_timeout_s,
            )
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(
            f"# backend unavailable (attempt {i + 1}/{attempts})",
            file=sys.stderr,
        )
        if i < attempts - 1:
            time.sleep(delay_s)
    return False


def _git_head() -> str | None:
    """Tree hash of the package + bench sources (docs-only commits keep
    the cached CPU baseline valid)."""
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD:alphadia_tpu", "HEAD:bench.py"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return "-".join(out.stdout.split()) or None
    except Exception:
        return None


_CPU_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "docs", "cpu_baseline.json"
)


def _cpu_baseline_rate(timeout_s: float = 3600.0) -> float | None:
    """CPU rate of the same workload — measured once per commit and cached
    (docs/cpu_baseline.json): the measurement is ~12 min of pure CPU and
    deterministic for a given code version, so re-measuring it inside
    every capture window only risks the window."""
    head = _git_head()
    try:
        cached = json.load(open(_CPU_CACHE))
        if head and cached.get("git_head") == head:
            return cached.get("cpu_rate")
    except Exception:
        pass
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                rate = json.loads(line).get("cpu_rate")
                if rate and head:
                    try:
                        json.dump(
                            {"git_head": head, "cpu_rate": rate},
                            open(_CPU_CACHE, "w"),
                        )
                    except Exception:
                        pass
                return rate
    except Exception:
        pass
    return None


def _emit_failure(error: str, cpu_rate: float | None) -> None:
    """Terminal-failure path: ALWAYS print one parseable JSON line so a
    backend outage can never again leave a round with no recorded number."""
    print(json.dumps({
        "metric": "precursors_scored_per_s",
        "value": None,
        "unit": "prec/s",
        "vs_baseline": None,
        "error": error,
        "cpu_rate": round(cpu_rate, 1) if cpu_rate else None,
    }))


def _measure_large():
    """Predicted-library scale: 1,000,000 precursors (incl. decoys) over
    2000 cycles, searched with the RT-windowed streaming driver
    (search/streaming.py) so device slab and host RSS stay BOUNDED by the
    window size, not the run size. One timed pass; reports rate, the max
    per-window slab footprint and peak host RSS."""
    import resource
    import time as _time

    import jax

    from alphadia_tpu.search.scoring import ScoringConfig
    from alphadia_tpu.search.selection import SelectionConfig
    from alphadia_tpu.search.streaming import RtWindowedSearch
    from alphadia_tpu.testing.synthetic import (
        SyntheticConfig,
        add_synthetic_decoys,
        make_synthetic_dia,
    )

    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(
            n_peptides=500_000,
            n_windows=24,
            n_cycles=2000,
            noise_peaks_per_spectrum=60,
            seed=11,
        )
    )
    prec, frag = add_synthetic_decoys(prec, frag)  # -> 1M precursors

    cdt = "float32" if jax.default_backend() == "cpu" else "bfloat16"
    sw = RtWindowedSearch(
        spectra, prec, frag,
        SelectionConfig(rt_tolerance=60.0, candidate_count=3, batch_size=16384),
        ScoringConfig(
            batch_size=8192, collect_fragments=True, compute_dtype=cdt
        ),
        n_rt_windows=8,
    )
    t0 = _time.time()
    psm, _ = sw()
    dt = _time.time() - t0
    return {
        "n_precursors": int(len(prec)),
        "n_cycles": 2000,
        "n_rt_windows": 8,
        "prec_per_s": round(len(prec) / dt, 1),
        "wall_s": round(dt, 1),
        "n_psm": int(len(psm)),
        # BOUNDED footprints: max per-window device slab + peak host RSS
        "window_slab_mb": round(sw.peak_window_slab_mb, 1),
        "peak_host_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        ),
        "backend": jax.default_backend(),
    }


def _pipeline_child() -> None:
    """Child-process body for the whole-pipeline benchmark: run the
    production CLI path (SearchStep -> workflow: optimization/calibration
    loop, extraction, FDR, calibration, quant, LFQ outputs) on the
    device backend over a synthetic 2-file study at predicted-library
    scale, counting XLA compiles. Prints one JSON line.

    This is the other half of the BASELINE.md metric pair (wall-clock
    per raw file) and the only probe that can see loop-driven recompiles
    and host ping-pong that the kernel bench structurally cannot; it is
    the analog of the reference's whole-run perf fixture
    (tests/e2e_tests/e2e_test_cases.yaml `basic`)."""
    import logging
    import tempfile
    from pathlib import Path

    import jax
    import pandas as pd

    # default scale measured to fit the capture window through the
    # remote-compile tunnel (first file pays one-time program loads);
    # env-tunable for larger studies
    n_peptides = int(os.environ.get("ADT_PIPE_PEPTIDES", 6000))
    n_cycles = int(os.environ.get("ADT_PIPE_CYCLES", 1000))
    n_files = int(os.environ.get("ADT_PIPE_FILES", 3))

    # count XLA compiles (the iterative optimization loop is where
    # data-dependent shapes would recompile; window bucketing + the pow2
    # batch schedule are supposed to bound this)
    compiles = {"n": 0}

    class _CompileCounter(logging.Handler):
        def emit(self, record):
            # count backend executable builds only ("Finished XLA
            # compilation of <name> in <t> sec"), not tracing records
            if "Finished XLA compilation" in record.getMessage():
                compiles["n"] += 1

    jax.config.update("jax_log_compiles", True)
    debug = bool(os.environ.get("ADT_PIPE_DEBUG"))
    for name in ("jax._src.dispatch", "jax._src.interpreters.pxla", "jax"):
        lg = logging.getLogger(name)
        lg.addHandler(handler := _CompileCounter())
        lg.propagate = debug  # keep the console log readable by default

    from alphadia_tpu.cli import run as cli_run
    from alphadia_tpu.library.speclib import SpecLibFlat
    from alphadia_tpu.rawdata.source import save_npz
    from alphadia_tpu.testing.synthetic import (
        SyntheticConfig,
        add_synthetic_decoys,
        make_synthetic_dia,
    )
    from alphadia_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        raw_paths = []
        prec = frag = None
        # same peptide world, distinct acquisitions (noise/RT-shift/
        # intensity). File 1 pays one-time compiles, file 2 the residual
        # pow2-tail shapes; file 3+ is the steady-state per-file cost
        acqs = [(301, 1.0, 0.0), (302, 1.4, 5.0), (303, 0.8, -4.0)][:n_files]
        for i, (acq, factor, shift) in enumerate(acqs):
            spectra, p, f = make_synthetic_dia(
                SyntheticConfig(
                    n_peptides=n_peptides,
                    n_windows=24,
                    n_cycles=n_cycles,
                    noise_peaks_per_spectrum=60,
                    seed=17,
                    acq_seed=acq,
                    run_intensity_factor=factor,
                    run_rt_shift=shift,
                )
            )
            if prec is None:
                prec, frag = p, f
            path = tmp / f"run_{i}.npz"
            save_npz(path, spectra)
            raw_paths.append(str(path))
        prec, frag = add_synthetic_decoys(prec, frag)
        lib_path = tmp / "library.hdf"
        drop = [c for c in ("_truth_detectable", "_truth_rt") if c in prec.columns]
        SpecLibFlat(prec.drop(columns=drop), frag).save_hdf(lib_path)

        out_dir = tmp / "out"
        overrides = {"general": {"random_state": 1, "save_figures": False}}
        t0 = time.time()
        cli_run(
            [
                "-o", str(out_dir),
                *[x for rp in raw_paths for x in ("-f", rp)],
                "-l", str(lib_path),
                "--config-dict", json.dumps(overrides),
            ]
        )
        wall = time.time() - t0

        stat = pd.read_csv(out_dir / "stat.tsv", sep="\t")
        internal = pd.read_csv(out_dir / "internal.tsv", sep="\t")
        phase_cols = [c for c in internal.columns if c.startswith("duration_")]
        per_file = [
            {c.removeprefix("duration_"): round(float(row[c]), 2) for c in phase_cols}
            for _, row in internal.iterrows()
        ]
        walls = [sum(p.values()) for p in per_file]
        print(json.dumps({
            "n_files": len(raw_paths),
            "n_precursors_library": int(len(prec)),
            "n_cycles": n_cycles,
            "wall_s_total": round(wall, 1),
            # file 0 pays any residual compiles; file 1 is the
            # steady-state per-file cost of a multi-file study
            "wall_s_per_file": [round(w, 1) for w in walls],
            "phases_s_per_file": per_file,
            "ids_at_1pct_fdr": [int(x) for x in stat["precursors"]],
            "xla_compiles": compiles["n"],
            "backend": jax.default_backend(),
        }))


def _run_child(flag: str, timeout_s: float) -> dict:
    """Run one bench leg in a subprocess with a hard timeout so a tunnel
    stall cannot eat the round's capture window."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True, text=True, timeout=timeout_s,
            env=dict(os.environ),
        )
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {
            "error": f"no JSON from child (rc={proc.returncode}): "
            + proc.stderr.strip()[-300:]
        }
    except subprocess.TimeoutExpired:
        return {"error": f"{flag} child exceeded {timeout_s}s"}
    except Exception as exc:
        return {"error": f"{type(exc).__name__}: {exc}"}


def _measure_pipeline(timeout_s: float = 1200.0) -> dict:
    """Whole-pipeline benchmark in a bounded subprocess."""
    return _run_child("--pipeline-child", timeout_s)


def main() -> None:
    if "--pipeline-child" in sys.argv:
        _pipeline_child()
        return

    if "--large-child" in sys.argv:
        print(json.dumps(_measure_large()))
        return

    if "--cpu-baseline" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # SAME workload as the TPU measurement (6000 peptides, 600 cycles);
        # the CPU keeps its own best batch size (1024 — smaller batches are
        # cache-friendlier on 4 cores; measured best in the round-2 sweep)
        rate, _, _, _ = measure(
            n_peptides=6000, n_cycles=600, batch_size=1024,
            n_warmup=1, with_device_time=False,
        )
        print(json.dumps({"cpu_rate": rate}))
        return

    if not _backend_available():
        _emit_failure("backend unavailable", _cpu_baseline_rate())
        return

    try:
        rate, phases, device, spread = measure()
    except Exception as exc:
        _emit_failure(f"{type(exc).__name__}: {exc}", _cpu_baseline_rate())
        return

    baseline_rate = _cpu_baseline_rate()

    large = None
    if "--skip-large" not in sys.argv:
        large = _run_child("--large-child", timeout_s=1200.0)

    pipeline = None
    if "--skip-pipeline" not in sys.argv:
        pipeline = _measure_pipeline()

    vs_baseline = rate / baseline_rate if baseline_rate else 0.0
    # ~2.2 candidates scored per library precursor in this workload
    n_cands = int(12000 * 2.2)
    out = {
        "metric": "precursors_scored_per_s",
        "value": round(rate, 1),
        "unit": "prec/s",
        # per-pass dispersion of the headline (median-of-n is `value`)
        "spread": spread,
        "vs_baseline": round(vs_baseline, 2),
        "baseline_note": "same workload (6000 peptides/600 cycles), CPU at its own best batch",
        "phases_s": phases,
        # pure device compute (inputs pre-staged, outputs on device, no
        # downloads): the tunnel-free kernel time per phase
        "device_s": device,
        "roofline_scoring": _roofline(n_cands, phases.get("scoring", 0.0)),
        "roofline_scoring_device": _roofline(n_cands, device.get("scoring", 0.0))
        if device
        else None,
    }
    if large is not None:
        out["large"] = large
    if pipeline is not None:
        out["pipeline"] = pipeline
    print(json.dumps(out))


if __name__ == "__main__":
    main()
