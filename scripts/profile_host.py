"""cProfile the host side of selection+scoring on the bench workload.

Usage: python scripts/profile_host.py [n_peptides] [batch]
Prints the top cumulative-time functions of one steady-state iteration.
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import _build_workload  # noqa: E402


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
        p["rt_library"] = p["rt_library"] + rng.uniform(-2, 2, len(p)).astype(
            np.float32
        )
        return p

    def run_once():
        p = jittered()
        sel = CandidateSelection(
            dia, p, frag,
            SelectionConfig(rt_tolerance=60.0, candidate_count=3, batch_size=batch),
        )
        cands = sel()
        score = CandidateScoring(
            dia, p, frag, ScoringConfig(batch_size=batch, collect_fragments=True)
        )
        psm, frag_out = score(cands)
        return len(psm)

    for _ in range(2):  # compile warmup
        run_once()

    pr = cProfile.Profile()
    pr.enable()
    run_once()
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())


if __name__ == "__main__":
    main()
