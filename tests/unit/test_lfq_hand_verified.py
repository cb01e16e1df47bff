"""Hand-verified fixtures for the directLFQ-style intensity estimation.

The directlfq package cannot be installed in this environment (no
network), so instead of diffing against its output these tests pin the
solver to worked examples computed BY HAND from the published algorithm
(Ammar et al. 2023, MCP, "Accurate label-free quantification by
directLFQ": align ion traces by removing per-ion offsets, take the
median trace as the sample profile, anchor the absolute level to the
median ion level). Every expected number below is derived in comments,
independent of the code under test.

(reference analog: the actual directlfq call in
alphadia/outputtransform/quantification/quant_builder.py:184-246.)
"""

import numpy as np
import pandas as pd

from alphadia_tpu.outputs.quant import (
    direct_lfq,
    estimate_group_intensity,
    normalize_samples,
)


def test_trace_alignment_worked_example():
    # log2 matrix, 3 ions x 3 runs:
    #   ion1 [10, 11, 12]  -> row median 11   -> centered [-1,  0,   1]
    #   ion2 [12, 13, nan] -> row median 12.5 -> centered [-0.5, 0.5, nan]
    #   ion3 [ 9, nan, 11] -> row median 10   -> centered [-1,  nan, 1]
    # profile = column medians of centered = [-1, 0.25, 1]
    # level   = median(row medians) = median(11, 12.5, 10) = 11
    # estimate = profile + level = [10, 11.25, 12]
    m = np.array(
        [
            [10.0, 11.0, 12.0],
            [12.0, 13.0, np.nan],
            [9.0, np.nan, 11.0],
        ]
    )
    np.testing.assert_allclose(
        estimate_group_intensity(m), [10.0, 11.25, 12.0]
    )


def test_trace_alignment_is_offset_invariant():
    # adding a constant offset to any single ion must not change the
    # result (the ion trace is aligned away) — the core directLFQ claim
    m = np.array(
        [
            [10.0, 11.0, 12.0],
            [12.0, 13.0, np.nan],
            [9.0, np.nan, 11.0],
        ]
    )
    shifted = m.copy()
    shifted[1] += 7.3
    np.testing.assert_allclose(
        estimate_group_intensity(shifted), estimate_group_intensity(m)
    )


def test_single_ion_group_passthrough():
    # one ion: centered = 0 everywhere observed; profile = 0; level = row
    # median -> estimate == the row median at every observed run? No:
    # profile(0, 0, nan) + level = [med, med, nan] only when centered is 0;
    # for [4, 6, nan]: row median 5, centered [-1, 1, nan],
    # profile [-1, 1, nan], level 5 -> [4, 6, nan] (exact passthrough)
    m = np.array([[4.0, 6.0, np.nan]])
    np.testing.assert_allclose(
        estimate_group_intensity(m), [4.0, 6.0, np.nan]
    )


def test_normalize_samples_worked_example():
    # each run is shifted by the median difference to the anchor run 0:
    #   col1: ref - col1 per row = [10-12, 13-14, 20-22.5] = [-2, -1, -2.5]
    #     -> shift = median = -2 -> normalized col1 = col1 - 2 = [10, 12, 20.5]
    #   col2: observed rows 0,2: ref - col2 = [10-11, 20-21] = [-1, -1]
    #     -> shift = -1 -> normalized col2 = col2 - 1 = [10, nan, 20]
    m = np.array(
        [
            [10.0, 12.0, 11.0],
            [13.0, 14.0, np.nan],
            [20.0, 22.5, 21.0],
        ]
    )
    out = normalize_samples(m)
    np.testing.assert_allclose(out[:, 0], m[:, 0])
    np.testing.assert_allclose(out[:, 1], [10.0, 12.0, 20.5])
    np.testing.assert_allclose(out[0, 2], 10.0)
    np.testing.assert_allclose(out[2, 2], 20.0)


def test_direct_lfq_end_to_end_hand_example():
    # two groups; run B is globally 1.0 log2 unit below run A (planted
    # shift). After normalization the estimates must recover the true
    # per-group levels in BOTH runs.
    # group g1 ions (true log2 level 10 flat), g2 (level 14 flat):
    ions = pd.DataFrame(
        {
            "A": [2.0**10, 2.0**10.5, 2.0**14, 2.0**14.5],
            "B": [2.0**9, 2.0**9.5, 2.0**13, 2.0**13.5],
        }
    )
    groups = pd.Series(["g1", "g1", "g2", "g2"])
    out = direct_lfq(ions, groups, ["A", "B"], normalize=True)
    out = out.set_index("group")
    # after shift removal, g1 profile flat at median ion level
    # median(10, 10.5) = 10.25; g2 at median(14, 14.5) = 14.25
    np.testing.assert_allclose(
        np.log2(out.loc["g1", ["A", "B"]].to_numpy(np.float64)),
        [10.25, 10.25],
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.log2(out.loc["g2", ["A", "B"]].to_numpy(np.float64)),
        [14.25, 14.25],
        atol=1e-9,
    )
