import numpy as np
import pandas as pd

from alphadia_tpu.workflow.peptidecentric.multiplexing_handler import (
    channel_fdr,
    multiplex_candidates,
)


def _confident_psm():
    return pd.DataFrame(
        {
            "elution_group_idx": [0, 1],
            "channel": [0, 0],
            "rank": [0, 0],
            "score": [5.0, 4.0],
            "qval": [0.001, 0.005],
            "scan_start": [0, 0],
            "scan_center": [0, 0],
            "scan_stop": [1, 1],
            "frame_start": [10, 50],
            "frame_center": [14, 54],
            "frame_stop": [18, 58],
        }
    )


def _unfiltered_lib():
    rows = []
    pid = 0
    for eg in range(3):
        for channel in (0, 4, 8, 12):
            rows.append(
                {"precursor_idx": pid, "elution_group_idx": eg, "channel": channel}
            )
            pid += 1
    return pd.DataFrame(rows)


def test_multiplex_candidates_expands_channels():
    cands = multiplex_candidates(_confident_psm(), _unfiltered_lib(), 0)
    # 2 confident elution groups x 4 channels
    assert len(cands) == 8
    assert set(cands["channel"]) == {0, 4, 8, 12}
    # coordinates copied from the reference-channel PSM
    eg0 = cands[cands["elution_group_idx"] == 0]
    assert (eg0["frame_center"] == 14).all()


def test_multiplex_requires_reference_channel():
    psm = _confident_psm()
    psm["channel"] = 4  # no PSM in reference channel 0
    out = multiplex_candidates(psm, _unfiltered_lib(), 0)
    assert len(out) == 0


def test_channel_fdr():
    rng = np.random.default_rng(0)
    n = 400
    rows = []
    for i in range(n):
        for channel in (4, 8, 12):
            proba = rng.uniform(0, 0.4) if channel != 12 else rng.uniform(0.3, 1.0)
            rows.append(
                {
                    "elution_group_idx": i,
                    "channel": channel,
                    "precursor_idx": i * 10 + channel,
                    "proba": proba,
                }
            )
    psm = pd.DataFrame(rows)
    out = channel_fdr(psm, decoy_channel=12, target_channels=[4, 8])
    assert {"qval"} <= set(out.columns)
    good = out[(out["qval"] <= 0.05) & (out["channel"] != 12)]
    assert len(good) > n  # both target channels mostly pass


def test_channel_fdr_channel_wise():
    """fdr.channel_wise_fdr: q-values estimated per target channel; a
    channel with degraded scores gets worse q-values than the clean one
    instead of borrowing its statistics."""
    rng = np.random.default_rng(1)
    rows = []
    for i in range(400):
        for channel in (4, 8, 12):
            if channel == 12:
                proba = rng.uniform(0.3, 1.0)  # decoy channel
            elif channel == 4:
                proba = rng.uniform(0.0, 0.3)  # clean channel
            else:
                proba = rng.uniform(0.2, 0.9)  # degraded channel
            rows.append(
                {
                    "elution_group_idx": i,
                    "channel": channel,
                    "precursor_idx": i * 10 + channel,
                    "proba": proba,
                }
            )
    psm = pd.DataFrame(rows)
    out = channel_fdr(
        psm, decoy_channel=12, target_channels=[4, 8], channel_wise=True
    )
    q4 = out.loc[out["channel"] == 4, "qval"]
    q8 = out.loc[out["channel"] == 8, "qval"]
    assert (q4 <= 0.05).mean() > 0.8
    assert q8.median() > q4.median()
    # decoy rows are the null, never discoveries
    assert (out.loc[out["channel"] == 12, "qval"] == 1.0).all()


def test_init_spectral_library_carries_unfiltered_fragment_frame():
    """Requant re-subsets from (precursor_df_unfiltered,
    fragment_df_unfiltered): the unfiltered indices address the ORIGINAL
    fragment table, so each precursor must get back ITS fragments even
    after init filtering compacted the active frames."""
    import numpy as np
    import pandas as pd

    from alphadia_tpu.library.speclib import SpecLibFlat
    from alphadia_tpu.workflow.optimizers.optimization_lock import (
        subset_flat_library,
    )
    from alphadia_tpu.workflow.peptidecentric.library_init import (
        init_spectral_library,
    )

    # precursor 0 sits outside the quad range and is filtered at init
    prec = pd.DataFrame(
        {
            "precursor_idx": [0, 1, 2],
            "elution_group_idx": [0, 1, 2],
            "decoy": [0, 0, 0],
            "channel": [0, 0, 0],
            "mz_library": [150.0, 450.0, 470.0],
            "rt_library": [0.2, 0.5, 0.8],
            "flat_frag_start_idx": [0, 3, 6],
            "flat_frag_stop_idx": [3, 6, 9],
        }
    )
    frag = pd.DataFrame(
        {
            "mz_library": np.arange(9, dtype=np.float32) + 100.0,
            "intensity": np.ones(9, np.float32),
        }
    )
    cycle = np.zeros((1, 2, 1, 2))
    cycle[0, 0] = [-1.0, -1.0]
    cycle[0, 1] = [400.0, 500.0]
    rt_values = np.linspace(0, 100, 50)

    out = init_spectral_library(cycle, rt_values, SpecLibFlat(prec, frag))
    assert len(out.precursor_df) == 2  # precursor 0 dropped
    assert hasattr(out, "fragment_df_unfiltered")

    # requant path: subset precursor 2 from the UNFILTERED pair
    unf = out.precursor_df_unfiltered
    lib2 = subset_flat_library(
        unf, out.fragment_df_unfiltered, (unf["precursor_idx"] == 2).to_numpy()
    )
    np.testing.assert_allclose(
        lib2.fragment_df["mz_library"].to_numpy(), [106.0, 107.0, 108.0]
    )
    # the compacted frame would have returned the WRONG rows (or run past
    # the end) for these original indices
    assert len(out.fragment_df) == 6
