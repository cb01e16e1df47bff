"""Multiplexing requantification: expand confident PSMs to all channels.

Behavioral contract (reference:
alphadia/workflow/peptidecentric/multiplexing_requantification_handler.py:44-140
+ alphadia/search/scoring/utils.py:114 ``multiplex_candidates``):

- calibration is predicted onto the *unfiltered* library (all channels);
- every confident PSM (qval <= fdr) seeds candidates for ALL channel
  siblings of its elution group, copying the reference candidate's
  scan/frame coordinates;
- candidates are rescored; channel-level FDR assigns q-values against the
  configured decoy channel.

Round-1 scope: reference-channel comparison features (the reference's
``reference_features``) are not yet computed; channel FDR uses the decoy
channel as the decoy class.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.fdr.qvalues import get_q_values, keep_best
from alphadia_tpu.reporting import logger


def multiplex_candidates(
    confident_psm: pd.DataFrame,
    unfiltered_precursor_df: pd.DataFrame,
    reference_channel: int = 0,
) -> pd.DataFrame:
    """Expand confident PSMs into candidates for all channels.

    Returns a candidates_df (precursor_idx, rank, scan/frame coords) covering
    every channel sibling of each confident elution group.
    """
    ref = confident_psm
    if reference_channel >= 0 and "channel" in ref.columns:
        ref = ref[ref["channel"] == reference_channel]
    if len(ref) == 0:
        logger.warning("multiplexing: no confident reference-channel PSMs")
        return pd.DataFrame()

    # best candidate per elution group donates the coordinates
    # (reference multiplex_candidates sorts by (proba, precursor_idx)
    # ascending and takes the first; fall back to score descending when
    # no classifier probability is present)
    if "proba" in ref.columns:
        sort_cols = ["proba"] + (
            ["precursor_idx"] if "precursor_idx" in ref.columns else []
        )
        ref = ref.sort_values(sort_cols, ascending=True)
    else:
        ref = ref.sort_values("score", ascending=False)
    coords = ref[
        [
            "elution_group_idx",
            "rank",
            "score",
            "scan_start",
            "scan_center",
            "scan_stop",
            "frame_start",
            "frame_center",
            "frame_stop",
        ]
    ].drop_duplicates("elution_group_idx")

    siblings = unfiltered_precursor_df[
        unfiltered_precursor_df["elution_group_idx"].isin(
            coords["elution_group_idx"]
        )
    ][["precursor_idx", "elution_group_idx", "channel"]]

    out = siblings.merge(coords, on="elution_group_idx", how="left")
    out["rank"] = out["rank"].fillna(0).astype(np.uint8)
    logger.info(
        f"multiplexing: expanded {len(coords)} elution groups to "
        f"{len(out)} channel candidates"
    )
    return out


def channel_fdr(
    psm_df: pd.DataFrame,
    decoy_channel: int,
    target_channels: list[int],
    channel_wise: bool = False,
) -> pd.DataFrame:
    """q-values using the decoy channel as the null.

    ``channel_wise`` (fdr.channel_wise_fdr) estimates q-values separately
    per target channel (each channel competes against the decoy channel
    on its own score distribution); otherwise one global estimate.
    """
    psm_df = psm_df.copy()
    psm_df["_decoy"] = (psm_df["channel"] == decoy_channel).astype(np.float32)
    if channel_wise:
        outs = []
        for c in target_channels:
            sub = psm_df[psm_df["channel"].isin([c, decoy_channel])].copy()
            if not len(sub):
                continue
            sub = get_q_values(sub, "proba", "_decoy")
            sub = keep_best(
                sub, group_columns=["channel", "elution_group_idx"]
            )
            sub = get_q_values(sub, "proba", "_decoy")
            outs.append(sub[sub["channel"] == c])
        dec = psm_df[psm_df["channel"] == decoy_channel].copy()
        if len(dec):
            dec = keep_best(
                dec, group_columns=["channel", "elution_group_idx"]
            )
            dec["qval"] = 1.0  # decoy rows are the null, not discoveries
            outs.append(dec)
        return pd.concat(outs, ignore_index=True) if outs else psm_df.iloc[:0]
    psm_df = get_q_values(psm_df, "proba", "_decoy")
    psm_df = keep_best(psm_df, group_columns=["channel", "elution_group_idx"])
    psm_df = get_q_values(psm_df, "proba", "_decoy")
    keep = psm_df["channel"].isin([*target_channels, decoy_channel])
    return psm_df[keep].reset_index(drop=True)


class MultiplexingHandler:
    def __init__(self, config, fdr_manager, extraction_handler, calibration_manager):
        self._config = config
        self._fdr_manager = fdr_manager
        self._handler = extraction_handler
        self._cm = calibration_manager

    def requantify(self, dia_data, spectral_library, psm_df: pd.DataFrame):
        from alphadia_tpu.workflow.managers.calibration_manager import (
            CalibrationGroups,
        )
        from alphadia_tpu.workflow.optimizers.optimization_lock import (
            subset_flat_library,
        )

        mp = self._config["multiplexing"]
        reference_channel = mp["reference_channel"]
        decoy_channel = mp["decoy_channel"]
        target_channels = [int(c) for c in str(mp["target_channels"]).split(",")]

        unfiltered = getattr(
            spectral_library, "precursor_df_unfiltered", spectral_library.precursor_df
        ).copy()
        self._cm.predict(unfiltered, CalibrationGroups.PRECURSOR)

        confident = psm_df[psm_df["qval"] <= self._config["fdr"]["fdr"]]
        candidates = multiplex_candidates(confident, unfiltered, reference_channel)
        if len(candidates) == 0:
            return pd.DataFrame(), pd.DataFrame()

        # rescore all channel candidates against the full (unfiltered)
        # library; unfiltered flat_frag_* indices address the ORIGINAL
        # fragment table, so subset from that, not the compacted one
        frag_unfiltered = getattr(
            spectral_library, "fragment_df_unfiltered", spectral_library.fragment_df
        )
        lib = subset_flat_library(
            unfiltered,
            frag_unfiltered,
            unfiltered["precursor_idx"]
            .isin(candidates["precursor_idx"])
            .to_numpy(),
        )
        features_df, fragments_df = self._handler.score_and_quantify_candidates(
            candidates[
                [
                    "precursor_idx", "rank", "score",
                    "scan_start", "scan_center", "scan_stop",
                    "frame_start", "frame_center", "frame_stop",
                ]
            ],
            dia_data,
            lib,
        )
        scored = self._fdr_manager.predict(features_df)
        out = channel_fdr(
            scored,
            decoy_channel,
            target_channels,
            channel_wise=self._config["fdr"]["channel_wise_fdr"],
        )
        logger.log(
            25,
            f"multiplexing requant: {len(out)} channel PSMs "
            f"({(out['qval'] <= self._config['fdr']['fdr']).sum()} at FDR)",
        )
        return out, fragments_df
