"""Cross-phase pipelined extraction: selection batches feed scoring the
moment they decode.

The reference engine's wall-clock IS its compute — the numba/rust loops
(reference: alphadia/search/selection/selection.py:547-737 +
search/scoring/scoring.py:114-137) run in host memory with zero
transport. On a (remote) TPU the same two stages serialize four extra
segments: selection download, selection decode, scoring upload, scoring
download. This driver overlaps them:

- all selection batches dispatch first (device queue is FIFO, so the
  chip is busy with selection while the host does everything else);
- the scoring library SoA (per-precursor fragment/isotope/slot arrays)
  uploads WHILE selection computes — it does not depend on candidates;
- each selection batch decodes as soon as its download lands, its
  candidates buffer into scoring-batch-sized geometry chunks, and each
  full chunk dispatches immediately — scoring batch k runs on device
  while selection batch k+2's download and batch k+1's decode are still
  in flight;
- scoring downloads prefetch and decode in arrival order at the end.

Wall-clock asymptotes to max(total device time, total download bytes /
tunnel bandwidth) + pipeline fill, instead of the sum of all segments.

Numerically identical to running CandidateSelection then
CandidateScoring: batches are independent, and the scoring window bucket
W only pads (feature values are W-invariant — masks bound every feature
to the candidate's own extent; verified in
tests/unit/test_pipelined.py).
"""

from __future__ import annotations

import time
from dataclasses import replace

import numpy as np
import pandas as pd

from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.reporting import logger
from alphadia_tpu.search.scoring import (
    GEO_KEYS,
    CandidateScoring,
    ScoringConfig,
    _empty_fragment_df,
    _empty_psm_df,
)
from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig
from alphadia_tpu.utils.device import batch_schedule, bucket_window


def _geo_concat(parts: list[dict]) -> dict:
    return {
        k: np.concatenate([p[k] for p in parts], axis=0) for k in GEO_KEYS
    }


def _chunk_window(geo: dict, a: int, b: int) -> int:
    """Scoring cycle-window bucket for candidates [a:b) — same rule as
    CandidateScoring._candidate_geometry (feature values are W-invariant,
    so per-chunk buckets are safe)."""
    half = np.maximum(
        geo["frame_center"][a:b] - geo["frame_start"][a:b],
        geo["frame_stop"][a:b] - geo["frame_center"][a:b],
    )
    return bucket_window(max(2 * int(half.max()) + 1, 16) if b > a else 16)


class PipelinedExtraction:
    """Run selection + scoring as one overlapped pipeline.

    Returns ``(candidates_df, psm_df, fragment_df)`` — byte-identical to
    the two-stage sequence. Single-device (non-mesh) paths only; with a
    mesh configured it falls back to the sequential drivers.
    """

    def __init__(
        self,
        dia_data: DiaData,
        precursor_df: pd.DataFrame,
        fragment_df: pd.DataFrame,
        sel_config: SelectionConfig | None = None,
        score_config: ScoringConfig | None = None,
        rt_column: str = "rt_library",
        precursor_mz_column: str = "mz_library",
        fragment_mz_column: str = "mz_library",
        sel_batch_cap: int = 4096,
    ):
        sel_config = sel_config or SelectionConfig()
        # smaller selection batches = earlier first candidates = earlier
        # first scoring dispatch (pipeline fill time)
        if sel_config.batch_size > sel_batch_cap:
            sel_config = replace(sel_config, batch_size=sel_batch_cap)
        cols = dict(
            rt_column=rt_column,
            precursor_mz_column=precursor_mz_column,
            fragment_mz_column=fragment_mz_column,
        )
        self.selection = CandidateSelection(
            dia_data, precursor_df, fragment_df, sel_config, **cols
        )
        self.scoring = CandidateScoring(
            dia_data, precursor_df, fragment_df, score_config, **cols
        )

    def __call__(self) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
        sel = self.selection
        score = self.scoring

        if sel._mesh() is not None or score._mesh() is not None:
            cands = sel()
            psm, frag = score(cands)
            return cands, psm, frag

        t_start = time.perf_counter()
        state = sel._submit()
        if isinstance(state, pd.DataFrame):  # empty library
            return state, _empty_psm_df(), _empty_fragment_df()

        # the scoring library SoA upload rides the tunnel while the chip
        # runs selection batches
        lib, lib_dev = score._upload_lib()
        dev = score.dia.device_arrays()
        cap = score._batch_cap()

        cand_frames: list[pd.DataFrame] = []
        all_parts: list[dict] = []  # every frame's geometry, in order
        buf_parts: list[dict] = []  # geometry not yet dispatched
        buffered = 0
        flushed = 0  # candidates already dispatched (global offset)
        pending: list[tuple] = []

        def _dispatch(geo_buf: dict, a: int, b: int, bsz: int):
            W = _chunk_window(geo_buf, a, b)
            chunk = score._geo_chunk(geo_buf, a, b, bsz)
            return score._dispatch_chunk(dev, lib_dev, chunk, bsz, W)

        for _, frame in sel._harvest_iter(state):
            if not len(frame):
                continue
            cand_frames.append(frame)
            part = {
                k: v
                for k, v in score._candidate_geometry(frame).items()
                if k in GEO_KEYS
            }
            all_parts.append(part)
            buf_parts.append(part)
            buffered += len(frame)
            if buffered < cap:
                continue
            # cut and dispatch every full scoring batch immediately
            geo_buf = _geo_concat(buf_parts)
            off = 0
            while buffered - off >= cap:
                pending.append(
                    (cap, flushed + off, _dispatch(geo_buf, off, off + cap, cap))
                )
                off += cap
            buf_parts = (
                [{k: v[off:] for k, v in geo_buf.items()}] if buffered > off else []
            )
            buffered -= off
            flushed += off

        # tail: pow2 schedule bounds padded rows
        if buffered:
            geo_buf = _geo_concat(buf_parts)
            for b0, bsz in batch_schedule(buffered, cap):
                b1 = min(b0 + bsz, buffered)
                pending.append(
                    (b1 - b0, flushed + b0, _dispatch(geo_buf, b0, b1, bsz))
                )

        if not cand_frames:
            return (
                _empty_candidates(sel),
                _empty_psm_df(),
                _empty_fragment_df(),
            )

        cand = pd.concat(cand_frames, ignore_index=True)
        geo_all = _geo_concat(all_parts)
        trace = {
            "prep": 0.0, "wire": 0.0, "submit": 0.0,
            "transfer_wait": 0.0, "decode": 0.0, "df_build": 0.0,
        }
        psm_df, fragment_df = score._harvest(pending, cand, lib, geo_all, trace)
        trace["wall"] = time.perf_counter() - t_start
        score.last_trace = trace
        self.last_trace = {"selection": state["trace"], "scoring": trace}
        logger.info(
            f"Pipelined extraction: {len(cand)} candidates -> "
            f"{len(psm_df)} PSMs in {trace['wall']:.2f}s"
        )
        return cand, psm_df, fragment_df


def _empty_candidates(sel: CandidateSelection) -> pd.DataFrame:
    from alphadia_tpu.search.selection import _empty_candidates_df

    return _empty_candidates_df()
