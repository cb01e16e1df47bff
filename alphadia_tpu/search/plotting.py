"""Kernel debug plotting: visualize what the selection/scoring kernels saw.

(reference: alphadia/search/scoring/plotting/{cycle,debug}.py — DIA cycle
scheme, dense fragment profile grids, template overlays; redrawn here from
the batch kernels' dense outputs instead of per-thread numba buffers.)

Usage: pass ``debug_figures=N`` on :class:`CandidateScoring` via
``ScoringConfig`` is not needed — call :func:`debug_candidates` with a
scoring driver and candidate frame, or the standalone plotters with dense
arrays. Figures land in a FigureBackend directory (reporting.py).
"""

from __future__ import annotations

import numpy as np


def _plt():
    """Lazy matplotlib import (optional dependency — same pattern as
    fdr/fdr.py and reporting.py: plotting must not break a headless
    install at import time)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_dia_cycle(dia, ax=None):
    """Isolation-window scheme: m/z extent per cycle slot.

    (reference plotting/cycle.py:105-165 plot_dia_cycle_nomobility)
    """
    if ax is None:
        _, ax = _plt().subplots(figsize=(7, 3))
    cyc = dia.cycle[0, :, 0, :]  # [n_slots, 2]
    for slot, (lo, hi) in enumerate(cyc):
        if lo < 0:
            ax.axhspan(slot - 0.4, slot + 0.4, color="#999", alpha=0.25)
            ax.text(0.01, slot, "MS1", va="center", transform=ax.get_yaxis_transform())
        else:
            ax.barh(slot, hi - lo, left=lo, height=0.8, color="#4878d0", alpha=0.7)
    ax.set_xlabel("isolation m/z")
    ax.set_ylabel("cycle slot")
    ax.set_title(f"DIA cycle: {dia.n_slots} slots x {dia.n_cycles} cycles")
    return ax.figure


def plot_fragment_profiles(
    dense_int: np.ndarray,  # [KF, O2, W]
    template: np.ndarray,  # [O2, W]
    frag_mz: np.ndarray,  # [KF]
    fmask: np.ndarray,  # [KF]
    title: str = "",
):
    """Per-fragment XIC traces with the quadrupole-weighted template.

    (reference plotting/debug.py:32-114 plot_fragment_profile — image grid
    of dense fragments + side profiles; here traces + template overlay.)
    """
    KF, O2, W = dense_int.shape
    fig, axes = _plt().subplots(
        1, O2, figsize=(4 * O2, 3.2), squeeze=False, sharey=True
    )
    x = np.arange(W)
    for o in range(O2):
        ax = axes[0, o]
        for f in range(KF):
            if not fmask[f]:
                continue
            ax.plot(x, dense_int[f, o], lw=1, alpha=0.8, label=f"{frag_mz[f]:.2f}")
        t = template[o]
        if t.max() > 0:
            scale = max(dense_int[:, o].max(), 1e-9) / max(t.max(), 1e-9)
            ax.plot(x, t * scale, "k--", lw=2, label="template")
        ax.set_xlabel("cycle (window)")
        ax.set_title(f"obs {o}")
        if KF <= 8:
            ax.legend(fontsize=6)
    axes[0, 0].set_ylabel("intensity")
    if title:
        fig.suptitle(title, fontsize=9)
    fig.tight_layout()
    return fig


def plot_precursor_profiles(
    dense_int: np.ndarray,  # [KI, W]
    iso_mz: np.ndarray,  # [KI]
    title: str = "",
):
    """Isotope-envelope XIC traces (reference plotting/debug.py:116-153)."""
    KI, W = dense_int.shape
    fig, ax = _plt().subplots(figsize=(4.5, 3.2))
    x = np.arange(W)
    for k in range(KI):
        ax.plot(x, dense_int[k], lw=1.2, label=f"i{k} {iso_mz[k]:.3f}")
    ax.set_xlabel("cycle (window)")
    ax.set_ylabel("intensity")
    ax.legend(fontsize=7)
    if title:
        ax.set_title(title, fontsize=9)
    fig.tight_layout()
    return fig


def plot_selection_score(
    score_profile: np.ndarray,  # [W] smoothed log-score over the RT window
    peaks: np.ndarray,  # indices of chosen candidate apexes
    extents: list[tuple[int, int]] | None = None,
    title: str = "",
):
    """Smoothed selection score with chosen candidate apexes/extents."""
    fig, ax = _plt().subplots(figsize=(5, 2.8))
    x = np.arange(len(score_profile))
    ax.plot(x, score_profile, lw=1.2, color="#4878d0")
    for p in np.atleast_1d(peaks):
        ax.axvline(p, color="#d65f5f", lw=1)
    for a, b in extents or []:
        ax.axvspan(a, b, color="#d65f5f", alpha=0.12)
    ax.set_xlabel("cycle (window)")
    ax.set_ylabel("selection score")
    if title:
        ax.set_title(title, fontsize=9)
    fig.tight_layout()
    return fig


def debug_candidates(scoring, candidates_df, n: int = 3, figure_dir=None):
    """Re-extract the dense tensors for the first ``n`` candidates of a
    :class:`~alphadia_tpu.search.scoring.CandidateScoring` driver and write
    fragment/precursor/template debug figures.

    Returns the list of created figure names.
    """
    import jax.numpy as jnp

    from alphadia_tpu.ops.features import logistic_rectangle
    from alphadia_tpu.ops.xic import extract_xic
    from alphadia_tpu.reporting.reporting import FigureBackend

    backend = FigureBackend(figure_dir) if figure_dir is not None else None
    cand = candidates_df.head(n).reset_index(drop=True)
    arrays = scoring._candidate_arrays(cand)
    dia = scoring.dia
    W = arrays["window_len"]
    dev = dia.device_arrays()
    names = []
    for i in range(len(cand)):
        cstart = np.int32(arrays["frame_center"][i] - W // 2)
        kw = dict(
            n_cycles=dia.n_cycles_dev, n_bins=dia.n_bins, bin_mz_min=dia.bin_mz_min,
            bin_width=dia.coarse_bin_width, slab=scoring.config.gather_slab,
            window_len=W,
        )
        fslot = np.where(
            arrays["frag_valid"][i][:, None], arrays["ms2_slot"][i][None, :], -1
        )
        KF, O2 = fslot.shape
        fmz = np.broadcast_to(arrays["frag_mz"][i][:, None], (KF, O2))
        d_frag = np.asarray(
            extract_xic(
                dev["peak_mz"], dev["peak_intensity"], dev["cell_start"],
                jnp.asarray(fslot.reshape(1, -1)), jnp.asarray(fmz.reshape(1, -1).copy()),
                jnp.float32(scoring.config.fragment_mz_tolerance),
                jnp.asarray([cstart]), **kw,
            )
        ).reshape(KF, O2, W)
        KI = arrays["iso_mz"].shape[1]
        O1 = arrays["ms1_slot"].shape[1]
        islot = np.broadcast_to(arrays["ms1_slot"][i][None, :], (KI, O1))
        imz = np.broadcast_to(arrays["iso_mz"][i][:, None], (KI, O1))
        d_prec = (
            np.asarray(
                extract_xic(
                    dev["peak_mz"], dev["peak_intensity"], dev["cell_start"],
                    jnp.asarray(islot.reshape(1, -1)), jnp.asarray(imz.reshape(1, -1).copy()),
                    jnp.float32(scoring.config.precursor_mz_tolerance),
                    jnp.asarray([cstart]), **kw,
                )
            )
            .reshape(KI, O1, W)
            .sum(axis=1)
        )
        qtf = np.asarray(
            logistic_rectangle(
                arrays["win_lo"][i][None, :], arrays["win_hi"][i][None, :],
                scoring.config.quad_sigma[0], scoring.config.quad_sigma[1],
                arrays["iso_mz"][i][:, None],
            )
        )  # [KI, O2]
        template = (
            arrays["iso_intensity"][i][:, None, None] * qtf[:, :, None] * d_prec[:, None, :]
        ).sum(axis=0)
        pid = int(cand["precursor_idx"].iloc[i])
        f1 = plot_fragment_profiles(
            d_frag, template, arrays["frag_mz"][i], arrays["frag_valid"][i],
            title=f"precursor {pid}",
        )
        f2 = plot_precursor_profiles(
            d_prec, arrays["iso_mz"][i], title=f"precursor {pid} isotopes"
        )
        for tag, fig in (("fragments", f1), ("precursor", f2)):
            name = f"debug_{pid}_{tag}"
            if backend is not None:
                backend.log_figure(name, fig)
            _plt().close(fig)
            names.append(name)
    return names
