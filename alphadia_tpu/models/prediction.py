"""Peptide property prediction for library-free search.

Role of the reference's ``PeptDeepPrediction`` step
(reference: alphadia/libtransform/prediction.py:14-90, which shells into
alphaPeptDeep): predict RT, ion mobility and MS2 fragment intensities for a
digested library.

This build ships self-contained JAX-free baseline predictors that the
transfer-learning step can later replace with fine-tuned JAX models:

- RT: additive hydrophobicity model (Krokhin SSRCalc-style retention
  coefficients, public constants) with length damping, min-max normalized;
- mobility: 0 (no prediction without trained model);
- MS2: smooth heuristic intensity prior over b/y series (y > b, mid-series
  maxima) — enough structure for selection/scoring to rank candidates.

A fine-tuned model directory (``peptdeep_model_path``) produced by the
transfer-learning step overrides these (loaded by models/finetune.py).
"""

from __future__ import annotations

import numpy as np

from alphadia_tpu.library.pipeline import ProcessingStep
from alphadia_tpu.library.speclib import SpecLibBase

# Krokhin et al. 2004-style retention coefficients (arbitrary units)
RT_COEFF = {
    "W": 11.0, "F": 10.5, "L": 9.6, "I": 8.4, "M": 5.8, "V": 5.0,
    "Y": 4.0, "A": 0.8, "T": 0.4, "P": 0.2, "E": 0.0, "D": -0.5,
    "C": -0.8, "S": -0.8, "Q": -0.9, "G": -0.9, "N": -1.2, "R": -1.3,
    "H": -1.3, "K": -1.9, "U": -0.8,
}


def predict_rt_norm(sequences) -> np.ndarray:
    """Additive hydrophobicity score, min-max normalized to [0, 1]."""
    lut = np.zeros(128, dtype=np.float64)
    for aa, c in RT_COEFF.items():
        lut[ord(aa)] = c
    scores = np.empty(len(sequences), dtype=np.float64)
    for i, s in enumerate(sequences):
        arr = np.frombuffer(s.encode(), dtype=np.uint8)
        h = lut[arr].sum()
        # N-terminal residues contribute less (SSRCalc heuristic)
        h -= 0.5 * lut[arr[:3]].sum() * 0.3
        # length damping for long peptides
        if len(s) > 20:
            h *= 1.0 - 0.01 * (len(s) - 20)
        scores[i] = h
    lo, hi = np.percentile(scores, [1, 99])
    return np.clip((scores - lo) / max(hi - lo, 1e-9), 0.0, 1.0).astype(np.float32)


def predict_ms2_prior(naa: int, n_cols: int, col_names: list[str]) -> np.ndarray:
    """Heuristic intensity prior for one precursor's fragment matrix."""
    n_sites = naa - 1
    out = np.zeros((n_sites, n_cols), dtype=np.float32)
    pos = np.arange(n_sites, dtype=np.float32)
    # mid-series hump
    hump = np.exp(-0.5 * ((pos - n_sites / 2) / max(n_sites / 3, 1)) ** 2)
    for j, c in enumerate(col_names):
        t = c.split("_z")[0]
        z = int(c.split("_z")[1])
        series_w = 1.0 if t == "y" else 0.6 if t == "b" else 0.3
        charge_w = 1.0 if z == 1 else 0.35
        # y ions numbered from C-term: weight by fragment length
        frac = (pos + 1) / naa if t in "abc" else 1.0 - (pos + 1) / naa
        out[:, j] = series_w * charge_w * (0.25 + 0.75 * hump) * (0.3 + 0.7 * frac)
    m = out.max()
    return out / m if m > 0 else out


class SimplePrediction(ProcessingStep):
    """Fill rt/mobility predictions + fragment intensity matrices.

    When ``model_path`` points to a fine-tuned model directory (produced by
    the transfer-learning step, models/finetune.py), the trained JAX models
    replace the heuristic baselines — the multistep transfer workflow.
    """

    def __init__(
        self,
        fragment_types=("b", "y"),
        max_fragment_charge: int = 2,
        model_path: str | None = None,
        predict_charge: bool = False,
        min_charge_probability: float = 0.1,
        nce: float = 25.0,
        instrument: str = "Lumos",
        model_type: str = "generic",
    ):
        self.fragment_types = tuple(fragment_types)
        self.max_fragment_charge = max_fragment_charge
        self.model_path = model_path
        self.predict_charge = predict_charge
        self.min_charge_probability = min_charge_probability
        self.nce = nce
        self.instrument = instrument
        if model_type not in ("generic",):
            from alphadia_tpu.reporting import logger

            logger.warning(
                f"peptdeep_model_type '{model_type}' is not packaged; "
                "using 'generic'"
            )
        self.model_type = "generic"

    def validate(self, input_) -> bool:
        return isinstance(input_, SpecLibBase)

    def _load_manager(self):
        from pathlib import Path

        path = self.model_path
        if not path:
            # packaged pretrained default (scripts/train_property_models.py),
            # the role of the reference's shipped peptdeep weights
            path = (
                Path(__file__).parents[1]
                / "constants"
                / "weights"
                / "peptdeep_default"
            )
        if not (Path(path) / "models.pkl").exists():
            return None
        from alphadia_tpu.models.finetune import FinetuneManager
        from alphadia_tpu.reporting import logger

        which = "fine-tuned" if self.model_path else "packaged pretrained"
        logger.log(25, f"Using {which} prediction models from {path}")
        return FinetuneManager.load(path)

    def forward(self, lib: SpecLibBase) -> SpecLibBase:
        df = lib.precursor_df
        manager = self._load_manager()

        # charge-state filtering (reference: peptdeep charge prediction,
        # library_prediction.predict_charge): drop enumerated charges the
        # model deems improbable, but never drop a peptide entirely — its
        # most probable enumerated charge always survives (deviation noted
        # in docs/parity.md; prevents losing peptides outright).
        if self.predict_charge and lib.fragment_mz_df is not None:
            from alphadia_tpu.reporting import logger

            logger.warning(
                "library_prediction.predict_charge ignored: the library "
                "already carries fragment matrices, and dropping charge "
                "states would desynchronize the fragment rows"
            )
        if (
            self.predict_charge
            and lib.fragment_mz_df is None
            and manager is not None
            and "charge" in manager.variables
        ):
            from alphadia_tpu.reporting import logger

            probs = manager.predict_charge(
                df["sequence"].tolist(),
                df.get("mods", [""] * len(df)).tolist(),
                df.get("mod_sites", [""] * len(df)).tolist(),
            )
            z = df["charge"].to_numpy(np.int32)
            p_own = probs[
                np.arange(len(df)), np.clip(z - 1, 0, probs.shape[1] - 1)
            ]
            import pandas as pd

            mods = (
                df["mods"].to_numpy(str)
                if "mods" in df.columns
                else np.full(len(df), "", dtype=object)
            )
            keys = np.char.add(
                np.char.add(df["sequence"].to_numpy(str), "|"),
                mods.astype(str),
            )
            best = pd.Series(p_own).groupby(keys).transform("max").to_numpy()
            keep = (p_own >= self.min_charge_probability) | (p_own >= best)
            if (~keep).any():
                logger.info(
                    f"charge prediction: dropped {int((~keep).sum())}/"
                    f"{len(df)} improbable charge states "
                    f"(p < {self.min_charge_probability})"
                )
            df = df[keep].reset_index(drop=True)
            lib.precursor_df = df

        if manager is not None and "rt" in manager.variables:
            df["rt_norm"] = manager.predict_rt(
                df["sequence"].tolist(),
                df.get("mods", [""] * len(df)).tolist(),
                df.get("mod_sites", [""] * len(df)).tolist(),
            ).astype(np.float32)
        else:
            df["rt_norm"] = predict_rt_norm(df["sequence"].tolist())
        if manager is not None and "ccs" in manager.variables:
            df["mobility"] = manager.predict_mobility(
                df["sequence"].tolist(),
                df.get("mods", [""] * len(df)).tolist(),
                df.get("mod_sites", [""] * len(df)).tolist(),
                df["charge"].to_numpy(np.int32),
            ).astype(np.float32)
        elif "mobility" not in df.columns:
            df["mobility"] = np.float32(0)
        if lib.fragment_mz_df is None:
            lib.calc_fragment_mz(
                max_charge=self.max_fragment_charge, types=self.fragment_types
            )
        cols = lib.charged_frag_types
        inten = np.zeros((len(lib.fragment_mz_df), len(cols)), dtype=np.float32)
        if manager is not None and "ms2" in manager.variables:
            from alphadia_tpu.models.property_models import FRAG_COLS, MAX_LEN

            from alphadia_tpu.reporting import logger

            # the packaged MS2 model conditions on NCE; instrument labels
            # are recorded but the generic model is instrument-agnostic
            logger.info(
                f"MS2 prediction: nce={self.nce} instrument={self.instrument} "
                f"model={self.model_type}"
            )
            pred = manager.predict_ms2(
                df["sequence"].tolist(),
                df.get("mods", [""] * len(df)).tolist(),
                df.get("mod_sites", [""] * len(df)).tolist(),
                df["charge"].to_numpy(np.int32),
                nce=self.nce,
            )  # [n, MAX_LEN-1, len(FRAG_COLS)]
            col_src = [FRAG_COLS.index(c) if c in FRAG_COLS else -1 for c in cols]
            # vectorized scatter of pred[i, :n_sites] into the fragment
            # rows of each precursor (a python loop here is minutes at
            # proteome scale)
            naa_arr = df["nAA"].to_numpy(np.int64)
            a_arr = df["frag_start_idx"].to_numpy(np.int64)
            b_arr = df["frag_stop_idx"].to_numpy(np.int64)
            ns = np.minimum(np.minimum(naa_arr - 1, MAX_LEN - 1), b_arr - a_arr)
            ns = np.maximum(ns, 0)
            prec_of = np.repeat(np.arange(len(df)), ns)
            # per-precursor site offsets 0..ns[i]-1, flattened
            cum = np.zeros(len(df) + 1, np.int64)
            np.cumsum(ns, out=cum[1:])
            off = np.arange(int(cum[-1])) - np.repeat(cum[:-1], ns)
            rowpos = a_arr[prec_of] + off
            for j, src in enumerate(col_src):
                if src >= 0:
                    inten[rowpos, j] = pred[prec_of, off, src]
        else:
            for naa, a, b in zip(df["nAA"], df["frag_start_idx"], df["frag_stop_idx"]):
                inten[a:b] = predict_ms2_prior(int(naa), len(cols), cols)
        import pandas as pd

        lib.fragment_intensity_df = pd.DataFrame(inten, columns=cols)
        return lib
