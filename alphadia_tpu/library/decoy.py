"""Decoy generation.

Behavioral contract (reference: alphadia/libtransform/decoy.py:12, which
delegates to alphabase's decoy providers):

- skip when the library already contains decoys;
- 'diann' decoys mutate the second and second-to-last residue with the
  DIA-NN mutation table; 'pseudo_reverse' reverses all but the C-terminal
  residue;
- decoys keep their target's elution_group_idx (FDR competition group),
  fragment intensities, RT and mobility; fragment m/z are recomputed from
  the mutated sequence;
- precursor_idx is re-assigned contiguously after append + stable sort by
  elution group.
"""

from __future__ import annotations

import numpy as np

from alphadia_tpu.library.pipeline import ProcessingStep
from alphadia_tpu.library.speclib import SpecLibBase
from alphadia_tpu.reporting import logger

# DIA-NN style mutation map (residue -> replacement)
_DIANN_FROM = "GAVLIFMPWSCTYHKRQEND"
_DIANN_TO = "LLLVVLLLLTSSSSLLNDQE"
_MUTATE = {a: b for a, b in zip(_DIANN_FROM, _DIANN_TO)}


def _mutate_diann(seq: str) -> str:
    if len(seq) < 3:
        return seq
    chars = list(seq)
    chars[1] = _MUTATE.get(chars[1], chars[1])
    chars[-2] = _MUTATE.get(chars[-2], chars[-2])
    return "".join(chars)


def _pseudo_reverse(seq: str) -> str:
    return seq[:-1][::-1] + seq[-1]


def _shift_sites(sites: str, seq_len: int, permutation) -> str:
    """Remap 1-based modification sites through a residue permutation."""
    if not sites:
        return sites
    out = []
    for s in str(sites).split(";"):
        p = int(s)
        if p <= 0:
            out.append(str(p))
        else:
            out.append(str(permutation[p - 1] + 1))
    return ";".join(out)


class DecoyGenerator(ProcessingStep):
    def __init__(self, decoy_type: str = "diann"):
        self.decoy_type = decoy_type

    def validate(self, input_) -> bool:
        return isinstance(input_, SpecLibBase)

    def forward(self, lib: SpecLibBase) -> SpecLibBase:
        df = lib.precursor_df
        if "decoy" not in df.columns:
            df["decoy"] = np.uint8(0)
        if df["decoy"].nunique() > 1:
            logger.info("Decoys already present, skipping decoy generation")
            return lib

        decoy = lib.copy()
        ddf = decoy.precursor_df
        if self.decoy_type == "diann":
            ddf["sequence"] = [_mutate_diann(s) for s in ddf["sequence"]]
            # mutation preserves positions; mod_sites unchanged
        elif self.decoy_type == "pseudo_reverse":
            new_seqs = []
            new_sites = []
            for s, sites in zip(ddf["sequence"], ddf.get("mod_sites", "")):
                n = len(s)
                perm = np.concatenate([np.arange(n - 1)[::-1], [n - 1]])
                inv = np.argsort(perm)
                new_seqs.append(_pseudo_reverse(s))
                new_sites.append(_shift_sites(sites, n, inv))
            ddf["sequence"] = new_seqs
            if "mod_sites" in ddf.columns:
                ddf["mod_sites"] = new_sites
        else:
            raise ValueError(f"unknown decoy_type {self.decoy_type}")

        ddf["decoy"] = np.uint8(1)
        decoy.calc_precursor_mz()
        max_charge = max(
            (int(c.split("_z")[1]) for c in lib.charged_frag_types), default=2
        )
        types = tuple(sorted({c.split("_z")[0] for c in lib.charged_frag_types})) or ("b", "y")
        decoy.calc_fragment_mz(max_charge=max_charge, types=types)

        lib.append(decoy)
        lib.precursor_df = (
            lib.precursor_df.sort_values("elution_group_idx", kind="stable")
            .reset_index(drop=True)
        )
        lib.precursor_df["precursor_idx"] = np.arange(
            len(lib.precursor_df), dtype=np.uint32
        )
        return lib
