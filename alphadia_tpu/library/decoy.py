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


def generate_flat_decoys(flat, method: str = "diann"):
    """Decoys for FLAT libraries (MBR libraries saved without decoys per
    ``fdr.keep_decoys_in_mbr_library=false``, or decoy-free flat HDF
    inputs). The hierarchical :class:`DecoyGenerator` cannot run here —
    flat libraries carry no fragment matrices — so each flat fragment
    row's m/z is recomputed from the mutated sequence via its
    (type, position, charge): ``position`` IS the cleavage-site ladder
    index (library/flatten.py). Intensities, RT/mobility and the target's
    elution group are kept, matching the reference decoy contract
    (alphadia/libtransform/decoy.py:12 + MBR regeneration at load,
    libtransform/mbr.py).
    """
    import pandas as pd

    from alphadia_tpu.library import chem
    from alphadia_tpu.library.speclib import SpecLibFlat, mod_seq_charge_hash

    if method != "diann":
        raise ValueError(f"flat decoys support 'diann' only, got {method}")

    prec = flat.precursor_df.reset_index(drop=True)
    if "decoy" in prec.columns and prec["decoy"].nunique() > 1:
        logger.info("Decoys already present, skipping flat decoy generation")
        return flat
    if "decoy" not in prec.columns:
        prec["decoy"] = np.uint8(0)
    mods = (
        prec["mods"].fillna("").tolist()
        if "mods" in prec.columns
        else [""] * len(prec)
    )
    sites = (
        prec["mod_sites"].fillna("").astype(str).tolist()
        if "mod_sites" in prec.columns
        else [""] * len(prec)
    )
    if "elution_group_idx" not in prec.columns:
        codes, _ = pd.factorize(
            mod_seq_charge_hash(prec["sequence"], mods, prec["charge"]),
            sort=False,
        )
        prec["elution_group_idx"] = codes.astype(np.uint32)

    frag = flat.fragment_df.reset_index(drop=True)
    fmz_col = "mz_library" if "mz_library" in frag.columns else "mz"
    pmz_cols = [
        c for c in ("mz_library", "precursor_mz", "mz") if c in prec.columns
    ]

    # diann mutation preserves residue positions -> mod_sites unchanged
    dseqs = [_mutate_diann(s) for s in prec["sequence"]]

    dprec = prec.copy()
    dprec["sequence"] = dseqs
    dprec["decoy"] = np.uint8(1)
    d_pmz = np.array(
        [
            chem.precursor_mz(s, int(z), m, ms)
            for s, z, m, ms in zip(dseqs, prec["charge"], mods, sites)
        ],
        dtype=np.float32,
    )
    for c in pmz_cols:
        dprec[c] = d_pmz

    ftype = frag["type"].to_numpy()
    fpos = frag["position"].to_numpy()
    fz = np.maximum(frag["charge"].to_numpy(np.int32), 1)
    floss = frag["loss_type"].to_numpy()
    loss_mass = {0: 0.0, 17: chem.MASS_NH3, 18: chem.MASS_H2O}
    new_mz = frag[fmz_col].to_numpy(np.float32).copy()
    starts = prec["flat_frag_start_idx"].to_numpy()
    stops = prec["flat_frag_stop_idx"].to_numpy()
    for i in range(len(prec)):
        a, b = int(starts[i]), int(stops[i])
        if b <= a:
            continue
        types_here = tuple(sorted({chr(t) for t in ftype[a:b]}))
        ladders = chem.fragment_mz_arrays(
            dseqs[i], mods[i], sites[i],
            max_charge=int(fz[a:b].max()), types=types_here,
        )
        for j in range(a, b):
            lad = ladders[f"{chr(ftype[j])}_z{int(fz[j])}"]
            p = int(fpos[j])
            if 0 <= p < len(lad):
                new_mz[j] = lad[p] - loss_mass.get(int(floss[j]), 0.0) / int(
                    fz[j]
                )
    dfrag = frag.copy()
    dfrag[fmz_col] = new_mz

    # append decoy blocks after the target blocks; per-row start/stop
    # columns keep each precursor linked to its fragments through the sort
    n_frag = len(frag)
    dprec["flat_frag_start_idx"] = starts + n_frag
    dprec["flat_frag_stop_idx"] = stops + n_frag
    out_prec = pd.concat([prec, dprec], ignore_index=True)
    out_prec = out_prec.sort_values(
        "elution_group_idx", kind="stable"
    ).reset_index(drop=True)
    out_prec["precursor_idx"] = np.arange(len(out_prec), dtype=np.uint32)
    out_frag = pd.concat([frag, dfrag], ignore_index=True)
    logger.info(f"Generated {len(dprec):,} flat decoys ({method})")
    return SpecLibFlat(out_prec, out_frag)


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
            from alphadia_tpu.library.speclib import _str_col

            for s, sites in zip(ddf["sequence"], _str_col(ddf, "mod_sites")):
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
        # calc_fragment_mz emits the full types x charge product; restrict
        # to the library's actual column set (e.g. [b_z1, y_z1, y_z2]) so
        # append never widens the mz frame past the intensity frame
        want = list(lib.charged_frag_types)
        if want and list(decoy.fragment_mz_df.columns) != want:
            decoy.fragment_mz_df = decoy.fragment_mz_df.reindex(
                columns=want, fill_value=0.0
            )

        lib.append(decoy)
        lib.precursor_df = (
            lib.precursor_df.sort_values("elution_group_idx", kind="stable")
            .reset_index(drop=True)
        )
        lib.precursor_df["precursor_idx"] = np.arange(
            len(lib.precursor_df), dtype=np.uint32
        )
        return lib
