"""Library harmonization steps.

(reference: alphadia/libtransform/harmonize.py:22-260 — PrecursorInitializer,
AnnotateFasta, IsotopeGenerator, RTNormalization)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.library.pipeline import ProcessingStep
from alphadia_tpu.library.speclib import SpecLibBase, mod_seq_hash
from alphadia_tpu.reporting import logger


class PrecursorInitializer(ProcessingStep):
    """Initialize canonical precursor columns; optionally drop input decoys."""

    def __init__(self, drop_decoys: bool = False):
        self.drop_decoys = drop_decoys

    def validate(self, input_) -> bool:
        return isinstance(input_, SpecLibBase)

    def forward(self, lib: SpecLibBase) -> SpecLibBase:
        df = lib.precursor_df
        if self.drop_decoys and "decoy" in df.columns:
            keep = df["decoy"] == 0
            lib.precursor_df = df = df[keep].reset_index(drop=True)
        if "decoy" not in df.columns:
            df["decoy"] = np.uint8(0)
        if "channel" not in df.columns:
            df["channel"] = np.uint32(0)
        if "mods" not in df.columns:
            df["mods"] = ""
        if "mod_sites" not in df.columns:
            df["mod_sites"] = ""
        lib.hash_precursors()
        if "elution_group_idx" not in df.columns:
            # one group per (modified sequence, charge): decoy/channel copies
            # inherit the group later and compete, but charge states stay
            # separate — grouping them would mark every shared y/b ion as
            # cardinality>=2 and exclude_shared_ions would strip multi-charge
            # peptides of all fragments (reference harmonize.py:82-89 uses
            # per-precursor groups for the same reason)
            codes, _ = pd.factorize(df["mod_seq_charge_hash"], sort=False)
            df["elution_group_idx"] = codes.astype(np.uint32)
        df["precursor_idx"] = np.arange(len(df), dtype=np.uint32)
        if "nAA" not in df.columns:
            df["nAA"] = df["sequence"].str.len().astype(np.uint8)
        return lib


class AnnotateFasta(ProcessingStep):
    """Annotate precursors with proteins/genes from FASTA digests."""

    def __init__(self, fasta_paths: list[str], drop_unannotated: bool = True):
        self.fasta_paths = fasta_paths
        self.drop_unannotated = drop_unannotated

    def validate(self, input_) -> bool:
        return isinstance(input_, SpecLibBase) and len(self.fasta_paths) > 0

    def forward(self, lib: SpecLibBase) -> SpecLibBase:
        from alphadia_tpu.library.digest import read_fasta

        frames = [read_fasta(p) for p in self.fasta_paths]
        proteins = pd.concat(frames, ignore_index=True)
        seqs = lib.precursor_df["sequence"].unique()
        pep_prot: dict[str, set] = {s: set() for s in seqs}
        pep_gene: dict[str, set] = {s: set() for s in seqs}
        # Aho-Corasick-free simple scan: index peptides by 6-mer prefix;
        # peptides shorter than 6 residues get a substring scan of their
        # own (a 6-mer window probe can never match them)
        by_prefix: dict[str, list[str]] = {}
        short = []
        for s in seqs:
            if len(s) >= 6:
                by_prefix.setdefault(s[:6], []).append(s)
            else:
                short.append(s)
        for prot, gene, _, pseq in proteins.itertuples(index=False):
            for i in range(len(pseq) - 5):
                for cand in by_prefix.get(pseq[i : i + 6], ()):
                    if pseq.startswith(cand, i):
                        pep_prot[cand].add(prot)
                        pep_gene[cand].add(gene)
            for cand in short:
                if cand in pseq:
                    pep_prot[cand].add(prot)
                    pep_gene[cand].add(gene)
        df = lib.precursor_df
        df["proteins"] = [";".join(sorted(pep_prot[s])) for s in df["sequence"]]
        df["genes"] = [";".join(sorted(pep_gene[s])) for s in df["sequence"]]
        if self.drop_unannotated:
            keep = df["proteins"] != ""
            n_drop = int((~keep).sum())
            if n_drop:
                logger.info(f"Dropping {n_drop} precursors without FASTA annotation")
            lib.precursor_df = df[keep].reset_index(drop=True)
        return lib


class IsotopeGenerator(ProcessingStep):
    """Compute i_0..i_{n-1} isotope envelope columns from composition."""

    def __init__(self, n_isotopes: int = 4):
        self.n_isotopes = n_isotopes

    def validate(self, input_) -> bool:
        return isinstance(input_, SpecLibBase)

    def forward(self, lib: SpecLibBase) -> SpecLibBase:
        lib.calc_isotopes(self.n_isotopes)
        return lib


class RTNormalization(ProcessingStep):
    """Normalize library RT to [0, 1] when it is on an iRT/minutes scale.

    Behavioral contract of the reference step: detect the RT scale of the
    library and bring it to a normalized 0-1 gradient fraction; per-run
    initialization later maps it to the run's own gradient.
    """

    def validate(self, input_) -> bool:
        return isinstance(input_, SpecLibBase) and any(
            c in input_.precursor_df.columns for c in ("rt", "rt_library", "irt", "rt_norm")
        )

    def forward(self, lib: SpecLibBase) -> SpecLibBase:
        df = lib.precursor_df
        col = next(
            c for c in ("rt_library", "rt", "rt_norm", "irt") if c in df.columns
        )
        rt = df[col].to_numpy(dtype=np.float32)
        lo, hi = np.percentile(rt, [0.1, 99.9])
        if hi - lo <= 0:
            norm = np.zeros_like(rt)
        else:
            norm = np.clip((rt - lo) / (hi - lo), 0.0, 1.0)
        df["rt_norm"] = norm
        # also overwrite the SOURCE column (the reference clips `rt` in
        # place, harmonize.py:237-240): InitFlatColumns prefers
        # rt_library/rt over rt_norm, so leaving the raw column would let
        # a single outlier iRT dominate the later min-max gradient mapping
        if col != "rt_norm":
            df[col] = norm
        return lib
