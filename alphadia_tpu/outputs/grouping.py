"""Protein inference by greedy set-cover parsimony + heuristic filtering.

(reference: alphadia/outputtransform/grouping.py:8-194 — same algorithm:
per decoy class, repeatedly take the protein covering the most precursors
as a master protein, removing its precursors from all other proteins;
heuristic mode then restricts each precursor's protein set to proteins
that are master somewhere.)
"""

from __future__ import annotations

import pandas as pd


def _group_and_parsimony(precursor_idx, precursor_ids, return_parsimony_groups=False):
    id_dict: dict[str, set] = {}
    for prec, ids in zip(precursor_idx, precursor_ids):
        for pid in str(ids).split(";"):
            id_dict.setdefault(pid, set()).add(prec)

    id_group, id_master, precursor_set = [], [], []
    for _ in range(len(id_dict)):
        query_id = max(id_dict, key=lambda k: len(id_dict[k]))
        query_peptides = id_dict.pop(query_id)
        if not query_peptides:
            break
        query_group = [query_id]
        for subject, peptides in id_dict.items():
            if not peptides:
                continue
            remaining = peptides - query_peptides
            id_dict[subject] = remaining
            if return_parsimony_groups and not remaining:
                query_group.append(subject)
        id_group.append(";".join(query_group))
        id_master.append(query_id)
        precursor_set.append(query_peptides)

    mapping = {}
    for master, group, peptides in zip(id_master, id_group, precursor_set):
        for p in peptides:
            mapping[p] = (master, group)

    if len(mapping) != len(set(precursor_idx)):
        raise ValueError("grouping lost precursors")

    masters = [mapping[p][0] for p in precursor_idx]
    groups = [mapping[p][1] for p in precursor_idx]
    return masters, groups


def perform_grouping(
    psm_df: pd.DataFrame,
    genes_or_proteins: str = "proteins",
    decoy_column: str = "decoy",
    group: bool = True,
    return_parsimony_groups: bool = False,
) -> pd.DataFrame:
    if genes_or_proteins not in ("genes", "proteins"):
        raise ValueError("genes_or_proteins must be 'genes' or 'proteins'")

    psm_df = psm_df.copy()
    psm_df[genes_or_proteins] = psm_df[genes_or_proteins].astype(str)
    unique = psm_df.drop_duplicates("precursor_idx")[
        ["precursor_idx", genes_or_proteins, decoy_column]
    ]

    pieces = []
    for _, sub in unique.groupby(decoy_column):
        sub = sub.copy()
        sub["pg_master"], sub["pg"] = _group_and_parsimony(
            sub["precursor_idx"].to_numpy(),
            sub[genes_or_proteins].to_numpy(),
            return_parsimony_groups,
        )
        pieces.append(sub)
    unique = pd.concat(pieces)

    if group:
        allowed = set(unique["pg"].str.split(";").str[0].unique())

        def filter_pg(ids: str) -> str:
            kept = sorted(set(str(ids).split(";")) & allowed)
            return ";".join(kept)

        unique["pg"] = unique[genes_or_proteins].map(filter_pg)

    unique = unique[["precursor_idx", "pg_master", "pg"]]
    return psm_df.merge(unique, on="precursor_idx", how="left")
