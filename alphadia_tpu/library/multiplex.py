"""Non-isobaric library multiplexing.

(reference: alphadia/libtransform/multiplex.py:12 ``MultiplexLibrary`` —
for every configured channel the library is copied, the channel column set,
and modifications translated by the channel's mapping; precursor and
fragment m/z are recomputed from the translated modifications. Copies share
their source's elution group so channel competition works downstream.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.library.pipeline import ProcessingStep
from alphadia_tpu.library.speclib import SpecLibBase
from alphadia_tpu.reporting import logger


def _translate_mods(mods: str, mapping: dict[str, str]) -> str:
    if not mods:
        return mods
    out = []
    for m in str(mods).split(";"):
        out.append(mapping.get(m, m))
    return ";".join(out)


class MultiplexLibrary(ProcessingStep):
    def __init__(self, multiplex_mapping: list[dict], input_channel: int = 0):
        """multiplex_mapping: [{channel_name, modifications: {from: to}}, ...]"""
        self.multiplex_mapping = multiplex_mapping or []
        self.input_channel = input_channel

    def validate(self, input_) -> bool:
        return isinstance(input_, SpecLibBase) and len(self.multiplex_mapping) > 0

    def forward(self, lib: SpecLibBase) -> SpecLibBase:
        source = lib.precursor_df
        if "channel" in source.columns:
            source = source[source["channel"] == self.input_channel]
        if not len(source):
            raise ValueError(
                f"no precursors in input channel {self.input_channel}"
            )

        channels = []
        base = SpecLibBase(
            source.reset_index(drop=True).copy(),
            lib.fragment_mz_df,
            lib.fragment_intensity_df,
        )
        for entry in self.multiplex_mapping:
            channel_name = entry["channel_name"]
            mapping = entry.get("modifications", {})
            chan = base.copy()
            df = chan.precursor_df
            df["channel"] = np.uint32(int(channel_name))
            df["mods"] = [_translate_mods(m, mapping) for m in df["mods"]]
            chan.calc_precursor_mz()
            types = tuple(sorted({c.split("_z")[0] for c in lib.charged_frag_types})) or ("b", "y")
            max_z = max((int(c.split("_z")[1]) for c in lib.charged_frag_types), default=2)
            chan.calc_fragment_mz(max_charge=max_z, types=types)
            channels.append(chan)

        out = channels[0]
        for chan in channels[1:]:
            out.append(chan)
        out.precursor_df = (
            out.precursor_df.sort_values(
                ["elution_group_idx", "channel"], kind="stable"
            ).reset_index(drop=True)
        )
        out.precursor_df["precursor_idx"] = np.arange(
            len(out.precursor_df), dtype=np.uint32
        )
        logger.log(
            25,
            f"Multiplexed library: {len(self.multiplex_mapping)} channels, "
            f"{len(out.precursor_df)} precursors",
        )
        return out
