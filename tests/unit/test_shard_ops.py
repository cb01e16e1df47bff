"""Pallas XIC under shard_map on the virtual CPU mesh (interpret mode)."""

import jax
import numpy as np
import pytest

from alphadia_tpu.ops.xic import extract_xic
from alphadia_tpu.parallel.mesh import make_mesh
from alphadia_tpu.parallel.shard_ops import extract_xic_pallas_sharded
from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.testing.synthetic import SyntheticConfig, make_synthetic_dia


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_pallas_sharded_matches_xla(rng):
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=60, n_windows=4, n_cycles=64, seed=13)
    )
    dia = DiaData.from_spectra(spectra)
    arr = dia.device_arrays()

    n_dev = len(jax.devices())
    B = 2 * n_dev
    Q = 4
    rows = prec.head(B)
    q_mz = np.zeros((B, Q), np.float32)
    q_slot = np.full((B, Q), -1, np.int32)
    c0 = np.zeros(B, np.int32)
    for i, (_, p) in enumerate(rows.iterrows()):
        fs = frag["mz_library"].to_numpy()[
            int(p.flat_frag_start_idx) : int(p.flat_frag_start_idx) + Q
        ]
        slots = dia.ms2_slots_for_mz(float(p.mz_library))
        q_mz[i, : len(fs)] = fs
        q_slot[i, : len(fs)] = int(slots[0]) if len(slots) else -1
        c0[i] = max(0, int(p.rt_library / 1.5) - 8)

    kw = dict(
        n_cycles=dia.n_cycles, n_bins=dia.n_bins, bin_mz_min=dia.bin_mz_min,
        bin_width=dia.coarse_bin_width, slab=256, window_len=16,
    )
    want = np.asarray(
        extract_xic(
            arr["peak_mz"], arr["peak_intensity"], arr["cell_start"],
            q_slot, q_mz, np.float32(10.0), c0, **kw,
        )
    )
    mesh = make_mesh(n_dev)
    got = np.asarray(
        extract_xic_pallas_sharded(
            mesh,
            arr["peak_packed"],
            arr["cell_start"], q_slot, q_mz, np.float32(10.0), c0, **kw,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)
    assert want.sum() > 0  # the comparison exercised real signal
