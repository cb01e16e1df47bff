"""pack_scoring_output / unpack_scoring_output round trip.

The packed single-download buffer is the TPU transfer hot path; this
pins the layout against the host-side unpacker, including KF > 16 where
the frag-valid bitmask spans multiple u16 words (transfer-requant scores
the full fragment space).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from alphadia_tpu.ops.scoring import (
    NUM_FEATURES,
    pack_scoring_output,
    unpack_scoring_output,
)


def test_wire_compaction_equivalence():
    """Uploading wire-compacted batch arrays (f16/u8/i16/bit-packed
    validity, ops/packing.py compact_wire) must give the same features as
    canonical dtypes, within f16 library-intensity precision."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from __graft_entry__ import _make_demo_data, _scoring_inputs

    from alphadia_tpu.ops.packing import compact_wire
    from alphadia_tpu.ops.scoring import score_candidates_batch

    dia, prec, frag = _make_demo_data()
    args, static = _scoring_inputs(dia, prec, frag, B=16)
    ref_feat, ref_valid, ref_frag = score_candidates_batch(*args, **static)

    # arg positions: 6 device arrays, then the batch arrays by name
    names = [None] * 6 + [
        "frag_mz", "frag_valid", "frag_intensity", "frag_type",
        "frag_position", "iso_mz", "iso_intensity", "ms2_slot", "ms1_slot",
        "win_lo", "win_hi", None, None,  # quad params
        "frame_center", "frame_start", "frame_stop",
        "scan_lo", "scan_hi", "mobility_width", None, None,
    ]
    wired = tuple(
        compact_wire(k, np.asarray(a)) if k else a
        for k, a in zip(names, args)
    )
    feat, valid, frag_out = score_candidates_batch(*wired, **static)

    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_valid))
    np.testing.assert_array_equal(
        np.asarray(frag_out["valid"]), np.asarray(ref_frag["valid"])
    )
    np.testing.assert_allclose(
        np.asarray(feat), np.asarray(ref_feat), rtol=2e-3, atol=1e-4
    )


@pytest.mark.parametrize("KF", [4, 12, 16, 20, 64])
def test_pack_unpack_round_trip(KF):
    rng = np.random.default_rng(17)
    B, O2 = 9, 2
    features = rng.normal(size=(B, NUM_FEATURES)).astype(np.float32)
    valid = rng.integers(0, 2, B).astype(bool)
    frag_out = {
        "mz_observed": rng.uniform(100, 1000, (B, KF)).astype(np.float32),
        "mass_error": rng.uniform(-40, 40, (B, KF)).astype(np.float32),
        "height": rng.uniform(0, 1e5, (B, KF)).astype(np.float32),
        "intensity": rng.uniform(0, 1.0, (B, KF)).astype(np.float32),
        "correlation": rng.uniform(-1, 1, (B, KF)).astype(np.float32),
        "valid": rng.integers(0, 2, (B, KF)).astype(bool),
        "obs_intensity": rng.uniform(0, 1e6, (B, O2)).astype(np.float32),
        "scan_com": rng.uniform(0, 30, B).astype(np.float32),
    }
    packed = np.asarray(
        pack_scoring_output(
            jnp.asarray(features), jnp.asarray(valid),
            {k: jnp.asarray(v) for k, v in frag_out.items()},
        )
    )
    assert packed.dtype == np.uint16
    f2, v2, fo2 = unpack_scoring_output(packed, KF, O2)

    # features: per-transport-class precision (see _feature_precision_classes)
    from alphadia_tpu.ops.scoring import _feature_precision_classes

    f32_idx, bf16_idx, f16_idx = _feature_precision_classes(NUM_FEATURES)
    np.testing.assert_array_equal(f2[:, f32_idx], features[:, f32_idx])
    np.testing.assert_allclose(
        f2[:, bf16_idx], features[:, bf16_idx], rtol=1 / 128
    )
    np.testing.assert_allclose(
        f2[:, f16_idx], features[:, f16_idx], rtol=1e-3, atol=1e-6
    )
    np.testing.assert_array_equal(v2, valid)
    np.testing.assert_array_equal(fo2["valid"], frag_out["valid"])
    np.testing.assert_array_equal(fo2["scan_com"], frag_out["scan_com"])
    np.testing.assert_allclose(
        fo2["mass_error"], frag_out["mass_error"], rtol=1e-3, atol=2e-2
    )
    np.testing.assert_allclose(
        fo2["correlation"], frag_out["correlation"], rtol=1e-3, atol=1e-3
    )
    for key in ("height", "intensity", "obs_intensity"):
        np.testing.assert_allclose(
            fo2[key], frag_out[key], rtol=1 / 128
        )  # bf16: 8-bit mantissa


@pytest.mark.parametrize("with_scan", [False, True])
def test_sel_u16_round_trip(with_scan):
    """Selection u16 packed download (half of pack_u32) round-trips: valid
    bitmask, i16 indices exactly, f16 scores to ~1e-3."""
    from alphadia_tpu.ops.packing import pack_sel_u16, unpack_sel_u16

    rng = np.random.default_rng(11)
    B, K = 13, 3
    result = {
        "valid": rng.integers(0, 2, (B, K)).astype(bool),
        "rank": np.tile(np.arange(K, dtype=np.int32), (B, 1)),
        "score": rng.uniform(0, 30, (B, K)).astype(np.float32),
        "cycle_center": rng.integers(0, 3000, (B, K)).astype(np.int32),
        "cycle_start": rng.integers(-5, 3000, (B, K)).astype(np.int32),
        "cycle_stop": rng.integers(0, 3000, (B, K)).astype(np.int32),
    }
    spec = {
        "valid": ("bool", K), "rank": ("int32", K), "score": ("float32", K),
        "cycle_center": ("int32", K), "cycle_start": ("int32", K),
        "cycle_stop": ("int32", K),
    }
    if with_scan:
        for key in ("scan_center", "scan_start", "scan_stop"):
            result[key] = rng.integers(0, 64, (B, K)).astype(np.int32)
            spec[key] = ("int32", K)

    packed = np.asarray(pack_sel_u16({k: jnp.asarray(v) for k, v in result.items()}))
    assert packed.dtype == np.uint16
    out = unpack_sel_u16(packed, spec)
    np.testing.assert_array_equal(out["valid"], result["valid"])
    for key in spec:
        if key in ("valid", "score"):
            continue
        np.testing.assert_array_equal(out[key], result[key])
        assert out[key].dtype == np.int32
    np.testing.assert_allclose(out["score"], result["score"], rtol=1e-3)


def test_pack_unpack_light_transport():
    """with_quant=False (optimization-iteration transport): quant columns
    are absent, the observed gate (height > 0) folds into the valid bits,
    and everything else round-trips as usual."""
    rng = np.random.default_rng(3)
    B, KF, O2 = 7, 12, 2
    features = rng.normal(size=(B, NUM_FEATURES)).astype(np.float32)
    valid = rng.integers(0, 2, B).astype(bool)
    frag_valid = rng.integers(0, 2, (B, KF)).astype(bool)
    height = np.where(
        rng.integers(0, 2, (B, KF)).astype(bool),
        rng.uniform(1, 1e5, (B, KF)),
        0.0,
    ).astype(np.float32)
    frag_out = {
        "mass_error": rng.uniform(-40, 40, (B, KF)).astype(np.float32),
        "height": height,
        "intensity": rng.uniform(0, 1.0, (B, KF)).astype(np.float32),
        "correlation": rng.uniform(-1, 1, (B, KF)).astype(np.float32),
        "valid": frag_valid,
        "obs_intensity": rng.uniform(0, 1e6, (B, O2)).astype(np.float32),
        "scan_com": rng.uniform(0, 30, B).astype(np.float32),
    }
    packed_full = np.asarray(
        pack_scoring_output(
            jnp.asarray(features), jnp.asarray(valid),
            {k: jnp.asarray(v) for k, v in frag_out.items()},
        )
    )
    packed = np.asarray(
        pack_scoring_output(
            jnp.asarray(features), jnp.asarray(valid),
            {k: jnp.asarray(v) for k, v in frag_out.items()},
            with_quant=False,
        )
    )
    assert packed.shape[1] == packed_full.shape[1] - 2 * KF
    f2, v2, fo2 = unpack_scoring_output(packed, KF, O2, with_quant=False)

    np.testing.assert_array_equal(v2, valid)
    np.testing.assert_array_equal(fo2["valid"], frag_valid & (height > 0))
    # height is synthesized 0/1 so `height > 0` gating still works
    np.testing.assert_array_equal(fo2["height"] > 0, fo2["valid"])
    np.testing.assert_array_equal(fo2["intensity"], 0.0)
    np.testing.assert_allclose(
        fo2["mass_error"], frag_out["mass_error"], rtol=1e-3, atol=2e-2
    )
    np.testing.assert_allclose(
        fo2["obs_intensity"], frag_out["obs_intensity"], rtol=1 / 128
    )
    np.testing.assert_array_equal(fo2["scan_com"], frag_out["scan_com"])


def test_wire_byte_planes_roundtrip():
    """wire_encode_jnp <-> wire_decode_np is lossless for u16 and u32."""
    import numpy as np

    from alphadia_tpu.ops.packing import wire_decode_np, wire_encode_jnp

    rng = np.random.default_rng(3)
    for dtype in (np.uint16, np.uint32):
        buf = rng.integers(
            0, np.iinfo(dtype).max, size=(37, 23), dtype=dtype, endpoint=True
        )
        # pin the edge values (0 and all-ones) into the round trip
        buf[0, 0] = 0
        buf[-1, -1] = np.iinfo(dtype).max
        planes = np.asarray(wire_encode_jnp(buf))
        assert planes.dtype == np.uint8
        assert planes.shape == (np.dtype(dtype).itemsize, 23, 37)
        out = wire_decode_np(planes, dtype)
        np.testing.assert_array_equal(out, buf)
