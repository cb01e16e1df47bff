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
