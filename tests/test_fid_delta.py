"""FID math + weight-delta utility tests."""

import numpy as np

from visper_lm_tpu.checkpoint.delta import apply_delta, make_delta, unflatten
from visper_lm_tpu.eval.fid import compute_stats, fid_from_features, frechet_distance


def test_fid_identical_distributions_is_zero():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 16))
    assert abs(fid_from_features(x, x)) < 1e-8


def test_fid_mean_shift_formula():
    """For equal covariances, FID = ||mu1 - mu2||^2."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5000, 8))
    y = x + 3.0
    mu1, s1 = compute_stats(x)
    mu2, s2 = compute_stats(y)
    fid = frechet_distance(mu1, s1, mu2, s2)
    assert abs(fid - np.sum((mu1 - mu2) ** 2)) < 1e-6


def test_fid_increases_with_divergence():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2000, 8))
    near = rng.normal(size=(2000, 8)) * 1.05
    far = rng.normal(size=(2000, 8)) * 3.0 + 2.0
    assert fid_from_features(x, near) < fid_from_features(x, far)


def test_delta_roundtrip():
    rng = np.random.default_rng(3)
    base = {"decoder": {"w": rng.normal(size=(4, 4)).astype(np.float32)},
            "embed": rng.normal(size=(10, 4)).astype(np.float32)}
    target = {
        "decoder": {"w": base["decoder"]["w"] + 1.0},
        "embed": np.concatenate(  # vocab expanded by 2 rows
            [base["embed"] + 0.5, rng.normal(size=(2, 4)).astype(np.float32)]
        ),
        "mm_projector": {"k": rng.normal(size=(4, 4)).astype(np.float32)},
    }
    delta = make_delta(base, target)
    restored = unflatten(apply_delta(base, delta))
    np.testing.assert_allclose(restored["decoder"]["w"], target["decoder"]["w"], rtol=1e-6)
    np.testing.assert_allclose(restored["embed"], target["embed"], rtol=1e-6)
    np.testing.assert_allclose(restored["mm_projector"]["k"], target["mm_projector"]["k"])
