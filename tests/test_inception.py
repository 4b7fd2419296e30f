"""InceptionV3 (FID variant) tests.

torchvision is absent here, so the oracle is the architecture spec itself:
per-stage feature-map shapes of inception_v3 at 299x299 are fixed and published
(reference /root/reference/ola_vlm/eval/inception.py block structure); the
importer is validated against a synthetic state dict in the exact
pt_inception/torchvision key layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visper_lm_tpu.eval.inception import (
    conv_shapes,
    import_inception,
    inception_feature_fn,
    inception_features,
    init_inception,
    module_branches,
)


def test_param_count_matches_torchvision():
    """inception_v3 convolutional trunk: 21,802,784 conv weights + BN params."""
    params = init_inception(jax.random.PRNGKey(0))
    n = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    # closed-form: sum over conv kernels + 4 BN tensors per conv
    expected = 0
    for full, (cin, cout, kh, kw) in conv_shapes().items():
        expected += kh * kw * cin * cout + 4 * cout
    assert n == expected
    # trunk conv-weight count for torchvision inception_v3 (well-known: ~21.8M
    # excluding the 1008-way fc): sanity range
    assert 21_000_000 < n < 22_500_000


def test_feature_shapes_end_to_end():
    params = init_inception(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    feats = inception_features(params, imgs)
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_stage_shapes_against_published_inception_dims():
    """Walk the net manually and assert the canonical stage shapes at 299 input."""
    from visper_lm_tpu.eval.inception import (
        MIXED_C,
        STEM,
        STEM2,
        basic_conv,
        inception_a,
        inception_b,
        inception_c,
        inception_d,
        inception_e,
        max_pool,
    )

    params = init_inception(jax.random.PRNGKey(1))
    x = jnp.zeros((1, 299, 299, 3))
    x = 2 * x - 1
    for name, stride, pad in STEM:
        x = basic_conv(params[name], x, stride=stride, padding=pad)
    assert x.shape == (1, 147, 147, 64)
    x = max_pool(x)
    assert x.shape == (1, 73, 73, 64)
    for name, stride, pad in STEM2:
        x = basic_conv(params[name], x, stride=stride, padding=pad)
    x = max_pool(x)
    assert x.shape == (1, 35, 35, 192)
    x = inception_a(params["Mixed_5b"], x)
    assert x.shape == (1, 35, 35, 256)
    x = inception_a(params["Mixed_5c"], x)
    assert x.shape == (1, 35, 35, 288)
    x = inception_a(params["Mixed_5d"], x)
    assert x.shape == (1, 35, 35, 288)
    x = inception_b(params["Mixed_6a"], x)
    assert x.shape == (1, 17, 17, 768)
    for name in MIXED_C:
        x = inception_c(params[name], x)
        assert x.shape == (1, 17, 17, 768)
    x = inception_d(params["Mixed_7a"], x)
    assert x.shape == (1, 8, 8, 1280)
    x = inception_e(params["Mixed_7b"], x, pool="avg")
    assert x.shape == (1, 8, 8, 2048)
    x = inception_e(params["Mixed_7c"], x, pool="max")
    assert x.shape == (1, 8, 8, 2048)


def test_avg_pool_excludes_padding():
    """The FIDInception patch: border pixels divide by the true window size."""
    from visper_lm_tpu.eval.inception import avg_pool_nocountpad

    x = jnp.ones((1, 4, 4, 1))
    y = np.asarray(avg_pool_nocountpad(x, k=3, stride=1, pad=1))
    assert y[0, 0, 0, 0] == pytest.approx(1.0)  # corner: 4 real / 4 counted
    assert y[0, 1, 1, 0] == pytest.approx(1.0)
    # count_include_pad=True would give 4/9 at the corner
    assert not np.isclose(y[0, 0, 0, 0], 4 / 9)


def _synthetic_pt_state_dict():
    rng = np.random.default_rng(0)
    sd = {}
    for mod, brs in module_branches().items():
        for br in brs:
            full = mod if br == "" else f"{mod}.{br}"
            cin, cout, kh, kw = conv_shapes()[full]
            sd[f"{full}.conv.weight"] = rng.normal(size=(cout, cin, kh, kw)).astype(
                np.float32
            ) * 0.05
            sd[f"{full}.bn.weight"] = np.abs(rng.normal(size=(cout,))).astype(np.float32)
            sd[f"{full}.bn.bias"] = rng.normal(size=(cout,)).astype(np.float32)
            sd[f"{full}.bn.running_mean"] = rng.normal(size=(cout,)).astype(np.float32)
            sd[f"{full}.bn.running_var"] = np.abs(
                rng.normal(size=(cout,))
            ).astype(np.float32) + 0.5
    # classifier present in the real file; importer must ignore it
    sd["fc.weight"] = rng.normal(size=(1008, 2048)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=(1008,)).astype(np.float32)
    return sd


def test_import_inception_and_run():
    sd = _synthetic_pt_state_dict()
    params = import_inception(sd)
    np.testing.assert_allclose(
        np.asarray(params["Conv2d_1a_3x3"]["kernel"]),
        sd["Conv2d_1a_3x3.conv.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(params["Mixed_5b"]["branch5x5_2"]["bn"]["mean"]),
        sd["Mixed_5b.branch5x5_2.bn.running_mean"],
    )
    fn = inception_feature_fn(params, batch_size=2)
    feats = fn(np.random.default_rng(1).uniform(0, 1, (3, 32, 32, 3)).astype(np.float32))
    assert feats.shape == (3, 2048)
    assert np.all(np.isfinite(feats))


@pytest.mark.slow
def test_fid_via_inception_npz_path(tmp_path):
    """eval.fid.inception_feature_fn loads an .npz of the canonical layout."""
    from visper_lm_tpu.eval.fid import fid_from_features, inception_feature_fn as fid_fn

    sd = _synthetic_pt_state_dict()
    path = tmp_path / "pt_inception.npz"
    np.savez(path, **sd)
    fn = fid_fn(str(path), batch_size=4)
    rng = np.random.default_rng(2)
    real = fn(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))
    fake = fn(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32) * 0.5)
    fid_same = fid_from_features(real, real)
    fid_diff = fid_from_features(real, fake)
    assert fid_same == pytest.approx(0.0, abs=1e-3)
    assert fid_diff > fid_same
