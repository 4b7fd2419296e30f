"""ConvNeXt tower parity (vs torch spec assembly) + anyres index-plan tests."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import ConvNeXtConfig
from visper_lm_tpu.data.anyres import anyres_index_plan, anyres_token_count, unpadded_hw
from visper_lm_tpu.models.convnext import convnext_forward, import_openclip_convnext


def test_convnext_parity_with_torch_spec():
    """timm-layout ConvNeXt trunk built in torch per the reference semantics."""
    dims = [8, 16, 32, 64]
    depths = [1, 1, 2, 1]

    class Block(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
            self.norm = nn.LayerNorm(dim, eps=1e-6)
            self.mlp = nn.ModuleDict(
                {"fc1": nn.Linear(dim, 4 * dim), "fc2": nn.Linear(4 * dim, dim)}
            )
            self.gamma = nn.Parameter(torch.full((dim,), 1e-6))

        def forward(self, x):
            y = self.conv_dw(x)
            y = y.permute(0, 2, 3, 1)
            y = self.norm(y)
            y = self.mlp["fc2"](F.gelu(self.mlp["fc1"](y)))
            y = (self.gamma * y).permute(0, 3, 1, 2)
            return x + y

    class LN2d(nn.LayerNorm):
        def forward(self, x):
            return super().forward(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(nn.Conv2d(3, dims[0], 4, 4), LN2d(dims[0], eps=1e-6))
            stages = []
            for s in range(4):
                mods = nn.ModuleDict()
                if s > 0:
                    mods["downsample"] = nn.Sequential(
                        LN2d(dims[s - 1], eps=1e-6), nn.Conv2d(dims[s - 1], dims[s], 2, 2)
                    )
                mods["blocks"] = nn.ModuleList([Block(dims[s]) for _ in range(depths[s])])
                stages.append(mods)
            self.stages = nn.ModuleList(stages)
            self.norm_pre = LN2d(dims[-1], eps=1e-6)

        def forward(self, x):
            x = self.stem(x)
            for st in self.stages:
                if "downsample" in st:
                    x = st["downsample"](x)
                for b in st["blocks"]:
                    x = b(x)
            return self.norm_pre(x)

    torch.manual_seed(0)
    trunk = Trunk().eval()

    # rename to timm/openclip key layout expected by the importer
    sd = {}
    for k, v in trunk.state_dict().items():
        k = k.replace("stem.0", "stem§0").replace("stem.1", "stem§1")
        k = k.replace("downsample.0", "downsample§0").replace("downsample.1", "downsample§1")
        k = k.replace("mlp.fc1", "mlp§fc1").replace("mlp.fc2", "mlp§fc2")
        sd[k] = v.detach().numpy()
    mapped = {}
    for k, v in sd.items():
        k = (
            k.replace("stem§0", "stem.0")
            .replace("stem§1", "stem.1")
            .replace("downsample§0", "downsample.0")
            .replace("downsample§1", "downsample.1")
            .replace("mlp§fc1", "mlp.fc1")
            .replace("mlp§fc2", "mlp.fc2")
        )
        mapped[k] = v
    cfg = ConvNeXtConfig(image_size=64, depths=tuple(depths), dims=tuple(dims), dtype="float32")
    params = import_openclip_convnext(mapped, cfg, prefix="")

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = trunk(torch.tensor(img)).numpy()
    got = convnext_forward(params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.array(got).transpose(0, 3, 1, 2), ref, rtol=3e-4, atol=3e-4
    )


GRID = [(336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008)]


def test_unpadded_hw_matches_reference_formula():
    # tall 300x1000 image on the (336,1008) grid: 1x3 tiles of 24 cells;
    # aspect 0.30 < grid 0.333 -> width gets cropped
    hp, wp, pt, pl = unpadded_hw((300, 1000), 3, 1, 24)
    assert hp == 72 and pt == 0
    assert wp == 22 and pl == 1
    # exact-aspect image -> no crop
    hp, wp, pt, pl = unpadded_hw((300, 900), 3, 1, 24)
    assert (hp, wp, pt, pl) == (72, 24, 0, 0)


def test_anyres_plan_flat_and_unpad():
    idx_flat, nl = anyres_index_plan((900, 300), GRID, merge_type="flat")
    # wide image -> (1008, 336) = 3x1 grid -> 4 tiles total
    assert nl == 4 * 576
    assert idx_flat.shape[0] == 4 * 576
    assert idx_flat[0] == 0 and idx_flat[-1] == 4 * 576 - 1

    idx, nl = anyres_index_plan((900, 300), GRID, merge_type="spatial_unpad")
    # base 576 + unpadded grid with newline per row
    assert (idx == nl).sum() > 0  # newline markers present
    assert idx[:576].tolist() == list(range(576))
    # all indices within the flat buffer (+ newline row)
    assert idx.max() <= nl
    hp, wp, _, _ = unpadded_hw((900, 300), 1, 3, 24)
    assert idx.shape[0] == 576 + hp * (wp + 1)
    assert anyres_token_count((900, 300), GRID) == idx.shape[0]

    # newline is the last column of each row
    rows = idx[576:].reshape(hp, wp + 1)
    assert (rows[:, -1] == nl).all()
    assert (rows[:, :-1] != nl).all()


def test_anyres_splice_and_encode():
    """End-to-end: tiled images through encode_images + anyres gather splice."""
    from visper_lm_tpu.config import tiny_test_vlm
    import dataclasses

    from visper_lm_tpu.constants import IMAGE_TOKEN_INDEX, SEG_IMAGE
    from visper_lm_tpu.data.collate import build_splice_plan
    from visper_lm_tpu.models.vlm import encode_images, init_vlm, splice_embeddings

    cfg = dataclasses.replace(tiny_test_vlm(), mm_patch_merge_type="spatial_unpad")
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    assert "image_newline" in params

    rng = np.random.default_rng(0)
    tiles = rng.normal(size=(2, 3, 28, 28, 3)).astype(np.float32)  # base + 2 tiles
    feats = encode_images(params, cfg, jnp.asarray(tiles))
    per_tile = cfg.vision.num_patches
    assert feats.shape == (2, 3 * per_tile + 1, cfg.decoder.hidden_size)

    # newline row equals the raw image_newline param
    np.testing.assert_allclose(
        np.array(feats[0, -1]), np.array(params["image_newline"]), rtol=1e-6
    )

    # build a splice plan with explicit indices hitting the newline row
    indices = np.array([0, 1, 3 * per_tile, 2], dtype=np.int32)
    plan = build_splice_plan(
        [1, IMAGE_TOKEN_INDEX, 5], None, 16,
        num_image_tokens=len(indices),
        image_feature_indices=[indices],
    )
    emb = splice_embeddings(
        params, cfg,
        jnp.asarray(plan.text_ids)[None],
        jnp.asarray(plan.token_type)[None],
        jnp.asarray(plan.src_index)[None],
        feats[:1],
    )
    # position 3 (3rd image slot) must be the newline embedding
    np.testing.assert_allclose(
        np.array(emb[0, 3]), np.array(params["image_newline"]), rtol=1e-6
    )
