"""Teacher parity tests against HF reference implementations (random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from visper_lm_tpu.utils.image import resize_bilinear


@pytest.fixture(autouse=True)
def no_grad():
    with torch.no_grad():
        yield


def test_resize_bilinear_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    for align in (True, False):
        for size in ((14, 18), (24, 24), (3, 5)):
            ref = F.interpolate(xt, size=size, mode="bilinear", align_corners=align)
            got = resize_bilinear(jnp.asarray(x), size, align_corners=align)
            np.testing.assert_allclose(
                np.array(got).transpose(0, 3, 1, 2), ref.numpy(), rtol=1e-5, atol=1e-5,
                err_msg=f"align={align} size={size}",
            )


def test_swin_backbone_parity():
    from transformers import SwinBackbone, SwinConfig as HFSwinConfig

    hf_cfg = HFSwinConfig(
        image_size=96,
        patch_size=4,
        embed_dim=24,
        depths=[2, 2],
        num_heads=[2, 4],
        window_size=6,
        mlp_ratio=4.0,
        hidden_act="gelu",
        out_features=["stage1", "stage2"],
        drop_path_rate=0.0,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = SwinBackbone(hf_cfg).eval()

    from visper_lm_tpu.checkpoint.hf_import import torch_state_dict_to_numpy
    from visper_lm_tpu.models.teachers.swin import SwinConfig, import_swin_backbone, swin_forward

    cfg = SwinConfig(embed_dim=24, depths=(2, 2), num_heads=(2, 4), window_size=6)
    sd = torch_state_dict_to_numpy(hf.state_dict())
    params = import_swin_backbone(sd, cfg, prefix="")

    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 3, 96, 96)).astype(np.float32)
    ref = hf(torch.tensor(img)).feature_maps

    got = swin_forward(params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)))
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            np.array(g).transpose(0, 3, 1, 2), r.numpy(), rtol=2e-4, atol=2e-4
        )


def test_dinov2_parity():
    from transformers import Dinov2Config, Dinov2Model

    hf_cfg = Dinov2Config(
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=2,
        intermediate_size=64,
        image_size=56,
        patch_size=14,
        layerscale_value=1e-5,
        hidden_act="gelu",
    )
    torch.manual_seed(1)
    hf = Dinov2Model(hf_cfg).eval()

    from visper_lm_tpu.config import VisionConfig
    from visper_lm_tpu.checkpoint.hf_import import _ln, _lin, _stack, torch_state_dict_to_numpy
    from visper_lm_tpu.models.vit import vit_forward
    from visper_lm_tpu.utils.param import layernorm

    cfg = VisionConfig(
        image_size=56, patch_size=14, hidden_size=32, num_layers=3, num_heads=2,
        mlp_dim=64, norm_eps=1e-6, hidden_act="gelu", use_pre_norm=False,
        dtype="float32",
    )
    sd = torch_state_dict_to_numpy(hf.state_dict())

    # HF Dinov2 key layout differs from the DAv2 torch hub layout; map inline here.
    d = cfg.hidden_size
    patch_w = sd["embeddings.patch_embeddings.projection.weight"]
    layers = []
    for i in range(cfg.num_layers):
        lp = f"encoder.layer.{i}."
        q = _lin(sd, lp + "attention.attention.query")
        k = _lin(sd, lp + "attention.attention.key")
        v = _lin(sd, lp + "attention.attention.value")
        layers.append({
            "norm1": _ln(sd, lp + "norm1"),
            "qkv": {
                "kernel": np.concatenate([q["kernel"], k["kernel"], v["kernel"]], axis=1),
                "bias": np.concatenate([q["bias"], k["bias"], v["bias"]]),
            },
            "proj": _lin(sd, lp + "attention.output.dense"),
            "ls1": {"gamma": sd[lp + "layer_scale1.lambda1"]},
            "norm2": _ln(sd, lp + "norm2"),
            "fc1": _lin(sd, lp + "mlp.fc1"),
            "fc2": _lin(sd, lp + "mlp.fc2"),
            "ls2": {"gamma": sd[lp + "layer_scale2.lambda1"]},
        })
    params = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(patch_w.reshape(d, -1).T),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "cls_token": sd["embeddings.cls_token"].reshape(-1),
        "pos_embed": sd["embeddings.position_embeddings"][0],
        "blocks": _stack(layers),
        "final_norm": _ln(sd, "layernorm"),
    }

    rng = np.random.default_rng(2)
    img = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)
    ref = hf(torch.tensor(img)).last_hidden_state.numpy()

    out = vit_forward(params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)), final_norm=True)
    np.testing.assert_allclose(np.array(out["last"]), ref, rtol=3e-4, atol=3e-4)


def test_dpt_head_parity_with_torch_spec():
    """Assemble the reference DPT decoder structure in torch, import, compare."""
    import torch.nn as nn

    feats, ocs, in_ch = 8, [8, 16, 32, 32], 16

    class RCU(nn.Module):
        def __init__(self, f):
            super().__init__()
            self.conv1 = nn.Conv2d(f, f, 3, 1, 1)
            self.conv2 = nn.Conv2d(f, f, 3, 1, 1)

        def forward(self, x):
            out = torch.relu(x)
            out = self.conv1(out)
            out = torch.relu(out)
            out = self.conv2(out)
            return out + x

    class Fusion(nn.Module):
        def __init__(self, f):
            super().__init__()
            self.resConfUnit1 = RCU(f)
            self.resConfUnit2 = RCU(f)
            self.out_conv = nn.Conv2d(f, f, 1)

        def forward(self, x, skip=None, size=None):
            out = x
            if skip is not None:
                out = out + self.resConfUnit1(skip)
            out = self.resConfUnit2(out)
            kw = {"scale_factor": 2} if size is None else {"size": size}
            out = F.interpolate(out, mode="bilinear", align_corners=True, **kw)
            return self.out_conv(out)

    class Scratch(nn.Module):
        def __init__(self):
            super().__init__()
            for i, oc in enumerate(ocs):
                setattr(self, f"layer{i+1}_rn", nn.Conv2d(oc, feats, 3, 1, 1, bias=False))
            for i in range(1, 5):
                setattr(self, f"refinenet{i}", Fusion(feats))
            self.output_conv1 = nn.Conv2d(feats, feats // 2, 3, 1, 1)
            self.output_conv2 = nn.Sequential(
                nn.Conv2d(feats // 2, 4, 3, 1, 1), nn.ReLU(True),
                nn.Conv2d(4, 1, 1), nn.ReLU(True), nn.Identity(),
            )

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.projects = nn.ModuleList([nn.Conv2d(in_ch, oc, 1) for oc in ocs])
            self.resize_layers = nn.ModuleList([
                nn.ConvTranspose2d(ocs[0], ocs[0], 4, 4),
                nn.ConvTranspose2d(ocs[1], ocs[1], 2, 2),
                nn.Identity(),
                nn.Conv2d(ocs[3], ocs[3], 3, 2, 1),
            ])
            self.scratch = Scratch()

        def forward(self, tokens, ph, pw):
            out = []
            for i, x in enumerate(tokens):
                x = x.permute(0, 2, 1).reshape(x.shape[0], x.shape[-1], ph, pw)
                x = self.projects[i](x)
                x = self.resize_layers[i](x)
                out.append(x)
            l1, l2, l3, l4 = out
            s = self.scratch
            r1, r2, r3, r4 = s.layer1_rn(l1), s.layer2_rn(l2), s.layer3_rn(l3), s.layer4_rn(l4)
            p4 = s.refinenet4(r4, size=r3.shape[2:])
            p3 = s.refinenet3(p4, r3, size=r2.shape[2:])
            p2 = s.refinenet2(p3, r2, size=r1.shape[2:])
            p1 = s.refinenet1(p2, r1)
            o = s.output_conv1(p1)
            o = F.interpolate(o, (ph * 14, pw * 14), mode="bilinear", align_corners=True)
            o = s.output_conv2(o)
            return torch.relu(o).squeeze(1)

    torch.manual_seed(3)
    head = Head().eval()

    from visper_lm_tpu.checkpoint.hf_import import torch_state_dict_to_numpy
    from visper_lm_tpu.models.teachers import dpt as dpt_lib

    # patch module constants for the tiny config
    old_oc, old_f = dpt_lib.OUT_CHANNELS, dpt_lib.FEATURES
    dpt_lib.OUT_CHANNELS, dpt_lib.FEATURES = tuple(ocs), feats
    try:
        params = dpt_lib.import_dpt_head(torch_state_dict_to_numpy(head.state_dict()), prefix="")
        rng = np.random.default_rng(4)
        ph = pw = 4
        tokens = [rng.normal(size=(1, ph * pw, in_ch)).astype(np.float32) for _ in range(4)]
        ref = head([torch.tensor(t) for t in tokens], ph, pw).numpy()
        got = dpt_lib.dpt_forward(params, [jnp.asarray(t) for t in tokens], ph, pw)
        np.testing.assert_allclose(np.array(got), ref, rtol=2e-4, atol=2e-4)
    finally:
        dpt_lib.OUT_CHANNELS, dpt_lib.FEATURES = old_oc, old_f


def test_swin_pair_scan_matches_unrolled():
    """The static-shift PAIR scan (depth >= 4) == per-block unrolled execution."""
    import jax
    import jax.numpy as jnp

    from visper_lm_tpu.models.teachers.swin import (
        SwinConfig,
        _rel_pos_index,
        _shift_attn_mask,
        _swin_block,
        init_swin,
        swin_forward,
    )

    cfg = SwinConfig(embed_dim=8, depths=(4,), num_heads=(2,), window_size=2)
    params = init_swin(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))

    out = swin_forward(params, cfg, images, out_stages=(0,))[0]

    # reference: run the stacked blocks one by one with explicit static shifts
    from visper_lm_tpu.utils.param import layernorm
    from visper_lm_tpu.utils.image import conv2d

    x = conv2d(params["patch_embed"], images, stride=cfg.patch_size, padding="VALID")
    x = layernorm(params["patch_norm"], x, cfg.norm_eps)
    ws = cfg.window_size
    rel_index = jnp.asarray(_rel_pos_index(ws))
    h, w = x.shape[1], x.shape[2]
    shift = ws // 2
    mask = jnp.asarray(_shift_attn_mask(h, w, ws, shift))
    for i in range(4):
        blk = jax.tree_util.tree_map(lambda a: a[i], params["stages"][0]["blocks"])
        x = _swin_block(
            blk, x, cfg.num_heads[0], ws, shift if i % 2 == 1 else 0,
            rel_index, mask, cfg.norm_eps,
        )
    ref = layernorm(params["out_norms"][0], x, cfg.norm_eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
