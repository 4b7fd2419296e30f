"""Pack visualization-decoder weights into the demo's teachers-dir bundles.

The reference demo loads three teacher decoders from HF/torch checkpoints at
startup (/root/reference/demo.py:104-147). Here the conversion runs ONCE and
the demo consumes small self-describing bundles (demo.load_viz_decoders):

    python -m visper_lm_tpu.checkpoint.teacher_bundles \
        --dav2 depth_anything_v2_vitl.pth \
        --oneformer shi-labs/oneformer_coco_swin_large_dir \
        --genpipe stable-diffusion-2-1-unclip_dir \
        --out ckpts/teachers

Produces: dav2_head.npz | oneformer/{config.json,*.safetensors} (copied
through, loaded directly by the demo) or oneformer.npz+json | genpipe.npz+json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Optional


def pack_dav2(src: str, out_dir: str) -> str:
    """DAv2 torch checkpoint (.pth with depth_head.*) or an OLA HF checkpoint
    dir (da_v2_head.depth_head.*) -> <out>/dav2_head.npz."""
    from visper_lm_tpu.models.teachers.dpt import import_dpt_head
    from visper_lm_tpu.utils.param import save_params_npz

    if os.path.isdir(src):
        from visper_lm_tpu.checkpoint.hf_import import load_sharded_safetensors

        sd = load_sharded_safetensors(src)
        prefix = next(
            (
                c
                for c in ("da_v2_head.depth_head.", "model.da_v2_head.depth_head.",
                          "depth_head.")
                if any(k.startswith(c) for k in sd)
            ),
            None,
        )
        assert prefix, f"no DPT-head keys found in {src}"
    else:
        import torch

        obj = torch.load(src, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in obj.items()}
        prefix = "depth_head."
    params = import_dpt_head(sd, prefix=prefix)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "dav2_head.npz")
    save_params_npz(path, params)
    return path


def pack_oneformer(src_dir: str, out_dir: str, image_size: int = 768) -> str:
    """HF OneFormer checkpoint dir -> <out>/oneformer.npz + oneformer.json
    (pre-imported bundle; the demo also reads raw HF dirs directly)."""
    from visper_lm_tpu.checkpoint.hf_import import load_sharded_safetensors
    from visper_lm_tpu.models.teachers.oneformer import (
        configs_from_hf,
        import_oneformer_decoder,
    )
    from visper_lm_tpu.models.teachers.swin import import_swin_backbone
    from visper_lm_tpu.utils.param import save_params_npz

    hf_cfg = json.load(open(os.path.join(src_dir, "config.json")))
    dec_cfg, swin_cfg = configs_from_hf(hf_cfg)
    sd = load_sharded_safetensors(src_dir)
    sd = {k[len("model."):] if k.startswith("model.") else k: v for k, v in sd.items()}
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "oneformer.npz")
    save_params_npz(
        path,
        {
            "dec": import_oneformer_decoder(sd, dec_cfg),
            "swin": import_swin_backbone(
                sd, swin_cfg, prefix="pixel_level_module.encoder."
            ),
        },
    )
    with open(os.path.join(out_dir, "oneformer.json"), "w") as f:
        json.dump(
            {
                "decoder": dataclasses.asdict(dec_cfg),
                "swin": dataclasses.asdict(swin_cfg),
                "image_size": image_size,
            },
            f,
        )
    return path


def pack_genpipe(src_dir: str, out_dir: str, cfg=None,
                 num_inference_steps: int = 25) -> str:
    """diffusers stable-diffusion-2-1-unclip checkout (unet/ vae/ text_encoder/
    image_normalizer/ with safetensors) -> <out>/genpipe.npz + genpipe.json."""
    from visper_lm_tpu.checkpoint.hf_import import load_sharded_safetensors
    from visper_lm_tpu.models.genpipe import (
        SD21_UNCLIP,
        genpipe_config_to_dict,
        import_genpipe,
    )
    from visper_lm_tpu.utils.param import save_params_npz

    cfg = cfg or SD21_UNCLIP
    params = import_genpipe(
        cfg,
        unet_sd=load_sharded_safetensors(os.path.join(src_dir, "unet")),
        vae_sd=load_sharded_safetensors(os.path.join(src_dir, "vae")),
        text_sd=load_sharded_safetensors(os.path.join(src_dir, "text_encoder")),
        normalizer_sd=load_sharded_safetensors(
            os.path.join(src_dir, "image_normalizer")
        ),
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "genpipe.npz")
    save_params_npz(path, params)
    d = genpipe_config_to_dict(cfg)
    d["num_inference_steps"] = num_inference_steps
    with open(os.path.join(out_dir, "genpipe.json"), "w") as f:
        json.dump(d, f)
    return path


def main(argv: Optional[list] = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dav2", default=None, help=".pth or OLA checkpoint dir")
    p.add_argument("--oneformer", default=None, help="HF OneFormer dir")
    p.add_argument("--genpipe", default=None, help="diffusers sd-2-1-unclip dir")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    if args.dav2:
        print("dav2:", pack_dav2(args.dav2, args.out))
    if args.oneformer:
        print("oneformer:", pack_oneformer(args.oneformer, args.out))
    if args.genpipe:
        print("genpipe:", pack_genpipe(args.genpipe, args.out))


if __name__ == "__main__":
    main()
