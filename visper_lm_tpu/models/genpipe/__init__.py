"""unCLIP image-synthesis pipeline (SD-2.1-unclip) — TPU-native JAX port.

The reference uses diffusers' StableUnCLIPImg2ImgPipeline to turn a predicted
1x1024 CLIP-H image embedding into pixels, for three call sites:
  * demo gen visualization          (/root/reference/demo.py:177-188)
  * training-time gen image logging (base_ola_vlm.py:171-193)
  * probe-task gen eval             (ola_vlm/eval/eval_probe_task.py:222-237)
all with `pipe(image_embeds=emb, num_inference_steps=25)` and the scheduler
swapped to DPMSolverMultistepScheduler (demo.py:145-147).

This package reimplements the inference graph TPU-first: NHWC convs, einsum
attention, static shapes, and the whole denoising loop as one `lax.scan` over
precomputed DPM-Solver++ coefficient tables — one compiled program end-to-end.

Components (mirroring the diffusers model zoo the pipeline composes):
  clip_text.py   — OpenCLIP-ViT-H text encoder (empty-prompt conditioning + CFG)
  unet.py        — UNet2DConditionModel (SD-2.1-unclip config: class_embed_type
                   'projection' carrying [image_embeds | noise-level embedding])
  vae.py         — AutoencoderKL decoder (latents -> 768x768 RGB)
  schedulers.py  — DDPM noise augmentation + DPM-Solver++(2M) sampler
  pipeline.py    — generate_from_embeds() driver + random init + importer glue
"""

from visper_lm_tpu.models.genpipe.pipeline import (  # noqa: F401
    GenPipeConfig,
    SD21_UNCLIP,
    generate_from_embeds,
    genpipe_config_from_dict,
    genpipe_config_to_dict,
    import_genpipe,
    init_genpipe,
    tiny_genpipe_config,
)
