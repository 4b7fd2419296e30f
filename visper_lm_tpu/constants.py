"""Model-level constants shared across the framework.

Parity with the reference constant set (/root/reference/ola_vlm/constants.py:7-13);
values must match exactly because they are baked into tokenized datasets and
checkpoint-embedded configs.
"""

IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"
IMAGE_PLACEHOLDER = "<image-placeholder>"

# Number of system-prompt tokens preceding the image span in the PT-stage
# prompt layout, per base LLM family (reference: ola_llama.py:65-68, ola_phi3.py:68).
NUM_SYS_TOKENS = {
    "llama3": 38,
    "vicuna": 26,
    "phi3": 13,
}

# CLIP-ViT-L/14 @ 336px produces 24x24 = 576 patch tokens; the ConvNeXt-XXL
# tower at res 768 is flattened to the same 576 positions (reference:
# clip_encoder.py:84-90, clip_convnext_encoder.py:150-174).
NUM_IMAGE_TOKENS = 576

# Token-type codes used by the static-shape multimodal splice plan
# (see visper_lm_tpu/models/vlm.py). These are a TPU-native design choice,
# not a reference concept.
SEG_PAD = 0
SEG_TEXT = 1
SEG_IMAGE = 2
SEG_TASK = 3
