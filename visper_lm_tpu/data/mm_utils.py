"""Multimodal data utilities: image preprocessing modes + image-token tokenization.

Host-side (numpy/PIL) counterparts of /root/reference/ola_vlm/mm_utils.py. Pixel-level
semantics must match the reference (HF CLIP processor bicubic resize + center crop +
CLIP normalization; expand2square padding with the mean color; anyres best-resolution
tiling) because numeric drift here silently moves eval scores (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import ast
import math
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image

from visper_lm_tpu.constants import IMAGE_TOKEN_INDEX

# OpenAI CLIP normalization constants (HF CLIPImageProcessor defaults).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)
# OpenCLIP ConvNeXt-XXL normalization (timm/open_clip defaults for this model).
OPENCLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENCLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)
# ImageNet normalization (DINOv2 / Depth-Anything-v2, OneFormer).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# Core pixel ops (HF CLIPImageProcessor-compatible)
# ---------------------------------------------------------------------------


def resize_shortest_edge(image: Image.Image, size: int) -> Image.Image:
    """HF 'shortest_edge' resize with bicubic resampling."""
    w, h = image.size
    short, long = (w, h) if w <= h else (h, w)
    if short == size:
        return image
    new_short = size
    new_long = int(size * long / short)
    new_w, new_h = (new_short, new_long) if w <= h else (new_long, new_short)
    return image.resize((new_w, new_h), Image.Resampling.BICUBIC)


def center_crop(image: Image.Image, size: int) -> Image.Image:
    w, h = image.size
    left = (w - size) // 2
    top = (h - size) // 2
    return image.crop((left, top, left + size, top + size))


def normalize_image(
    image: Image.Image,
    mean: Sequence[float],
    std: Sequence[float],
) -> np.ndarray:
    """PIL RGB -> float32 (H, W, 3) normalized. NHWC (TPU-friendly layout)."""
    arr = np.asarray(image.convert("RGB"), dtype=np.float32) / 255.0
    arr = (arr - np.asarray(mean, dtype=np.float32)) / np.asarray(std, dtype=np.float32)
    return arr


def clip_preprocess(image: Image.Image, size: int = 336) -> np.ndarray:
    """HF CLIPImageProcessor pipeline: shortest-edge resize -> center crop -> normalize."""
    image = resize_shortest_edge(image, size)
    image = center_crop(image, size)
    return normalize_image(image, CLIP_IMAGE_MEAN, CLIP_IMAGE_STD)


def resize_square_preprocess(
    image: Image.Image,
    size: int,
    mean: Sequence[float] = CLIP_IMAGE_MEAN,
    std: Sequence[float] = CLIP_IMAGE_STD,
) -> np.ndarray:
    """Plain (size, size) bicubic resize + normalize (ConvNeXt tower path)."""
    image = image.convert("RGB").resize((size, size), Image.Resampling.BICUBIC)
    return normalize_image(image, mean, std)


def expand2square(image: Image.Image, background_color: Tuple[int, ...]) -> Image.Image:
    """Pad to square with the given color (reference mm_utils.py:295-306)."""
    width, height = image.size
    if width == height:
        return image
    if width > height:
        result = Image.new(image.mode, (width, width), background_color)
        result.paste(image, (0, (width - height) // 2))
        return result
    result = Image.new(image.mode, (height, height), background_color)
    result.paste(image, ((height - width) // 2, 0))
    return result


# ---------------------------------------------------------------------------
# anyres machinery (reference mm_utils.py:121-288)
# ---------------------------------------------------------------------------


def select_best_resolution(
    original_size: Tuple[int, int], possible_resolutions: List[Tuple[int, int]]
) -> Tuple[int, int]:
    """Pick the grid resolution maximizing effective resolution then minimizing waste."""
    original_width, original_height = original_size
    best_fit = None
    max_effective_resolution = 0
    min_wasted_resolution = float("inf")

    for width, height in possible_resolutions:
        scale = min(width / original_width, height / original_height)
        downscaled_width = int(original_width * scale)
        downscaled_height = int(original_height * scale)
        effective_resolution = min(
            downscaled_width * downscaled_height, original_width * original_height
        )
        wasted_resolution = width * height - effective_resolution

        if effective_resolution > max_effective_resolution or (
            effective_resolution == max_effective_resolution
            and wasted_resolution < min_wasted_resolution
        ):
            max_effective_resolution = effective_resolution
            min_wasted_resolution = wasted_resolution
            best_fit = (width, height)

    return best_fit


def resize_and_pad_image(
    image: Image.Image, target_resolution: Tuple[int, int]
) -> Image.Image:
    """Aspect-preserving resize then center-pad to target (mm_utils.py:151-183)."""
    original_width, original_height = image.size
    target_width, target_height = target_resolution

    scale_w = target_width / original_width
    scale_h = target_height / original_height

    if scale_w < scale_h:
        new_width = target_width
        new_height = min(math.ceil(original_height * scale_w), target_height)
    else:
        new_height = target_height
        new_width = min(math.ceil(original_width * scale_h), target_width)

    resized_image = image.resize((new_width, new_height))
    new_image = Image.new("RGB", (target_width, target_height), (0, 0, 0))
    paste_x = (target_width - new_width) // 2
    paste_y = (target_height - new_height) // 2
    new_image.paste(resized_image, (paste_x, paste_y))
    return new_image


def divide_to_patches(image: Image.Image, patch_size: int) -> List[Image.Image]:
    patches = []
    width, height = image.size
    for i in range(0, height, patch_size):
        for j in range(0, width, patch_size):
            patches.append(image.crop((j, i, j + patch_size, i + patch_size)))
    return patches


def get_anyres_image_grid_shape(
    image_size: Tuple[int, int],
    grid_pinpoints: Union[str, List[Tuple[int, int]]],
    patch_size: int,
) -> Tuple[int, int]:
    if isinstance(grid_pinpoints, str):
        possible_resolutions = ast.literal_eval(grid_pinpoints)
    else:
        possible_resolutions = grid_pinpoints
    width, height = select_best_resolution(image_size, possible_resolutions)
    return width // patch_size, height // patch_size


def process_anyres_image(
    image: Image.Image,
    grid_pinpoints: Union[str, List[Tuple[int, int]]],
    crop_size: int,
    shortest_edge: int,
    preprocess_fn,
) -> np.ndarray:
    """Base-resize + tiles (mm_utils.py:238-288). Returns (1 + n_tiles, H, W, 3)."""
    if isinstance(grid_pinpoints, str):
        possible_resolutions = ast.literal_eval(grid_pinpoints)
    else:
        possible_resolutions = grid_pinpoints
    best_resolution = select_best_resolution(image.size, possible_resolutions)
    image_padded = resize_and_pad_image(image, best_resolution)

    patches = divide_to_patches(image_padded, crop_size)
    image_original_resize = image.resize(
        (shortest_edge, shortest_edge), Image.Resampling.BICUBIC
    )
    image_patches = [image_original_resize] + patches
    return np.stack([preprocess_fn(p) for p in image_patches], axis=0)


def unpad_image_array(tensor: np.ndarray, original_size: Tuple[int, int]) -> np.ndarray:
    """Remove the center padding added by resize_and_pad (llava_arch.py:147-175).

    tensor: (H, W, C) feature map in spatial layout.
    """
    original_width, original_height = original_size
    current_height, current_width = tensor.shape[:2]

    original_aspect_ratio = original_width / original_height
    current_aspect_ratio = current_width / current_height

    if original_aspect_ratio > current_aspect_ratio:
        scale_factor = current_width / original_width
        new_height = int(original_height * scale_factor)
        padding = (current_height - new_height) // 2
        return tensor[padding : current_height - padding, :]
    scale_factor = current_height / original_height
    new_width = int(original_width * scale_factor)
    padding = (current_width - new_width) // 2
    return tensor[:, padding : current_width - padding]


# ---------------------------------------------------------------------------
# highres / crop_split modes (reference mm_utils.py:40-117)
# ---------------------------------------------------------------------------


def resize_and_center_crop(image: Image.Image, size: int) -> Image.Image:
    image = resize_shortest_edge(image, size)
    return center_crop(image, size)


def extract_patches(
    image: Image.Image, patch_size: int, overlap_ratio: float = 0.0
) -> List[Image.Image]:
    """Centered non-overlapping (or overlapping) patch grid (mm_utils.py:63-85)."""
    w, h = image.size
    stride = int(patch_size * (1 - overlap_ratio))
    num_y = (h - patch_size) // stride + 1
    num_x = (w - patch_size) // stride + 1
    y_start = (h - (num_y - 1) * stride - patch_size) // 2
    x_start = (w - (num_x - 1) * stride - patch_size) // 2
    patches = []
    for y in range(y_start, y_start + num_y * stride, stride):
        for x in range(x_start, x_start + num_x * stride, stride):
            patches.append(image.crop((x, y, x + patch_size, y + patch_size)))
    return patches


def process_highres_image(
    image: Image.Image,
    grid_params: Sequence[int],
    shortest_edge: int,
    preprocess_fn,
) -> np.ndarray:
    """Square-pad to max(grid_params), split into shortest_edge patches, prepend the
    base resize (mm_utils.py:99-117 — including the reference's 'always pick the
    largest grid' behavior, :108)."""
    select_size = max(grid_params)
    bg = tuple(int(x * 255) for x in CLIP_IMAGE_MEAN)
    image_padded = expand2square(image.convert("RGB"), bg).resize(
        (select_size, select_size)
    )
    image_original_resize = image.resize((shortest_edge, shortest_edge))
    patches = [image_original_resize] + extract_patches(
        image_padded, patch_size=shortest_edge, overlap_ratio=0
    )
    return np.stack([preprocess_fn(p) for p in patches], axis=0)


def process_crop_split_image(
    image: Image.Image,
    crop_resolution: int,
    split_resolution: int,
    preprocess_fn,
) -> np.ndarray:
    """resize+center-crop then non-overlapping split (mm_utils.py:88-97)."""
    image_crop = resize_and_center_crop(image.convert("RGB"), crop_resolution)
    patches = extract_patches(image_crop, patch_size=split_resolution, overlap_ratio=0)
    return np.stack([preprocess_fn(p) for p in patches], axis=0)


# ---------------------------------------------------------------------------
# process_images dispatch (reference mm_utils.py:309-333)
# ---------------------------------------------------------------------------


def process_images(
    images: List[Image.Image],
    image_aspect_ratio: str = "square",
    image_size: int = 336,
    grid_pinpoints: Optional[Union[str, List[Tuple[int, int]]]] = None,
    preprocess_fn=None,
    highres_grid: Sequence[int] = (672,),
    crop_resolution: int = 672,
    split_resolution: int = 336,
) -> Union[np.ndarray, List[np.ndarray]]:
    if preprocess_fn is None:
        preprocess_fn = lambda im: clip_preprocess(im, image_size)

    if image_aspect_ratio == "highres":
        return [
            process_highres_image(im, highres_grid, image_size, preprocess_fn)
            for im in images
        ]
    if image_aspect_ratio == "crop_split":
        return [
            process_crop_split_image(im, crop_resolution, split_resolution, preprocess_fn)
            for im in images
        ]
    if image_aspect_ratio == "pad":
        bg = tuple(int(x * 255) for x in CLIP_IMAGE_MEAN)
        out = [preprocess_fn(expand2square(im.convert("RGB"), bg)) for im in images]
        return np.stack(out, axis=0)
    if image_aspect_ratio == "anyres":
        assert grid_pinpoints is not None
        return [
            process_anyres_image(
                im.convert("RGB"), grid_pinpoints, image_size, image_size, preprocess_fn
            )
            for im in images
        ]
    # 'square' default
    return np.stack([preprocess_fn(im.convert("RGB")) for im in images], axis=0)


# ---------------------------------------------------------------------------
# Tokenization with <image> placeholders (reference mm_utils.py:336-363)
# ---------------------------------------------------------------------------


def tokenizer_image_token(
    prompt: str,
    tokenizer,
    image_token_index: int = IMAGE_TOKEN_INDEX,
) -> List[int]:
    """Split the prompt on '<image>' and insert the sentinel index between chunks.

    Matches the reference insert-separator logic including the BOS dedup: if the first
    chunk starts with BOS it is kept once at the front.
    """
    prompt_chunks = [tokenizer(chunk).input_ids for chunk in prompt.split("<image>")]

    def insert_separator(X, sep):
        return [ele for sublist in zip(X, [sep] * len(X)) for ele in sublist][:-1]

    input_ids = []
    offset = 0
    if (
        len(prompt_chunks) > 0
        and len(prompt_chunks[0]) > 0
        and prompt_chunks[0][0] == tokenizer.bos_token_id
    ):
        offset = 1
        input_ids.append(prompt_chunks[0][0])

    for x in insert_separator(prompt_chunks, [image_token_index] * (offset + 1)):
        input_ids.extend(x[offset:])

    return input_ids


class KeywordsStoppingCriteria:
    """Stop decode when any keyword string appears at the end of the generation
    (reference mm_utils.py:366-398), evaluated host-side on decoded text."""

    def __init__(self, keywords: List[str], tokenizer, input_len: int):
        self.keywords = keywords
        self.tokenizer = tokenizer
        self.input_len = input_len

    def should_stop(self, output_ids: Sequence[int]) -> bool:
        text = self.tokenizer.decode(output_ids[self.input_len :], skip_special_tokens=False)
        return any(kw in text for kw in self.keywords)
