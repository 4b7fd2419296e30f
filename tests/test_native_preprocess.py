"""Native preprocessing library: parity vs torch antialiased resize + PIL padding."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from visper_lm_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def test_resize_normalize_matches_torch_antialias():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(123, 201, 3), dtype=np.uint8)
    mean, std = (0.48, 0.45, 0.4), (0.26, 0.26, 0.27)
    for mode, tmode in ((native.BILINEAR, "bilinear"), (native.BICUBIC, "bicubic")):
        for size in (336, 64):
            out = native.resize_normalize(img, size, mean, std, mode)
            t = torch.tensor(img.transpose(2, 0, 1)[None], dtype=torch.float32)
            ref = F.interpolate(
                t, size=(size, size), mode=tmode, antialias=True, align_corners=False
            ).clamp(0, 255)[0].numpy().transpose(1, 2, 0)
            ref = (ref / 255.0 - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
            np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_resize_close_to_pil():
    """PIL uses int16 fixed-point weights; agreement is within a few uint8 steps."""
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    out = native.resize_normalize(img, 336, (0, 0, 0), (1, 1, 1), native.BILINEAR)
    ref = np.asarray(
        Image.fromarray(img).resize((336, 336), Image.Resampling.BILINEAR), np.float32
    ) / 255.0
    assert np.abs(out - ref).max() < 0.03


def test_expand2square_matches_pil_path():
    from visper_lm_tpu.data.mm_utils import expand2square
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(30, 50, 3), dtype=np.uint8)
    got = native.expand2square(img, (7, 8, 9))
    ref = np.asarray(expand2square(Image.fromarray(img), (7, 8, 9)))
    np.testing.assert_array_equal(got, ref)
