"""Native-vs-PIL parity of the teacher pixel pipelines (training-side targets).

The native fused resize+normalize deviates from PIL only by PIL's int16
fixed-point kernel quantization (plus bicubic-overshoot clamping at hard
edges); on uint8 noise — the worst case — the mean deviation stays under 2% of
a normalized std unit. Eval pixel paths stay PIL-exact (see
teacher_batch_from_pil docstring).
"""

import numpy as np
import pytest
from PIL import Image

from visper_lm_tpu import native
from visper_lm_tpu.config import phi3_clip_vlm
from visper_lm_tpu.models.teachers import teacher_batch_from_pil

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def test_teacher_batch_native_matches_pil_within_kernel_tolerance():
    cfg = phi3_clip_vlm(distill=True)
    rng = np.random.default_rng(0)
    pils = [
        Image.fromarray(rng.integers(0, 255, size=(640, 480, 3), dtype=np.uint8))
        for _ in range(2)
    ]

    fast = teacher_batch_from_pil(cfg, pils)
    orig = native.available
    native.available = lambda: False
    try:
        ref = teacher_batch_from_pil(cfg, pils)
    finally:
        native.available = orig

    assert set(fast) == {"depth_images", "gen_images", "seg_images"}
    for k in fast:
        assert fast[k].shape == ref[k].shape, k
        diff = np.abs(fast[k] - ref[k])
        assert float(diff.mean()) < 0.02, (k, diff.mean())
        assert float(diff.max()) < 0.5, (k, diff.max())
