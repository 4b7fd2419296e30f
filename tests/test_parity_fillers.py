"""Tests for the small parity components: silog, S2 tower, attention pool,
panoptic->semantic conversion, COCO probe records."""

import json

import numpy as np
import torch

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import VisionConfig


def test_silog_matches_torch_spec():
    from visper_lm_tpu.train.losses import silog_loss

    rng = np.random.default_rng(0)
    est = np.abs(rng.normal(size=(4, 8))) + 0.1
    gt = np.abs(rng.normal(size=(4, 8)))
    gt[0, :4] = 0.0  # masked-out entries

    te, tg = torch.tensor(est), torch.tensor(gt)
    mask = tg > 0
    d = torch.log(te[mask]) - torch.log(tg[mask])
    ref = torch.sqrt((d ** 2).mean() - 0.5 * d.mean() ** 2)

    got = silog_loss(jnp.asarray(est), jnp.asarray(gt))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    assert float(silog_loss(jnp.asarray(est), jnp.zeros_like(jnp.asarray(gt)))) == 0.0


def test_s2_tower_shapes():
    from visper_lm_tpu.models.vit import clip_tower_features, clip_tower_features_s2, init_vit

    cfg = VisionConfig(
        image_size=28, patch_size=14, hidden_size=16, num_layers=2, num_heads=2,
        mlp_dim=32, select_layer=-2, dtype="float32",
    )
    params = init_vit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 56, 56, 3)), jnp.float32)  # largest scale 2x
    out = clip_tower_features_s2(params, cfg, img, scales=(28, 56))
    assert out.shape == (2, cfg.num_patches, 2 * cfg.hidden_size)

    # the base-scale half equals the plain tower on the (bicubic, s2wrapper
    # semantics) downscaled image
    from visper_lm_tpu.utils.image import resize_bicubic

    base = clip_tower_features(params, cfg, resize_bicubic(img, (28, 28)))
    np.testing.assert_allclose(np.array(out[..., :16]), np.array(base), atol=1e-5)


def test_attention_pool2d():
    from visper_lm_tpu.models.resampler import attention_pool2d, init_attention_pool2d

    p = init_attention_pool2d(jax.random.PRNGKey(0), seq_len=9, embed_dim=16, output_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 16))
    pooled = attention_pool2d(p, x, num_heads=2)
    assert pooled.shape == (2, 8)
    all_tok = attention_pool2d(p, x, num_heads=2, return_all_tokens=True)
    assert all_tok.shape == (2, 10, 8)
    np.testing.assert_allclose(np.array(all_tok[:, 0]), np.array(pooled), rtol=1e-6)


def test_panoptic_to_semantic():
    from visper_lm_tpu.eval.pan_to_sem import build_category_train_ids, panoptic_to_semantic, rgb2id

    pan = np.zeros((4, 4, 3), dtype=np.uint8)
    pan[:2] = [5, 0, 0]          # id 5
    pan[2:] = [0, 1, 0]          # id 256
    assert rgb2id(pan)[0, 0] == 5 and rgb2id(pan)[3, 0] == 256

    cats = [{"id": 10}, {"id": 20}]
    train_ids = build_category_train_ids(cats)
    segments = [{"id": 5, "category_id": 20}, {"id": 256, "category_id": 99}]
    sem = panoptic_to_semantic(pan, segments, train_ids)
    assert (sem[:2] == 1).all()          # cat 20 -> train id 1
    assert (sem[2:] == 255).all()        # unknown category -> ignore


def test_coco_probe_records(tmp_path):
    from visper_lm_tpu.data.dataset import prepare_coco_probe_records

    coco = {
        "images": [{"id": 1, "file_name": "a.jpg"}, {"id": 2, "file_name": "b.jpg"}],
        "annotations": [
            {"image_id": 1, "caption": "x"},
            {"image_id": 1, "caption": "y"},
            {"image_id": 2, "caption": "z"},
        ],
    }
    path = tmp_path / "captions.json"
    json.dump(coco, open(path, "w"))
    recs = prepare_coco_probe_records(str(path))
    assert len(recs) == 2  # deduped by image
    assert recs[0]["image"] == "train2017/a.jpg"
    assert "<image>" in recs[0]["conversations"][0]["value"]
