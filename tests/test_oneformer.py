"""OneFormer mask-decoding parity vs HF OneFormerForUniversalSegmentation (random
tiny config): pixel decoder (deformable attention + FPN), query transformer,
masked-attention decoder, prediction heads, task MLP — end to end."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers import OneFormerConfig, SwinConfig as HFSwinConfig
    from transformers.models.oneformer.modeling_oneformer import (
        OneFormerForUniversalSegmentation,
    )

    backbone = HFSwinConfig(
        image_size=64, patch_size=4, embed_dim=8, depths=[1, 1, 1, 1],
        num_heads=[1, 2, 2, 4], window_size=2, drop_path_rate=0.0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    cfg = OneFormerConfig(
        backbone_config=backbone,
        conv_dim=32, mask_dim=32, hidden_dim=32,
        encoder_feedforward_dim=48, dim_feedforward=48,
        num_queries=6, encoder_layers=2, decoder_layers=3,
        num_attention_heads=4, dropout=0.0,
        task_seq_len=77, text_encoder_n_ctx=16, max_seq_len=77,
        use_auxiliary_loss=False,
        num_labels=9,
    )
    torch.manual_seed(0)
    hf = OneFormerForUniversalSegmentation(cfg).eval()
    # the model is in inference mode -> text encoder unused

    from visper_lm_tpu.checkpoint.hf_import import torch_state_dict_to_numpy
    from visper_lm_tpu.models.teachers.oneformer import (
        OneFormerDecoderConfig,
        import_oneformer_decoder,
    )
    from visper_lm_tpu.models.teachers.swin import SwinConfig, import_swin_backbone

    sd = torch_state_dict_to_numpy(hf.state_dict())
    sd = {k[len("model."):] if k.startswith("model.") else k: v for k, v in sd.items()}

    our_cfg = OneFormerDecoderConfig(
        d_model=32, encoder_layers=2, decoder_layers=3, query_dec_layers=2,
        dim_feedforward=48, num_heads=4, num_queries=6, num_classes=9,
        num_feature_levels=3, num_points=4, backbone_dims=(8, 16, 32, 64),
    )
    swin_cfg = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 4),
                          window_size=2)
    swin_params = import_swin_backbone(sd, swin_cfg, prefix="pixel_level_module.encoder.")
    dec_params = import_oneformer_decoder(sd, our_cfg)
    return hf, our_cfg, swin_cfg, swin_params, dec_params


@pytest.mark.slow
def test_oneformer_mask_decoding_parity(hf_and_ours):
    hf, our_cfg, swin_cfg, swin_params, dec_params = hf_and_ours
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    task = rng.integers(0, 100, size=(2, 77)).astype(np.float32)

    with torch.no_grad():
        out = hf(
            pixel_values=torch.tensor(img),
            task_inputs=torch.tensor(task),
        )
    ref_class = out.class_queries_logits.numpy()
    ref_masks = out.masks_queries_logits.numpy()

    from visper_lm_tpu.models.teachers.oneformer import get_masks

    got = get_masks(
        dec_params, our_cfg, swin_params, swin_cfg,
        jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(task),
    )
    np.testing.assert_allclose(
        np.array(got["class_queries_logits"]), ref_class, rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.array(got["masks_queries_logits"]), ref_masks, rtol=2e-3, atol=3e-3
    )


def test_semantic_postprocess_matches_torch_formula():
    """HF post_process_semantic_segmentation formula (the processor class itself
    needs a class_info_file download, so the 6-line formula is inlined in torch):
    softmax classes (drop null) x sigmoid masks -> argmax."""
    import torch.nn.functional as F

    from visper_lm_tpu.models.teachers.oneformer import semantic_segmentation

    rng = np.random.default_rng(1)
    classes = rng.normal(size=(1, 6, 10)).astype(np.float32)   # 9 classes + null
    masks = rng.normal(size=(1, 6, 16, 16)).astype(np.float32)

    mq = F.interpolate(torch.tensor(masks), size=(32, 32), mode="bilinear",
                       align_corners=False)
    cls = torch.tensor(classes).softmax(dim=-1)[..., :-1]
    seg = torch.einsum("bqc,bqhw->bchw", cls, mq.sigmoid())
    ref = seg.argmax(dim=1)[0]

    got = semantic_segmentation(jnp.asarray(classes), jnp.asarray(masks), (32, 32))[0]
    agree = (np.array(got) == ref.numpy()).mean()
    assert agree > 0.99, agree
