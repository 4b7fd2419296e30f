"""unCLIP generation pipeline tests (models/genpipe).

No diffusers in this image, so parity is established structurally:
  * scheduler tables vs independently-derived closed forms,
  * importer mapping vs hand-built diffusers-layout synthetic state dicts
    (key coverage + value placement + conv kernel transposition),
  * end-to-end: a tiny pipeline renders an image tensor from a 1x(embed_dim)
    embedding — the contract demo.py:177-188 / eval_probe_task.py:222-237 need.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visper_lm_tpu.models.genpipe import (
    generate_from_embeds,
    import_genpipe,
    init_genpipe,
    tiny_genpipe_config,
)
from visper_lm_tpu.models.genpipe.clip_text import (
    clip_text_forward,
    empty_prompt_ids,
    init_clip_text,
)
from visper_lm_tpu.models.genpipe.schedulers import (
    DPMConfig,
    alphas_cumprod,
    make_dpm_step_coeffs,
    make_dpm_tables,
    scaled_linear_betas,
    squaredcos_cap_v2_betas,
)
from visper_lm_tpu.models.genpipe.unet import (
    UNetConfig,
    init_unet,
    timestep_embedding,
    unet_forward,
)
from visper_lm_tpu.models.genpipe.vae import VAEConfig, init_vae_decoder, vae_decode

# heavyweight (subprocess / AOT compile / oracle / e2e) — excluded from the
# fast default suite (pytest.ini addopts); run everything with: pytest -m ''
pytestmark = pytest.mark.slow


# ------------------------------------------------------------------ schedulers


def test_beta_schedules_match_closed_form():
    betas = scaled_linear_betas(1000)
    assert betas[0] == pytest.approx(0.00085)
    assert betas[-1] == pytest.approx(0.012)
    assert np.all(np.diff(betas) > 0)

    cos = squaredcos_cap_v2_betas(1000)
    assert np.all(cos > 0) and np.all(cos <= 0.999)
    acp = alphas_cumprod(cos)
    # cosine alpha_bar: acp[t] ~ alpha_bar((t+1)/T)/alpha_bar(~0)
    t = 500
    expected = np.cos(((t + 1) / 1000 + 0.008) / 1.008 * np.pi / 2) ** 2
    expected /= np.cos(0.008 / 1.008 * np.pi / 2) ** 2
    assert acp[t] == pytest.approx(expected, rel=1e-6)


def test_dpm_tables_shapes_and_monotonicity():
    cfg = DPMConfig()
    tables = make_dpm_tables(cfg, 25)
    assert tables.timesteps.shape == (25,)
    # diffusers linspace spacing: last timestep is round(999/25)=40; the final
    # update integrates to the t=0 marginal (diffusers' appended sigma_last)
    assert tables.timesteps[0] == 999 and tables.timesteps[-1] == 40
    assert np.all(np.diff(tables.timesteps) < 0)
    # lambda strictly increases along sampling (noise decreases)
    assert np.all(np.diff(tables.lambda_t) > 0)
    coeffs = make_dpm_step_coeffs(tables)
    assert float(coeffs["r_weight"][0]) == 0.0
    # 25 >= 15: diffusers keeps 2nd order at the final step
    assert float(coeffs["r_weight"][-1]) > 0.0
    assert float(make_dpm_step_coeffs(make_dpm_tables(cfg, 8))["r_weight"][-1]) == 0.0
    assert np.all(np.asarray(coeffs["sigma_ratio"]) > 0)


def test_dpm_sampler_recovers_x0_on_linear_model():
    """With a perfect v-prediction model for data x0, DPM-Solver++ must converge to
    x0 exactly (the update is exact when x0-prediction is constant)."""
    cfg = DPMConfig()
    tables = make_dpm_tables(cfg, 25)
    coeffs = make_dpm_step_coeffs(tables)
    x0_true = np.random.default_rng(0).normal(size=(2, 4)).astype(np.float32)
    lat = np.random.default_rng(1).normal(size=(2, 4)).astype(np.float32)

    lam, alpha, sigma = tables.lambda_t, tables.alpha_t, tables.sigma_t
    x = jnp.asarray(lat)
    x0_prev = jnp.zeros_like(x)
    for i in range(25):
        # oracle model: always predicts exactly x0_true (data prediction)
        x0 = jnp.asarray(x0_true)
        w = float(coeffs["r_weight"][i])
        d = (1 + w) * x0 - w * (x0_prev if i > 0 else x0)
        x = float(coeffs["sigma_ratio"][i]) * x + float(coeffs["alpha_coef"][i]) * d
        x0_prev = x0
    # with a constant-x0 oracle the DPM++ update is EXACT: the trajectory is
    # x(t) = alpha_t x0 + sigma_t eps0, integrated to the t=0 marginal
    eps0 = (lat - alpha[0] * x0_true) / sigma[0]
    expected = alpha[-1] * x0_true + sigma[-1] * eps0
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-4, atol=1e-4)


def test_timestep_embedding_matches_diffusers_formula():
    emb = np.asarray(timestep_embedding(jnp.asarray([3.0]), 8))
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = 3.0 * freqs
    expected = np.concatenate([np.cos(args), np.sin(args)])  # flip_sin_to_cos
    np.testing.assert_allclose(emb[0], expected, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------------ components


def test_unet_forward_shapes_and_grad_flow():
    cfg = tiny_genpipe_config()
    params = init_unet(jax.random.PRNGKey(0), cfg.unet)
    b, s = 2, cfg.unet.sample_size
    sample = jnp.ones((b, s, s, 4)) * 0.1
    ctx = jnp.ones((b, cfg.text.max_positions, cfg.unet.cross_attention_dim)) * 0.2
    cls = jnp.ones((b, cfg.unet.projection_class_embeddings_input_dim)) * 0.3
    out = unet_forward(params, cfg.unet, sample, jnp.asarray(10), ctx, cls)
    assert out.shape == (b, s, s, 4)
    assert np.all(np.isfinite(np.asarray(out)))
    # conditioning must reach the output (cross-attn + class embedding wired)
    out2 = unet_forward(params, cfg.unet, sample, jnp.asarray(10), ctx * 2, cls)
    out3 = unet_forward(params, cfg.unet, sample, jnp.asarray(10), ctx, cls * 2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    assert not np.allclose(np.asarray(out), np.asarray(out3))


def test_vae_decoder_upsamples_8x_equivalent():
    cfg = tiny_genpipe_config()
    params = init_vae_decoder(jax.random.PRNGKey(0), cfg.vae)
    lat = jnp.ones((1, 8, 8, 4)) * 0.05
    img = vae_decode(params, cfg.vae, lat)
    ups = 2 ** (len(cfg.vae.block_out_channels) - 1)
    assert img.shape == (1, 8 * ups, 8 * ups, 3)
    arr = np.asarray(img)
    assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_clip_text_causal_and_padded():
    cfg = tiny_genpipe_config()
    params = init_clip_text(jax.random.PRNGKey(0), cfg.text)
    ids = empty_prompt_ids(cfg.text)
    out = clip_text_forward(params, cfg.text, ids)
    assert out.shape == (1, cfg.text.max_positions, cfg.text.hidden_size)
    # causality: changing a later token must not affect earlier positions
    ids2 = np.asarray(ids).copy()
    ids2[0, -1] = 5
    out2 = clip_text_forward(params, cfg.text, jnp.asarray(ids2))
    np.testing.assert_allclose(
        np.asarray(out)[0, :-1], np.asarray(out2)[0, :-1], rtol=1e-5, atol=1e-6
    )
    assert not np.allclose(np.asarray(out)[0, -1], np.asarray(out2)[0, -1])


# ------------------------------------------------------------------ end-to-end


def test_generate_from_embeds_renders_image():
    """The gen-visualization contract: predicted (B, 1, D) embed -> RGB image."""
    cfg = tiny_genpipe_config()
    params = init_genpipe(jax.random.PRNGKey(0), cfg)
    embeds = jnp.ones((1, 1, cfg.embed_dim)) * 0.1  # head output rank
    imgs = generate_from_embeds(params, cfg, embeds, num_inference_steps=5, seed=3)
    ups = 2 ** (len(cfg.vae.block_out_channels) - 1)
    side = cfg.unet.sample_size * ups
    assert imgs.shape == (1, side, side, 3)
    assert np.all(np.isfinite(imgs))
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # guidance/conditioning sanity: different embeds -> different image
    imgs2 = generate_from_embeds(
        params, cfg, embeds * 5.0, num_inference_steps=5, seed=3
    )
    assert not np.allclose(imgs, imgs2)


# -------------------------------------------------------------------- importer


def _rand_sd_linear(rng, prefix, din, dout, sd, bias=True):
    sd[f"{prefix}.weight"] = rng.normal(size=(dout, din)).astype(np.float32)
    if bias:
        sd[f"{prefix}.bias"] = rng.normal(size=(dout,)).astype(np.float32)


def _rand_sd_conv(rng, prefix, cin, cout, k, sd):
    sd[f"{prefix}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32)
    sd[f"{prefix}.bias"] = rng.normal(size=(cout,)).astype(np.float32)


def _rand_sd_norm(rng, prefix, dim, sd):
    sd[f"{prefix}.weight"] = rng.normal(size=(dim,)).astype(np.float32)
    sd[f"{prefix}.bias"] = rng.normal(size=(dim,)).astype(np.float32)


def _synth_diffusers_sds(cfg):
    """Build synthetic diffusers-layout state dicts covering the tiny config."""
    rng = np.random.default_rng(0)
    u = {}
    c0, c1 = cfg.unet.block_out_channels
    temb = cfg.unet.time_embed_dim
    xdim = cfg.unet.cross_attention_dim
    _rand_sd_conv(rng, "conv_in", 4, c0, 3, u)
    _rand_sd_linear(rng, "time_embedding.linear_1", c0, temb, u)
    _rand_sd_linear(rng, "time_embedding.linear_2", temb, temb, u)
    _rand_sd_linear(
        rng, "class_embedding.linear_1",
        cfg.unet.projection_class_embeddings_input_dim, temb, u,
    )
    _rand_sd_linear(rng, "class_embedding.linear_2", temb, temb, u)

    def resnet(p, cin, cout):
        _rand_sd_norm(rng, f"{p}.norm1", cin, u)
        _rand_sd_conv(rng, f"{p}.conv1", cin, cout, 3, u)
        _rand_sd_linear(rng, f"{p}.time_emb_proj", temb, cout, u)
        _rand_sd_norm(rng, f"{p}.norm2", cout, u)
        _rand_sd_conv(rng, f"{p}.conv2", cout, cout, 3, u)
        if cin != cout:
            _rand_sd_conv(rng, f"{p}.conv_shortcut", cin, cout, 1, u)

    def xattn(p, dim):
        _rand_sd_norm(rng, f"{p}.norm", dim, u)
        _rand_sd_linear(rng, f"{p}.proj_in", dim, dim, u)
        _rand_sd_linear(rng, f"{p}.proj_out", dim, dim, u)
        tb = f"{p}.transformer_blocks.0"
        _rand_sd_norm(rng, f"{tb}.norm1", dim, u)
        for nm in ("to_q", "to_k", "to_v"):
            din = dim
            _rand_sd_linear(rng, f"{tb}.attn1.{nm}", din, dim, u, bias=False)
        _rand_sd_linear(rng, f"{tb}.attn1.to_out.0", dim, dim, u)
        _rand_sd_norm(rng, f"{tb}.norm2", dim, u)
        _rand_sd_linear(rng, f"{tb}.attn2.to_q", dim, dim, u, bias=False)
        _rand_sd_linear(rng, f"{tb}.attn2.to_k", xdim, dim, u, bias=False)
        _rand_sd_linear(rng, f"{tb}.attn2.to_v", xdim, dim, u, bias=False)
        _rand_sd_linear(rng, f"{tb}.attn2.to_out.0", dim, dim, u)
        _rand_sd_norm(rng, f"{tb}.norm3", dim, u)
        _rand_sd_linear(rng, f"{tb}.ff.net.0.proj", dim, dim * 8, u)
        _rand_sd_linear(rng, f"{tb}.ff.net.2", dim * 4, dim, u)

    # down level 0 (cross-attn) + downsample; level 1 plain
    resnet("down_blocks.0.resnets.0", c0, c0)
    xattn("down_blocks.0.attentions.0", c0)
    _rand_sd_conv(rng, "down_blocks.0.downsamplers.0.conv", c0, c0, 3, u)
    resnet("down_blocks.1.resnets.0", c0, c1)
    # mid
    resnet("mid_block.resnets.0", c1, c1)
    xattn("mid_block.attentions.0", c1)
    resnet("mid_block.resnets.1", c1, c1)
    # up_blocks.0 = deepest (level 1, no attn), 2 resnets, upsampler
    resnet("up_blocks.0.resnets.0", c1 + c1, c1)
    resnet("up_blocks.0.resnets.1", c1 + c0, c1)
    _rand_sd_conv(rng, "up_blocks.0.upsamplers.0.conv", c1, c1, 3, u)
    # up_blocks.1 = level 0 (cross-attn)
    resnet("up_blocks.1.resnets.0", c1 + c0, c0)
    xattn("up_blocks.1.attentions.0", c0)
    resnet("up_blocks.1.resnets.1", c0 + c0, c0)
    xattn("up_blocks.1.attentions.1", c0)
    _rand_sd_norm(rng, "conv_norm_out", c0, u)
    _rand_sd_conv(rng, "conv_out", c0, 4, 3, u)

    # --- vae (decoder only) ---
    v = {}
    v0, v1 = cfg.vae.block_out_channels
    _rand_sd_conv(rng, "post_quant_conv", 4, 4, 1, v)
    _rand_sd_conv(rng, "decoder.conv_in", 4, v1, 3, v)

    def vres(p, cin, cout):
        _rand_sd_norm(rng, f"{p}.norm1", cin, v)
        _rand_sd_conv(rng, f"{p}.conv1", cin, cout, 3, v)
        _rand_sd_norm(rng, f"{p}.norm2", cout, v)
        _rand_sd_conv(rng, f"{p}.conv2", cout, cout, 3, v)
        if cin != cout:
            _rand_sd_conv(rng, f"{p}.conv_shortcut", cin, cout, 1, v)

    vres("decoder.mid_block.resnets.0", v1, v1)
    _rand_sd_norm(rng, "decoder.mid_block.attentions.0.group_norm", v1, v)
    for nm in ("to_q", "to_k", "to_v", "to_out.0"):
        _rand_sd_linear(rng, f"decoder.mid_block.attentions.0.{nm}", v1, v1, v)
    vres("decoder.mid_block.resnets.1", v1, v1)
    for i in range(cfg.vae.layers_per_block + 1):
        vres(f"decoder.up_blocks.0.resnets.{i}", v1, v1)
    _rand_sd_conv(rng, "decoder.up_blocks.0.upsamplers.0.conv", v1, v1, 3, v)
    for i in range(cfg.vae.layers_per_block + 1):
        vres(f"decoder.up_blocks.1.resnets.{i}", v1 if i == 0 else v0, v0)
    _rand_sd_norm(rng, "decoder.conv_norm_out", v0, v)
    _rand_sd_conv(rng, "decoder.conv_out", v0, 3, 3, v)

    # --- text encoder ---
    t = {}
    h, mlp = cfg.text.hidden_size, cfg.text.mlp_dim
    t["text_model.embeddings.token_embedding.weight"] = rng.normal(
        size=(cfg.text.vocab_size, h)
    ).astype(np.float32)
    t["text_model.embeddings.position_embedding.weight"] = rng.normal(
        size=(cfg.text.max_positions, h)
    ).astype(np.float32)
    for i in range(cfg.text.num_layers):
        lp = f"text_model.encoder.layers.{i}"
        _rand_sd_norm(rng, f"{lp}.layer_norm1", h, t)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _rand_sd_linear(rng, f"{lp}.self_attn.{nm}", h, h, t)
        _rand_sd_norm(rng, f"{lp}.layer_norm2", h, t)
        _rand_sd_linear(rng, f"{lp}.mlp.fc1", h, mlp, t)
        _rand_sd_linear(rng, f"{lp}.mlp.fc2", mlp, h, t)
    _rand_sd_norm(rng, "text_model.final_layer_norm", h, t)

    n = {
        "mean": rng.normal(size=(1, cfg.embed_dim)).astype(np.float32),
        "std": (np.abs(rng.normal(size=(1, cfg.embed_dim))) + 0.5).astype(np.float32),
    }
    return u, v, t, n


def test_import_genpipe_roundtrip_and_forward():
    cfg = tiny_genpipe_config()
    unet_sd, vae_sd, text_sd, norm_sd = _synth_diffusers_sds(cfg)
    params = import_genpipe(
        cfg, unet_sd=unet_sd, vae_sd=vae_sd, text_sd=text_sd, normalizer_sd=norm_sd
    )
    # conv kernels transposed OIHW->HWIO
    np.testing.assert_allclose(
        np.asarray(params["unet"]["conv_in"]["kernel"]),
        unet_sd["conv_in.weight"].transpose(2, 3, 1, 0),
    )
    # linear transposed (out,in)->(in,out)
    np.testing.assert_allclose(
        np.asarray(params["unet"]["time_embedding"]["linear_1"]["kernel"]),
        unet_sd["time_embedding.linear_1.weight"].T,
    )
    # the imported tree runs end to end with finite output
    imgs = generate_from_embeds(
        params, cfg, np.full((1, cfg.embed_dim), 0.2, np.float32),
        num_inference_steps=4,
    )
    assert np.all(np.isfinite(imgs))
    # structural match with random init (same treedef & shapes)
    ref = init_genpipe(jax.random.PRNGKey(0), cfg)
    ref_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), ref)
    imp_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), params)
    assert jax.tree_util.tree_structure(ref_shapes) == jax.tree_util.tree_structure(
        imp_shapes
    )
    assert jax.tree_util.tree_leaves(ref_shapes) == jax.tree_util.tree_leaves(
        imp_shapes
    )


def test_demo_gen_visualization_end_to_end(tmp_path):
    """demo.visualize_interpretations renders a gen PNG from the predicted
    embedding through the tiny unCLIP pipe (reference demo.py:177-188 path)."""
    import os

    from PIL import Image

    from visper_lm_tpu.api import VisperModel
    from visper_lm_tpu.config import tiny_test_vlm
    from visper_lm_tpu.demo import visualize_interpretations
    from visper_lm_tpu.models.vlm import init_vlm

    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_api import FakeTok

    vlm_cfg = tiny_test_vlm(distill=True)
    # the tiny VLM's gen head must emit embed_dim-sized embeddings for the tiny pipe
    pipe_cfg = tiny_genpipe_config()
    gen_dim = next(t for t in vlm_cfg.distill.tasks if t.task == "gen").head.output_dim
    assert gen_dim > 0
    model = VisperModel(
        cfg=vlm_cfg,
        params=init_vlm(jax.random.PRNGKey(0), vlm_cfg),
        tokenizer=FakeTok(),
        context_len=256,
    )
    # adapt: tiny pipe consumes whatever the head emits by matching embed_dim
    import dataclasses as dc

    pipe_cfg = dc.replace(
        pipe_cfg,
        embed_dim=gen_dim,
        unet=dc.replace(pipe_cfg.unet, projection_class_embeddings_input_dim=2 * gen_dim),
    )
    pipe_params = init_genpipe(jax.random.PRNGKey(1), pipe_cfg)
    img = Image.new("RGB", (32, 32), (10, 200, 30))
    manifest = visualize_interpretations(
        model, "describe", img, str(tmp_path),
        genpipe={"params": pipe_params, "cfg": pipe_cfg, "num_inference_steps": 3},
    )
    pngs = [v for k, v in manifest.items() if k.startswith("gen/") and v.endswith(".png")]
    assert pngs, manifest
    rendered = Image.open(pngs[0])
    ups = 2 ** (len(pipe_cfg.vae.block_out_channels) - 1)
    assert rendered.size == (pipe_cfg.unet.sample_size * ups,) * 2
