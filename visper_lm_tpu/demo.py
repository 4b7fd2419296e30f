"""Interactive demo: chat + intermediate-representation visualization.

Re-design of the reference Gradio demo (/root/reference/demo.py): the same two
capabilities — streamed chat over an image, and "visualize" which decodes the
intermediate LLM representations through the teachers' decoders
(demo.py:177-229) — exposed as a CLI REPL (gradio is optional and gated: the
environment here has no gradio; `--serve` uses it when installed).

Visualization paths:
  * depth: predicted depth embeddings -> frozen DPT decoder -> colormapped PNG
    (demo.py:190-207);
  * seg / gen: predicted embeddings are saved as .npy (full OneFormer mask decoding
    and unCLIP image synthesis are teacher-decoder ports tracked for the eval/viz
    round; the embeddings themselves are checkpoint-parity outputs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def visualize_interpretations(model, question: str, image, out_dir: str,
                              dpt_params=None, oneformer=None, genpipe=None) -> dict:
    """Run get_visual_interpretations and render what we can to disk.

    oneformer: optional dict with keys dec_params, cfg, swin_params, swin_cfg,
    task_inputs — enables real mask decoding through the predicted seg embedding
    (reference demo.py:209-229 backbone-feature substitution).
    genpipe: optional dict with keys params, cfg (models/genpipe) — enables
    rendering the predicted gen embedding to pixels through the unCLIP diffusion
    pipeline (reference demo.py:177-188, 25-step DPM-Solver).
    """
    os.makedirs(out_dir, exist_ok=True)
    interp = model.get_visual_interpretations(question, image)
    manifest = {}
    for task, layers in interp.items():
        for layer, emb in layers.items():
            base = os.path.join(out_dir, f"{task}_layer{layer + 1}")
            np.save(base + ".npy", emb)
            manifest[f"{task}/{layer + 1}"] = base + ".npy"
            if task == "depth" and dpt_params is not None:
                import jax.numpy as jnp

                from visper_lm_tpu.models.teachers.dpt import normalized_depth

                feats = [jnp.asarray(emb)] * 4  # use_intermediate_depth=False path
                depth = np.asarray(normalized_depth(dpt_params, feats))[0]
                _save_colormap(depth, base + ".png")
                manifest[f"{task}/{layer + 1}_png"] = base + ".png"
            if task == "seg" and oneformer is not None:
                import jax.numpy as jnp

                from visper_lm_tpu.models.teachers.dinov2 import IMAGENET_MEAN, IMAGENET_STD
                from visper_lm_tpu.models.teachers.oneformer import (
                    get_masks,
                    semantic_segmentation,
                )

                side = int(emb.shape[1] ** 0.5)
                pred_map = jnp.asarray(emb).reshape(1, side, side, -1)
                pixels = np.asarray(
                    image.resize((768, 768)), dtype=np.float32
                )[None] / 255.0
                pixels = (pixels - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
                out = get_masks(
                    oneformer["dec_params"], oneformer["cfg"],
                    oneformer["swin_params"], oneformer["swin_cfg"],
                    jnp.asarray(pixels, jnp.float32), oneformer["task_inputs"],
                    backbone_last_feature=pred_map,
                )
                sem = np.asarray(
                    semantic_segmentation(
                        out["class_queries_logits"], out["masks_queries_logits"],
                        (image.size[1], image.size[0]),
                    )
                )[0]
                _save_colormap(sem / max(sem.max(), 1), base + "_sem.png")
                manifest[f"{task}/{layer + 1}_sem"] = base + "_sem.png"
            if task == "gen" and genpipe is not None:
                from PIL import Image

                from visper_lm_tpu.models.genpipe import generate_from_embeds

                steps = genpipe.get("num_inference_steps", 25)
                imgs = generate_from_embeds(
                    genpipe["params"], genpipe["cfg"],
                    np.asarray(emb).reshape(1, -1),
                    num_inference_steps=steps,
                )
                Image.fromarray(
                    (imgs[0] * 255).astype(np.uint8)
                ).save(base + ".png")
                manifest[f"{task}/{layer + 1}_png"] = base + ".png"
    return manifest


def _save_colormap(depth01: np.ndarray, path: str) -> None:
    """Grayscale-to-inferno-ish colormap without matplotlib."""
    from PIL import Image

    x = np.clip(depth01, 0, 1)
    r = np.clip(1.5 * x, 0, 1)
    g = np.clip(1.5 * (x - 0.33), 0, 1)
    b = np.clip(1.5 * (x - 0.66), 0, 1)
    rgb = (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)
    Image.fromarray(rgb).save(path)


def repl(model, image_path: str, out_dir: str = "demo_out") -> None:
    from PIL import Image

    image = Image.open(image_path).convert("RGB")
    print(f"Loaded {image_path}. Commands: /viz <question>, /quit, or just chat.")
    while True:
        try:
            line = input("user> ").strip()
        except EOFError:
            return
        if not line:
            continue
        if line == "/quit":
            return
        if line.startswith("/viz"):
            q = line[4:].strip() or "Describe the image."
            manifest = visualize_interpretations(model, q, image, out_dir)
            print(json.dumps(manifest, indent=2))
            continue
        out = model.chat([line], [image], max_new_tokens=256)
        print("assistant>", out[0])


def serve(model, port: int = 7860, out_dir: str = "demo_out") -> None:
    """Gradio web UI (reference demo.py:236-332): image upload + chat + a
    "Visualize" button that renders the intermediate-representation decodes.

    gradio is an optional dependency; the CLI REPL covers the same capabilities
    without it."""
    try:
        import gradio as gr
    except ImportError as e:
        raise SystemExit(
            "--serve needs gradio, which is not installed in this environment. "
            "Use the CLI REPL (omit --serve), or `pip install gradio` where allowed."
        ) from e

    def _chat(message, history, image):
        if image is None:
            return "Please upload an image first."
        return model.chat([message], [image], max_new_tokens=256)[0]

    def _viz(question, image):
        if image is None:
            return {}
        return visualize_interpretations(
            model, question or "Describe the image.", image, out_dir
        )

    with gr.Blocks(title="VisPer-LM TPU demo") as ui:
        image = gr.Image(type="pil", label="image")
        chat = gr.ChatInterface(fn=lambda m, h: _chat(m, h, image.value))
        question = gr.Textbox(label="viz question", value="Describe the image.")
        viz_btn = gr.Button("Visualize intermediate representations")
        manifest = gr.JSON(label="rendered artifacts")
        viz_btn.click(_viz, inputs=[question, image], outputs=[manifest])
        _ = chat
    ui.launch(server_port=port)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-path", required=True, help="HF or orbax checkpoint dir")
    parser.add_argument("--tokenizer", default=None, help="tokenizer path (HF)")
    parser.add_argument("--image", default=None)
    parser.add_argument("--question", default=None, help="one-shot question (no REPL)")
    parser.add_argument("--viz", action="store_true", help="also dump interpretations")
    parser.add_argument("--out-dir", default="demo_out")
    parser.add_argument("--serve", action="store_true", help="gradio web UI (optional)")
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args()

    from transformers import AutoTokenizer

    from visper_lm_tpu.api import VisperModel

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer or args.model_path)
    if os.path.isdir(os.path.join(args.model_path, "checkpoints")) or os.path.exists(
        os.path.join(args.model_path, "_CHECKPOINT_METADATA")
    ):
        model = VisperModel.from_orbax(args.model_path, tokenizer=tokenizer)
    else:
        model = VisperModel.from_hf_checkpoint(args.model_path, tokenizer=tokenizer)

    if args.serve:
        serve(model, port=args.port, out_dir=args.out_dir)
    elif args.question:
        from PIL import Image

        if args.image is None:
            parser.error("--question needs --image")
        image = Image.open(args.image).convert("RGB")
        print(model.chat([args.question], [image])[0])
        if args.viz:
            manifest = visualize_interpretations(model, args.question, image, args.out_dir)
            print(json.dumps(manifest, indent=2))
    else:
        if args.image is None:
            parser.error("the REPL needs --image")
        repl(model, args.image, args.out_dir)


if __name__ == "__main__":
    main()
