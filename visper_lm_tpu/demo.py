"""Interactive demo: streamed chat + intermediate-representation visualization.

Re-design of the reference Gradio demo (/root/reference/demo.py): the same two
capabilities — streamed chat over an image (demo.py:286-350), and "visualize",
which decodes the intermediate LLM representations through the teachers'
decoders (demo.py:177-229) — exposed as a CLI REPL (gradio is optional and
gated: `--serve` uses it when installed).

Out-of-box visualization (all three tasks render to PNG, like the reference):
  * depth: predicted embedding -> the head's intermediate-feature pyramid ->
    frozen DPT decoder -> colormapped PNG (reference base_ola_vlm.py:462-470 —
    intermediate MLP outputs when the head has them, else [emb]*4);
  * seg: predicted embedding substituted for the OneFormer backbone's last
    feature -> full mask decoding -> semantic map PNG (demo.py:209-229);
  * gen: predicted CLIP image embedding -> unCLIP diffusion pipe -> PNG
    (demo.py:177-188).

Decoder weights are auto-discovered by `load_viz_decoders`:
  * DPT: `da_v2_head.depth_head.*` keys inside the model checkpoint itself
    (reference PT checkpoints embed the frozen decoder) or
    `<teachers>/dav2_head.npz`;
  * OneFormer: `<teachers>/oneformer/` HF checkpoint dir (config.json +
    safetensors) or `<teachers>/oneformer.npz` + `oneformer.json`;
  * genpipe: `<teachers>/genpipe.npz` + `genpipe.json` (convert a diffusers
    stable-diffusion-2-1-unclip checkout once via
    models.genpipe.import_genpipe + utils.param.save_params_npz).
Missing decoders degrade per-task to .npy embedding dumps with a notice.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def load_viz_decoders(model, model_dir=None, teachers_dir=None, quiet=False):
    """Discover and load the three visualization decoders (see module doc).

    Returns dict with any of: dpt_params, dpt_head_params (per tapped depth
    layer, for the intermediate pyramid), oneformer, genpipe.
    """
    out = {}

    def note(msg):
        if not quiet:
            print(f"[viz] {msg}", file=sys.stderr)

    # ---- depth: frozen DPT decoder -------------------------------------
    dpt = None
    if model_dir and os.path.isdir(model_dir):
        try:
            import glob as _glob

            if _glob.glob(os.path.join(model_dir, "*.safetensors")):
                from visper_lm_tpu.checkpoint.hf_import import (
                    load_sharded_safetensors,
                )
                from visper_lm_tpu.models.teachers.dpt import import_dpt_head

                sd = load_sharded_safetensors(model_dir)
                prefix = None
                for cand in ("da_v2_head.depth_head.", "model.da_v2_head.depth_head."):
                    if any(k.startswith(cand) for k in sd):
                        prefix = cand
                        break
                if prefix:
                    dpt = import_dpt_head(sd, prefix=prefix)
                    note("depth: DPT decoder loaded from the model checkpoint")
        except Exception as e:  # noqa: BLE001 - degrade to .npy dumps
            note(f"depth: checkpoint scan failed ({e})")
    if dpt is None and teachers_dir:
        npz = os.path.join(teachers_dir, "dav2_head.npz")
        if os.path.exists(npz):
            from visper_lm_tpu.utils.param import load_params_npz

            dpt = load_params_npz(npz)
            note("depth: DPT decoder loaded from teachers dir")
    if dpt is not None:
        out["dpt_params"] = dpt
    else:
        note("depth: no DPT decoder found -> .npy only")

    # ---- seg: OneFormer decoder + Swin backbone ------------------------
    if teachers_dir:
        of_dir = os.path.join(teachers_dir, "oneformer")
        of_npz = os.path.join(teachers_dir, "oneformer.npz")
        try:
            if os.path.isdir(of_dir) and os.path.exists(
                os.path.join(of_dir, "config.json")
            ):
                from visper_lm_tpu.checkpoint.hf_import import (
                    load_sharded_safetensors,
                )
                from visper_lm_tpu.models.teachers.oneformer import (
                    configs_from_hf,
                    import_oneformer_decoder,
                )
                from visper_lm_tpu.models.teachers.swin import import_swin_backbone

                hf_cfg = json.load(open(os.path.join(of_dir, "config.json")))
                dec_cfg, swin_cfg = configs_from_hf(hf_cfg)
                sd = load_sharded_safetensors(of_dir)
                sd = {
                    k[len("model."):] if k.startswith("model.") else k: v
                    for k, v in sd.items()
                }
                out["oneformer"] = {
                    "dec_params": import_oneformer_decoder(sd, dec_cfg),
                    "cfg": dec_cfg,
                    "swin_params": import_swin_backbone(
                        sd, swin_cfg, prefix="pixel_level_module.encoder."
                    ),
                    "swin_cfg": swin_cfg,
                    "task_inputs": _oneformer_task_inputs(of_dir, dec_cfg),
                }
                note("seg: OneFormer loaded from teachers dir (HF layout)")
            elif os.path.exists(of_npz):
                from visper_lm_tpu.models.teachers.oneformer import (
                    OneFormerDecoderConfig,
                )
                from visper_lm_tpu.models.teachers.swin import SwinConfig
                from visper_lm_tpu.utils.param import load_params_npz

                bundle = load_params_npz(of_npz)
                cfg_json = json.load(
                    open(os.path.join(teachers_dir, "oneformer.json"))
                )
                dec_cfg = OneFormerDecoderConfig(
                    **{k: tuple(v) if isinstance(v, list) else v
                       for k, v in cfg_json["decoder"].items()}
                )
                swin_cfg = SwinConfig(
                    **{k: tuple(v) if isinstance(v, list) else v
                       for k, v in cfg_json["swin"].items()}
                )
                out["oneformer"] = {
                    "dec_params": bundle["dec"],
                    "cfg": dec_cfg,
                    "swin_params": bundle["swin"],
                    "swin_cfg": swin_cfg,
                    "task_inputs": np.zeros((1, dec_cfg.task_seq_len), np.int32),
                    "image_size": int(cfg_json.get("image_size", 768)),
                }
                note("seg: OneFormer loaded from teachers dir (npz bundle)")
        except Exception as e:  # noqa: BLE001
            note(f"seg: OneFormer load failed ({e}) -> .npy only")
    if "oneformer" not in out:
        note("seg: no OneFormer decoder found -> .npy only")

    # ---- gen: unCLIP diffusion pipe ------------------------------------
    if teachers_dir:
        gp_npz = os.path.join(teachers_dir, "genpipe.npz")
        try:
            if os.path.exists(gp_npz):
                from visper_lm_tpu.models.genpipe import genpipe_config_from_dict
                from visper_lm_tpu.utils.param import load_params_npz

                cfg_json = json.load(
                    open(os.path.join(teachers_dir, "genpipe.json"))
                )
                out["genpipe"] = {
                    "params": load_params_npz(gp_npz),
                    "cfg": genpipe_config_from_dict(cfg_json),
                    "num_inference_steps": cfg_json.get("num_inference_steps", 25),
                }
                note("gen: unCLIP pipe loaded from teachers dir")
        except Exception as e:  # noqa: BLE001
            note(f"gen: pipe load failed ({e}) -> .npy only")
    if "genpipe" not in out:
        note("gen: no unCLIP pipe found -> .npy only")
    return out


def _oneformer_task_inputs(of_dir: str, dec_cfg) -> np.ndarray:
    """Tokenized 'the task is semantic' via the checkpoint's CLIP tokenizer
    (the OneFormer processor's task conditioning); zeros when no tokenizer."""
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(of_dir)
        ids = tok(
            "the task is semantic", padding="max_length",
            max_length=dec_cfg.task_seq_len, truncation=True,
        ).input_ids
        return np.asarray([ids], dtype=np.int32)
    except Exception:  # noqa: BLE001
        return np.zeros((1, dec_cfg.task_seq_len), np.int32)


def _depth_pyramid(model, layer: int, emb):
    """The head's 4-level feature pyramid for the DPT decoder: intermediate MLP
    outputs when the head has them (use_intermediate_depth,
    base_ola_vlm.py:462-465), else [emb]*4 (:466)."""
    import jax.numpy as jnp

    from visper_lm_tpu.models.heads import depth_intermediate_features

    emb = jnp.asarray(emb)
    d = model.cfg.distill
    heads = (model.params or {}).get("heads", {}).get("depth")
    if d is not None and heads:
        for tcfg in d.tasks:
            if tcfg.task != "depth":
                continue
            if layer in tcfg.layer_indices:
                hp = heads[tcfg.layer_indices.index(layer)]
                feats = depth_intermediate_features(hp, emb)
                if len(feats) >= 4:
                    return feats
                return [feats[-1]] * 4
    return [emb] * 4


def visualize_interpretations(model, question: str, image, out_dir: str,
                              dpt_params=None, oneformer=None, genpipe=None) -> dict:
    """Run get_visual_interpretations and render everything the loaded
    decoders cover (reference demo.py:177-229); embeddings are always dumped
    as .npy for offline use."""
    os.makedirs(out_dir, exist_ok=True)
    interp = model.get_visual_interpretations(question, image)
    manifest = {}
    for task, layers in interp.items():
        for layer, emb in layers.items():
            base = os.path.join(out_dir, f"{task}_layer{layer + 1}")
            np.save(base + ".npy", emb)
            manifest[f"{task}/{layer + 1}"] = base + ".npy"
            if task == "depth" and dpt_params is not None:
                from visper_lm_tpu.models.teachers.dpt import normalized_depth

                feats = _depth_pyramid(model, layer, emb)
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
                # the backbone runs at the processor resolution; the tiny test
                # teachers use smaller inputs, so scale to the swin image size
                seg_res = oneformer.get("image_size", 768)
                pixels = np.asarray(
                    image.resize((seg_res, seg_res)), dtype=np.float32
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
                    (np.asarray(imgs[0]) * 255).clip(0, 255).astype(np.uint8)
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


def _print_stream(text: str) -> None:
    print(text, end="", flush=True)


def repl(model, image_path: str, out_dir: str = "demo_out", decoders=None) -> None:
    from PIL import Image

    decoders = decoders or {}
    image = Image.open(image_path).convert("RGB")
    # multi-turn: conversation history rides a prefix-cached KV handle, so each
    # turn prefills only its own tokens (api.ChatSession) — the reference demo
    # re-prefills the whole history every turn
    session = model.chat_session(image)
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
            manifest = visualize_interpretations(
                model, q, image, out_dir, **decoders
            )
            print(json.dumps(manifest, indent=2))
            continue
        # streamed decode (reference demo.py:286-350, TextIteratorStreamer)
        print("assistant> ", end="", flush=True)
        session.ask(line, max_new_tokens=256, stream_callback=_print_stream)
        print()


def build_ui(model, gr, out_dir: str = "demo_out", decoders=None,
             max_new_tokens: int = 256):
    """Construct the Gradio Blocks graph (reference demo.py:286-350): image
    upload + STREAMED chat (a worker thread decodes while the handler yields
    accumulated text — the TextIteratorStreamer pattern) + a "Visualize"
    button wired to the intermediate-representation decoders.

    `gr` is the gradio module (injected so tests can exercise the graph and
    both handlers under a stub — gradio itself is an optional dependency).
    Returns (ui, handlers) where handlers = {"chat": fn, "viz": fn}."""
    import queue
    import threading

    decoders = decoders or {}

    def _chat(message, history, image):
        if image is None:
            yield "Please upload an image first."
            return
        q: "queue.Queue" = queue.Queue()
        done = object()
        err: list = []

        def _run():
            try:
                model.chat([message], [image], max_new_tokens=max_new_tokens,
                           stream_callback=q.put)
            except BaseException as e:  # re-raised on the handler side
                err.append(e)
            finally:
                q.put(done)

        threading.Thread(target=_run, daemon=True).start()
        text = ""
        while True:
            piece = q.get()
            if piece is done:
                break
            text += piece
            yield text
        if err:
            # surface worker failures to Gradio (the synchronous handler's
            # behavior) instead of rendering a silently-empty turn
            raise err[0]
        if not text:
            yield text  # empty generation still resolves the UI turn

    def _viz(question, image):
        if image is None:
            return {}
        return visualize_interpretations(
            model, question or "Describe the image.", image, out_dir, **decoders
        )

    with gr.Blocks(title="VisPer-LM TPU demo") as ui:
        image = gr.Image(type="pil", label="image")
        # the image COMPONENT is an additional chat input: its current value is
        # delivered per call (capturing image.value at build time freezes None)
        chat = gr.ChatInterface(fn=_chat, additional_inputs=[image])
        question = gr.Textbox(label="viz question", value="Describe the image.")
        viz_btn = gr.Button("Visualize intermediate representations")
        manifest = gr.JSON(label="rendered artifacts")
        viz_btn.click(_viz, inputs=[question, image], outputs=[manifest])
        _ = chat
    return ui, {"chat": _chat, "viz": _viz}


def serve(model, port: int = 7860, out_dir: str = "demo_out", decoders=None) -> None:
    """Gradio web UI entry point; the CLI REPL covers the same capabilities
    when gradio is unavailable."""
    try:
        import gradio as gr
    except ImportError as e:
        raise SystemExit(
            "--serve needs gradio, which is not installed in this environment. "
            "Use the CLI REPL (omit --serve), or `pip install gradio` where allowed."
        ) from e

    ui, _ = build_ui(model, gr, out_dir=out_dir, decoders=decoders)
    ui.launch(server_port=port)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-path", required=True, help="HF or orbax checkpoint dir")
    parser.add_argument("--tokenizer", default=None, help="tokenizer path (HF)")
    parser.add_argument("--image", default=None)
    parser.add_argument("--question", default=None, help="one-shot question (no REPL)")
    parser.add_argument("--viz", action="store_true", help="render interpretations")
    parser.add_argument(
        "--teachers", default=None,
        help="dir with visualization decoder weights (see module doc); "
        "defaults to <model-path>/teachers when present",
    )
    parser.add_argument("--out-dir", default="demo_out")
    parser.add_argument("--serve", action="store_true", help="gradio web UI (optional)")
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args(argv)

    from transformers import AutoTokenizer

    from visper_lm_tpu.api import VisperModel

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer or args.model_path)
    if os.path.isdir(os.path.join(args.model_path, "checkpoints")) or os.path.exists(
        os.path.join(args.model_path, "_CHECKPOINT_METADATA")
    ):
        model = VisperModel.from_orbax(args.model_path, tokenizer=tokenizer)
    else:
        model = VisperModel.from_hf_checkpoint(args.model_path, tokenizer=tokenizer)

    teachers = args.teachers
    if teachers is None and os.path.isdir(os.path.join(args.model_path, "teachers")):
        teachers = os.path.join(args.model_path, "teachers")
    decoders = (
        load_viz_decoders(model, args.model_path, teachers)
        if (args.viz or not args.question)
        else {}
    )

    if args.serve:
        serve(model, port=args.port, out_dir=args.out_dir, decoders=decoders)
    elif args.question:
        from PIL import Image

        if args.image is None:
            parser.error("--question needs --image")
        image = Image.open(args.image).convert("RGB")
        print(model.chat([args.question], [image])[0])
        if args.viz:
            manifest = visualize_interpretations(
                model, args.question, image, args.out_dir, **decoders
            )
            print(json.dumps(manifest, indent=2))
    else:
        if args.image is None:
            parser.error("the REPL needs --image")
        repl(model, args.image, args.out_dir, decoders=decoders)


if __name__ == "__main__":
    main()
