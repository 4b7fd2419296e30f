"""Demo web-UI graph smoke (VERDICT r4 missing #2, reference demo.py:286-350).

gradio is not installable here, so demo.build_ui takes the module as an
argument: these tests construct the Blocks graph under a stub that records
components and event wiring, then drive BOTH handlers — the streamed chat
generator (worker thread + queue, the TextIteratorStreamer pattern) against
the real tiny model, and the visualize handler end-to-end to a manifest.
"""

import types

import numpy as np
import pytest
from PIL import Image as PILImage

import jax

from visper_lm_tpu.api import VisperModel
from visper_lm_tpu.config import tiny_test_vlm
from visper_lm_tpu.demo import build_ui
from visper_lm_tpu.models.vlm import init_vlm

from test_data_pipeline import FakeTokenizer


class FakeTok(FakeTokenizer):
    eos_token_id = 2


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    return VisperModel(cfg=cfg, params=params, tokenizer=FakeTok(), context_len=256)


def _stub_gradio():
    """Minimal gradio lookalike: components record constructor kwargs,
    Button.click records wiring, Blocks is a context manager."""
    created = []
    clicks = []

    class _Component:
        def __init__(self, *a, **kw):
            self.args, self.kwargs = a, kw
            created.append(self)

    class Button(_Component):
        def click(self, fn, inputs=None, outputs=None):
            clicks.append({"fn": fn, "inputs": inputs, "outputs": outputs})

    class Blocks:
        def __init__(self, *a, **kw):
            self.kwargs = kw
            self.launched = False

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def launch(self, **kw):
            self.launched = True

    gr = types.SimpleNamespace(
        Blocks=Blocks,
        Image=type("Image", (_Component,), {}),
        ChatInterface=type("ChatInterface", (_Component,), {}),
        Textbox=type("Textbox", (_Component,), {}),
        Button=Button,
        JSON=type("JSON", (_Component,), {}),
    )
    gr._created, gr._clicks = created, clicks
    return gr


def test_build_ui_graph_wiring(model, tmp_path):
    gr = _stub_gradio()
    ui, handlers = build_ui(model, gr, out_dir=str(tmp_path))
    assert ui.kwargs.get("title") == "VisPer-LM TPU demo"
    names = [type(c).__name__ for c in gr._created]
    assert names == ["Image", "ChatInterface", "Textbox", "Button", "JSON"]
    # the image component is an additional chat input (live value per call)
    chat_comp = gr._created[1]
    assert chat_comp.kwargs["fn"] is handlers["chat"]
    assert chat_comp.kwargs["additional_inputs"] == [gr._created[0]]
    # the visualize button drives _viz: [question, image] -> manifest JSON
    (click,) = gr._clicks
    assert click["fn"] is handlers["viz"]
    assert click["inputs"] == [gr._created[2], gr._created[0]]
    assert click["outputs"] == [gr._created[4]]


def test_chat_handler_streams_and_matches_nonstreamed(model, tmp_path):
    gr = _stub_gradio()
    _, handlers = build_ui(model, gr, out_dir=str(tmp_path), max_new_tokens=8)
    img = PILImage.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    )
    chunks = list(handlers["chat"]("describe the image", [], img))
    assert chunks, "generator yielded nothing"
    # streaming yields monotone prefixes of the final answer
    for a, b in zip(chunks, chunks[1:]):
        assert b.startswith(a)
    expected = model.chat(["describe the image"], [img], max_new_tokens=8)[0]
    assert chunks[-1] == expected
    # no image -> polite prompt instead of a crash
    assert list(handlers["chat"]("hi", [], None)) == [
        "Please upload an image first."
    ]


def test_viz_handler_renders_manifest(model, tmp_path):
    gr = _stub_gradio()
    _, handlers = build_ui(model, gr, out_dir=str(tmp_path))
    img = PILImage.fromarray(
        np.random.default_rng(1).integers(0, 255, (32, 32, 3), np.uint8)
    )
    assert handlers["viz"]("what is here?", None) == {}
    manifest = handlers["viz"]("what is here?", img)
    assert isinstance(manifest, dict) and manifest


def test_chat_handler_surfaces_worker_errors(model, tmp_path):
    """A model.chat failure inside the streaming worker thread must re-raise
    in the handler (the synchronous handler's behavior) — not render a
    silently-empty chat turn."""
    gr = _stub_gradio()

    class _Boom:
        def chat(self, *a, **kw):
            raise RuntimeError("decode exploded")

    _, handlers = build_ui(_Boom(), gr, out_dir=str(tmp_path))
    img = PILImage.fromarray(
        np.zeros((8, 8, 3), np.uint8)
    )
    with pytest.raises(RuntimeError, match="decode exploded"):
        list(handlers["chat"]("hi", [], img))
