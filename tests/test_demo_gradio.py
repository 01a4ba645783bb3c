"""Smoke test for the Gradio Blocks wrapper.

gradio is not installable in this environment (no network), so a minimal
stub stands in: it records the components and the click wiring that
`launch_gradio` builds, then the test drives the recorded 16-argument
callback end-to-end on tiny models — the round-1 gap was that the widget
wiring (reference: gradio_app.py:430-994) had zero test signal and was one
positional-arg typo away from breaking silently.
"""
import sys
import types

import pytest


class _Component:
    def __init__(self, *args, **kwargs):
        self.args = args
        self.label = kwargs.get("label")


class _Button(_Component):
    clicks = []

    def click(self, fn, inputs, outputs):
        _Button.clicks.append((fn, inputs, outputs))


class _Blocks:
    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.launched = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def launch(self, **kwargs):
        self.launched = kwargs
        return self


def _install_gradio_stub(monkeypatch):
    gr = types.ModuleType("gradio")
    gr.Blocks = _Blocks
    for name in ("Textbox", "Audio", "Slider", "Number", "Checkbox",
                 "Markdown"):
        setattr(gr, name, _Component)
    gr.Button = _Button
    monkeypatch.setitem(sys.modules, "gradio", gr)
    _Button.clicks = []


@pytest.fixture(scope="module")
def models(tiny_models):
    return tiny_models


def test_launch_gradio_wiring(models, monkeypatch, tmp_path):
    _install_gradio_stub(monkeypatch)
    monkeypatch.setattr("echo_tts_tpu.demo.app.DemoSession.__init__",
                        _session_init_tmp(tmp_path))
    from echo_tts_tpu.demo.app import launch_gradio

    demo = launch_gradio(models, share=False)
    assert demo.launched == {"share": False}
    assert len(_Button.clicks) == 1
    fn, inputs, outputs = _Button.clicks[0]
    assert len(inputs) == 16 and len(outputs) == 4

    # Drive the recorded callback with widget-ordered values (text, speaker,
    # steps, seed, cfg_t, cfg_s, min_t, max_t, trunc, rk, rs, force, kvs,
    # kvmt, kvml, recon) on the tiny model.
    audio_path, normalized, took, recon_path = fn(
        "Wiring check.", None, 2, 0, 3.0, 8.0, 0.5, 1.0,
        1.0, 1.0, 3.0, False, 1.5, 0.9, 2, False)
    import os
    assert os.path.isfile(audio_path)
    assert "Wiring check" in normalized
    assert took.endswith("s")
    assert recon_path is None


def _session_init_tmp(tmp_path):
    import os
    import uuid

    def init(self, models, temp_dir=None, session_id=None):
        self.models = models
        self.session_id = session_id or uuid.uuid4().hex[:8]
        self.temp_dir = os.path.join(str(tmp_path), self.session_id)
        os.makedirs(self.temp_dir, exist_ok=True)

    return init
