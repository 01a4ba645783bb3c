"""Smoke + plumbing tests for the Gradio Blocks wrapper.

gradio is not installable in this environment (no network), so a minimal
stub stands in: it records the components and all click/change/select
wiring that `launch_gradio` builds, then the tests drive the recorded
callbacks end-to-end on tiny models — the round-1 gap was that the widget
wiring (reference: gradio_app.py:430-994) had zero test signal; round 3
extends it to the preset appliers, the sampler-preset dropdown, the
text-presets library and the voice-library dropdown (gradio_app.py:372-451,
734-760, 857-935).
"""
import sys
import types

import pytest


class _Update(dict):
    pass


def _update(**kwargs):
    return _Update(kwargs)


class _Component:
    changes = []
    selects = []

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.label = kwargs.get("label")

    def change(self, fn, inputs=None, outputs=None):
        _Component.changes.append((self, fn, inputs, outputs))

    def select(self, fn, inputs=None, outputs=None):
        _Component.selects.append((self, fn, inputs, outputs))


class _Button(_Component):
    clicks = []

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.text = args[0] if args else ""

    def click(self, fn, inputs=None, outputs=None):
        _Button.clicks.append((self, fn, inputs, outputs))


class _Row(_Component):
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


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
                 "Markdown", "Dropdown", "Dataframe"):
        setattr(gr, name, _Component)
    gr.Button = _Button
    gr.Row = _Row
    gr.update = _update
    gr.SelectData = object
    monkeypatch.setitem(sys.modules, "gradio", gr)
    _Button.clicks = []
    _Component.changes = []
    _Component.selects = []
    return gr


@pytest.fixture(scope="module")
def models(tiny_models):
    return tiny_models


def _launch(models, monkeypatch, tmp_path, **kwargs):
    _install_gradio_stub(monkeypatch)
    monkeypatch.setattr("echo_tts_tpu.demo.app.DemoSession.__init__",
                        _session_init_tmp(tmp_path))
    from echo_tts_tpu.demo.app import launch_gradio

    return launch_gradio(models, **kwargs)


def _by_label(wirings, label):
    return [w for w in wirings if getattr(w[0], "label", None) == label]


def test_launch_gradio_generate_wiring(models, monkeypatch, tmp_path):
    demo = _launch(models, monkeypatch, tmp_path, share=False)
    assert demo.launched == {"share": False}

    gen = [c for c in _Button.clicks if c[0].text == "Generate"]
    assert len(gen) == 1
    _, fn, inputs, outputs = gen[0]
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


def test_sampler_preset_dropdown_updates_all_fields(models, monkeypatch,
                                                    tmp_path):
    from echo_tts_tpu.demo import app as demo_app
    _launch(models, monkeypatch, tmp_path)
    dd_changes = _by_label(_Component.changes, "Sampler preset")
    assert len(dd_changes) == 1
    _, fn, inputs, outputs = dd_changes[0]
    assert len(outputs) == 13  # 12 sampler fields + the KV row visibility

    updates = fn("Independent-High-CFG-Flat")
    assert len(updates) == 13
    expect = demo_app.apply_sampler_preset("Independent-High-CFG-Flat")
    values = [u.get("value") for u in updates[:-1]]
    assert values == [expect[f] for f in demo_app.SAMPLER_PRESET_FIELDS]
    assert updates[-1] == {"visible": False}  # force_speaker off -> row hid

    # Unknown / "Custom" leaves every field untouched
    assert all(u == {} for u in fn("Custom"))


def test_preset_buttons_update_sliders_and_reset_dropdown(models,
                                                          monkeypatch,
                                                          tmp_path):
    _launch(models, monkeypatch, tmp_path)

    cfg = [c for c in _Button.clicks if c[0].text == "CFG: large guidances"]
    assert len(cfg) == 1
    updates = cfg[0][1]()
    assert [u.get("value") for u in updates] == [8.0, 8.0, 0.5, 1.0,
                                                "Custom"]
    assert len(cfg[0][3]) == 5  # cfg_t, cfg_s, min_t, max_t, preset_dd

    tr = [c for c in _Button.clicks if c[0].text == "Truncation: flat"]
    assert [u.get("value") for u in tr[0][1]()] == [0.8, 1.2, 3.0, "Custom"]

    kv_on = [c for c in _Button.clicks
             if c[0].text == "Speaker KV: enable"]
    ups = kv_on[0][1]()
    assert ups[0] == {"value": True}     # force_speaker checkbox
    assert ups[1] == {"visible": True}   # KV row visibility
    assert ups[2] == {"value": "Custom"}

    force_changes = _by_label(_Component.changes, "Force speaker")
    assert force_changes and force_changes[0][1](True) == {"visible": True}


def test_text_presets_and_voice_library_wiring(models, monkeypatch,
                                               tmp_path):
    import os
    vd = tmp_path / "voices"
    vd.mkdir()
    (vd / "alice.wav").write_bytes(b"x")
    (vd / "bob.wav").write_bytes(b"x")
    _launch(models, monkeypatch, tmp_path, voices_dir=str(vd))

    # text-presets table selection fills the prompt box
    sel = [s for s in _Component.selects
           if s[0].kwargs.get("headers") == ["Category", "Words",
                                             "Preset Text"]]
    assert len(sel) == 1
    from echo_tts_tpu.demo.app import load_text_presets
    evt = types.SimpleNamespace(index=(1, 2), value="x")
    assert sel[0][1](evt) == {"value": load_text_presets()[1][2]}

    # voice dropdown lists the library and fills the speaker audio path
    dd = _by_label(_Component.changes, "Voice library")
    assert len(dd) == 1
    assert dd[0][0].kwargs.get("choices") == ["alice.wav", "bob.wav"]
    assert dd[0][1]("bob.wav") == {"value": os.path.join(str(vd),
                                                         "bob.wav")}

    search = _by_label(_Component.changes, "Voice search")
    assert search and search[0][1]("ali") == {"choices": ["alice.wav"]}


def _session_init_tmp(tmp_path):
    import os
    import uuid

    def init(self, models, temp_dir=None, session_id=None):
        self.models = models
        self.session_id = session_id or uuid.uuid4().hex[:8]
        self.temp_dir = os.path.join(str(tmp_path), self.session_id)
        os.makedirs(self.temp_dir, exist_ok=True)

    return init
