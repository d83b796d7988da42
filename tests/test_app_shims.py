"""Fake-API shim tests for the gradio/viser shells.

The real `gradio` and `viser` packages are not in this image (the reference
app demo_gr.py:852-1259 has the same optional deps), so these tests install
faithful fake modules capturing the exact widget API the shells use, then
drive the reference app's core Advanced-mode UX end-to-end:

  build_app -> session start -> preprocess -> viser keyframe editor
  (preset submit -> "Set camera trajectory", seva/gui.py:860-901)
  -> Advanced render consuming `gui_state.camera_traj_list`
  (reference demo_gr.py:501-509).

Any widget-signature drift in apps/gradio_app.py or apps/viser_gui.py fails
here instead of at launch time.
"""

import glob
import os.path as osp
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # engine-scale: minutes on this 1-core box


# ---------------------------------------------------------------------------
# fake gradio
# ---------------------------------------------------------------------------


class _FakeWidget:
    def __init__(self, *args, **kw):
        self.args = args
        self.value = kw.get("value", kw.get("initial_value"))
        self.label = kw.get("label")
        self.text = args[0] if args and isinstance(args[0], str) else None
        self.visible = kw.get("visible", True)
        self.events: list[tuple] = []  # (fn, inputs, outputs)

    def click(self, fn=None, inputs=None, outputs=None, **kw):
        self.events.append((fn, inputs or [], outputs or []))
        return self

    change = click


class _FakeBlocks:
    def __init__(self, *a, **kw):
        self.load_handlers: list[tuple] = []
        self.unload_handlers: list = []

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def load(self, fn, inputs=None, outputs=None, **kw):
        self.load_handlers.append((fn, inputs or [], outputs or []))

    def unload(self, fn, **kw):
        self.unload_handlers.append(fn)

    def queue(self, **kw):
        return self

    def launch(self, **kw):  # pragma: no cover - never called in tests
        raise RuntimeError("launch() not available in shim tests")


class _FakeTab:
    def __init__(self, *a, **kw):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeProgress:
    def __init__(self, *a, **kw):
        self.calls = []

    def __call__(self, *a, **kw):
        self.calls.append((a, kw))


class _GrError(Exception):
    pass


def make_fake_gradio():
    gr = types.ModuleType("gradio")
    created: list[_FakeWidget] = []

    def widget_factory(name):
        def make(*args, **kw):
            w = _FakeWidget(*args, **kw)
            w.kind = name
            created.append(w)
            return w

        return make

    for name in ("State", "HTML", "Number", "Dropdown", "Slider", "Button",
                 "Image", "File", "Video"):
        setattr(gr, name, widget_factory(name))
    gr.Blocks = _FakeBlocks
    gr.Tab = _FakeTab
    gr.Progress = _FakeProgress
    gr.Error = _GrError
    gr.Info = lambda *a, **kw: None
    gr.Request = object
    gr._created = created
    return gr


# ---------------------------------------------------------------------------
# fake viser
# ---------------------------------------------------------------------------


class _AnyAttr:
    def __getattr__(self, name):
        return name


class _FakeHandle:
    def __init__(self, name, kw):
        self.name = name
        for k, v in kw.items():
            setattr(self, k, v)
        self.removed = False
        self._clicks = []

    def on_click(self, fn):
        self._clicks.append(fn)
        return fn

    def remove(self):
        self.removed = True


class _FakeScene:
    def __init__(self):
        self.nodes: dict[str, _FakeHandle] = {}
        self.resets = 0

    def reset(self):
        self.resets += 1
        self.nodes.clear()

    def _add(self, name, **kw):
        h = _FakeHandle(name, kw)
        self.nodes[name] = h
        return h

    add_camera_frustum = _add
    add_point_cloud = _add
    add_spline_catmull_rom = _add


class _FakeGuiWidget:
    def __init__(self, label, kw):
        self.label = label
        self.value = kw.get("initial_value")
        self.visible = kw.get("visible", True)
        self.disabled = kw.get("disabled", False)
        self._updates: list = []
        self._clicks: list = []

    def on_update(self, fn):
        self._updates.append(fn)
        return fn

    def on_click(self, fn):
        self._clicks.append(fn)
        return fn

    def remove(self):
        self.removed = True

    def fire(self, event=None):
        for fn in self._clicks + self._updates:
            fn(event)


class _FakeFolder:
    def __init__(self, label):
        self.label = label

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeGui:
    def __init__(self):
        self.widgets: list[_FakeGuiWidget] = []

    def _add(self, label, *a, **kw):
        w = _FakeGuiWidget(label, kw)
        self.widgets.append(w)
        return w

    def add_folder(self, label, **kw):
        return _FakeFolder(label)

    add_dropdown = _add
    add_number = _add
    add_button = _add
    add_slider = _add
    add_checkbox = _add

    def find(self, label, index=0):
        matches = [w for w in self.widgets if w.label == label]
        return matches[index]


class _FakeViserServer:
    def __init__(self, *a, **kw):
        self.scene = _FakeScene()
        self.gui = _FakeGui()
        self.stopped = False

    def get_host(self):
        return "localhost"

    def get_port(self):
        return 8080

    def get_clients(self):
        return {}

    def stop(self):
        self.stopped = True


def make_fake_viser():
    viser = types.ModuleType("viser")
    viser.ViserServer = _FakeViserServer
    viser.Icon = _AnyAttr()
    return viser


# ---------------------------------------------------------------------------
# event driver
# ---------------------------------------------------------------------------


def run_event(fn, inputs, outputs, extra_args=()):
    """Simulate a gradio event: read input widget values, call, assign
    outputs; generators are drained and yields collected."""
    vals = [w.value for w in inputs]
    result = fn(*extra_args, *vals)
    yields = []
    if hasattr(result, "__next__"):
        for item in result:
            yields.append(item)
        result = yields[-1] if yields else None
    if outputs:
        if len(outputs) == 1:
            outputs[0].value = result
        else:
            for w, v in zip(outputs, result):
                w.value = v
    return result, yields


class _FakeRequest:
    def __init__(self, session_hash):
        self.session_hash = session_hash


# ---------------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------------


@pytest.fixture()
def fake_ui(monkeypatch):
    gr = make_fake_gradio()
    viser = make_fake_viser()
    monkeypatch.setitem(sys.modules, "gradio", gr)
    monkeypatch.setitem(sys.modules, "viser", viser)
    return gr, viser


def _find_button(gr, text, fn_name=None):
    for w in gr._created:
        if getattr(w, "kind", None) == "Button" and w.text == text:
            if fn_name is None or any(
                ev[0].__name__ == fn_name for ev in w.events
            ):
                return w
    raise AssertionError(f"no Button {text!r} wired to {fn_name}")


def test_editor_to_render_loop(fake_ui, tmp_path):
    """The reference app's core Advanced-mode UX: keyframe editor ->
    'Set camera trajectory' -> render consumes the GUI cameras
    (demo_gr.py:501-509, seva/gui.py:860-901)."""
    gr, _ = fake_ui
    from stable_virtual_camera_tpu.apps.gradio_app import build_app
    from stable_virtual_camera_tpu.apps.renderer import HeadlessRenderer
    from stable_virtual_camera_tpu.config import VersionConfig
    from stable_virtual_camera_tpu.models.io import random_bundle

    renderer = HeadlessRenderer(
        random_bundle(image_hw=(64, 64)), work_dir=str(tmp_path)
    )
    renderer.version = VersionConfig(H=64, W=64, T=5)
    app = build_app(random_bundle(image_hw=(64, 64)), advanced=True,
                    renderer=renderer, num_steps=2)

    # session start: viser server + abort event + iframe html
    (fn, inputs, outputs) = app.load_handlers[0]
    run_event(fn, inputs, outputs, extra_args=(_FakeRequest("sess-1"),))
    session = outputs[0]
    assert "iframe" in outputs[1].value

    # Basic preprocess populates the scene AND defines the keyframe editor
    img_in = next(w for w in gr._created if w.kind == "Image")
    img_in.value = np.random.default_rng(0).integers(
        0, 255, size=(64, 64, 3), dtype=np.uint8
    )
    pre_btn = _find_button(gr, "Preprocess")
    run_event(*pre_btn.events[0])
    preprocessed = pre_btn.events[0][2][0]
    assert preprocessed.value is not None

    # the editor exists on the session's viser server
    server = app.svc_sessions["servers"]["sess-1"]
    assert server.scene.nodes, "viser scene never populated"
    assert app.svc_sessions["gui_states"]["sess-1"] is not None
    gui = server.gui

    # drive the editor: short orbit preset -> submit -> set trajectory
    gui.find("Options").value = "orbit"
    gui.find("Duration (sec)", 0).value = 0.2  # preset duration widget
    gui.find("Submit").fire()
    assert len(server.scene.nodes) > 1  # keyframe frustums drawn
    gui.find("Set camera trajectory").fire()

    # Advanced render consumes the serialized GUI trajectory
    chunk = next(w for w in gr._created if w.kind == "Dropdown" and
                 w.label == "Chunk strategy")
    chunk.value = "interp"
    adv_btn = _find_button(gr, "Render video", fn_name="do_render_advanced")
    result, yields = run_event(*adv_btn.events[0])
    assert len(yields) == 2
    first, final = yields[-1]
    assert first is not None and final is not None
    assert osp.exists(final)
    # frame count == the GUI trajectory's length (not the preset slider's)
    n_targets = len(glob.glob(osp.join(osp.dirname(final), "samples-rgb", "*.png")))
    traj = app.svc_sessions["gui_states"]["sess-1"].camera_traj_list
    assert traj is not None and n_targets == len(traj)
    assert n_targets != 80  # 80 = the Basic preset #frames widget: GUI wins


def test_advanced_render_requires_trajectory(fake_ui, tmp_path):
    gr, _ = fake_ui
    from stable_virtual_camera_tpu.apps.gradio_app import build_app
    from stable_virtual_camera_tpu.apps.renderer import HeadlessRenderer
    from stable_virtual_camera_tpu.config import VersionConfig
    from stable_virtual_camera_tpu.models.io import random_bundle

    bundle = random_bundle(image_hw=(64, 64))
    renderer = HeadlessRenderer(bundle, work_dir=str(tmp_path))
    renderer.version = VersionConfig(H=64, W=64, T=5)
    app = build_app(bundle, advanced=True, renderer=renderer, num_steps=2)
    (fn, inputs, outputs) = app.load_handlers[0]
    run_event(fn, inputs, outputs, extra_args=(_FakeRequest("sess-2"),))

    adv_btn = _find_button(gr, "Render video", fn_name="do_render_advanced")
    with pytest.raises(Exception, match="Set a camera trajectory"):
        run_event(*adv_btn.events[0])


def test_shims_satisfy_pinned_ui_manifest():
    """The fakes implement exactly the pinned UI surface the real apps check
    at startup (apps/ui_manifest.py, pinned to the reference's
    gradio==5.17.0 / viser): the same `check_*` call that guards against
    real-package drift also keeps these shims honest."""
    from stable_virtual_camera_tpu.apps import ui_manifest

    gr = make_fake_gradio()
    ui_manifest.check_gradio(gr)

    viser = make_fake_viser()
    server = viser.ViserServer()
    ui_manifest.check_viser(viser, server)

    # widget-level surfaces the module-level check can't reach: events on
    # widget instances and attributes on gui handles
    btn = gr.Button("x")
    for ev in ui_manifest.GRADIO_WIDGET_EVENTS:
        assert hasattr(btn, ev), f"fake gradio widget missing .{ev}"
    handle = server.gui.add_slider("s", initial_value=1)
    for attr in ui_manifest.VISER_HANDLE_ATTRS:
        assert hasattr(handle, attr), f"fake viser gui handle missing .{attr}"
    # a missing symbol must fail loudly
    import types as _types

    broken = _types.ModuleType("gradio")
    with pytest.raises(ui_manifest.UiApiDrift, match="missing"):
        ui_manifest.check_gradio(broken)
