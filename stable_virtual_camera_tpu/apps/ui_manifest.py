"""Pinned UI-API contract for the gradio/viser shells.

The real `gradio` / `viser` packages are absent from this image, so the GUI
layers (`gradio_app.py`, `viser_gui.py`) are exercised against faithful fakes
(tests/test_app_shims.py). This module records the EXACT API surface those
layers consume — pinned against the reference's dependency versions
(gradio==5.17.0, viser: /root/reference/pyproject.toml:12,16) — so that:

- the fakes are checked against the same manifest the apps check the real
  packages against (tests assert `check_gradio(fake)` passes), and
- the day real packages appear, any drift between our emulated surface and
  the installed package fails loudly at app startup instead of silently
  misbehaving (reference GUI entry points: demo_gr.py:852-1264, seva/gui.py).
"""

from __future__ import annotations

GRADIO_PIN = "5.17"  # reference /root/reference/pyproject.toml:16

# Symbols of the gradio module the app instantiates or raises.
GRADIO_SYMBOLS = (
    "Blocks",
    "Button",
    "Dropdown",
    "Error",
    "File",
    "HTML",
    "Image",
    "Info",
    "Number",
    "Progress",
    "Request",
    "Slider",
    "State",
    "Tab",
    "Video",
)
# Methods called on a Blocks instance.
GRADIO_BLOCKS_METHODS = ("load", "unload", "queue", "launch")
# Event wiring used on widgets (gradio exposes these per-widget instance).
GRADIO_WIDGET_EVENTS = ("click",)

# viser.ViserServer attribute paths the GUI layers touch.
VISER_SYMBOLS = ("ViserServer", "Icon")
VISER_SERVER_METHODS = ("stop", "get_clients")
VISER_GUI_METHODS = (
    "add_button",
    "add_checkbox",
    "add_dropdown",
    "add_folder",
    "add_number",
    "add_slider",
)
# used on per-client gui handles only (client.gui.add_modal)
VISER_CLIENT_GUI_METHODS = ("add_modal",)
VISER_SCENE_METHODS = (
    "add_camera_frustum",
    "add_spline_catmull_rom",
)
# Attributes used on returned GUI handles.
VISER_HANDLE_ATTRS = ("on_click", "on_update", "remove", "value", "visible",
                      "disabled")
# Attributes used on client camera handles.
VISER_CAMERA_ATTRS = ("fov", "position", "wxyz")


class UiApiDrift(RuntimeError):
    """The installed UI package no longer matches the pinned surface."""


def _require(obj, names, where: str) -> list[str]:
    return [f"{where}.{n}" for n in names if not hasattr(obj, n)]


def check_gradio(gr) -> None:
    """Assert the gradio module exposes the pinned surface; raise UiApiDrift
    listing every missing symbol. Version-gated: a non-5.17 real gradio still
    passes if the surface is intact (minor releases rarely drop widgets)."""
    missing = _require(gr, GRADIO_SYMBOLS, "gradio")
    blocks = getattr(gr, "Blocks", None)
    if blocks is not None:
        missing += _require(blocks, GRADIO_BLOCKS_METHODS, "gradio.Blocks")
    if missing:
        version = getattr(gr, "__version__", "unknown")
        raise UiApiDrift(
            f"gradio {version} drifted from the pinned =={GRADIO_PIN} "
            f"surface; missing: {', '.join(missing)}"
        )


def check_viser(viser_mod, server=None) -> None:
    """Assert the viser module (and optionally a live server instance)
    exposes the pinned surface."""
    missing = _require(viser_mod, VISER_SYMBOLS, "viser")
    if server is not None:
        missing += _require(server, VISER_SERVER_METHODS, "ViserServer")
        missing += _require(
            getattr(server, "gui", server), VISER_GUI_METHODS, "ViserServer.gui"
        )
        missing += _require(
            getattr(server, "scene", server),
            VISER_SCENE_METHODS,
            "ViserServer.scene",
        )
    if missing:
        raise UiApiDrift(
            "viser drifted from the pinned surface; missing: "
            + ", ".join(missing)
        )
