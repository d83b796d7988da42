"""Headless renderer behind the GUI: preprocess + render.

Logic parity with the reference Gradio app's `SevaRenderer`
(demo_gr.py:133-245 preprocess, demo_gr.py:464-701 render): Basic mode
(identity pose, default intrinsics, shorter side -> 576 snapped to /64),
Advanced mode (DUSt3R poses -> scene normalization -> viewport rescale),
anchor inference, per-pass chunk counting for progress bars, and the
img2trajvid two-pass engine invocation. UI toolkits (gradio/viser) are
deliberately absent here — apps/gradio_app.py wires this into widgets when
those packages exist.
"""

from __future__ import annotations

import copy
import os.path as osp
from datetime import datetime

import numpy as np

from stable_virtual_camera_tpu.config import EngineOptions, VersionConfig
from stable_virtual_camera_tpu.core.camera import get_default_intrinsics
from stable_virtual_camera_tpu.core.normalize import normalize_scene
from stable_virtual_camera_tpu.core.transforms import transform_img_and_K
from stable_virtual_camera_tpu.core.trajectories import get_preset_pose_fov
from stable_virtual_camera_tpu.engine import planner
from stable_virtual_camera_tpu.engine.prior import resolve_anchors
from stable_virtual_camera_tpu.engine.runner import ModelBundle, SceneEngine


def preprocess_basic(img: np.ndarray, shorter: int = 576) -> dict:
    """Single unposed image -> identity pose + default K
    (reference demo_gr.py:140-177)."""
    shorter = round(shorter / 64) * 64
    imgs = np.asarray(img, np.float32)[None, ..., :3] / (
        255.0 if img.dtype == np.uint8 else 1.0
    )
    imgs = imgs * 2.0 - 1.0
    imgs, _ = transform_img_and_K(imgs, shorter, K=None, size_stride=64)
    H, W = imgs.shape[1:3]
    Ks = get_default_intrinsics(aspect_ratio=W / H)
    return {
        "input_imgs": (imgs + 1.0) / 2.0,
        "input_Ks": Ks,
        "input_c2ws": np.eye(4)[None],
        "input_wh": (W, H),
        "points": [np.zeros((0, 3))],
        "point_colors": [np.zeros((0, 3))],
        "scene_scale": 1.0,
    }


def preprocess_advanced(
    img_paths: list[str], dust3r, shorter: int = 576
) -> dict:
    """Unposed images -> DUSt3R poses -> normalized scene
    (reference demo_gr.py:179-245)."""
    shorter = round(shorter / 64) * 64
    input_imgs, input_Ks, input_c2ws, points, point_colors = (
        dust3r.infer_cameras_and_points(img_paths)
    )
    input_imgs = [im[..., :3] for im in input_imgs]
    point_chunks = [p.shape[0] for p in points]
    point_indices = np.cumsum(point_chunks)[:-1]
    input_c2ws, pts, _ = normalize_scene(
        input_c2ws, np.concatenate(points, 0), camera_center_method="poses"
    )
    points = np.split(pts, point_indices, 0)
    scene_scale = np.median(
        np.ptp(np.concatenate([input_c2ws[:, :3, 3], *points], 0), -1)
    )
    input_c2ws[:, :3, 3] /= scene_scale
    points = [p / scene_scale for p in points]

    new_imgs, new_Ks = [], []
    for im, K in zip(input_imgs, input_Ks):
        im4 = np.asarray(im, np.float32)[None] * 2.0 - 1.0
        im4, K = transform_img_and_K(im4, shorter, K=K[None], size_stride=64)
        K = K[0] / np.array([im4.shape[2], im4.shape[1], 1.0])[:, None]
        new_imgs.append(im4)
        new_Ks.append(K)
    imgs = np.concatenate(new_imgs, 0)
    return {
        "input_imgs": (imgs + 1.0) / 2.0,
        "input_Ks": np.stack(new_Ks),
        "input_c2ws": input_c2ws,
        "input_wh": (imgs.shape[2], imgs.shape[1]),
        "points": points,
        "point_colors": point_colors,
        "scene_scale": float(scene_scale),
    }


class HeadlessRenderer:
    """The GUI's render path without the GUI."""

    def __init__(self, bundle: ModelBundle, work_dir: str = "work_dirs/gradio"):
        self.bundle = bundle
        self.work_dir = work_dir
        self.version = VersionConfig()

    def target_cameras_from_traj_list(self, camera_traj_list: list[dict]):
        """(reference demo_gr.py:357-380 get_target_c2ws_and_Ks_from_gui)."""
        target_c2ws, target_Ks = [], []
        for item in camera_traj_list:
            W, H = item["img_wh"]
            w2c = np.array(item["w2c"]).reshape(4, 4)
            target_c2ws.append(np.linalg.inv(w2c))
            K = np.array(item["K"]).reshape(3, 3) / np.array([W, H, 1.0])[:, None]
            target_Ks.append(K)
        return np.stack(target_c2ws), np.stack(target_Ks)

    def target_cameras_from_preset(
        self, preprocessed: dict, preset_traj: str, num_frames: int,
        zoom_factor: float | None,
    ):
        """(reference demo_gr.py:382-462 get_target_c2ws_and_Ks_from_preset)."""
        W, H = preprocessed["input_wh"]
        img_wh = (W, H)
        start_w2c = np.eye(4)
        look_at = np.array([0.0, 0.0, 10.0])
        up_direction = np.array([0.0, -1.0, 0.0])
        poses, fovs = get_preset_pose_fov(
            preset_traj, num_frames, start_w2c, look_at, up_direction,
            zoom_factor=zoom_factor,
        )
        Ks = get_default_intrinsics(fovs, aspect_ratio=img_wh[0] / img_wh[1])
        return poses, Ks

    def prepare(
        self,
        preprocessed: dict,
        seed: int = 23,
        chunk_strategy: str = "interp-gt",
        cfg: float = 4.0,
        camera_traj_list: list[dict] | None = None,
        preset_traj: str | None = None,
        num_frames: int | None = None,
        zoom_factor: float | None = None,
        camera_scale: float = 2.0,
        num_steps: int = 50,
        min_anchor_fill: bool = False,
        deliver_anchors: bool | None = None,
    ) -> dict:
        """Resolve the full render plan: targets, anchors, options (incl. the
        reference's >10-input-views forced `interp` strategy, demo_gr.py:242-244)
        and both passes' chunk counts for progress-bar sizing
        (demo_gr.py:576-627). Returns a plan dict for `run`."""
        input_imgs = np.asarray(preprocessed["input_imgs"], np.float32)
        input_Ks = np.asarray(preprocessed["input_Ks"])
        input_c2ws = np.asarray(preprocessed["input_c2ws"])
        W, H = preprocessed["input_wh"]
        num_inputs = len(input_imgs)
        if num_inputs > 10:  # reference demo_gr.py:242-244
            chunk_strategy = "interp"

        if preset_traj is None:
            assert camera_traj_list is not None
            target_c2ws, target_Ks = self.target_cameras_from_traj_list(
                camera_traj_list
            )
        else:
            assert num_frames is not None and num_inputs == 1
            input_c2ws = np.eye(4)[None]
            target_c2ws, target_Ks = self.target_cameras_from_preset(
                preprocessed, preset_traj, num_frames, zoom_factor
            )
        all_c2ws = np.concatenate([input_c2ws, target_c2ws], 0)
        all_Ks = (
            np.concatenate([input_Ks, target_Ks], 0)
            * np.array([W, H, 1.0])[:, None]
        )
        num_targets = len(target_c2ws)
        input_indices = list(range(num_inputs))

        version = copy.deepcopy(self.version)
        version.H, version.W = H, W
        options = EngineOptions(
            chunk_strategy=chunk_strategy,
            video_save_fps=30.0,
            guider_types=[1, 2],
            cfg=[float(cfg), 3.0 if num_inputs >= 9 else 2.0],
            camera_scale=camera_scale,
            num_steps=num_steps,
            cfg_min=1.2,
            encoding_t=0,
            # the reference en/decodes 1 frame at a time for GPU memory
            # (demo_gr.py:569-570); on TPU one flat batch over all T frames is
            # the measured optimum AT 576^2 (2.82 s vs 3.86 s chunked,
            # round-3 journal) and just fits HBM there (~11 GB decoder
            # activations + 2.6 GB params + the overlapped next scan).
            # Larger frames scale the decoder's widest layer linearly in
            # pixels — the Basic 768x576 workload OOMed 16 GB exactly here
            # (round-5 journal) — so above 576^2 the decode groups into
            # lax.map sub-batches sized to ~60% of the proven footprint.
            decoding_t=(
                0
                if H * W <= 576 * 576
                else max(4, int(21 * (576 * 576) / (H * W) * 0.6))
            ),
            min_anchor_fill=min_anchor_fill,
        )
        # Economy (min_anchor_fill=False): anchors at exact target indices,
        # balanced gaps bounded by the per-chunk capacity (plan_dense_anchors)
        # — the minimum anchor count vs the reference's fill-to-T-1
        # (seva/eval.py:404-407) and round(linspace) placement; optionally
        # with anchor delivery. Reference placement otherwise.
        if deliver_anchors is not None:
            options.set("deliver_anchors", bool(deliver_anchors))
        # None = AUTO: resolve_anchors turns delivery on iff the dense
        # economy schedule applies (config.deliver_anchors rationale)
        rel, _dense = resolve_anchors(
            version.T, num_inputs, num_targets, version, options
        )
        anchor_indices = [num_inputs + r for r in rel]
        num_anchors = len(anchor_indices)
        anchor_c2ws = all_c2ws[[round(ind) for ind in anchor_indices]]
        anchor_Ks = all_Ks[[round(ind) for ind in anchor_indices]]

        first_chunks, second_chunks = self.chunk_counts(
            input_c2ws,
            anchor_c2ws,
            target_c2ws,
            input_indices,
            [round(i) for i in anchor_indices],
            list(range(num_inputs, num_inputs + num_targets)),
            options,
            version.T,
        )

        all_imgs_np = (
            np.concatenate(
                [input_imgs, np.zeros((num_targets,) + input_imgs.shape[1:])], 0
            )
            * 255.0
        ).astype(np.uint8)
        return {
            "version": version,
            "options": options,
            "seed": seed,
            "image_cond": {
                "img": [im for im in all_imgs_np],
                "input_indices": input_indices,
                "prior_indices": anchor_indices,
            },
            "camera_cond": {
                "c2w": all_c2ws.astype(np.float32),
                "K": [k for k in all_Ks.astype(np.float32)],
                "input_indices": list(range(num_inputs + num_targets)),
            },
            "anchor_c2ws": anchor_c2ws,
            "anchor_Ks": anchor_Ks,
            # progress-bar sizing: total sigma-steps per pass
            "first_pass_steps": first_chunks * num_steps,
            "second_pass_steps": second_chunks * num_steps,
            "first_pass_chunks": first_chunks,
            "second_pass_chunks": second_chunks,
        }

    def run(
        self,
        plan: dict,
        abort_event=None,
        first_pass_pbar=None,
        second_pass_pbar=None,
    ):
        """Execute a prepared plan; yields video paths (first pass, then
        final) as the engine produces them."""
        render_name = datetime.now().strftime("%Y%m%d_%H%M%S")
        render_dir = osp.join(self.work_dir, render_name)
        engine = SceneEngine(self.bundle, plan["version"], plan["options"])
        return engine.run_one_scene(
            "img2trajvid",
            plan["image_cond"],
            plan["camera_cond"],
            save_path=render_dir,
            use_traj_prior=True,
            traj_prior_Ks=plan["anchor_Ks"],
            traj_prior_c2ws=plan["anchor_c2ws"],
            seed=plan["seed"],
            abort_event=abort_event,
            first_pass_pbar=first_pass_pbar,
            second_pass_pbar=second_pass_pbar,
        )

    def render(
        self,
        preprocessed: dict,
        abort_event=None,
        first_pass_pbar=None,
        second_pass_pbar=None,
        **kwargs,
    ):
        """prepare + run in one call; returns the video-path generator."""
        plan = self.prepare(preprocessed, **kwargs)
        return self.run(
            plan,
            abort_event=abort_event,
            first_pass_pbar=first_pass_pbar,
            second_pass_pbar=second_pass_pbar,
        )

    def chunk_counts(self, input_c2ws, anchor_c2ws, target_c2ws, input_indices,
                     anchor_indices, target_indices, options, T) -> tuple[int, int]:
        """Pre-compute both passes' chunk counts to size progress bars
        (reference demo_gr.py:576-627)."""
        quiet = copy.deepcopy(options)
        quiet.sampler_verbose = False
        T_first = T[0] if isinstance(T, (list, tuple)) else T
        n0 = len(
            planner.chunk_input_and_test(
                T_first,
                input_c2ws,
                anchor_c2ws,
                input_indices,
                anchor_indices,
                options=quiet,
                task="img2trajvid",
                chunk_strategy=quiet.get("chunk_strategy_first_pass", "gt-nearest"),
                gt_input_inds=list(range(len(input_c2ws))),
            ).input_inds_per_chunk
        )
        anchor_argsort = np.argsort(
            list(input_indices) + list(anchor_indices), kind="stable"
        ).tolist()
        sorted_anchor_indices = np.array(list(input_indices) + list(anchor_indices))[
            anchor_argsort
        ].tolist()
        gt_input_inds = [anchor_argsort.index(i) for i in range(len(input_c2ws))]
        anchor_c2ws_second = np.concatenate([input_c2ws, anchor_c2ws], 0)[
            anchor_argsort
        ]
        T_second = T[1] if isinstance(T, (list, tuple)) else T
        if quiet.get("deliver_anchors", False):
            # anchor-coincident targets are delivered, not re-planned
            # (mirrors SceneEngine's second-pass reduction)
            coincident = set(anchor_indices)
            keep = [j for j, t in enumerate(target_indices) if t not in coincident]
            target_c2ws = target_c2ws[keep]
            target_indices = [target_indices[j] for j in keep]
        n1 = len(
            planner.chunk_input_and_test(
                T_second,
                anchor_c2ws_second,
                target_c2ws,
                sorted_anchor_indices,
                target_indices,
                options=quiet,
                task="img2trajvid",
                chunk_strategy=quiet.get("chunk_strategy", "nearest"),
                gt_input_inds=gt_input_inds,
            ).input_inds_per_chunk
        )
        return n0, n1
