"""HTTP render service (apps/server.py): job lifecycle, queue discipline,
abort, and the JSON API — fast tests drive RenderService/HTTP with injected
fake runners; the slow test renders a real tiny scene through the full stack
(the serving counterpart of test_cli, reference demo_gr.py's gpu_queue)."""

import http.client
import json
import threading
import time

import numpy as np
import pytest

from stable_virtual_camera_tpu.apps.server import (
    RenderService,
    build_http_server,
)


def _wait(pred, timeout=10.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.01)
    return False


def test_job_lifecycle_and_order():
    ran = []
    gate = threading.Event()

    def runner(spec, job, abort):
        gate.wait(5)
        ran.append(spec["data_path"])
        return [spec["data_path"] + "/out"]

    svc = RenderService(runner)
    try:
        a = svc.submit({"data_path": "/a"})
        b = svc.submit({"data_path": "/b"})
        # single-flight: nothing finishes until the gate opens
        assert svc.get(a)["status"] in ("queued", "running")
        assert svc.get(b)["status"] == "queued"
        gate.set()
        assert _wait(lambda: svc.get(b)["status"] == "done")
        assert svc.get(a)["status"] == "done"
        assert ran == ["/a", "/b"]  # FIFO
        assert svc.get(a)["outputs"] == ["/a/out"]
        assert svc.get("nope") is None
    finally:
        svc.shutdown()


def test_error_isolation():
    def runner(spec, job, abort):
        if spec["data_path"] == "/bad":
            raise RuntimeError("boom")
        return []

    svc = RenderService(runner)
    try:
        bad = svc.submit({"data_path": "/bad"})
        good = svc.submit({"data_path": "/good"})
        assert _wait(lambda: svc.get(good)["status"] == "done")
        rec = svc.get(bad)
        assert rec["status"] == "error" and "boom" in rec["error"]
    finally:
        svc.shutdown()


def test_abort_queued_and_running():
    started = threading.Event()

    def runner(spec, job, abort):
        started.set()
        # cooperative poll, like the engine between chunks
        for _ in range(500):
            if abort.is_set():
                return []
            time.sleep(0.01)
        return ["never"]

    svc = RenderService(runner)
    try:
        running = svc.submit({"data_path": "/x"})
        queued = svc.submit({"data_path": "/y"})
        assert started.wait(5)
        assert svc.abort(queued)  # drops before it ever runs
        assert svc.get(queued)["status"] == "aborted"
        assert svc.abort(running)
        assert _wait(lambda: svc.get(running)["status"] == "aborted")
        assert not svc.abort("nope")
    finally:
        svc.shutdown()


def test_submit_validation():
    svc = RenderService(lambda s, j, a: [])
    try:
        with pytest.raises(ValueError):
            svc.submit({"no_data_path": 1})
        with pytest.raises(ValueError):
            svc.submit("not a dict")
    finally:
        svc.shutdown()


@pytest.fixture()
def http_stack():
    gate = threading.Event()

    def runner(spec, job, abort):
        job.progress.update({"step": 3, "total": 5})
        gate.wait(5)
        return ["/out/scene0"]

    svc = RenderService(runner)
    httpd = build_http_server(svc, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    conn = http.client.HTTPConnection(*httpd.server_address)
    yield conn, gate, svc
    conn.close()
    httpd.shutdown()
    svc.shutdown()


def _req(conn, method, path, body=None):
    conn.request(method, path, body=json.dumps(body) if body else None)
    r = conn.getresponse()
    return r.status, json.loads(r.read() or b"{}")


def test_http_api_roundtrip(http_stack):
    conn, gate, svc = http_stack
    code, health = _req(conn, "GET", "/v1/health")
    assert code == 200 and health["status"] == "ok"

    code, out = _req(conn, "POST", "/v1/jobs", {"data_path": "/tmp/scenes"})
    assert code == 201
    jid = out["id"]

    code, rec = _req(conn, "GET", f"/v1/jobs/{jid}")
    assert code == 200 and rec["status"] in ("queued", "running")

    code, lst = _req(conn, "GET", "/v1/jobs")
    assert code == 200 and [j["id"] for j in lst["jobs"]] == [jid]

    gate.set()
    assert _wait(lambda: _req(conn, "GET", f"/v1/jobs/{jid}")[1]["status"] == "done")
    code, rec = _req(conn, "GET", f"/v1/jobs/{jid}")
    assert rec["outputs"] == ["/out/scene0"]
    assert rec["progress"] == {"step": 3, "total": 5}

    # error paths
    assert _req(conn, "GET", "/v1/jobs/zzz")[0] == 404
    assert _req(conn, "GET", "/v1/nope")[0] == 404
    assert _req(conn, "POST", "/v1/jobs", {"bad": 1})[0] == 400
    conn.request("POST", "/v1/jobs", body=b"{not json")
    r = conn.getresponse()
    r.read()
    assert r.status == 400
    assert _req(conn, "DELETE", "/v1/jobs/zzz")[0] == 404
    code, _ = _req(conn, "DELETE", f"/v1/jobs/{jid}")
    assert code == 202  # abort of a finished job is still acknowledged


def test_warmup_buckets_covers_each_T_once():
    """warmup_buckets drives one zero-conditioned sample per distinct T at
    the version's latent resolution (dedup [21, 21] -> one call), with the
    CFG-doubled conditioning shapes the engine produces."""
    from stable_virtual_camera_tpu.apps.server import warmup_buckets
    from stable_virtual_camera_tpu.config import SevaSpec, VersionConfig

    calls = []

    class FakeDenoiser:
        def sample(self, noise, plan, cond, key):
            calls.append((noise.shape, cond.crossattn.shape, cond.dense.shape,
                          plan.num_steps))
            import jax.numpy as jnp

            return jnp.zeros_like(noise)

    class FakeBundle:
        spec = SevaSpec.tiny()
        denoiser = FakeDenoiser()

    version = VersionConfig(H=64, W=64, T=[3, 3])
    warmup_buckets(FakeBundle(), version, num_steps=4)
    assert len(calls) == 1  # duplicate T deduped
    noise_shape, ca_shape, dense_shape, steps = calls[0]
    assert noise_shape == (3, 8, 8, 4) and steps == 4
    assert ca_shape == (6, 1, FakeBundle.spec.context_dim)
    assert dense_shape == (6, 8, 8, FakeBundle.spec.dense_in_channels)


def _write_tiny_scene(tmp_path, rng):
    import json as jsonlib

    from PIL import Image

    from conftest import random_c2ws

    scene = tmp_path / "data" / "scene0"
    (scene / "images").mkdir(parents=True)
    n = 6
    c2ws = random_c2ws(rng, n)
    c2ws_gl = c2ws.copy()
    c2ws_gl[:, :, [1, 2]] *= -1
    frames = []
    for i in range(n):
        img = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
        name = f"images/frame_{i:03d}.png"
        Image.fromarray(img).save(scene / name)
        frames.append(
            {"file_path": f"./{name}", "transform_matrix": c2ws_gl[i].tolist(),
             "fl_x": 80.0, "fl_y": 80.0, "cx": 32.0, "cy": 32.0, "w": 64, "h": 64}
        )
    (scene / "transforms.json").write_text(jsonlib.dumps({"frames": frames}))
    (scene / "train_test_split_1.json").write_text(
        jsonlib.dumps({"train_ids": [0], "test_ids": list(range(1, n))})
    )
    return scene


@pytest.mark.slow  # engine-scale: two full renders of the same scene
def test_server_output_identical_to_cli(tmp_path):
    """The service renders through the SAME render_one_scene as the CLI —
    same seed, same scene must give byte-identical frames. Pins the
    refactor contract between apps/cli.py and apps/server.py."""
    import glob
    import os.path as osp
    import threading as _t

    from stable_virtual_camera_tpu.apps import cli as cli_mod
    from stable_virtual_camera_tpu.apps.server import engine_runner
    from stable_virtual_camera_tpu.config import VersionConfig

    rng = np.random.default_rng(0)
    _write_tiny_scene(tmp_path, rng)
    opts = dict(task="img2trajvid", use_traj_prior=True, num_steps=2,
                guider_types=[1, 2], cfg=[2.0, 2.0], sampler_verbose=False)

    cli_mod.main(
        data_path=str(tmp_path / "data"), random_model=True,
        work_dir=str(tmp_path / "w_cli"), **opts,
    )

    bundle, _ = cli_mod._build_bundle(None, random_model=True)
    runner = engine_runner(
        bundle,
        lambda: VersionConfig(H=64, W=64, T=bundle.spec.num_frames),
        cli_mod._default_options,
        str(tmp_path / "w_srv"),
    )

    class Job:  # minimal stand-in; runner only touches .progress
        progress = {}

    outs = runner({"data_path": str(tmp_path / "data"), **opts}, Job(), _t.Event())
    assert len(outs) == 1

    cli_pngs = sorted(
        glob.glob(str(tmp_path / "w_cli" / "img2trajvid" / "scene0" /
                      "samples-rgb" / "*.png"))
    )
    srv_pngs = sorted(glob.glob(osp.join(outs[0], "samples-rgb", "*.png")))
    assert len(cli_pngs) == len(srv_pngs) > 0
    for a, b in zip(cli_pngs, srv_pngs):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), (a, b)


@pytest.mark.slow  # engine-scale: renders a real (tiny) scene end-to-end
def test_server_end_to_end_tiny_scene(tmp_path):
    from stable_virtual_camera_tpu.apps.cli import _build_bundle, _default_options
    from stable_virtual_camera_tpu.apps.server import engine_runner
    from stable_virtual_camera_tpu.config import VersionConfig

    rng = np.random.default_rng(0)
    _write_tiny_scene(tmp_path, rng)

    bundle, _ = _build_bundle(None, random_model=True)
    runner = engine_runner(
        bundle,
        lambda: VersionConfig(H=64, W=64, T=bundle.spec.num_frames),
        _default_options,
        str(tmp_path / "work"),
    )
    svc = RenderService(runner)
    httpd = build_http_server(svc, port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    conn = http.client.HTTPConnection(*httpd.server_address)
    try:
        code, out = _req(
            conn, "POST", "/v1/jobs",
            {"data_path": str(tmp_path / "data"), "task": "img2trajvid",
             "use_traj_prior": True, "num_steps": 2,
             "guider_types": [1, 2], "cfg": [2.0, 2.0],
             "sampler_verbose": False},
        )
        assert code == 201
        jid = out["id"]
        assert _wait(
            lambda: _req(conn, "GET", f"/v1/jobs/{jid}")[1]["status"]
            in ("done", "error"),
            timeout=1500,
        )
        rec = _req(conn, "GET", f"/v1/jobs/{jid}")[1]
        assert rec["status"] == "done", rec.get("error")
        assert len(rec["outputs"]) == 1
        import os.path as osp

        assert osp.exists(osp.join(rec["outputs"][0], "transforms.json"))
        assert osp.exists(osp.join(rec["outputs"][0], "samples-rgb.mp4"))
        # the engine reported real progress along the way
        assert rec["progress"].get("total", 0) >= 1
    finally:
        conn.close()
        httpd.shutdown()
        svc.shutdown()
