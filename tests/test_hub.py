"""Hub auto-download wiring (models/hub.py): repo/filename contract against
a monkeypatched hf_hub_download (no egress here), and the offline error
path. The real download is exercised the day the environment has network."""

import os.path as osp

import pytest

from stable_virtual_camera_tpu.models import hub


def test_release_table_matches_reference_repos():
    # the exact artifacts the reference pulls (seva/utils.py:29-43 etc.)
    assert hub.RELEASED["seva"][0] == "stabilityai/stable-virtual-camera"
    assert hub.RELEASED["seva"][1] == "model.safetensors"
    assert hub.RELEASED["vae"][0] == "stabilityai/stable-diffusion-2-1-base"
    assert hub.RELEASED["clip"][0].startswith("laion/CLIP-ViT-H-14")


def test_download_released_wiring(monkeypatch, tmp_path):
    calls = []

    def fake_download(repo_id, filename, cache_dir=None):
        calls.append((repo_id, filename))
        p = tmp_path / filename.replace("/", "_")
        p.write_bytes(b"fake")
        return str(p)

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "hf_hub_download", fake_download)
    paths = hub.download_released(components=("seva", "vae"))
    assert set(paths) == {"seva", "vae"}
    assert all(osp.exists(p) for p in paths.values())
    assert ("stabilityai/stable-virtual-camera", "model.safetensors") in calls
    assert (
        "stabilityai/stable-diffusion-2-1-base",
        "vae/diffusion_pytorch_model.safetensors",
    ) in calls


def test_offline_raises_actionable_error(monkeypatch):
    import huggingface_hub

    def boom(**kw):
        raise OSError("offline")

    monkeypatch.setattr(huggingface_hub, "hf_hub_download", boom)
    with pytest.raises(RuntimeError, match="network egress"):
        hub.download_released(components=("seva",))
