"""Native LPIPS tower: math parity vs an in-test torch oracle of the
LPIPS-v0.1 spec, converter layout round-trip, and the metrics-harness
execution path with synthetic weights (default tier — the whole file uses a
few small images on CPU)."""

import numpy as np
import pytest

from stable_virtual_camera_tpu.models import lpips as L


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _torch_state_dicts(rng):
    """Synthetic torch checkpoints in the EXACT released layouts:
    torchvision vgg16 (`features.{idx}.weight/bias`, OIHW) and the lpips
    package's vgg.pth heads (`lin{i}.model.1.weight`, (1, C, 1, 1))."""
    import torch

    vgg_sd, in_ch = {}, 3
    for idx, out_ch in L._VGG16_CONVS:
        vgg_sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.normal(0, 0.1, size=(out_ch, in_ch, 3, 3)).astype(np.float32)
        )
        vgg_sd[f"features.{idx}.bias"] = torch.from_numpy(
            rng.normal(0, 0.1, size=(out_ch,)).astype(np.float32)
        )
        in_ch = out_ch
    chns = [64, 128, 256, 512, 512]
    lin_sd = {
        f"lin{i}.model.1.weight": torch.from_numpy(
            rng.uniform(0, 0.2, size=(1, c, 1, 1)).astype(np.float32)
        )
        for i, c in enumerate(chns)
    }
    return vgg_sd, lin_sd


def _torch_lpips_oracle(vgg_sd, lin_sd, pred, target):
    """The LPIPS-v0.1 computation, written directly against the torch
    checkpoints (conv trunk + ScalingLayer + unit-normalize + squared diff +
    1x1 heads + spatial mean) — an independent oracle for the flax graph."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def features(x):
        x = (x - shift) / scale
        taps = []
        for idx, _ in L._VGG16_CONVS:
            if idx in L._POOL_BEFORE:
                x = F.max_pool2d(x, 2, 2)
            x = F.relu(
                F.conv2d(
                    x, vgg_sd[f"features.{idx}.weight"],
                    vgg_sd[f"features.{idx}.bias"], padding=1,
                )
            )
            if idx in L._TAP_AFTER:
                taps.append(x)
        return taps

    def unit_norm(f):
        n = torch.sqrt(torch.sum(f**2, dim=1, keepdim=True))
        return f / (n + 1e-10)

    def to_t(x):
        return torch.from_numpy(np.moveaxis(x, -1, 1).copy())

    with torch.no_grad():
        f0, f1 = features(to_t(pred)), features(to_t(target))
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            d = (unit_norm(a) - unit_norm(b)) ** 2
            r = F.conv2d(d, lin_sd[f"lin{i}.model.1.weight"])
            total = total + r.mean(dim=(1, 2, 3))
        return total.numpy()


def test_matches_torch_oracle(rng):
    vgg_sd, lin_sd = _torch_state_dicts(rng)
    params = L.convert_lpips(vgg_sd, lin_sd)
    pred = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    target = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    oracle = _torch_lpips_oracle(vgg_sd, lin_sd, pred, target)
    module = L.LPIPS()
    ours = np.asarray(module.apply({"params": params}, pred, target))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_identity_is_zero(rng):
    params = L.synthetic_lpips_params()
    x = rng.uniform(-1, 1, size=(1, 64, 64, 3)).astype(np.float32)
    val = np.asarray(L.LPIPS().apply({"params": params}, x, x))
    np.testing.assert_allclose(val, 0.0, atol=1e-6)


def test_save_load_roundtrip(tmp_path, rng):
    params = L.synthetic_lpips_params(seed=3)
    path = str(tmp_path / "lpips.msgpack")
    L.save_lpips(params, path)
    loaded = L.load_lpips(path)
    flat_a = jax_flat(params)
    flat_b = jax_flat(loaded)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def jax_flat(tree):
    import jax

    return {
        "/".join(str(p.key) for p in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_metrics_harness_synthetic_path(monkeypatch, rng):
    """SVC_LPIPS_WEIGHTS=synthetic makes benchmark.metrics score LPIPS
    through the native tower — the drill path that proves the scoring
    pipeline runs before real weights can land."""
    from benchmark import metrics

    monkeypatch.setenv("SVC_LPIPS_WEIGHTS", "synthetic")
    assert metrics.lpips_available()
    fn = metrics.lpips_fn()
    a = rng.uniform(0, 1, size=(32, 32, 3))
    b = rng.uniform(0, 1, size=(32, 32, 3))
    val = fn(a, b)
    assert isinstance(val, float) and np.isfinite(val)
    assert fn(a, a) == pytest.approx(0.0, abs=1e-6)


def test_metrics_harness_file_path(monkeypatch, tmp_path, rng):
    """A converted checkpoint on disk resolves through the same harness."""
    from benchmark import metrics

    path = str(tmp_path / "lpips.msgpack")
    L.save_lpips(L.synthetic_lpips_params(seed=5), path)
    monkeypatch.setenv("SVC_LPIPS_WEIGHTS", path)
    assert metrics.lpips_available()
    fn = metrics.lpips_fn()
    a = rng.uniform(0, 1, size=(16, 16, 3))
    assert np.isfinite(fn(a, a * 0.5))
