"""Native (jax/optax) global alignment recovers poses, focal and geometry
from synthetic pairwise pointmaps — the stage the reference delegates to
torch's PointCloudOptimizer (reference seva/modules/preprocessor.py:78-101).

The synthetic construction mirrors the stereo net's contract: for edge
(i, j) both pointmaps live in image i's frame, each edge has its own
arbitrary scale, confidences vary per pixel, and predictions carry noise."""

import numpy as np
import pytest

from stable_virtual_camera_tpu.core.global_alignment import (
    EdgePreds,
    estimate_focal,
    global_align,
    weighted_umeyama,
)


def _lookat_c2w(pos, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    """OpenCV-convention c2w (+z forward) looking at `target`."""
    pos = np.asarray(pos, np.float64)
    fwd = np.asarray(target, np.float64) - pos
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, :3] = np.stack([right, down, fwd], axis=1)
    c2w[:3, 3] = pos
    return c2w


def _make_scene(N=4, H=24, W=32, f=40.0, noise=0.0, seed=0):
    """GT cameras on an arc + smooth GT depth per image -> EdgePreds with
    random per-edge scales; returns (edges, gt dict)."""
    rng = np.random.default_rng(seed)
    thetas = np.linspace(-0.5, 0.5, N)
    c2ws = np.stack(
        [_lookat_c2w((4 * np.sin(t), 0.7 * np.sin(2 * t), -4 * np.cos(t)))
         for t in thetas]
    )
    uu, vv = np.meshgrid(
        np.arange(W) + 0.5 - W / 2, np.arange(H) + 0.5 - H / 2
    )
    dirs = np.stack([uu / f, vv / f, np.ones_like(uu)], -1)  # (H, W, 3)
    depth = 3.0 + 0.5 * np.sin(
        np.linspace(0, 2 * np.pi, W)[None, :] + np.linspace(0, np.pi, H)[:, None]
    )
    depth = np.stack([depth + 0.1 * k for k in range(N)])  # (N, H, W)
    cam_pts = depth[..., None] * dirs  # (N, H, W, 3) frame-local
    world = (
        np.einsum("nab,nhwb->nhwa", c2ws[:, :3, :3], cam_pts)
        + c2ws[:, None, None, :3, 3]
    )

    i_idx, j_idx, pts1, pts2, conf1, conf2, kappas = [], [], [], [], [], [], []
    w2cs = np.linalg.inv(c2ws)
    for i in range(N):
        for j in range(N):
            if i == j:
                continue
            kappa = float(rng.uniform(0.5, 2.0))  # per-edge scale ambiguity
            in_i = lambda pts: (
                np.einsum("ab,hwb->hwa", w2cs[i, :3, :3], pts)
                + w2cs[i, :3, 3]
            )
            p1 = kappa * in_i(world[i])
            p2 = kappa * in_i(world[j])
            if noise:
                p1 = p1 + rng.normal(scale=noise, size=p1.shape)
                p2 = p2 + rng.normal(scale=noise, size=p2.shape)
            i_idx.append(i)
            j_idx.append(j)
            pts1.append(p1)
            pts2.append(p2)
            # span the default min_conf_thr=3 so masks are non-trivial
            conf1.append(rng.uniform(1.0, 10.0, (H, W)))
            conf2.append(rng.uniform(1.0, 10.0, (H, W)))
            kappas.append(kappa)
    edges = EdgePreds(
        i_idx=np.array(i_idx),
        j_idx=np.array(j_idx),
        pts1=np.stack(pts1).astype(np.float32),
        conf1=np.stack(conf1).astype(np.float32),
        pts2=np.stack(pts2).astype(np.float32),
        conf2=np.stack(conf2).astype(np.float32),
    )
    return edges, {"c2ws": c2ws, "f": f, "world": world, "depth": depth}


def test_weighted_umeyama_recovers_similarity():
    rng = np.random.default_rng(3)
    src = rng.normal(size=(200, 3))
    ang = 0.7
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    )
    s, t = 1.7, np.array([0.3, -1.2, 2.0])
    dst = s * src @ R.T + t
    w = rng.uniform(0.5, 2.0, 200)
    s_fit, R_fit, t_fit = weighted_umeyama(src, dst, w)
    np.testing.assert_allclose(s_fit, s, rtol=1e-10)
    np.testing.assert_allclose(R_fit, R, atol=1e-10)
    np.testing.assert_allclose(t_fit, t, atol=1e-9)


def test_estimate_focal_exact_pinhole():
    H, W, f = 30, 40, 55.0
    uu, vv = np.meshgrid(np.arange(W) + 0.5 - W / 2, np.arange(H) + 0.5 - H / 2)
    depth = 2.0 + 0.3 * np.cos(uu / 7) * np.sin(vv / 5)
    pts = np.stack([depth * uu / f, depth * vv / f, depth], -1)
    f_fit = estimate_focal(pts, np.ones((H, W)))
    np.testing.assert_allclose(f_fit, f, rtol=1e-10)


def _align_to_gt(c2ws_rec, c2ws_gt):
    """Global similarity mapping recovered camera centers onto GT."""
    s, R, t = weighted_umeyama(
        c2ws_rec[:, :3, 3], c2ws_gt[:, :3, 3], np.ones(len(c2ws_rec))
    )
    out = c2ws_rec.copy()
    out[:, :3, 3] = s * c2ws_rec[:, :3, 3] @ R.T + t
    out[:, :3, :3] = np.einsum("ab,nbc->nac", R, c2ws_rec[:, :3, :3])
    return out, s, R, t


@pytest.mark.parametrize("noise", [0.0, 0.01])
def test_global_align_recovers_scene(noise):
    edges, gt = _make_scene(N=4, noise=noise, seed=1)
    scene = global_align(edges, niter=200, lr=0.01)

    assert np.isfinite(scene.final_loss)
    rec, s, R, t = _align_to_gt(scene.c2ws.astype(np.float64), gt["c2ws"])

    # camera centers (scene scale ~4)
    pos_tol = 0.02 if noise == 0 else 0.08
    np.testing.assert_allclose(
        rec[:, :3, 3], gt["c2ws"][:, :3, 3], atol=pos_tol
    )
    # rotations: angular error per camera
    for n in range(len(rec)):
        dR = rec[n, :3, :3].T @ gt["c2ws"][n, :3, :3]
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < (1.0 if noise == 0 else 4.0), f"cam {n}: {ang:.2f} deg"
    # shared focal
    np.testing.assert_allclose(
        scene.Ks[:, 0, 0], gt["f"], rtol=0.01 if noise == 0 else 0.05
    )
    # geometry: recovered world points match GT under the same similarity
    rec_pts = scene.pts3d.astype(np.float64) @ R.T * s + t
    err = np.linalg.norm(rec_pts - gt["world"], axis=-1)
    assert np.median(err) < (0.02 if noise == 0 else 0.1)


def test_global_align_masks_threshold():
    edges, _ = _make_scene(N=3, seed=2)
    scene = global_align(edges, niter=5)
    masks = scene.masks(5.0)
    assert len(masks) == 3 and masks[0].shape == scene.conf[0].shape
    assert masks[0].dtype == bool
    # conf was drawn in [1,10]: threshold 5 must be non-trivial
    assert 0 < masks[0].sum() < masks[0].size


def test_global_align_sharded_matches_unsharded():
    """Edge-sharded alignment over the virtual mesh == single-device result
    (params replicated, per-edge residuals sharded, GSPMD grad reduction)."""
    from stable_virtual_camera_tpu.parallel.mesh import make_mesh

    edges, gt = _make_scene(N=4, noise=0.005, seed=6)  # E = 12 edges
    ref = global_align(edges, niter=60, lr=0.01)
    mesh = make_mesh(n_data=4, n_view=2)
    sharded = global_align(edges, niter=60, lr=0.01, mesh=mesh)
    np.testing.assert_allclose(sharded.final_loss, ref.final_loss, rtol=1e-3)
    # cross-device reduction order perturbs grads at fp32 epsilon; the scene
    # ends in the same place to tight tolerance
    np.testing.assert_allclose(
        sharded.c2ws[:, :3, 3], ref.c2ws[:, :3, 3], atol=5e-3
    )
    np.testing.assert_allclose(sharded.Ks[0, 0, 0], ref.Ks[0, 0, 0], rtol=1e-3)


def test_ragged_output_mixed_resolutions_recovers_scene():
    """dust3r-style ragged inference output (each image at its own
    aspect-dependent size) -> padded EdgePreds with per-image principal
    points -> the aligner still recovers the GT scene. The replaced torch
    PointCloudOptimizer supported per-image imshapes; this pins parity."""
    import torch

    from stable_virtual_camera_tpu.core.global_alignment import (
        edges_from_dust3r_output,
    )

    rng = np.random.default_rng(12)
    f = 40.0
    hws = [(24, 32), (32, 24), (24, 32)]  # mixed aspect ratios
    N = len(hws)
    thetas = np.linspace(-0.4, 0.4, N)
    c2ws = np.stack(
        [_lookat_c2w((4 * np.sin(t), 0.5 * np.sin(2 * t), -4 * np.cos(t)))
         for t in thetas]
    )
    w2cs = np.linalg.inv(c2ws)

    world = []
    for n, (H, W) in enumerate(hws):
        uu, vv = np.meshgrid(
            np.arange(W) + 0.5 - W / 2, np.arange(H) + 0.5 - H / 2
        )
        dirs = np.stack([uu / f, vv / f, np.ones_like(uu)], -1)
        depth = 3.0 + 0.4 * np.cos(uu / 9 + 0.3 * n) * np.sin(vv / 7)
        pts = depth[..., None] * dirs
        world.append(
            np.einsum("ab,hwb->hwa", c2ws[n, :3, :3], pts) + c2ws[n, :3, 3]
        )

    i_idx, j_idx, p1s, p2s, c1s, c2s = [], [], [], [], [], []
    for i in range(N):
        for j in range(N):
            if i == j:
                continue
            kappa = float(rng.uniform(0.6, 1.7))
            in_i = lambda pts: (
                np.einsum("ab,hwb->hwa", w2cs[i, :3, :3], pts) + w2cs[i, :3, 3]
            )
            i_idx.append(i)
            j_idx.append(j)
            p1s.append(torch.tensor((kappa * in_i(world[i])).astype(np.float32)))
            p2s.append(torch.tensor((kappa * in_i(world[j])).astype(np.float32)))
            c1s.append(torch.tensor(rng.uniform(1, 10, hws[i]).astype(np.float32)))
            c2s.append(torch.tensor(rng.uniform(1, 10, hws[j]).astype(np.float32)))

    output = {
        "view1": {"idx": i_idx},
        "view2": {"idx": j_idx},
        "pred1": {"pts3d": p1s, "conf": c1s},
        "pred2": {"pts3d_in_other_view": p2s, "conf": c2s},
    }
    edges = edges_from_dust3r_output(output)
    assert edges.img_whs is not None
    np.testing.assert_array_equal(edges.img_whs[0], (32, 24))
    np.testing.assert_array_equal(edges.img_whs[1], (24, 32))

    scene = global_align(edges, niter=200, lr=0.01)
    rec, s, R, t = _align_to_gt(scene.c2ws.astype(np.float64), c2ws)
    np.testing.assert_allclose(rec[:, :3, 3], c2ws[:, :3, 3], atol=0.03)
    np.testing.assert_allclose(scene.Ks[:, 0, 0], f, rtol=0.02)
    # per-image principal points at each image's real center
    np.testing.assert_allclose(scene.Ks[0, 0, 2], 16.0)
    np.testing.assert_allclose(scene.Ks[1, 0, 2], 12.0)
    # padded pixels never survive the masks
    masks = scene.masks(0.5)
    assert not masks[1][:, 24:].any() and not masks[0][24:, :].any()
