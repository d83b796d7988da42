"""Golden-parity tests for image+K resize/crop/pad policies vs the reference
(seva/eval.py:99-322), run as an oracle with torch CPU."""

import numpy as np
import pytest
import torch

from stable_virtual_camera_tpu.core import transforms as tf


@pytest.mark.parametrize(
    "target,current",
    [((576, 576), (480, 640)), ((576, 576), (640, 480)), ((320, 576), (480, 640)),
     ((576, 320), (200, 100)), ((100, 300), (300, 100))],
)
@pytest.mark.parametrize("cover", [True, False])
def test_resizing_factor_matches_reference(ref, target, current, cover):
    assert tf.get_resizing_factor(target, current, cover) == pytest.approx(
        ref.eval.get_resizing_factor(target, current, cover)
    )


@pytest.mark.parametrize("w,h,size", [(640, 480, 576), (480, 640, 576), (100, 100, 64)])
def test_wh_shortest_side_matches_reference(ref, w, h, size):
    assert tf.get_wh_with_fixed_shortest_side(w, h, size) == (
        ref.eval.get_wh_with_fixed_shortest_side(w, h, size)
    )


@pytest.mark.parametrize("mode", ["crop", "pad", "stretch"])
@pytest.mark.parametrize("size", [(64, 64), 64])
def test_transform_img_and_K_matches_reference(ref, rng, mode, size):
    h, w = 96, 128
    # smooth synthetic image: resize backends (cv2 INTER_AREA vs torch area)
    # differ at fractional scales, so content comparison must use naturally
    # smooth data; K math is compared exactly.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [np.sin(xx / 9) * np.cos(yy / 7), xx / w * 2 - 1, yy / h * 2 - 1], -1
    )[None]
    K = np.array(
        [[100.0, 0.0, w / 2], [0.0, 100.0, h / 2], [0.0, 0.0, 1.0]], dtype=np.float64
    )

    ours_img, ours_K = tf.transform_img_and_K(
        img.copy(), size, K=K[None].copy(), mode=mode
    )
    theirs_img, theirs_K = ref.eval.transform_img_and_K(
        torch.from_numpy(np.moveaxis(img, -1, 1).copy()),
        size,
        K=torch.from_numpy(K[None].copy()).float(),
        mode=mode,
    )
    theirs_img = np.moveaxis(theirs_img.numpy(), 1, -1)
    assert ours_img.shape == theirs_img.shape
    np.testing.assert_allclose(ours_K, theirs_K.numpy(), rtol=1e-5, atol=1e-4)
    # interpolation backends differ (cv2 INTER_AREA vs torch area): compare
    # loosely but meaningfully
    assert np.abs(ours_img - theirs_img).mean() < 0.03


def test_normalized_K_branch_matches_reference(ref, rng):
    h, w = 96, 128
    img = rng.uniform(-1, 1, size=(1, h, w, 3)).astype(np.float32)
    K = np.array(
        [[0.9, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]], dtype=np.float64
    )
    ours_img, ours_K = tf.transform_img_and_K(
        img.copy(), (64, 64), K=K[None].copy(), mode="crop"
    )
    _, theirs_K = ref.eval.transform_img_and_K(
        torch.from_numpy(np.moveaxis(img, -1, 1).copy()),
        (64, 64),
        K=torch.from_numpy(K[None].copy()).float(),
        mode="crop",
    )
    np.testing.assert_allclose(ours_K, theirs_K.numpy(), rtol=1e-5, atol=1e-4)


def test_mixed_K_batch_classified_per_row(rng):
    """A batch mixing normalized and pixel-unit Ks must classify each K
    independently (ADVICE r4 medium #1: the batched transform previously
    classified the whole batch as a unit) — each row must equal its own
    single-K transform."""
    h, w = 96, 128
    img = rng.uniform(-1, 1, size=(2, h, w, 3)).astype(np.float32)
    K_norm = np.array(
        [[0.9, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]], dtype=np.float64
    )
    K_pix = np.array(
        [[110.0, 0.0, 64.0], [0.0, 115.0, 48.0], [0.0, 0.0, 1.0]],
        dtype=np.float64,
    )
    _, K_batch = tf.transform_img_and_K(
        img.copy(), (64, 64), K=np.stack([K_norm, K_pix]).copy(), mode="crop"
    )
    for row, K in enumerate([K_norm, K_pix]):
        _, K_solo = tf.transform_img_and_K(
            img[row : row + 1].copy(), (64, 64), K=K[None].copy(), mode="crop"
        )
        np.testing.assert_allclose(K_batch[row], K_solo[0], rtol=1e-12)


def test_load_img_and_K_roundtrip(tmp_path, rng):
    from PIL import Image

    arr = (rng.uniform(0, 255, (80, 120, 3))).astype(np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    img, K = tf.load_img_and_K(
        str(p), 64, K=np.array([[0.9, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1.0]])
    )
    assert img.shape[0] == 1 and img.shape[-1] == 3
    assert img.min() >= -1.0 and img.max() <= 1.0
    assert K is not None


def test_value_dict_matches_reference(ref, rng):
    """Camera centering/normalization + Plücker of the chunk-conditioning
    builder vs reference get_value_dict (seva/eval.py:1152-1215)."""
    from stable_virtual_camera_tpu.engine.value_dict import build_chunk_values
    from conftest import random_c2ws

    T, H, W = 5, 64, 64
    imgs = rng.uniform(-1, 1, (T, H, W, 3)).astype(np.float32)
    c2ws = random_c2ws(rng, T).astype(np.float32)[:, :3]
    Ks = np.repeat(
        np.array([[1.1, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1.0]], np.float32)[None], T, 0
    )
    all_c2ws = random_c2ws(rng, 12).astype(np.float32)
    input_inds = [0, 2]
    # camera indices must be a 0..k-1 prefix (the reference's own contract,
    # seva/eval.py:1162-1164)
    cam_inds = [0, 1]

    values = build_chunk_values(
        imgs, imgs, input_inds, c2ws, Ks, cam_inds, all_c2ws[:, :3],
        camera_scale=2.0, latent_hw=(H // 8, W // 8),
    )

    vd = ref.eval.get_value_dict(
        torch.from_numpy(np.moveaxis(imgs, -1, 1)),
        torch.from_numpy(np.moveaxis(imgs, -1, 1)),
        input_inds,
        torch.from_numpy(c2ws),
        torch.from_numpy(Ks),
        cam_inds,
        all_c2ws=torch.from_numpy(all_c2ws[:, :3]),
        camera_scale=2.0,
    )
    np.testing.assert_allclose(
        values.c2w, vd["c2w"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.moveaxis(values.plucker, -1, 1),
        vd["plucker_coordinate"].numpy(),
        atol=2e-4,
    )
    np.testing.assert_array_equal(
        values.input_frame_mask, vd["cond_frames_mask"].numpy()
    )
