"""Scene -> TrainBatch pipeline: chunk sampling layout, conditioning
semantics (same tensors the sampler consumes), prefetch equivalence, and an
end-to-end fine-tuning step on a parsed scene."""

import jax
import numpy as np
import optax
import pytest

from stable_virtual_camera_tpu.data.dataset import Dataset
from stable_virtual_camera_tpu.data.parsers import DirectParser
from stable_virtual_camera_tpu.models.io import random_bundle
from stable_virtual_camera_tpu.training.data import (
    SceneChunkSampler,
    device_prefetch,
    train_batch_from_values,
)
from stable_virtual_camera_tpu.training.train_step import make_train_step

from conftest import random_c2ws


@pytest.fixture(scope="module")
def bundle():
    return random_bundle(image_hw=(64, 64))


@pytest.fixture(scope="module")
def scene_dataset():
    rng = np.random.default_rng(3)
    n = 6
    # Non-square, non-model-resolution source images exercise the resize+K path.
    imgs = rng.uniform(0, 255, size=(n, 72, 96, 3)).astype(np.uint8)
    c2ws = random_c2ws(rng, n).astype(np.float32)[:, :3]
    Ks = np.repeat(
        np.array(
            [[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]], np.float32
        )[None],
        n,
        axis=0,
    )
    parser = DirectParser([im for im in imgs], c2ws, Ks)
    return Dataset(parser, split="train")


def _sampler(scene_dataset, T=3, k=1):
    return SceneChunkSampler(
        scene_dataset, num_frames=T, num_input_frames=k, image_size=(64, 64)
    )


def test_sampler_chunk_layout(scene_dataset):
    s = _sampler(scene_dataset, T=3, k=2)
    v = s.sample(np.random.default_rng(0))
    assert v.imgs.shape == (3, 64, 64, 3)
    assert v.plucker.shape == (3, 8, 8, 6)
    assert v.K.shape == (3, 3, 3)
    # Input views lead the chunk; slot 0 is the Plücker source.
    np.testing.assert_array_equal(v.input_frame_mask, [True, True, False])
    np.testing.assert_array_equal(v.camera_mask, [True, True, False])
    # Engine-identical normalization: first camera at distance camera_scale.
    assert np.linalg.norm(v.c2w[0, :3, 3]) == pytest.approx(2.0, rel=1e-5)
    assert np.isfinite(v.plucker).all()
    # Ks stay normalized (resize tracked intrinsics into [0, 1] units).
    assert (v.K[:, :2, 2] >= 0).all() and (v.K[:, :2, 2] <= 1).all()


def test_train_batch_semantics(bundle, scene_dataset):
    s = _sampler(scene_dataset, T=3, k=1)
    v = s.sample(np.random.default_rng(1))
    b = train_batch_from_values(bundle.vae, bundle.clip, v)
    T = 3
    assert b.latents.shape == (T, 8, 8, 4)
    assert b.concat.shape == (T, 8, 8, 7)
    assert b.dense.shape == (T, 8, 8, 6)
    assert b.crossattn.shape == (T, 1, bundle.spec.context_dim)
    # concat channel 0 is the input-frame mask map; the rest is the Plücker.
    np.testing.assert_array_equal(
        b.concat[..., 0], np.broadcast_to([[[1.0]], [[0.0]], [[0.0]]], (T, 8, 8))
    )
    np.testing.assert_array_equal(b.concat[..., 1:], b.dense)
    np.testing.assert_array_equal(b.dense, v.plucker.astype(np.float32))
    # One shared CLIP embedding row per frame.
    np.testing.assert_array_equal(b.crossattn[0], b.crossattn[1])
    # Input views drop out of the loss by default.
    np.testing.assert_array_equal(b.loss_mask, [0.0, 1.0, 1.0])
    b_all = train_batch_from_values(bundle.vae, bundle.clip, v, mask_inputs=False)
    np.testing.assert_array_equal(b_all.loss_mask, [1.0, 1.0, 1.0])
    # Latents are the sampler's replace-space: the VAE encode of the frames.
    np.testing.assert_allclose(
        b.latents, np.asarray(bundle.vae.encode(v.imgs, 0)), rtol=1e-5
    )


def test_device_prefetch_matches_direct(bundle, scene_dataset):
    s = _sampler(scene_dataset)
    import itertools

    direct = list(
        itertools.islice(s.batches(bundle.vae, bundle.clip, seed=5), 3)
    )
    fetched = list(
        itertools.islice(
            device_prefetch(s.batches(bundle.vae, bundle.clip, seed=5), size=2), 3
        )
    )
    for a, b in zip(direct, fetched):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_device_prefetch_propagates_errors():
    def gen():
        raise RuntimeError("producer failed")
        yield  # pragma: no cover

    with pytest.raises(RuntimeError, match="producer failed"):
        list(device_prefetch(gen()))


@pytest.mark.slow
def test_scene_finetune_step(bundle, scene_dataset):
    """End to end: parsed scene -> prefetched batches -> two optimizer steps
    on the tiny UNet; the loss is finite and the params move."""
    s = _sampler(scene_dataset)
    opt = optax.adamw(1e-4)
    step = make_train_step(
        bundle.denoiser.unet, opt, num_frames=bundle.spec.num_frames
    )
    params = jax.tree.map(lambda x: x, bundle.denoiser.params)
    p0 = jax.tree.leaves(bundle.denoiser.params)[0].copy()
    opt_state = opt.init(params)
    it = device_prefetch(s.batches(bundle.vae, bundle.clip, seed=9), size=2)
    for i, batch in zip(range(2), it):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(i)
        )
        assert np.isfinite(float(loss))
    assert not np.array_equal(np.asarray(jax.tree.leaves(params)[0]), p0)


@pytest.mark.slow
def test_train_cli_smoke_and_resume(tmp_path):
    """The fine-tuning CLI runs end-to-end on a reconfusion scene on disk
    with a random tiny bundle, checkpoints, and resumes from its own state."""
    import json

    from PIL import Image

    from stable_virtual_camera_tpu.apps import train_cli
    from stable_virtual_camera_tpu.training.checkpoint import (
        restore_train_state,
    )

    rng = np.random.default_rng(11)
    scene = tmp_path / "scene0"
    (scene / "images").mkdir(parents=True)
    n = 6
    c2ws = random_c2ws(rng, n)
    c2ws_gl = c2ws.copy()
    c2ws_gl[:, :, [1, 2]] *= -1
    frames = []
    for i in range(n):
        name = f"images/frame_{i:03d}.png"
        Image.fromarray(
            rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
        ).save(scene / name)
        frames.append(
            {
                "file_path": f"./{name}",
                "transform_matrix": c2ws_gl[i].tolist(),
                "fl_x": 80.0, "fl_y": 80.0, "cx": 32.0, "cy": 32.0,
                "w": 64, "h": 64,
            }
        )
    (scene / "transforms.json").write_text(json.dumps({"frames": frames}))
    (scene / "train_test_split_4.json").write_text(
        json.dumps({"train_ids": [0, 1, 2, 3], "test_ids": [4, 5]})
    )

    work = str(tmp_path / "work")
    kwargs = dict(
        data_path=str(scene), work_dir=work, random_model=True,
        num_input_frames=1, lr=1e-4, warmup_steps=1, ema_decay=0.99,
        ckpt_every=2, log_every=1, seed=3,
    )
    train_cli.main(num_steps=3, **kwargs)

    import optax

    ckpt = f"{work}/state"
    # template only supplies structure; reuse via a fresh tiny bundle
    from stable_virtual_camera_tpu.models.io import random_bundle

    bundle = random_bundle(image_hw=(64, 64))
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-4, 1, 3)
    opt = optax.adamw(sched, weight_decay=1e-2)
    _, _, step, ema = restore_train_state(ckpt, opt.init(bundle.denoiser.params))
    assert step == 3 and ema is not None

    train_cli.main(num_steps=5, **kwargs)  # resumes at 3, runs 2 more
    _, _, step, _ = restore_train_state(ckpt, opt.init(bundle.denoiser.params))
    assert step == 5
