"""Training-step tests: loss decreases on a fixed batch; the view-sharded
step matches the unsharded one on the virtual 8-device mesh."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.config import SevaSpec
from stable_virtual_camera_tpu.models.unet import SevaUNet
from stable_virtual_camera_tpu.parallel.mesh import make_mesh
from stable_virtual_camera_tpu.training.train_step import (
    make_sharded_train_step,
    make_train_step,
    synthetic_batch,
)


@pytest.fixture(scope="module")
def setup():
    spec = SevaSpec(
        model_channels=32, num_frames=8, num_head_channels=16, context_dim=64
    )
    T, h, w = spec.num_frames, 16, 16
    # use_pallas=True exercises the trainable flash dispatch in the grad
    # graph (tiny seqs fall back to einsum; the kernel itself is covered
    # by test_flash_attention's interpret-mode grad check)
    unet = SevaUNet(spec, dtype=jnp.float32, param_dtype=jnp.float32,
                    use_pallas=True)
    params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((T, h, w, spec.in_channels)),
        jnp.zeros((T,), jnp.int32),
        jnp.zeros((T, 1, spec.context_dim)),
        jnp.zeros((T, h, w, spec.dense_in_channels)),
        num_frames=T,
    )["params"]
    batch = synthetic_batch(spec, T, h, w, jax.random.PRNGKey(1))
    return spec, unet, params, batch


@pytest.mark.slow
def test_loss_decreases(setup):
    spec, unet, params, batch = setup
    T = spec.num_frames
    opt = optax.adamw(1e-3)
    step = make_train_step(unet, opt, T)
    # the step donates params; keep the module-scoped fixture's tree intact
    params = jax.tree_util.tree_map(jnp.copy, params)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(2)
    # fixed timestep key so every step optimizes the same objective sample
    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, batch, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_sharded_step_matches_unsharded(setup):
    spec, unet, params, batch = setup
    T = spec.num_frames
    opt = optax.adamw(1e-3)
    key = jax.random.PRNGKey(3)

    step = make_train_step(unet, opt, T)
    p1, s1, loss1 = step(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params), batch, key
    )

    mesh = make_mesh(n_data=1, n_view=8)
    with mesh:
        sharded = make_sharded_train_step(unet, opt, T, mesh)
        p2, s2, loss2 = sharded(
            jax.tree_util.tree_map(jnp.copy, params), opt.init(params), batch, key
        )
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-4)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        # cross-device reduction order perturbs grads at fp32 epsilon; Adam's
        # normalization amplifies that, so compare with a modest tolerance
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


@pytest.mark.slow
def test_checkpoint_resume_bit_identical(setup, tmp_path):
    """Save after k steps, restore, continue: identical to an uninterrupted
    run (params bitwise; same keys, donated buffers copied before use)."""
    from stable_virtual_camera_tpu.training.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    spec, unet, params, batch = setup
    T = spec.num_frames
    opt = optax.adamw(1e-3)
    step = make_train_step(unet, opt, T)
    keys = [jax.random.PRNGKey(100 + i) for i in range(4)]

    # uninterrupted: 4 steps
    p, s = jax.tree_util.tree_map(jnp.copy, params), opt.init(params)
    for k in keys:
        p, s, _ = step(p, s, batch, k)

    # interrupted: 2 steps, save, restore, 2 more
    p2, s2 = jax.tree_util.tree_map(jnp.copy, params), opt.init(params)
    for k in keys[:2]:
        p2, s2, _ = step(p2, s2, batch, k)
    ckpt = tmp_path / "state"
    # periodic-checkpoint pattern: the same path is overwritten each save
    save_train_state(str(ckpt), params, opt.init(params), step=0)
    save_train_state(str(ckpt), p2, s2, step=2)

    p3, s3, n, ema = restore_train_state(str(ckpt), opt.init(params))
    assert n == 2 and ema is None
    p3 = jax.tree_util.tree_map(jnp.asarray, p3)
    s3 = jax.tree_util.tree_map(jnp.asarray, s3)
    for k in keys[2:]:
        p3, s3, _ = step(p3, s3, batch, k)

    for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_remat_step_matches_plain(setup):
    """jax.checkpoint rematerialization changes memory, not numerics: one
    remat step == one plain step on identical inputs."""
    spec, unet, params, batch = setup
    T = spec.num_frames
    opt = optax.adamw(1e-3)
    key = jax.random.PRNGKey(7)

    plain = make_train_step(unet, opt, T)
    p1, _, loss1 = plain(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params), batch, key
    )
    remat = make_train_step(unet, opt, T, remat=True)
    p2, _, loss2 = remat(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params), batch, key
    )
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_ema_step_tracks_params(setup, tmp_path):
    """EMA shadow = exact exponential average of the iterates; the regular
    params match a plain (non-EMA) run bitwise; checkpoint round-trips the
    shadow tree."""
    from stable_virtual_camera_tpu.training.checkpoint import (
        restore_train_state,
        save_train_state,
    )
    from stable_virtual_camera_tpu.training.train_step import make_train_step_ema

    spec, unet, params, batch = setup
    T = spec.num_frames
    decay = 0.5  # aggressive so divergence from params is visible in 3 steps
    opt = optax.adamw(1e-3)
    plain = make_train_step(unet, opt, T)
    ema_step = make_train_step_ema(unet, opt, T, ema_decay=decay)
    keys = [jax.random.PRNGKey(7 + i) for i in range(3)]

    p1, s1 = jax.tree_util.tree_map(jnp.copy, params), opt.init(params)
    p2, s2 = jax.tree_util.tree_map(jnp.copy, params), opt.init(params)
    e2 = jax.tree_util.tree_map(jnp.copy, params)
    trail = [jax.tree_util.tree_map(jnp.copy, params)]
    for k in keys:
        p1, s1, _ = plain(p1, s1, batch, k)
        trail.append(jax.tree_util.tree_map(jnp.copy, p1))
        p2, s2, e2, _ = ema_step(p2, s2, e2, batch, k)

    # raw params identical to the plain run
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # shadow equals the closed-form exponential average of the iterates
    expect = trail[0]
    for it in trail[1:]:
        expect = jax.tree_util.tree_map(
            lambda e, p: e * decay + p * (1 - decay), expect, it
        )
    for a, b in zip(jax.tree_util.tree_leaves(expect), jax.tree_util.tree_leaves(e2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # and differs from the raw params (decay pulls toward history)
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(e2))
    ]
    assert max(diffs) > 1e-5

    ckpt = tmp_path / "ema_state"
    save_train_state(str(ckpt), p2, s2, step=3, ema_params=e2)
    rp, rs, n, re = restore_train_state(str(ckpt), opt.init(params))
    assert n == 3 and re is not None
    for a, b in zip(jax.tree_util.tree_leaves(e2), jax.tree_util.tree_leaves(re)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sharded_ema_step_matches_unsharded(setup):
    """EMA variant of the sharded step == the unsharded EMA step."""
    from stable_virtual_camera_tpu.training.train_step import (
        make_sharded_train_step,
    )

    spec, unet, params, batch = setup
    T = spec.num_frames
    opt = optax.adamw(1e-3)
    plain = make_train_step(unet, opt, T, ema_decay=0.9)
    key = jax.random.PRNGKey(11)

    p1, s1 = jax.tree_util.tree_map(jnp.copy, params), opt.init(params)
    e1 = jax.tree_util.tree_map(jnp.copy, params)
    p1, s1, e1, l1 = plain(p1, s1, e1, batch, key)

    mesh = make_mesh(n_data=1, n_view=8)
    with mesh:
        sharded = make_sharded_train_step(unet, opt, T, mesh, ema_decay=0.9)
        p2, s2 = jax.tree_util.tree_map(jnp.copy, params), opt.init(params)
        e2 = jax.tree_util.tree_map(jnp.copy, params)
        p2, s2, e2, l2 = sharded(p2, s2, e2, batch, key)

    assert float(l1) == pytest.approx(float(l2), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(e1), jax.tree_util.tree_leaves(e2)):
        # same tolerance rationale as test_sharded_step_matches_unsharded
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


@pytest.mark.slow
def test_gradient_accumulation_multisteps(setup):
    """optax.MultiSteps composes with the step builder: k accumulation
    micro-steps apply ONE update equal to the step on the averaged gradient
    (same batch+key -> identical gradient each micro-step, so the average is
    that gradient)."""
    spec, unet, params, batch = setup
    T = spec.num_frames
    key = jax.random.PRNGKey(4)

    base = optax.adamw(1e-3)
    plain = make_train_step(unet, base, T)
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    s1 = base.init(p1)
    p1, s1, _ = plain(p1, s1, batch, key)

    acc = optax.MultiSteps(base, every_k_schedule=2)
    step = make_train_step(unet, acc, T)
    p2 = jax.tree_util.tree_map(jnp.copy, params)
    s2 = acc.init(p2)
    p2, s2, _ = step(p2, s2, batch, key)  # micro-step 1: params unchanged
    mid = jax.tree_util.tree_leaves(p2)[0]
    np.testing.assert_array_equal(
        np.asarray(mid), np.asarray(jax.tree_util.tree_leaves(params)[0])
    )
    p2, s2, _ = step(p2, s2, batch, key)  # micro-step 2: one real update

    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_fsdp_step_matches_unsharded(setup):
    """ZeRO-3/FSDP: params + AdamW state sharded leaf-wise over 'data' ==
    the plain replicated step, and the optimizer-state leaves really live
    sharded (per-device footprint drops)."""
    from stable_virtual_camera_tpu.training.train_step import (
        make_fsdp_train_step,
    )

    spec, unet, params, batch = setup
    T = spec.num_frames
    opt = optax.adamw(1e-3)
    key = jax.random.PRNGKey(21)

    plain = make_train_step(unet, opt, T)
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, l1 = plain(p1, s1, batch, key)

    mesh = make_mesh(n_data=8, n_view=1)
    with mesh:
        step, init = make_fsdp_train_step(unet, opt, T, mesh, params)
        p2, s2 = init(jax.tree_util.tree_map(jnp.copy, params))
        # the big leaves are actually distributed, not replicated
        leaf = max(jax.tree_util.tree_leaves(p2), key=lambda x: x.size)
        shard_size = leaf.addressable_shards[0].data.size
        assert shard_size == leaf.size // 8, (leaf.shape, shard_size)
        p2, s2, l2 = step(p2, s2, batch, key)

    assert float(l1) == pytest.approx(float(l2), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
