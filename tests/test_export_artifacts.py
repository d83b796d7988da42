"""AOT denoise artifacts (models/export.py): export/load round trip, the
topology fingerprint, platform gating, and the export CLI.

Deployment contract: a serialized artifact run through the sampler must be
indistinguishable from the live-traced program — same inputs, identical
latents — while refusing mismatched weights and foreign-platform binaries.
"""

import json
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_virtual_camera_tpu.models import io as mio
from stable_virtual_camera_tpu.models.export import (
    MANIFEST,
    export_denoise_buckets,
    load_denoise_artifacts,
)
from stable_virtual_camera_tpu.sampling.discretization import DDPMDiscretization
from stable_virtual_camera_tpu.sampling.sampler import (
    ChunkConditioning,
    UNetDenoiser,
    make_sampling_plan,
)

STEPS = 2


def _sample_inputs(spec, T, h, w, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731
    noise = r(T, h, w, 4)
    cond = ChunkConditioning(
        crossattn=r(2 * T, 1, spec.context_dim),
        concat=r(2 * T, h, w, spec.in_channels - 4),
        dense=r(2 * T, h, w, spec.dense_in_channels),
        replace=r(2 * T, h, w, 5),
        scale=jnp.full((T,), 2.0, jnp.float32),
    )
    return noise, cond


@pytest.fixture(scope="module")
def tiny_bundle():
    return mio.random_bundle()


def test_artifact_matches_live_program(tmp_path, tiny_bundle):
    bundle = tiny_bundle
    T = bundle.spec.num_frames
    h = w = 8
    export_denoise_buckets(
        bundle.denoiser, bundle.spec, (h, w), T, STEPS, str(tmp_path)
    )
    artifacts = load_denoise_artifacts(str(tmp_path), params=bundle.denoiser.params)
    assert set(artifacts) == {("scan", T, h, w, STEPS)}

    noise, cond = _sample_inputs(bundle.spec, T, h, w)
    plan = make_sampling_plan(DDPMDiscretization(), STEPS)
    key = jax.random.PRNGKey(7)
    live = bundle.denoiser.sample(noise, plan, cond, key)
    aot_denoiser = UNetDenoiser(
        bundle.denoiser.unet, bundle.denoiser.params, artifacts=artifacts
    )
    aot = aot_denoiser.sample(noise, plan, cond, key)
    # the artifact IS the live program (serialized + reloaded): bit-identical
    np.testing.assert_array_equal(np.asarray(live), np.asarray(aot))


def test_fingerprint_pins_topology(tmp_path, tiny_bundle):
    bundle = tiny_bundle
    T = bundle.spec.num_frames
    export_denoise_buckets(
        bundle.denoiser, bundle.spec, (8, 8), T, STEPS, str(tmp_path)
    )
    # grow one leaf: same treedef, different shape -> must refuse
    params = jax.tree_util.tree_map(lambda x: x, bundle.denoiser.params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves[0] = jnp.zeros((3,) + tuple(leaves[0].shape), leaves[0].dtype)
    bad = jax.tree_util.tree_unflatten(treedef, leaves)
    with pytest.raises(ValueError, match="fingerprint"):
        load_denoise_artifacts(str(tmp_path), params=bad)
    # without params the loader trusts the manifest
    assert load_denoise_artifacts(str(tmp_path))


def test_foreign_platform_bucket_skipped(tmp_path, tiny_bundle):
    bundle = tiny_bundle
    T = bundle.spec.num_frames
    export_denoise_buckets(
        bundle.denoiser, bundle.spec, (8, 8), T, STEPS, str(tmp_path)
    )
    man_path = osp.join(str(tmp_path), MANIFEST)
    manifest = json.load(open(man_path))
    manifest["buckets"][0]["platforms"] = ["not-this-backend"]
    json.dump(manifest, open(man_path, "w"))
    assert load_denoise_artifacts(str(tmp_path)) == {}


def test_export_cli_writes_manifest(tmp_path):
    from stable_virtual_camera_tpu.apps.export_artifacts import main

    out = str(tmp_path / "artifacts")
    main(out, random_model=True, num_steps=STEPS)
    manifest = json.load(open(osp.join(out, MANIFEST)))
    assert manifest["buckets"], manifest
    e = manifest["buckets"][0]
    assert osp.exists(osp.join(out, e["file"]))
    assert e["steps"] == STEPS


def test_server_uses_artifact_bucket(tmp_path, tiny_bundle):
    """--artifact_dir wiring: a loaded artifact bucket is what the sampler
    compiles for that shape (the jitted entry comes from Exported.call)."""
    bundle = tiny_bundle
    T = bundle.spec.num_frames
    h = w = 8
    export_denoise_buckets(
        bundle.denoiser, bundle.spec, (h, w), T, STEPS, str(tmp_path)
    )
    artifacts = load_denoise_artifacts(str(tmp_path), params=bundle.denoiser.params)
    den = UNetDenoiser(
        bundle.denoiser.unet, bundle.denoiser.params, artifacts=artifacts
    )
    noise, cond = _sample_inputs(bundle.spec, T, h, w)
    plan = make_sampling_plan(DDPMDiscretization(), STEPS)
    den.sample(noise, plan, cond, jax.random.PRNGKey(0))
    bucket = ("scan", T, h, w, STEPS)
    assert bucket in den._jitted
    # the live path would have traced make_scan_fn; the artifact path jits
    # Exported.call, whose __wrapped__ is the deserialized call method
    assert den._jitted[bucket].__wrapped__ == artifacts[bucket].call

    # progress-tracked sampling PREFERS the pinned program (coarse progress)
    # over live-tracing an in-scan-callback twin of it
    ticks = []
    out = den.sample(
        noise, plan, cond, jax.random.PRNGKey(0),
        progress_cb=lambda i, n: ticks.append((i, n)),
    )
    assert out is not None
    assert ("scan-tracked", T, h, w, STEPS) not in den._jitted
    assert ticks == [(STEPS, STEPS)]  # chunk-granular tick
