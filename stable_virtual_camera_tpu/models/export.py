"""AOT-exported denoise artifacts: ship a pinned program, never retrace.

The reference redeploys its Python model code with every serving host and
pays a fresh torch.compile per process (reference demo.py:62-65 and
docs/INSTALL.md:36-38 — the "2x speedup" requires a nightly compiler at
import time). The TPU-native deployment story is ahead-of-time export:
`jax.export` serializes the ENTIRE traced denoise-scan program (UNet
forward x 50 sigma steps, FiLM precompute, CFG blending, Euler updates)
into a versioned, backwards-compatible StableHLO artifact. A serving fleet
ships `artifact + orbax weights`; startup deserializes and XLA-compiles the
pinned bytes — Python never re-traces the model, so the served program
cannot drift from the one that was validated, and model-code upgrades on
the host cannot silently change numerics.

Weights are NOT baked in: the exported signature is
`(params, noise, plan_arrays, cond, key) -> latents`, the exact calling
convention of `UNetDenoiser.make_scan_fn` (sampling/sampler.py), so one
artifact serves any checkpoint with the same topology. A manifest pins the
parameter-tree fingerprint, shapes, jax version and target platforms;
`load_denoise_artifacts` re-verifies all of it before the sampler will use
a bucket.

Export:  python -m stable_virtual_camera_tpu.apps.export_artifacts \
             --checkpoint_dir ... --out_dir artifacts/ [--num_steps 50]
Serve:   python -m stable_virtual_camera_tpu.apps.server \
             --checkpoint_dir ... --artifact_dir artifacts/
"""

from __future__ import annotations

import hashlib
import json
import os
import os.path as osp

MANIFEST = "manifest.json"
_FORMAT_VERSION = 1


def _fingerprint(params) -> str:
    """Stable hash of the parameter tree's structure + leaf shapes/dtypes
    (NOT values — artifacts are weight-independent by design)."""
    import jax

    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    h = hashlib.sha256()
    for path, leaf in leaves:
        h.update(jax.tree_util.keystr(path).encode())
        h.update(str(jax.ShapeDtypeStruct(leaf.shape, leaf.dtype)).encode())
    return h.hexdigest()[:32]


def _bucket_file(T: int, h: int, w: int, steps: int) -> str:
    return f"denoise_T{T}_{h}x{w}_s{steps}.jaxexport"


def _arg_structs(denoiser, spec, T: int, h: int, w: int, steps: int):
    """ShapeDtypeStructs for make_scan_fn's signature, matching the engine's
    runtime dtypes exactly (build_chunk_conditioning emits float32 leaves;
    Exported.call is strict about dtype/treedef)."""
    import jax
    import jax.numpy as jnp

    from stable_virtual_camera_tpu.sampling.sampler import ChunkConditioning

    s = lambda shape, dt=jnp.float32: jax.ShapeDtypeStruct(shape, dt)  # noqa: E731
    params = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), denoiser.params
    )
    noise = s((T, h, w, 4))
    plan_arrays = {
        "sigma_hat_raw": s((steps,)),
        "sigma_hat_quant": s((steps,)),
        "t_indices": s((steps,), jnp.int32),
        "sigma_next": s((steps,)),
        "noise_coeff": s((steps,)),
        "init_scale": s(()),
    }
    cond = ChunkConditioning(
        crossattn=s((2 * T, 1, spec.context_dim)),
        concat=s((2 * T, h, w, spec.in_channels - 4)),
        dense=s((2 * T, h, w, spec.dense_in_channels)),
        replace=s((2 * T, h, w, 5)),
        scale=s((T,)),
    )
    key = jax.random.split(jax.random.PRNGKey(0))[0]
    key = jax.ShapeDtypeStruct(key.shape, key.dtype)
    return params, noise, plan_arrays, cond, key


def export_denoise_buckets(
    denoiser,
    spec,
    latent_hw: tuple[int, int],
    Ts,
    num_steps: int,
    out_dir: str,
    platforms=None,
) -> dict:
    """Export one artifact per T bucket and write the manifest.

    `platforms=None` targets the current default backend; pass e.g.
    ("tpu",) or ("tpu", "cpu") for cross-platform artifacts (the lowering
    happens on this host, no device needed)."""
    import jax
    from jax import export as jax_export

    h, w = latent_hw
    os.makedirs(out_dir, exist_ok=True)
    entries = []
    plats = tuple(platforms) if platforms else None
    for T in dict.fromkeys(int(t) for t in (Ts if isinstance(Ts, list) else [Ts])):
        structs = _arg_structs(denoiser, spec, T, h, w, num_steps)
        fn = jax.jit(denoiser.make_scan_fn(T))
        exported = jax_export.export(fn, platforms=plats)(*structs)
        fname = _bucket_file(T, h, w, num_steps)
        with open(osp.join(out_dir, fname), "wb") as f:
            f.write(bytes(exported.serialize()))
        entries.append(
            {"file": fname, "T": T, "h": h, "w": w, "steps": num_steps,
             "platforms": list(exported.platforms)}
        )
        print(f"[export] {fname}: platforms={exported.platforms}")
    manifest = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "param_fingerprint": _fingerprint(denoiser.params),
        "buckets": entries,
    }
    with open(osp.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_denoise_artifacts(artifact_dir: str, params=None) -> dict:
    """Deserialize every manifest bucket usable on the current backend into
    the sampler's artifact map {("scan", T, h, w, steps): Exported}.

    With `params` given, refuses trees whose structure/shapes differ from
    the exported one (the artifact is weight-independent but NOT
    topology-independent). Buckets exported for other platforms are skipped
    with a warning instead of failing at dispatch time."""
    import jax
    from jax import export as jax_export

    with open(osp.join(artifact_dir, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"artifact format {manifest.get('format_version')} != "
            f"supported {_FORMAT_VERSION}"
        )
    if params is not None:
        fp = _fingerprint(params)
        if fp != manifest["param_fingerprint"]:
            raise ValueError(
                "parameter tree does not match the exported artifact "
                f"(fingerprint {fp} != manifest "
                f"{manifest['param_fingerprint']}): the artifact pins the "
                "model topology it was exported from"
            )
    backend = jax.default_backend()
    artifacts = {}
    for e in manifest["buckets"]:
        if backend not in e["platforms"]:
            print(
                f"[export] skipping {e['file']}: exported for "
                f"{e['platforms']}, backend is {backend!r}"
            )
            continue
        with open(osp.join(artifact_dir, e["file"]), "rb") as f:
            exported = jax_export.deserialize(bytearray(f.read()))
        artifacts[("scan", e["T"], e["h"], e["w"], e["steps"])] = exported
    return artifacts
