"""The scene engine: chunked, optionally two-pass, autoregressive sampling.

Orchestration parity with reference seva/eval.py:1218-1974 (`do_sample`,
`run_one_scene`): the same chunk schedules, conditioning construction,
autoregressive feedback of generated frames, two-pass anchor-then-interpolate
procedure, save formats and yield points.

TPU-native differences (by design, documented):
  * the 50-step denoise loop runs as one jitted lax.scan per shape bucket
    (or stepwise-jitted when progress/abort is requested),
  * VAE/CLIP run batched over all views at once by default (the reference
    chunks with encoding_t/decoding_t=1 for GPU memory; both are supported),
  * RNG is JAX threefry keyed by (seed, pass, chunk) — reproducible, but a
    different stream than torch's global RNG (parity is metric-level, not
    bitwise; SURVEY.md §7 step 5).
"""

from __future__ import annotations

import concurrent.futures
import contextlib
import hashlib
import os
import os.path as osp
from dataclasses import dataclass, field
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from stable_virtual_camera_tpu.config import EngineOptions, SevaSpec, VersionConfig
from stable_virtual_camera_tpu.core.transforms import (
    load_img_and_K,
    transform_img_and_K,
)
from stable_virtual_camera_tpu.engine import planner
from stable_virtual_camera_tpu.engine.saving import (
    StreamingFrameWriter,
    decode_output,
    extend_dict,
    get_k_from_dict,
    replace_or_include_input_for_dict,
    save_output,
    to_uint8,
    update_kv_for_dict,
)
from stable_virtual_camera_tpu.engine.value_dict import ChunkValues, build_chunk_values
from stable_virtual_camera_tpu.models.clip import ClipVisionTower, preprocess
from stable_virtual_camera_tpu.models.vae import AutoEncoderKL
from stable_virtual_camera_tpu.sampling import guidance
from stable_virtual_camera_tpu.utils.profiling import StageTimer
from stable_virtual_camera_tpu.sampling.discretization import DDPMDiscretization
from stable_virtual_camera_tpu.sampling.sampler import (
    ChunkConditioning,
    SamplingPlan,
    UNetDenoiser,
    make_sampling_plan,
)


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    reps = np.repeat(x[-1:], n - x.shape[0], axis=0)
    return np.concatenate([x, reps], axis=0)


def _maybe_offload(params, lowvram: bool):
    """lowvram mode keeps weights in host RAM and streams them per call —
    the TPU analogue of the reference's stage-wise load_model/unload_model
    (seva/eval.py:325-341)."""
    if lowvram:
        return jax.device_get(params)
    return params


class VaeApplier:
    """Jitted, optionally view-chunked VAE encode/decode."""

    def __init__(self, module: AutoEncoderKL, params, lowvram: bool = False):
        self.module = module
        self.params = _maybe_offload(params, lowvram)
        self._enc_cache: dict[bytes, np.ndarray] = {}
        # params passed as jit args (not captured constants); view-chunking
        # happens INSIDE the program via lax.map so a whole batch is one
        # device dispatch (dispatch latency is expensive; SURVEY.md §5.7's
        # encoding_t/decoding_t python loop becomes a sequential on-device map)
        enc = jax.jit(lambda p, x: module.apply({"params": p}, x, method=module.encode))
        dec = jax.jit(lambda p, z: module.apply({"params": p}, z, method=module.decode))
        dec_u8 = jax.jit(
            lambda p, z: module.apply({"params": p}, z, method=module.decode_uint8)
        )
        enc_map = jax.jit(
            lambda p, xs: jax.lax.map(
                lambda xc: module.apply({"params": p}, xc, method=module.encode), xs
            )
        )
        dec_map = jax.jit(
            lambda p, zs: jax.lax.map(
                lambda zc: module.apply({"params": p}, zc, method=module.decode), zs
            )
        )
        dec_u8_map = jax.jit(
            lambda p, zs: jax.lax.map(
                lambda zc: module.apply(
                    {"params": p}, zc, method=module.decode_uint8
                ),
                zs,
            )
        )
        self._encode = lambda x: enc(self.params, x)
        self._decode = lambda z: dec(self.params, z)
        self._decode_u8 = lambda z: dec_u8(self.params, z)
        self._encode_map = lambda xs: enc_map(self.params, xs)
        self._decode_map = lambda zs: dec_map(self.params, zs)
        self._decode_u8_map = lambda zs: dec_u8_map(self.params, zs)

    def _chunked(self, fn, map_fn, x: np.ndarray, chunk_size: int | None) -> np.ndarray:
        if x.shape[0] == 0:
            # shape-correct empty result: derive the per-element output shape
            # abstractly (no device execution) so zero-input conditioning
            # paths see (0, h, w, C), not a bare (0,) array
            out_s = jax.eval_shape(fn, jnp.zeros((1,) + x.shape[1:], x.dtype))
            return np.zeros((0,) + tuple(out_s.shape[1:]), out_s.dtype)
        if not chunk_size or chunk_size >= x.shape[0]:
            # bucket the batch to the next power of two: chunks carry varying
            # numbers of input views and every new shape is a fresh (slow)
            # compile — padding trades a little compute for compile reuse
            n = x.shape[0]
            bucket = 1 << (n - 1).bit_length()
            return np.asarray(fn(jnp.asarray(_pad_to(x, bucket))))[:n]
        n = x.shape[0]
        n_chunks = -(-n // chunk_size)
        padded = _pad_to(x, n_chunks * chunk_size)
        xs = padded.reshape((n_chunks, chunk_size) + x.shape[1:])
        out = np.asarray(map_fn(jnp.asarray(xs)))
        return out.reshape((n_chunks * chunk_size,) + out.shape[2:])[:n]

    def encode(self, imgs: np.ndarray, chunk_size: int | None = None) -> np.ndarray:
        return self._chunked(self._encode, self._encode_map, imgs, chunk_size)

    def encode_cached(
        self, imgs: np.ndarray, chunk_size: int | None = None
    ) -> np.ndarray:
        """`encode` with a per-frame content cache. Input and anchor frames
        recur across chunks (an anchor conditions 2-4 second-pass chunks; the
        reference re-encodes it each time, seva/eval.py:1245-1247) — hashing
        the pixels (~5 ms/frame) replaces a device dispatch the relay charges
        ~1 s for. Only frames not seen this scene are encoded, batched
        together. SVC_COND_CACHE=0 disables; SceneEngine clears per scene."""
        if os.environ.get("SVC_COND_CACHE", "1") == "0" or imgs.shape[0] == 0:
            return self.encode(imgs, chunk_size)
        cache = self._enc_cache
        keys = [
            hashlib.md5(np.ascontiguousarray(im).tobytes()).digest()
            for im in imgs
        ]
        missing = [i for i, k in enumerate(keys) if k not in cache]
        if missing:
            lat = self.encode(np.stack([imgs[i] for i in missing]), chunk_size)
            for j, i in enumerate(missing):
                cache[keys[i]] = lat[j]
        return np.stack([cache[k] for k in keys])

    def clear_cache(self) -> None:
        self._enc_cache.clear()

    def decode(self, z: np.ndarray, chunk_size: int | None = None) -> np.ndarray:
        return self._chunked(self._decode, self._decode_map, z, chunk_size)

    def fused_decode_uint8(self):
        """(fn, params) for tracing the uint8 decode INTO another jitted
        program (UNetDenoiser `post=`): fn(params, z) pads the batch to the
        same pow2 bucket `decode_async` uses and applies
        AutoEncoderKL.decode_uint8 — one denoise+decode dispatch per chunk
        instead of two programs with an HBM round-trip and a relay
        program-switch between them. Params flow as an argument (never
        captured constants)."""
        module = self.module

        def fn(p, z):
            n = z.shape[0]
            bucket = 1 << (n - 1).bit_length()
            if bucket != n:
                z = jnp.pad(z, ((0, bucket - n),) + ((0, 0),) * (z.ndim - 1))
            return module.apply({"params": p}, z, method=module.decode_uint8)[:n]

        return fn, self.params

    def decode_async(
        self,
        z: jnp.ndarray,
        chunk_size: int | None = None,
        uint8: bool = False,
    ):
        """Device-to-device decode: accepts the denoiser's device array and
        returns a device array WITHOUT host sync — lets the engine queue
        chunk k's decode behind chunk k+1's denoise (chunk pipelining,
        SURVEY.md §7 hard part 7; the reference serializes these,
        eval.py:1317-1318).

        uint8=True quantizes on device (AutoEncoderKL.decode_uint8,
        byte-identical to the host saving.to_uint8 path): 4x less
        device->host transfer for frames whose only consumer is the 8-bit
        save sink — use it wherever frames are not re-fed to the model."""
        n = z.shape[0]
        dec, dec_map = (
            (self._decode_u8, self._decode_u8_map)
            if uint8
            else (self._decode, self._decode_map)
        )

        def pad_to(x, m):
            return (
                jnp.pad(x, ((0, m - n),) + ((0, 0),) * (x.ndim - 1))
                if m != n
                else x
            )

        if not chunk_size or chunk_size >= n:
            bucket = 1 << (n - 1).bit_length()
            return dec(pad_to(z, bucket))[:n]
        n_chunks = -(-n // chunk_size)
        zs = pad_to(z, n_chunks * chunk_size).reshape(
            (n_chunks, chunk_size) + z.shape[1:]
        )
        out = dec_map(zs)
        return out.reshape((n_chunks * chunk_size,) + out.shape[2:])[:n]


class ClipApplier:
    """Jitted CLIP image embedding (preprocess fused into the program)."""

    def __init__(self, module: ClipVisionTower, params, lowvram: bool = False):
        self.module = module
        self.params = _maybe_offload(params, lowvram)
        self._emb_cache: dict[bytes, np.ndarray] = {}
        size = module.spec.image_size
        self._embed = jax.jit(
            lambda p, x: module.apply({"params": p}, preprocess(x, size))
        )

    def embed(self, imgs: np.ndarray) -> np.ndarray:
        n = imgs.shape[0]
        bucket = 1 << (n - 1).bit_length()  # shape-bucketed: see VaeApplier
        out = np.asarray(self._embed(self.params, jnp.asarray(_pad_to(imgs, bucket))))
        return out[:n]

    def embed_cached(self, imgs: np.ndarray) -> np.ndarray:
        """`embed` with a per-frame content cache (see VaeApplier.encode_cached
        — the per-frame tower output is batch-independent, and the chunk mean
        of cached rows equals the mean of a batched call)."""
        if os.environ.get("SVC_COND_CACHE", "1") == "0" or imgs.shape[0] == 0:
            return self.embed(imgs)
        cache = self._emb_cache
        keys = [
            hashlib.md5(np.ascontiguousarray(im).tobytes()).digest()
            for im in imgs
        ]
        missing = [i for i, k in enumerate(keys) if k not in cache]
        if missing:
            emb = self.embed(np.stack([imgs[i] for i in missing]))
            for j, i in enumerate(missing):
                cache[keys[i]] = emb[j]
        return np.stack([cache[k] for k in keys])

    def clear_cache(self) -> None:
        self._emb_cache.clear()


@dataclass
class ModelBundle:
    """Everything the engine needs to run a scene."""

    spec: SevaSpec
    denoiser: UNetDenoiser
    vae: VaeApplier
    clip: ClipApplier
    discretization: DDPMDiscretization = field(default_factory=DDPMDiscretization)

    _plans: dict[int, SamplingPlan] = field(default_factory=dict)

    def plan(self, num_steps: int) -> SamplingPlan:
        if num_steps not in self._plans:
            self._plans[num_steps] = make_sampling_plan(
                self.discretization, num_steps
            )
        return self._plans[num_steps]


def build_chunk_conditioning(
    bundle: ModelBundle,
    values: ChunkValues,
    *,
    cfg: float,
    guider_type: int,
    cfg_min: float,
    encoding_t: int | None = None,
    latent_downsample: int = 8,
) -> tuple[ChunkConditioning, tuple[int, int, int, int]]:
    """One chunk's CFG-doubled device conditioning (the first half of the
    reference's `do_sample`, seva/eval.py:1242-1281): VAE-encode input views,
    CLIP-embed + average, assemble crossattn/concat/dense/replace and the
    per-frame guidance scale vector. Returns (cond, (T, h, w, C))."""
    T, H, W = values.imgs.shape[0], values.imgs.shape[1], values.imgs.shape[2]
    h, w = H // latent_downsample, W // latent_downsample
    mask = values.input_frame_mask

    latents = bundle.vae.encode_cached(values.imgs[mask], encoding_t)  # (Ti,h,w,4)
    clip_emb = bundle.clip.embed_cached(values.imgs_clip[mask]).mean(0)  # (ctx,)

    C = latents.shape[-1]
    replace_c = np.zeros((T, h, w, C + 1), np.float32)
    replace_c[mask] = np.concatenate(
        [latents, np.ones((*latents.shape[:-1], 1), np.float32)], axis=-1
    )
    crossattn_c = np.tile(clip_emb[None, None], (T, 1, 1)).astype(np.float32)
    mask_map = np.broadcast_to(
        mask[:, None, None, None].astype(np.float32), (T, h, w, 1)
    )
    concat_c = np.concatenate([mask_map, values.plucker], axis=-1)
    concat_u = np.concatenate([np.zeros_like(mask_map), values.plucker], axis=-1)

    scale_vec = guidance.compute_scale_vector(
        guider_type, cfg, T, values.c2w, values.K, mask, cfg_min
    )

    # HOST-built conditioning: CFG-doubling and zero-filling are numpy; the
    # leaves transfer with the sampler's dispatch instead of paying 4-5
    # eager device concatenates per chunk (the engine dispatch diet,
    # docs/ARCHITECTURE.md round-3 journal).
    plucker = np.asarray(values.plucker, np.float32)
    cond = ChunkConditioning(
        crossattn=np.concatenate(
            [np.zeros_like(crossattn_c), crossattn_c], 0
        ),
        concat=np.concatenate([concat_u, concat_c], 0).astype(np.float32),
        dense=np.concatenate([plucker, plucker], 0),
        replace=np.concatenate([np.zeros_like(replace_c), replace_c], 0),
        scale=np.asarray(scale_vec, np.float32),
    )
    return cond, (T, h, w, C)


def sample_chunk(
    bundle: ModelBundle,
    values: ChunkValues,
    *,
    num_steps: int,
    cfg: float,
    guider_type: int,
    cfg_min: float,
    key: jax.Array | None = None,
    base_key: jax.Array | None = None,
    pass_id: int = 0,
    chunk_id: int = 0,
    encoding_t: int | None = None,
    decoding_t: int | None = None,
    latent_downsample: int = 8,
    progress_cb=None,
    abort_event=None,
    defer: bool = False,
    output_uint8: bool = False,
    prebuilt=None,
) -> np.ndarray | None:
    """One chunk's conditioning + denoising + decode
    (reference seva/eval.py:1218-1321 `do_sample`).

    Preferred key plumbing: `base_key` + (`pass_id`, `chunk_id`) — the
    fold-ins, split and initial noise then run INSIDE the jitted sampling
    program (UNetDenoiser.sample_from_key) — same op sequence as the eager
    derivation (equal up to compile-variation ulps), four device dispatches
    cheaper per chunk on the relay. Passing an already-folded `key` keeps
    the legacy eager path.

    `defer=True` returns the decoded frames as a DEVICE array without host
    sync, so the caller can dispatch the next chunk while this one finishes
    (chunk pipelining — valid whenever chunks are independent, i.e. the
    second pass).

    `output_uint8=True` quantizes frames on device before the host transfer
    (4x fewer bytes; byte-identical to the host to_uint8 path) — only valid
    when the chunk's frames are final output, never re-fed to the model.

    `prebuilt` short-circuits the conditioning build with an already-staged
    (cond, latent_shape) pair — lets the caller prefetch the next chunk's
    conditioning while the device runs the current scan."""
    if prebuilt is not None:
        cond, (T, h, w, C) = prebuilt
    else:
        cond, (T, h, w, C) = build_chunk_conditioning(
            bundle, values, cfg=cfg, guider_type=guider_type, cfg_min=cfg_min,
            encoding_t=encoding_t, latent_downsample=latent_downsample,
        )
    if base_key is not None:
        # Fused scan+decode (SVC_FUSED_DECODE): when the chunk's frames go
        # straight to the uint8 save sink, the VAE decode is traced INTO
        # the keyed sampling program — one dispatch per chunk instead of
        # scan-then-decode (saves the intermediate HBM materialization and
        # a relay program-switch). Single-device flat-decode buckets only;
        # bit-compat is covered by tests/test_sampling fused-parity.
        fuse = (
            output_uint8
            and not decoding_t
            and os.environ.get("SVC_FUSED_DECODE", "0") == "1"
        )
        post = (
            ("decu8", *bundle.vae.fused_decode_uint8()) if fuse else None
        )
        x = bundle.denoiser.sample_from_key(
            (T, h, w, C), bundle.plan(num_steps), cond, base_key,
            np.array([pass_id, chunk_id], np.int32),
            progress_cb=progress_cb, abort_event=abort_event,
            post=post,
        )
        if x is not None and post is not None:
            # x is already decoded uint8 frames (or latents if the sampler
            # fell back to a sharded bucket — detect by dtype)
            if x.dtype == jnp.uint8:
                return x if defer else np.asarray(x)
    else:
        key_init, key_loop = jax.random.split(key)
        noise = jax.random.normal(key_init, (T, h, w, C), jnp.float32)
        x = bundle.denoiser.sample(
            noise, bundle.plan(num_steps), cond, key_loop,
            progress_cb=progress_cb, abort_event=abort_event,
        )
    if x is None:
        return None
    # decode consumes the denoiser's device array directly (no re-upload)
    out = bundle.vae.decode_async(x, decoding_t, uint8=output_uint8)
    return out if defer else np.asarray(out)


def _resolve_guiders(guider_types) -> list[int]:
    if not isinstance(guider_types, (list, tuple)):
        return [int(guider_types)]
    return [int(g) for g in guider_types]


def _cfg_at(cfg, i: int) -> float:
    if isinstance(cfg, (list, tuple)):
        return float(cfg[i]) if len(cfg) > i else float(cfg[0])
    return float(cfg)


class SceneEngine:
    """Drives `run_one_scene` over a ModelBundle (the reference's generator
    contract: yields video paths as passes complete, seva/eval.py:1324-1974)."""

    def __init__(
        self,
        bundle: ModelBundle,
        version: VersionConfig,
        options: EngineOptions,
    ):
        self.bundle = bundle
        self.version = version
        self.options = options

    # ---------------- image preparation ----------------

    def _prepare_images(self, image_cond, camera_cond):
        """Load/transform all scene images + normalize Ks
        (reference seva/eval.py:1352-1424)."""
        options, version = self.options, self.version
        W, H = version.W, version.H
        F = version.f
        imgs, img_size = [], None
        pending: dict = {}  # (h, w) -> [(position, arr, K)] batched below
        for i, (img, K) in enumerate(zip(image_cond["img"], camera_cond["K"])):
            if isinstance(img, str) or img is None:
                img_arr, K = load_img_and_K(img or img_size, None, K=np.asarray(K))
                img_size = img_arr.shape[1:3]
                mode = (
                    options.get("transform_input", "crop")
                    if i in image_cond["input_indices"]
                    else options.get("transform_target", "crop")
                )
                scale = (
                    1.0
                    if i in image_cond["input_indices"]
                    else options.get("transform_scale", 1.0)
                )
                if options.get("L_short", -1) == -1:
                    img_arr, K = transform_img_and_K(
                        img_arr, (W, H), K=K[None], mode=mode, scale=scale
                    )
                else:
                    stride = F * 2**3
                    assert options.get("L_short") % stride == 0, (
                        f"--L_short must be a multiple of the latent stride {stride}"
                    )
                    img_arr, K = transform_img_and_K(
                        img_arr,
                        options.get("L_short"),
                        K=K[None],
                        size_stride=stride,
                        mode=mode,
                        scale=scale,
                    )
                    version.W = W = img_arr.shape[2]
                    version.H = H = img_arr.shape[1]
                K = K[0]
                K[0] /= W
                K[1] /= H
                camera_cond["K"][i] = K
            elif isinstance(img, np.ndarray):
                img_size = img.shape[:2]
                if img.dtype == np.uint8:
                    img_arr = img.astype(np.float32)[None] / 255.0 * 2.0 - 1.0
                else:
                    img_arr = np.asarray(img, np.float32)[None]
                    if img_arr.max() > 1.5:  # 0..255 float
                        img_arr = img_arr / 255.0 * 2.0 - 1.0
                # defer: same-shape ndarray frames transform as ONE batch
                # below (the resize math is identical, vectorized — a long
                # trajectory's 100+ target placeholders otherwise pay a
                # per-frame python resize each)
                pending.setdefault(img_arr.shape[1:3], []).append(
                    (i, img_arr, np.asarray(K))
                )
                img_arr = None
            else:
                raise TypeError(f"Unsupported image type {type(img)}")
            imgs.append(img_arr)
        for _shape_hw, items in pending.items():
            batch = np.concatenate([a for _, a, _ in items], 0)
            Ks_in = np.stack([k for _, _, k in items], 0)
            batch_t, Ks_t = transform_img_and_K(batch, (W, H), K=Ks_in)
            for j, (i, _, _) in enumerate(items):
                imgs[i] = batch_t[j : j + 1]
                Kj = Ks_t[j]
                Kj[0] /= W
                Kj[1] /= H
                camera_cond["K"][i] = Kj
        out = np.concatenate(imgs, 0)
        return out, out.copy(), img_size

    def _prepare_prior_Ks(self, traj_prior_Ks, img_size):
        options, version = self.options, self.version
        W, H = version.W, version.H
        out = []
        for prior_k in traj_prior_Ks:
            img, prior_k = load_img_and_K(img_size, None, K=np.asarray(prior_k))
            img, prior_k = transform_img_and_K(
                img,
                (W, H),
                K=prior_k[None],
                mode=options.get("transform_target", "crop"),
                scale=options.get("transform_scale", 1.0),
            )
            prior_k = prior_k[0]
            prior_k[0] /= W
            prior_k[1] /= H
            out.append(prior_k)
        return np.stack(out)

    # ---------------- main generator ----------------

    def run_one_scene(self, *args, **kwargs) -> Iterator[str]:
        """Generator wrapper guaranteeing resource cleanup: the impl registers
        its flush pool and streaming writers in `_cleanup`, and EVERY exit
        path — abort, worker exception, generator abandonment mid-yield —
        runs them (best-effort) so no writer/executor thread outlives the
        render and no queued PNG write is silently dropped. On the happy path
        every registered callable is an idempotent no-op (the impl already
        joined/drained at its explicit, error-raising checkpoints)."""
        cleanup: list[Callable[[], None]] = []
        try:
            yield from self._run_scene_impl(*args, _cleanup=cleanup, **kwargs)
        finally:
            for fn in reversed(cleanup):
                try:
                    fn()
                except BaseException:  # noqa: BLE001 - best-effort teardown
                    pass

    def _run_scene_impl(
        self,
        task: str,
        image_cond: dict,
        camera_cond: dict,
        save_path: str,
        use_traj_prior: bool = False,
        traj_prior_Ks: np.ndarray | None = None,
        traj_prior_c2ws: np.ndarray | None = None,
        seed: int = 23,
        abort_event=None,
        first_pass_pbar: Callable | None = None,
        second_pass_pbar: Callable | None = None,
        _cleanup: list | None = None,
    ) -> Iterator[str]:
        if _cleanup is None:
            _cleanup = []
        options = self.options
        version = self.version
        bundle = self.bundle
        T = version.T
        F = version.f
        # opt-in per-stage wall decomposition (SVC_ENGINE_TIMING=1): where a
        # render's non-scan time goes — printed at scene end
        timer = StageTimer() if os.environ.get("SVC_ENGINE_TIMING") else None
        sp_writer = fp_writer = None  # set in the two-pass branch (stream_save)
        stage = (
            timer.stage if timer else (lambda name: contextlib.nullcontext())
        )
        # per-frame conditioning caches are scene-scoped (bounded memory;
        # a server bundle serves many scenes — see encode_cached)
        bundle.vae.clear_cache()
        bundle.clip.clear_cache()

        camera_cond = dict(camera_cond)
        camera_cond["K"] = [np.asarray(k) for k in camera_cond["K"]]
        with stage("prepare_images"):
            imgs, imgs_clip, img_size = self._prepare_images(
                image_cond, camera_cond
            )
        camera_cond["K"] = np.stack(camera_cond["K"]).astype(np.float32)
        all_c2ws = np.asarray(camera_cond["c2w"], np.float32)

        if traj_prior_Ks is not None:
            assert img_size is not None
            traj_prior_Ks = self._prepare_prior_Ks(traj_prior_Ks, img_size)

        base_key = jax.random.PRNGKey(seed)

        input_indices = list(image_cond["input_indices"])
        input_imgs = imgs[input_indices]
        input_imgs_clip = imgs_clip[input_indices]
        input_c2ws = all_c2ws[input_indices]
        input_Ks = camera_cond["K"][input_indices]

        test_indices = [i for i in range(len(imgs)) if i not in input_indices]
        test_imgs = imgs[test_indices]
        test_imgs_clip = imgs_clip[test_indices]
        test_c2ws = all_c2ws[test_indices]
        test_Ks = camera_cond["K"][test_indices]

        if options.get("save_input", True):
            save_output(
                {"/image": input_imgs},
                save_path=osp.join(save_path, "input"),
                video_save_fps=2,
            )

        guiders = _resolve_guiders(options.get("guider_types", 1))
        num_steps = options.get("num_steps", 50)
        cfg_min = options.get("cfg_min", 1.0)
        cfg_opt = options.get("cfg", 2.0)
        camera_scale = options.get("camera_scale", 2.0)
        enc_t = options.get("encoding_t", 1)
        dec_t = options.get("decoding_t", 1)

        def chunk_values_for(
            curr_imgs, curr_imgs_clip, frame_inds, curr_c2ws, curr_Ks, cam_inds
        ):
            return build_chunk_values(
                curr_imgs,
                curr_imgs_clip,
                frame_inds,
                curr_c2ws,
                curr_Ks,
                cam_inds,
                all_c2ws=all_c2ws,
                camera_scale=camera_scale,
                latent_hw=(version.H // F, version.W // F),
            )

        if not use_traj_prior:
            chunk_strategy = options.get("chunk_strategy", "gt")
            plan = planner.chunk_input_and_test(
                T if not isinstance(T, (list, tuple)) else T[0],
                input_c2ws,
                test_c2ws,
                input_indices,
                test_indices,
                options=options,
                task=task,
                chunk_strategy=chunk_strategy,
                gt_input_inds=list(range(input_c2ws.shape[0])),
            )
            print(
                f"One pass - chunking with `{chunk_strategy}` strategy: total "
                f"{len(plan.input_inds_per_chunk)} forward(s) ..."
            )
            T_run = T if not isinstance(T, (list, tuple)) else T[0]

            all_samples: dict = {}
            all_test_inds: list[int] = []
            for i, (c_in_inds, c_in_sels, c_test_inds, c_test_sels) in enumerate(
                zip(
                    plan.input_inds_per_chunk,
                    plan.input_sels_per_chunk,
                    plan.test_inds_per_chunk,
                    plan.test_sels_per_chunk,
                )
            ):
                (
                    curr_input_sels,
                    curr_test_sels,
                    curr_input_maps,
                    curr_test_maps,
                ) = planner.pad_indices(
                    c_in_sels,
                    c_test_sels,
                    T=T_run,
                    padding_mode=options.get("t_padding_mode", "last"),
                )
                gen = get_k_from_dict(all_samples, "samples-rgb")
                pool_imgs = np.concatenate(
                    [input_imgs, gen.reshape((-1,) + input_imgs.shape[1:])], 0
                )
                pool_clip = np.concatenate(
                    [input_imgs_clip, gen.reshape((-1,) + input_imgs.shape[1:])], 0
                )
                pool_c2ws = np.concatenate([input_c2ws, test_c2ws[all_test_inds]], 0)
                pool_Ks = np.concatenate([input_Ks, test_Ks[all_test_inds]], 0)
                curr = [
                    planner.assemble(
                        input=x[c_in_inds],
                        test=y[c_test_inds],
                        input_maps=curr_input_maps,
                        test_maps=curr_test_maps,
                    )
                    for x, y in zip(
                        [pool_imgs, pool_clip, pool_c2ws, pool_Ks],
                        [test_imgs, test_imgs_clip, test_c2ws, test_Ks],
                    )
                ]
                curr_imgs, curr_imgs_clip, curr_c2ws, curr_Ks = curr
                extra_sels = [
                    sel
                    for (ind, sel) in zip(
                        np.array(c_test_inds)[curr_test_maps[curr_test_maps != -1]],
                        curr_test_sels,
                    )
                    if test_indices[ind] in image_cond["input_indices"]
                ]
                values = chunk_values_for(
                    curr_imgs,
                    curr_imgs_clip,
                    curr_input_sels + extra_sels,
                    curr_c2ws,
                    curr_Ks,
                    curr_input_sels + extra_sels,
                )
                samples = sample_chunk(
                    bundle,
                    values,
                    num_steps=num_steps,
                    cfg=_cfg_at(cfg_opt, 0),
                    guider_type=guiders[0],
                    cfg_min=cfg_min,
                    base_key=base_key,
                    pass_id=0,
                    chunk_id=i,
                    encoding_t=enc_t,
                    decoding_t=dec_t,
                    latent_downsample=F,
                    abort_event=abort_event,
                )
                if samples is None:
                    return
                samples = decode_output(samples, len(curr_imgs), c_test_sels)
                if options.get("save_first_pass", False):
                    save_output(
                        replace_or_include_input_for_dict(
                            samples, c_test_sels, curr_imgs, curr_c2ws, curr_Ks
                        ),
                        save_path=osp.join(save_path, "first-pass", f"forward_{i}"),
                        video_save_fps=2,
                    )
                extend_dict(all_samples, samples)
                all_test_inds.extend(c_test_inds)
        else:
            assert traj_prior_c2ws is not None, (
                "`traj_prior_c2ws` should be set when using 2-pass sampling."
            )
            traj_prior_c2ws = np.asarray(traj_prior_c2ws, np.float32)
            if traj_prior_Ks is None:
                traj_prior_Ks = np.repeat(test_Ks[:1], traj_prior_c2ws.shape[0], 0)
            traj_prior_imgs = np.zeros(
                (traj_prior_c2ws.shape[0],) + imgs.shape[1:], np.float32
            )
            traj_prior_imgs_clip = traj_prior_imgs.copy()

            T_first, T_second = (
                (T[0], T[1]) if isinstance(T, (list, tuple)) else (T, T)
            )

            # ---------------- first pass: generate anchors ----------------
            strategy1 = options.get("chunk_strategy_first_pass", "gt-nearest")
            plan1 = planner.chunk_input_and_test(
                T_first,
                input_c2ws,
                traj_prior_c2ws,
                input_indices,
                image_cond["prior_indices"],
                options=options,
                task=task,
                chunk_strategy=strategy1,
                gt_input_inds=list(range(input_c2ws.shape[0])),
            )
            print(
                f"Two passes (first) - chunking with `{strategy1}` strategy: total "
                f"{len(plan1.input_inds_per_chunk)} forward(s) ..."
            )
            all_samples = {}
            all_prior_inds: list[int] = []
            for i, (c_in_inds, c_in_sels, c_pri_inds, c_pri_sels) in enumerate(
                zip(
                    plan1.input_inds_per_chunk,
                    plan1.input_sels_per_chunk,
                    plan1.test_inds_per_chunk,
                    plan1.test_sels_per_chunk,
                )
            ):
                with stage("first_pass_build"):
                    (
                        curr_input_sels,
                        curr_prior_sels,
                        curr_input_maps,
                        curr_prior_maps,
                    ) = planner.pad_indices(
                        c_in_sels,
                        c_pri_sels,
                        T=T_first,
                        padding_mode=options.get("t_padding_mode", "last"),
                    )
                    gen = get_k_from_dict(all_samples, "samples-rgb")
                    pool_imgs = np.concatenate(
                        [input_imgs, gen.reshape((-1,) + input_imgs.shape[1:])], 0
                    )
                    pool_clip = np.concatenate(
                        [input_imgs_clip, gen.reshape((-1,) + input_imgs.shape[1:])],
                        0,
                    )
                    pool_c2ws = np.concatenate(
                        [input_c2ws, traj_prior_c2ws[all_prior_inds]], 0
                    )
                    pool_Ks = np.concatenate(
                        [input_Ks, traj_prior_Ks[all_prior_inds]], 0
                    )
                    curr = [
                        planner.assemble(
                            input=x[c_in_inds],
                            test=y[c_pri_inds],
                            input_maps=curr_input_maps,
                            test_maps=curr_prior_maps,
                        )
                        for x, y in zip(
                            [pool_imgs, pool_clip, pool_c2ws, pool_Ks],
                            [
                                traj_prior_imgs,
                                traj_prior_imgs_clip,
                                traj_prior_c2ws,
                                traj_prior_Ks,
                            ],
                        )
                    ]
                    curr_imgs, curr_imgs_clip, curr_c2ws, curr_Ks = curr
                    values = chunk_values_for(
                        curr_imgs,
                        curr_imgs_clip,
                        curr_input_sels,
                        curr_c2ws,
                        curr_Ks,
                        list(range(T_first)),
                    )
                use_second_sampler = (
                    len(guiders) > 1
                    and options.get("ltr_first_pass", False)
                    and strategy1 != "gt"
                    and i > 0
                )
                g = guiders[1] if use_second_sampler else guiders[0]
                with stage("first_pass_sample"):
                    samples = sample_chunk(
                        bundle,
                        values,
                        num_steps=num_steps,
                        cfg=_cfg_at(cfg_opt, 0),
                        guider_type=g,
                        cfg_min=cfg_min,
                        base_key=base_key,
                        pass_id=1,
                        chunk_id=i,
                        encoding_t=enc_t,
                        decoding_t=dec_t,
                        latent_downsample=F,
                        abort_event=abort_event,
                        progress_cb=first_pass_pbar,
                    )
                if samples is None:
                    return
                with stage("first_pass_decode_extend"):
                    samples = decode_output(samples, T_first, c_pri_sels)
                    extend_dict(all_samples, samples)
                all_prior_inds.extend(c_pri_inds)

            # Frame PNGs stream to a background writer and overlap the
            # remaining denoise scans (identical bytes; saving.py). Disabled
            # when input splicing rewrites frames at save time, or via
            # stream_save=False.
            stream_save = options.get("stream_save", True) and not options.get(
                "replace_or_include_input", False
            )
            fp_writer = None
            if options.get("save_first_pass", True):
                with stage("first_pass_save"):
                    if stream_save:
                        fp_writer = StreamingFrameWriter(
                            osp.join(save_path, "first-pass", "samples-rgb")
                        )
                        _cleanup.append(fp_writer.drain)
                        fp_frames = get_k_from_dict(all_samples, "samples-rgb")
                        fp_writer.submit(range(len(fp_frames)), fp_frames)
                    save_output(
                        all_samples,
                        save_path=osp.join(save_path, "first-pass"),
                        video_save_fps=5,
                        skip_png_keys=("samples-rgb",) if stream_save else (),
                    )
                yield osp.join(save_path, "first-pass", "samples-rgb.mp4")

            # ------------- second pass: interpolate all targets -------------
            prior_indices = image_cond["prior_indices"]
            assert prior_indices is not None
            prior_argsort = np.argsort(
                list(input_indices) + list(prior_indices), kind="stable"
            ).tolist()
            prior_indices = np.array(list(input_indices) + list(prior_indices))[
                prior_argsort
            ].tolist()
            gt_input_inds = [prior_argsort.index(i) for i in range(input_c2ws.shape[0])]

            gen = get_k_from_dict(all_samples, "samples-rgb")
            traj_prior_imgs = np.concatenate([input_imgs, gen], axis=0)[prior_argsort]
            traj_prior_imgs_clip = np.concatenate(
                [input_imgs_clip, gen], axis=0
            )[prior_argsort]
            traj_prior_c2ws = np.concatenate([input_c2ws, traj_prior_c2ws], axis=0)[
                prior_argsort
            ]
            traj_prior_Ks = np.concatenate([input_Ks, traj_prior_Ks], axis=0)[
                prior_argsort
            ]
            update_kv_for_dict(all_samples, "samples-rgb", traj_prior_imgs)
            update_kv_for_dict(all_samples, "samples-c2ws", traj_prior_c2ws)
            update_kv_for_dict(all_samples, "samples-intrinsics", traj_prior_Ks)

            with stage("second_pass_prime"):
                if os.environ.get("SVC_COND_CACHE", "1") != "0":
                    # Prime the per-frame encode/embed caches with every
                    # generated anchor frame in ONE batched dispatch each.
                    # Without this, each chunk's conditioning build pays a
                    # relay-priced device dispatch for its newly-seen anchor
                    # (~2 extra dispatches per chunk); primed, every
                    # per-chunk encode/embed below is a cache hit. The gt
                    # input rows are excluded EXPLICITLY (the first pass
                    # already cached them) so the prime batch — and hence
                    # its pow2 compile bucket — is always exactly the
                    # anchor count, independent of cache state (a warmup /
                    # server can precompile it from the plan alone).
                    gt_set = set(gt_input_inds)
                    gen_rows = [
                        j for j in range(len(traj_prior_imgs)) if j not in gt_set
                    ]
                    bundle.vae.encode_cached(traj_prior_imgs[gen_rows], enc_t)
                    bundle.clip.embed_cached(traj_prior_imgs_clip[gen_rows])

            strategy2 = options.get("chunk_strategy", "nearest")
            deliver = (
                options.get("deliver_anchors", False)
                and strategy2.startswith("interp")
            )
            if deliver:
                # Targets whose ordinal coincides with an anchor are not
                # re-denoised: the first-pass frame at the identical pose is
                # delivered directly (TPU addition, EngineOptions.
                # deliver_anchors; the reference re-samples every target,
                # seva/eval.py:1837-1956). Inputs can never coincide —
                # test_indices excludes them by construction. Ordinal
                # coincidence alone is not proof of pose identity (a direct
                # run_one_scene caller may pass a separate prior trajectory
                # whose integer indices alias target ordinals), so each
                # candidate pair's pose AND intrinsics are verified; any
                # mismatch falls back to re-denoising that target.
                prior_rows = {
                    int(round(p)): j
                    for j, p in enumerate(prior_indices)
                    if abs(p - round(p)) < 1e-9
                }
                keep, delivered = [], []
                for j, t in enumerate(test_indices):
                    r = prior_rows.get(t)
                    if (
                        r is not None
                        and np.allclose(
                            traj_prior_c2ws[r], test_c2ws[j], atol=1e-5
                        )
                        and np.allclose(traj_prior_Ks[r], test_Ks[j], atol=1e-5)
                    ):
                        delivered.append((j, r))
                    else:
                        keep.append(j)
            else:
                keep = list(range(len(test_indices)))
                delivered = []
            test_indices2 = [test_indices[j] for j in keep]
            test_imgs2 = test_imgs[keep]
            test_imgs_clip2 = test_imgs_clip[keep]
            test_c2ws2 = test_c2ws[keep]
            test_Ks2 = test_Ks[keep]
            with stage("second_pass_plan"):
                plan2 = planner.chunk_input_and_test(
                    T_second,
                    traj_prior_c2ws,
                    test_c2ws2,
                    prior_indices,
                    test_indices2,
                    options=options,
                    task=task,
                    chunk_strategy=strategy2,
                    gt_input_inds=gt_input_inds,
                )
            print(
                f"Two passes (second) - chunking with `{strategy2}` strategy: total "
                f"{len(plan2.input_inds_per_chunk)} forward(s) ..."
            )
            all_samples = {}
            all_test_inds = []
            # Chunk flushes (decode sync + host transfer + extend + PNG
            # submit, ~5 s each on the relay) run on ONE ordered worker
            # thread so they overlap the next chunk's dispatch-block instead
            # of serializing between dispatches. FIFO worker == serial
            # ordering; errors re-raise at the join below.
            sp_writer = (
                StreamingFrameWriter(osp.join(save_path, "samples-rgb"))
                if stream_save
                else None
            )
            if sp_writer is not None:
                _cleanup.append(sp_writer.drain)

            flush_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="svc-flush"
            )
            flush_futs: list = []

            def _teardown_flush_pool():
                # consume pending futures (swallowing their exceptions only
                # on abnormal exits — the happy path joins with .result()
                # below, which re-raises) then stop the executor thread.
                # Registered AFTER sp_writer.drain so reversed-order cleanup
                # stops the pool (which submits to the writer) first.
                for f in flush_futs:
                    f.exception()
                flush_pool.shutdown(wait=True)

            _cleanup.append(_teardown_flush_pool)

            def _flush_second_pass_chunk(item):
              with stage("second_pass_flush"):
                samples_dev, i, c_test_sels, c_test_inds, curr = item
                curr_imgs, _, curr_c2ws, curr_Ks = curr
                samples = decode_output(np.asarray(samples_dev), T_second, c_test_sels)
                if options.get("save_second_pass", False):
                    save_output(
                        replace_or_include_input_for_dict(
                            samples, c_test_sels, curr_imgs, curr_c2ws, curr_Ks
                        ),
                        save_path=osp.join(save_path, "second-pass", f"forward_{i}"),
                        video_save_fps=2,
                    )
                extend_dict(all_samples, samples)
                # c_test_inds index the (possibly anchor-reduced) test arrays;
                # map back to positions in the full target list
                final_inds = [keep[k] for k in c_test_inds]
                all_test_inds.extend(final_inds)
                if sp_writer is not None:
                    frames = samples.get("samples-rgb/image")
                    if frames is not None:
                        # a chunk's final frame indices are known at flush
                        # time: PNG encodes overlap the next chunk's scan
                        sp_writer.submit(final_inds, frames)

            # host-assemble every chunk up front (cheap numpy): second-pass
            # chunks depend only on the fixed anchors, so they can run
            # serially (1-deep device pipeline) or data-parallel over the
            # mesh's 'data' axis (sample_many)
            work = []
            with stage("second_pass_build"):
              for i, (c_pri_inds, c_pri_sels, c_test_inds, c_test_sels) in enumerate(
                zip(
                    plan2.input_inds_per_chunk,
                    plan2.input_sels_per_chunk,
                    plan2.test_inds_per_chunk,
                    plan2.test_sels_per_chunk,
                )
              ):
                (
                    curr_prior_sels,
                    curr_test_sels,
                    curr_prior_maps,
                    curr_test_maps,
                ) = planner.pad_indices(
                    c_pri_sels, c_test_sels, T=T_second, padding_mode="last"
                )
                curr = [
                    planner.assemble(
                        input=x[c_pri_inds],
                        test=y[c_test_inds],
                        input_maps=curr_prior_maps,
                        test_maps=curr_test_maps,
                    )
                    for x, y in zip(
                        [
                            traj_prior_imgs,
                            traj_prior_imgs_clip,
                            traj_prior_c2ws,
                            traj_prior_Ks,
                        ],
                        [test_imgs2, test_imgs_clip2, test_c2ws2, test_Ks2],
                    )
                ]
                curr_imgs, curr_imgs_clip, curr_c2ws, curr_Ks = curr
                values = chunk_values_for(
                    curr_imgs,
                    curr_imgs_clip,
                    curr_prior_sels,
                    curr_c2ws,
                    curr_Ks,
                    list(range(T_second)),
                )
                work.append((i, c_test_sels, c_test_inds, curr, values))

            mesh = bundle.denoiser.mesh
            n_data = mesh.shape.get("data", 1) if mesh is not None else 1
            guider2 = guiders[1] if len(guiders) > 1 else guiders[0]
            cfg2 = _cfg_at(cfg_opt, 1)
            chunk_key = lambda i: jax.random.fold_in(  # noqa: E731
                jax.random.fold_in(base_key, 2), i
            )
            # per-step progress needs the serial sampler; without it,
            # independent chunks batch over the data axis in groups of n_data
            # (bit-identical to serial: same per-chunk keys, see sample_many).
            # A final PARTIAL group is padded by repeating its last chunk so
            # it still runs as one sharded program (a 7-chunk pass on an
            # 8-wide data axis is one dispatch, not 7 serial scans); padded
            # outputs are dropped.
            #
            # SINGLE-CHIP chunk batching (SVC_CHUNK_BATCH=B / options
            # chunk_batch): the same grouping with no mesh — B independent
            # chunks vmap into one scan, widening every matmul's batch dim
            # (the narrow-N fusions and D=64 attention heads that cap MFU at
            # ~53% feed better at 2x batch). Same per-chunk keys -> serial-
            # equivalent outputs; HBM doubles per +1 B. A/B:
            # benchmark/chunk_batch_ab.py.
            chunk_batch = int(
                os.environ.get("SVC_CHUNK_BATCH", "0")
                or options.get("chunk_batch", 0)
                or 0
            )
            use_dp = n_data > 1 and len(work) > 1 and second_pass_pbar is None
            use_batch = (
                not use_dp
                and chunk_batch > 1
                and len(work) > 1
                and second_pass_pbar is None
            )
            if use_batch:
                n_data = chunk_batch  # group width for the loop below
            n_dp = len(work) if (use_dp or use_batch) else 0
            for g in range(0, n_dp, n_data):
                if abort_event is not None and abort_event.is_set():
                    return  # _cleanup joins the pool and drains writers
                group = work[g : g + n_data]
                pad = n_data - len(group)
                conds, shape = [], None
                with stage("second_pass_conditioning"):
                    for _, _, _, _, values in group:
                        cond, shape = build_chunk_conditioning(
                            bundle, values, cfg=cfg2, guider_type=guider2,
                            cfg_min=cfg_min, encoding_t=enc_t,
                            latent_downsample=F,
                        )
                        conds.append(cond)
                    conds += [conds[-1]] * pad
                    conds_n = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *conds
                    )
                    keys = [chunk_key(item[0]) for item in group]
                    keys_n = jnp.stack(keys + [keys[-1]] * pad)
                with stage("second_pass_sample_many"):
                    xs_n = bundle.denoiser.sample_many(
                        keys_n, bundle.plan(num_steps), conds_n, shape
                    )
                for j, (i, c_test_sels, c_test_inds, curr, _) in enumerate(group):
                    # second-pass frames are final output: quantize on device
                    out_dev = bundle.vae.decode_async(xs_n[j], dec_t, uint8=True)
                    flush_futs.append(
                        flush_pool.submit(
                            _flush_second_pass_chunk,
                            (out_dev, i, c_test_sels, c_test_inds, curr),
                        )
                    )
            # conditioning is staged AHEAD of the dispatch loop in a bounded
            # rolling window (default 3 chunks, SVC_PREFETCH_CHUNKS): a cond
            # build contains blocking encode syncs which would otherwise
            # queue behind the in-flight scan and stall the host a full
            # scan-time between dispatches; prebuilt, the loop below is pure
            # dispatch+flush and scans run back-to-back. The window bounds
            # device memory to ~10 MB x window instead of growing linearly
            # with trajectory length (with the primed cond cache the
            # steady-state refill below is a pure-numpy cache hit anyway).
            work_rest = work[n_dp:]
            prefetch = max(1, int(os.environ.get("SVC_PREFETCH_CHUNKS", "3")))
            staged: list = []

            def _build_cond(values):
                return build_chunk_conditioning(
                    bundle, values, cfg=cfg2, guider_type=guider2,
                    cfg_min=cfg_min, encoding_t=enc_t,
                    latent_downsample=F,
                )

            with stage("second_pass_conditioning"):
                for _i, _sels, _inds, _curr, values in work_rest[:prefetch]:
                    staged.append(_build_cond(values))
            for pos, (i, c_test_sels, c_test_inds, curr, values) in enumerate(
                work_rest
            ):
              pb = staged[pos]
              staged[pos] = None  # release the window slot's device refs
              with stage("second_pass_sample"):
                samples_dev = sample_chunk(
                    bundle,
                    values,
                    num_steps=num_steps,
                    cfg=cfg2,
                    guider_type=guider2,
                    cfg_min=cfg_min,
                    base_key=base_key,
                    pass_id=2,
                    chunk_id=i,
                    encoding_t=enc_t,
                    decoding_t=dec_t,
                    latent_downsample=F,
                    abort_event=abort_event,
                    progress_cb=second_pass_pbar,
                    # chunk i's decode queues on-device behind chunk i+1's
                    # denoise; the flush worker materializes it while the
                    # host blocks on chunk i+1's dispatch
                    defer=True,
                    output_uint8=True,
                    prebuilt=pb,
                )
                if samples_dev is None:
                    return  # aborted; _cleanup joins the pool and drains writers
                flush_futs.append(
                    flush_pool.submit(
                        _flush_second_pass_chunk,
                        (samples_dev, i, c_test_sels, c_test_inds, curr),
                    )
                )
              # refill the prefetch window: build the conditioning for chunk
              # pos+prefetch while the just-dispatched scan occupies the device
              nxt = pos + prefetch
              if nxt < len(work_rest):
                  with stage("second_pass_conditioning"):
                      staged.append(_build_cond(work_rest[nxt][4]))
            with stage("second_pass_flush_join"):
                for f in flush_futs:
                    f.result()  # re-raises worker errors, preserves order
                flush_pool.shutdown(wait=True)
            if delivered:
                # splice the first-pass anchor frames in at their coincident
                # target positions (same dtype/op order as the device-side
                # uint8 decode: to_uint8 is byte-identical to decode_uint8)
                rows = [r for _, r in delivered]
                spliced = to_uint8(traj_prior_imgs[rows])
                extend_dict(all_samples, {"samples-rgb/image": spliced})
                all_test_inds.extend(j for j, _ in delivered)
                if sp_writer is not None:
                    sp_writer.submit([j for j, _ in delivered], spliced)
            all_samples = {
                key: value[np.argsort(all_test_inds, kind="stable")]
                for key, value in all_samples.items()
            }

        with stage("final_save"):
            skip_pngs = ()
            if sp_writer is not None:
                sp_writer.drain()
                if fp_writer is not None:
                    fp_writer.drain()
                skip_pngs = ("samples-rgb",)
            save_output(
                replace_or_include_input_for_dict(
                    all_samples,
                    test_indices,
                    imgs.copy(),
                    np.asarray(camera_cond["c2w"]).copy(),
                    camera_cond["K"].copy(),
                )
                if options.get("replace_or_include_input", False)
                else all_samples,
                save_path=save_path,
                video_save_fps=options.get("video_save_fps", 2),
                skip_png_keys=skip_pngs,
            )
        if timer is not None:
            print("[engine timing]\n" + timer.report())
        yield osp.join(save_path, "samples-rgb.mp4")
