"""Euler-EDM sampling as a single jitted `lax.scan`.

The reference runs a Python loop of 50 sampler steps, each launching a
CFG-doubled denoiser forward (seva/sampling.py:301-405) with per-call sigma
quantization (DiscreteDenoiser, seva/sampling.py:105-152) and "replace"
conditioning overwriting input-view latent slots (seva/sampling.py:146-148).

TPU-native design:
  * Everything that depends only on the sigma schedule — quantized sigmas,
    discrete timestep indices, churn gammas, noise coefficients — is
    precomputed on the host into a `SamplingPlan` of (n,) arrays.
  * The whole denoising loop is ONE jitted program: `lax.scan` over steps,
    each step doing replace-masking, CFG batch doubling, the UNet forward,
    per-frame-scale guidance blending and the Euler update, with threefry
    per-step noise folded from a single key. No host sync until the final x.
"""

from __future__ import annotations

import itertools
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from stable_virtual_camera_tpu.sampling.discretization import (
    DDPMDiscretization,
    sigma_to_idx,
)

# ---------------------------------------------------------------------------
# In-scan host callbacks (progress + abort)
#
# The reference's GradioTrackedSampler (seva/eval.py:1037-1089) updates a
# progress bar and polls a threading.Event per sigma step from its Python
# loop. Here the whole loop is ONE jitted scan, so per-step host contact goes
# through `jax.experimental.io_callback` instead: each step emits
# (step, total) to a registered host callback and reads back an abort flag
# that gates the remaining steps' compute via `lax.cond` (the scan still runs
# to completion, but aborted steps skip the network call). The jitted program
# receives only an integer HANDLE, so one compiled program serves every
# chunk / GUI session.
# ---------------------------------------------------------------------------

_CB_REGISTRY: dict[int, tuple[Callable | None, Any]] = {}
_CB_COUNTER = itertools.count(1)


def register_tick(progress_cb, abort_event) -> int:
    handle = next(_CB_COUNTER)
    _CB_REGISTRY[handle] = (progress_cb, abort_event)
    return handle


def unregister_tick(handle: int) -> None:
    _CB_REGISTRY.pop(int(handle), None)


def _host_tick(handle, step, total) -> np.bool_:
    cb, ev = _CB_REGISTRY.get(int(handle), (None, None))
    if cb is not None:
        cb(int(step), int(total))
    return np.bool_(ev is not None and ev.is_set())


_IO_CALLBACK_OK: dict[str, bool] = {}


def io_callback_supported() -> bool:
    """Whether ordered `io_callback` works on the default backend.

    CPU and real TPU/GPU backends support host callbacks; the axon TPU *relay*
    HANGS on them (measured: a trivial ordered-io_callback jit never returns),
    and a hang is strictly worse than the stepwise fallback — so unknown
    platforms are out unless SVC_IN_SCAN_TICK=1 forces the probe."""
    platform = jax.default_backend()
    if platform in _IO_CALLBACK_OK:
        return _IO_CALLBACK_OK[platform]
    forced = os.environ.get("SVC_IN_SCAN_TICK")
    if forced == "0":
        return False
    if forced != "1" and platform not in ("cpu", "tpu", "gpu", "cuda", "rocm"):
        return False
    try:
        from jax.experimental import io_callback

        def probe(x):
            flag = io_callback(
                lambda v: np.bool_(v > 0),
                jax.ShapeDtypeStruct((), jnp.bool_),
                x,
                ordered=True,
            )
            return jnp.where(flag, x, -x)

        _IO_CALLBACK_OK[platform] = bool(jax.jit(probe)(jnp.int32(1)) == 1)
    except Exception:  # pragma: no cover - platform-dependent
        _IO_CALLBACK_OK[platform] = False
    return _IO_CALLBACK_OK[platform]


@dataclass(frozen=True)
class SamplingPlan:
    """Host-precomputed per-step schedule arrays (all shape (n,))."""

    sigma_hat_raw: np.ndarray  # churned sigma used in the Euler update
    sigma_hat_quant: np.ndarray  # quantized sigma used for preconditioning
    t_indices: np.ndarray  # discrete timestep index fed to the network
    sigma_next: np.ndarray  # next sigma in the schedule
    noise_coeff: np.ndarray  # per-step injected-noise std (churn)
    init_scale: float  # sqrt(1 + sigma_0^2) initial noise scaling

    @property
    def num_steps(self) -> int:
        return len(self.t_indices)


def make_sampling_plan(
    discretization: DDPMDiscretization,
    num_steps: int,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = 999.0,
    s_noise: float = 1.0,
) -> SamplingPlan:
    """Precompute the whole sigma schedule (reference seva/sampling.py:325-405
    prepare_sampling_loop + per-step gamma/sigma_hat computation)."""
    sigmas = discretization(num_steps)  # descending, with appended 0
    registered = discretization.registered_sigmas()
    n = num_steps

    sigma = sigmas[:n].astype(np.float64)
    gamma = np.where(
        (s_tmin <= sigma) & (sigma <= s_tmax),
        min(s_churn / max(n - 1, 1), 2**0.5 - 1),
        0.0,
    )
    sigma_hat_raw = sigma * (gamma + 1.0) + 1e-6
    t_indices = sigma_to_idx(sigma_hat_raw.astype(np.float32), registered)
    sigma_hat_quant = registered[t_indices]
    noise_coeff = np.sqrt(np.maximum(sigma_hat_raw**2 - sigma**2, 0.0)) * s_noise
    return SamplingPlan(
        sigma_hat_raw=sigma_hat_raw.astype(np.float32),
        sigma_hat_quant=sigma_hat_quant.astype(np.float32),
        t_indices=t_indices.astype(np.int32),
        sigma_next=sigmas[1 : n + 1].astype(np.float32),
        noise_coeff=noise_coeff.astype(np.float32),
        init_scale=float(np.sqrt(1.0 + sigmas[0].astype(np.float64) ** 2)),
    )


@dataclass
class ChunkConditioning:
    """Device-ready conditioning for one T-frame chunk, already CFG-doubled
    along axis 0 ([uncond | cond], matching reference seva/sampling.py:231-242).

    crossattn: (2T, 1, ctx)   CLIP embedding (zeros in the uncond half)
    concat:    (2T, h, w, 7)  input-mask ++ Plücker (mask zeroed in uncond)
    dense:     (2T, h, w, 6)  Plücker FiLM map (SAME in both halves)
    replace:   (2T, h, w, 5)  input latents ++ replace mask (zeros in uncond)
    scale:     (T,)           per-frame CFG scale vector
    """

    crossattn: Any
    concat: Any
    dense: Any
    replace: Any
    scale: Any


NetworkFn = Callable[..., jnp.ndarray]
# network_fn(x_2T(4ch), concat_2T(7ch), t_vec, crossattn, dense, num_frames)
#   -> (2T, h, w, 4)
# The concat channels are appended to the PRE-conditioned latent exactly as
# SGMWrapper does (x*c_in ++ concat, reference seva/model.py:219-234 with
# seva/sampling.py:149-152).


def euler_edm_sample(
    network_fn: NetworkFn,
    noise: jnp.ndarray,  # (T, h, w, 4) standard normal
    plan_arrays: dict[str, jnp.ndarray],
    cond: ChunkConditioning,
    key: jax.Array,
    num_frames: int,
    tick_handle: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """The jittable sampling loop. `plan_arrays` holds the SamplingPlan fields
    as device arrays plus 'init_scale' (scalar).

    `tick_handle` (int32 scalar, see `register_tick`) enables per-step host
    contact from INSIDE the scan: progress via ordered io_callback and an
    abort flag that short-circuits the remaining steps' network calls — the
    single-dispatch replacement for the reference's per-step Python loop
    (GradioTrackedSampler, seva/eval.py:1037-1089)."""
    T = num_frames
    x = noise * plan_arrays["init_scale"]
    schedule = (
        plan_arrays["sigma_hat_raw"],
        plan_arrays["sigma_hat_quant"],
        plan_arrays["t_indices"],
        plan_arrays["sigma_next"],
        plan_arrays["noise_coeff"],
    )

    if tick_handle is None:

        def step(carry, per_step):
            x, key = carry
            key, sub = jax.random.split(key)
            x = euler_edm_step(network_fn, x, per_step, cond, sub, num_frames=T)
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, key), schedule)
        return x

    from jax.experimental import io_callback

    n_steps = schedule[0].shape[0]

    def tracked_step(carry, xs):
        x, key, aborted = carry
        i, per_step = xs
        key, sub = jax.random.split(key)
        x = jax.lax.cond(
            aborted,
            lambda x, *_: x,
            lambda x, per_step, sub: euler_edm_step(
                network_fn, x, per_step, cond, sub, num_frames=T
            ),
            x,
            per_step,
            sub,
        )
        flag = io_callback(
            _host_tick,
            jax.ShapeDtypeStruct((), jnp.bool_),
            tick_handle,
            i + 1,
            n_steps,
            ordered=True,
        )
        return (x, key, aborted | flag), None

    (x, _, _), _ = jax.lax.scan(
        tracked_step,
        (x, key, jnp.bool_(False)),
        (jnp.arange(n_steps, dtype=jnp.int32), schedule),
    )
    return x


def euler_edm_step(
    network_fn: NetworkFn,
    x: jnp.ndarray,
    per_step: tuple,
    cond: ChunkConditioning,
    step_key: jax.Array,
    num_frames: int,
    return_net_in: bool = False,
) -> jnp.ndarray:
    """One churned Euler step (reference seva/sampling.py:347-368 with the
    DiscreteDenoiser preconditioning of seva/sampling.py:133-152).

    `return_net_in=True` additionally returns the (preconditioned latent,
    t_vec) the network consumed — the static-W8A8 calibration capture
    (`UNetDenoiser.ensure_quant_calibrated`)."""
    T = num_frames
    sigma_hat_raw, sigma_hat_quant, t_idx, sigma_next, noise_coeff = per_step
    rep_lat, rep_mask = jnp.split(cond.replace, [x.shape[-1]], axis=-1)
    scale = cond.scale[:, None, None, None]

    eps = jax.random.normal(step_key, x.shape, x.dtype)
    x = x + eps * noise_coeff

    xin = jnp.concatenate([x, x], axis=0)
    # replace conditioning: overwrite input-view latents every call
    # (reference seva/sampling.py:146-148)
    xin = xin * (1 - rep_mask) + rep_lat * rep_mask

    c_in = jax.lax.rsqrt(sigma_hat_quant**2 + 1.0)
    t_vec = jnp.full((2 * T,), t_idx, jnp.int32)
    net_x = xin * c_in
    out = network_fn(net_x, cond.concat, t_vec, cond.crossattn, cond.dense, T)
    denoised = out * (-sigma_hat_quant) + xin  # c_out, c_skip (EpsScaling)

    uncond, condit = jnp.split(denoised, 2, axis=0)
    denoised = uncond + scale * (condit - uncond)

    d = (x - denoised) / sigma_hat_raw
    x_next = x + (sigma_next - sigma_hat_raw) * d
    if return_net_in:
        return x_next, (net_x, t_vec)
    return x_next


def euler_edm_capture(
    network_fn: NetworkFn,
    noise: jnp.ndarray,
    plan_arrays: dict[str, jnp.ndarray],
    cond: ChunkConditioning,
    key: jax.Array,
    num_frames: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`euler_edm_sample` that also stacks every step's network inputs:
    returns (net_x (n, 2T, h, w, 4), t_vecs (n, 2T)). Used by the
    static-W8A8 calibration to observe the exact activation trajectory the
    serving scan will run (ops/quant.py)."""
    T = num_frames
    x = noise * plan_arrays["init_scale"]
    schedule = (
        plan_arrays["sigma_hat_raw"],
        plan_arrays["sigma_hat_quant"],
        plan_arrays["t_indices"],
        plan_arrays["sigma_next"],
        plan_arrays["noise_coeff"],
    )

    def step(carry, per_step):
        x, key = carry
        key, sub = jax.random.split(key)
        x, net_in = euler_edm_step(
            network_fn, x, per_step, cond, sub, num_frames=T,
            return_net_in=True,
        )
        return (x, key), net_in

    _, (net_xs, t_vecs) = jax.lax.scan(step, (x, key), schedule)
    return net_xs, t_vecs


def film_cache_enabled() -> bool:
    """Per-chunk FiLM precompute (hoists each ResBlock's resize+dense_proj
    of the Plücker map out of the sigma scan). Exact (tests/test_film_cache)
    but measured NEUTRAL on the real chip (38.44 vs 37.81 s denoise, within
    relay noise — docs/ARCHITECTURE.md round-3 journal) while holding ~1-2 GB
    of HBM at 2x21 frames, so the default is OFF; SVC_FILM_CACHE=1 enables."""
    return os.environ.get("SVC_FILM_CACHE", "0") == "1"


def plan_to_device(plan: SamplingPlan) -> dict[str, jnp.ndarray]:
    return {
        "sigma_hat_raw": jnp.asarray(plan.sigma_hat_raw),
        "sigma_hat_quant": jnp.asarray(plan.sigma_hat_quant),
        "t_indices": jnp.asarray(plan.t_indices),
        "sigma_next": jnp.asarray(plan.sigma_next),
        "noise_coeff": jnp.asarray(plan.noise_coeff),
        "init_scale": jnp.asarray(plan.init_scale, jnp.float32),
    }


def plan_as_host(plan: SamplingPlan) -> dict[str, np.ndarray]:
    """The SamplingPlan as plain HOST arrays with the same treedef as
    `plan_to_device`. Passing these straight into a jitted call transfers
    them with the dispatch instead of paying one eager device op per field
    (six per chunk on the relay — the engine dispatch diet, round-3
    journal)."""
    return {
        "sigma_hat_raw": plan.sigma_hat_raw,
        "sigma_hat_quant": plan.sigma_hat_quant,
        "t_indices": plan.t_indices,
        "sigma_next": plan.sigma_next,
        "noise_coeff": plan.noise_coeff,
        "init_scale": np.float32(plan.init_scale),
    }


class UNetDenoiser:
    """Binds SevaUNet params into a `network_fn` and jit-caches the full
    sampling program per (T, h, w, steps) shape bucket."""

    def __init__(self, unet_module, params, mesh=None, artifacts=None):
        """`mesh` (jax.sharding.Mesh with a 'view' axis) turns every sampling
        program into a view-sharded pjit: frames distribute over the axis,
        params replicate, and the joint-attention collectives ride ICI
        (parallel/sharding.py semantics, engine-integrated). Buckets whose T
        does not divide the axis fall back to single-device jit.

        `artifacts` maps ("scan", T, h, w, steps) buckets to AOT-exported
        programs (`jax.export.Exported`, see models/export.py): matching
        plain-scan buckets run the deserialized artifact instead of
        re-tracing the model — the deployment path where serving fleets
        ship a pinned program + weights and never retrace."""
        self.unet = unet_module
        self.params = params
        self.mesh = mesh
        self.artifacts = artifacts or {}
        self._jitted: dict[tuple, Callable] = {}
        self._warned_unsharded: set[int] = set()

    def _maybe_shard(self, fn, T: int, has_per_step: bool):
        """jit `fn(params, x, plan/per_step, cond, key)` with view shardings
        when the mesh applies to this T."""
        if self.mesh is None:
            return jax.jit(fn)
        n_view = self.mesh.shape.get("view", 1)
        if T % n_view != 0:
            if T not in self._warned_unsharded:
                self._warned_unsharded.add(T)
                print(
                    f"[sampler] WARNING: T={T} does not divide the mesh view "
                    f"axis ({n_view}); this shape bucket runs UNSHARDED on "
                    f"one device"
                )
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        vs = lambda rank: NamedSharding(  # noqa: E731
            mesh, P("view", *([None] * (rank - 1)))
        )
        scalar = NamedSharding(mesh, P())
        if mesh.shape.get("model", 1) > 1:
            # 3-D mesh: weights tensor-parallel over 'model' (Megatron via
            # GSPMD; parallel/param_sharding.py), frames still over 'view'
            from stable_virtual_camera_tpu.parallel.param_sharding import (
                tree_shardings,
            )

            params_sh = tree_shardings(self.params, mesh, "model")
        else:
            params_sh = jax.tree_util.tree_map(lambda _: scalar, self.params)
        cond_sh = ChunkConditioning(
            crossattn=vs(3), concat=vs(4), dense=vs(4), replace=vs(4), scale=vs(1)
        )
        plan_sh = (
            (scalar,) * 5
            if has_per_step
            else {
                k: scalar
                for k in (
                    "sigma_hat_raw", "sigma_hat_quant", "t_indices",
                    "sigma_next", "noise_coeff", "init_scale",
                )
            }
        )
        return jax.jit(
            fn,
            in_shardings=(params_sh, vs(4), plan_sh, cond_sh, scalar),
            out_shardings=vs(4),
        )

    def make_scan_fn(self, T: int):
        """The pure plain-scan program for one T bucket:
        `run(params, noise, plan_arrays, cond, key) -> latents`. Shared by
        the live-jit path (`sample`) and AOT export (models/export.py).

        View-sharded buckets compute the FiLM cache at the full 2T batch
        (the half-batch broadcast reshape would split the sharded axis);
        GSPMD keeps the per-sample precompute local."""
        sharded = self.mesh is not None and T % self.mesh.shape.get("view", 1) == 0

        def run(params, noise, plan_arrays, cond, key, _T=T, _sh=sharded):
            return euler_edm_sample(
                self._bound_network(params, cond, _T, full_batch=_sh),
                noise,
                plan_arrays,
                cond,
                key,
                num_frames=_T,
            )

        return run

    def network_with_params(
        self, params, x, concat, t_vec, crossattn, dense, num_frames, film=None
    ):
        from stable_virtual_camera_tpu.models.unet import assemble_network_input

        from stable_virtual_camera_tpu.ops.quant import as_variables

        net_in = assemble_network_input(x, concat)
        # film only as an explicit kwarg: test doubles for the network don't
        # speak the FiLM-cache protocol
        kwargs = {} if film is None else {"film": film}
        return self.unet.apply(
            as_variables(params),
            net_in,
            t_vec,
            crossattn,
            dense,
            num_frames=num_frames,
            **kwargs,
        )

    def network_fn(self, x, concat, t_vec, crossattn, dense, num_frames):
        return self.network_with_params(
            self.params, x, concat, t_vec, crossattn, dense, num_frames
        )

    def _bound_network(self, params, cond, T, full_batch=False):
        """network_fn for one chunk, with the per-chunk FiLM cache
        precomputed and bound: each ResBlock's resize + dense_proj of the
        Plücker map depends only on the chunk conditioning, so it is hoisted
        here (once per chunk, inside the same jitted program) instead of
        recomputed at every sigma step of the scan. The ChunkConditioning
        contract guarantees the CFG halves share one Plücker map
        (engine/runner.py build_chunk_conditioning concatenates
        [plucker, plucker]), so by default the cache is computed at T —
        half the batch — and broadcast over the doubled batch at apply
        time. `full_batch=True` computes it at 2T instead (used under the
        view-sharded pjit, where the broadcast reshape would split the
        sharded batch axis; also contract-free). The cache scales linearly
        with T (~1-2 GB bf16 at 2x21 frames, 576p): above
        SVC_FILM_CACHE_MAX_T (default 48) the per-step recompute is kept —
        the T~90 semi-dense regime would spend several HBM GB on it.
        Measured NEUTRAL on the real chip (round-3 journal), so the cache
        is opt-in: SVC_FILM_CACHE=1 enables, default recomputes per step."""
        from stable_virtual_camera_tpu.models.unet import SevaUNet

        max_t = int(os.environ.get("SVC_FILM_CACHE_MAX_T", "48"))
        if (
            not film_cache_enabled()
            or T > max_t
            or not isinstance(self.unet, SevaUNet)
        ):
            # dummy network modules in tests don't implement the film_only
            # walk; the cache is a SevaUNet-specific protocol
            return partial(self.network_with_params, params)
        from stable_virtual_camera_tpu.ops.quant import as_variables

        film = self.unet.apply(
            as_variables(params),
            None,
            None,
            None,
            cond.dense if full_batch else cond.dense[:T],
            num_frames=T,
            film_only=True,
        )
        return partial(self.network_with_params, params, film=film)

    def ensure_quant_calibrated(
        self,
        shape: tuple[int, int, int, int],
        plan: SamplingPlan,
        cond: ChunkConditioning,
        num_points: int = 6,
    ) -> None:
        """Static-W8A8 calibration (ops/quant.py). Under `SVC_QUANT=
        w8a8-static`, before the first serving program traces: run ONE bf16
        sampling trajectory on this chunk's own conditioning (the serving
        schedule, exact math), capture every step's network inputs on
        device, and push `num_points` steps spread over the schedule through
        the UNet in calibration mode (mutable "quant" collection) — one
        serving-sized forward per point (peak activation memory stays at
        serving scale), per-point collections max-merged in one jitted
        reduce. The frozen collection — prequantized int8 weights +
        per-site activation abs-max — then travels with `self.params` as a
        {"params","quant"} variables dict through every existing
        jit/sharding path. No-op in all other modes; idempotent.

        Cost: one extra denoise trajectory + K serving-sized forwards, paid
        once per process (two extra compiles). Calibrating on the scene's
        first real chunk keeps the scales honest for that scene family."""
        from stable_virtual_camera_tpu.ops.quant import (
            force_mode,
            is_variables_dict,
            static_enabled,
        )

        if not static_enabled() or is_variables_dict(self.params):
            return
        from stable_virtual_camera_tpu.models.unet import (
            assemble_network_input,
        )

        T, h, w, C = shape
        raw = self.params
        key = jax.random.PRNGKey(0)
        with force_mode("0"):
            capture = jax.jit(
                lambda p, noise, plan_arrays, c, k: euler_edm_capture(
                    partial(self.network_with_params, p),
                    noise, plan_arrays, c, k, num_frames=T,
                )
            )
            noise = jax.random.normal(key, (T, h, w, C), jnp.float32)
            net_xs, t_vecs = capture(raw, noise, plan_as_host(plan), cond, key)
        n = plan.num_steps
        idx = np.unique(
            np.linspace(0, n - 1, min(num_points, n)).round().astype(np.int32)
        )
        with force_mode("w8a8-calib"):

            def calib_step(p, xs, tv, concat, ca, de, k, _T=T):
                x_k = jax.lax.dynamic_index_in_dim(xs, k, 0, keepdims=False)
                t_k = jax.lax.dynamic_index_in_dim(tv, k, 0, keepdims=False)
                ni = assemble_network_input(x_k, concat)
                return self.unet.apply(
                    {"params": p}, ni, t_k, ca, de, num_frames=_T,
                    mutable=["quant"],
                )[1]["quant"]

            calib = jax.jit(calib_step)
            concat = jnp.asarray(cond.concat)
            ca = jnp.asarray(cond.crossattn)
            de = jnp.asarray(cond.dense)
            # wq/ws are weight-only (identical across points): keep the
            # accumulator's; ax is the running abs-max: elementwise max.
            # MERGE PAIRWISE AS EACH POINT LANDS, donating the accumulator:
            # holding all K collections before one merge keeps K int8 copies
            # of every quantized kernel resident (~K x 1.3 GB at full scale
            # — the first on-chip run OOMed 16 GB HBM exactly there). Peak
            # is now two collections regardless of K.
            merge2 = jax.jit(
                lambda acc, t: jax.tree_util.tree_map(
                    lambda a, b: a if a.dtype == jnp.int8 else jnp.maximum(a, b),
                    acc,
                    t,
                ),
                donate_argnums=(0,),
            )
            acc = None
            for k in idx:
                t = calib(raw, net_xs, t_vecs, concat, ca, de, jnp.int32(k))
                acc = t if acc is None else merge2(acc, t)
        self.params = {"params": raw, "quant": acc}

    def sample(
        self,
        noise: jnp.ndarray,
        plan: SamplingPlan,
        cond: ChunkConditioning,
        key: jax.Array,
        progress_cb=None,
        abort_event=None,
    ) -> jnp.ndarray | None:
        """Run the full denoising loop.

        Fast path: one jitted lax.scan program. With `progress_cb` /
        `abort_event` the SAME single-dispatch scan runs with an in-scan
        ordered io_callback emitting per-step progress and polling abort
        (the GradioTrackedSampler capability, reference seva/eval.py:1037-1089,
        without the per-step dispatch cost). Backends without host-callback
        support (the axon relay) and view-sharded programs keep the
        single-dispatch scan with chunk-granular progress/abort instead; a
        stepwise python loop survives only as a debug path
        (SVC_STEPWISE_SAMPLER=1). Returns None if aborted.
        """
        T, h, w, _ = noise.shape
        self.ensure_quant_calibrated(noise.shape, plan, cond)
        # NB: params flow in as a jit argument (never as captured constants —
        # capturing a 1.3B tree as literals bloats compilation catastrophically).
        def _scan_plain():
            bucket = ("scan", T, h, w, plan.num_steps)
            if bucket not in self._jitted:
                if bucket in self.artifacts:
                    # AOT artifact: the serialized program already contains
                    # the traced scan — jit of Exported.call just compiles it.
                    self._jitted[bucket] = jax.jit(self.artifacts[bucket].call)
                else:
                    self._jitted[bucket] = self._maybe_shard(
                        self.make_scan_fn(T), T, has_per_step=False
                    )
            return self._jitted[bucket](
                self.params, noise, plan_to_device(plan), cond, key
            )

        if progress_cb is None and abort_event is None:
            return _scan_plain()

        stepwise = os.environ.get("SVC_STEPWISE_SAMPLER", "0") == "1"
        sharded = self.mesh is not None and T % self.mesh.shape.get("view", 1) == 0
        pinned = ("scan", T, h, w, plan.num_steps) in self.artifacts
        use_in_scan = (
            not stepwise
            and not sharded  # io_callback placement under pjit is per-device;
            # the sharded buckets keep the coarse fallback
            and not pinned  # an AOT artifact IS the validated program —
            # run it (coarse progress) rather than live-trace a tracked twin
            and io_callback_supported()
        )
        if use_in_scan:
            bucket = ("scan-tracked", T, h, w, plan.num_steps)
            if bucket not in self._jitted:

                def run_tracked(params, noise, plan_arrays, cond, key, handle, _T=T):
                    return euler_edm_sample(
                        self._bound_network(params, cond, _T),
                        noise,
                        plan_arrays,
                        cond,
                        key,
                        num_frames=_T,
                        tick_handle=handle,
                    )

                self._jitted[bucket] = jax.jit(run_tracked)
            handle = register_tick(progress_cb, abort_event)
            try:
                x = self._jitted[bucket](
                    self.params, noise, plan_to_device(plan), cond, key,
                    jnp.int32(handle),
                )
                x.block_until_ready()
            finally:
                unregister_tick(handle)
            if abort_event is not None and abort_event.is_set():
                return None
            return x

        if not stepwise:
            # coarse-progress fallback (backends without working host
            # callbacks — the axon relay hangs on ordered io_callback — and
            # view-sharded programs): keep the SINGLE-dispatch scan, tick
            # progress at chunk granularity, poll abort between chunks. The
            # per-σ-step dispatch loop below costs ~35-40 ms of relay floor
            # per step (docs/ARCHITECTURE.md "Dispatch discipline") and stays
            # debug-only (SVC_STEPWISE_SAMPLER=1).
            if abort_event is not None and abort_event.is_set():
                return None
            x = _scan_plain()
            x.block_until_ready()
            if abort_event is not None and abort_event.is_set():
                return None
            if progress_cb is not None:
                progress_cb(plan.num_steps, plan.num_steps)
            return x

        bucket = ("step", T, h, w)
        if bucket not in self._jitted:  # stepwise debug/fallback path

            def run_step(params, x, per_step, cond, key, _T=T):
                return euler_edm_step(
                    partial(self.network_with_params, params),
                    x,
                    per_step,
                    cond,
                    key,
                    num_frames=_T,
                )

            self._jitted[bucket] = self._maybe_shard(
                run_step, T, has_per_step=True
            )
        _step_inner = self._jitted[bucket]
        step_fn = lambda x, per_step, cond, key: _step_inner(  # noqa: E731
            self.params, x, per_step, cond, key
        )
        pa = plan_to_device(plan)
        x = noise * pa["init_scale"]
        for i in range(plan.num_steps):  # stepwise debug/fallback loop
            per_step = tuple(
                pa[k][i]
                for k in (
                    "sigma_hat_raw",
                    "sigma_hat_quant",
                    "t_indices",
                    "sigma_next",
                    "noise_coeff",
                )
            )
            key, sub = jax.random.split(key)
            x = step_fn(x, per_step, cond, sub)
            if progress_cb is not None:
                progress_cb(i + 1, plan.num_steps)
            if abort_event is not None and abort_event.is_set():
                return None
        return x

    def _jit_keyed(self, fn, T: int, n_extra_scalars: int = 0):
        """jit `fn(params, plan_arrays, cond, base_key, pass_chunk, ...)`
        with view shardings when the mesh applies to this T (the keyed
        twin of `_maybe_shard`; noise is derived inside the program)."""
        if self.mesh is None:
            return jax.jit(fn)
        n_view = self.mesh.shape.get("view", 1)
        if T % n_view != 0:
            if T not in self._warned_unsharded:
                self._warned_unsharded.add(T)
                print(
                    f"[sampler] WARNING: T={T} does not divide the mesh view "
                    f"axis ({n_view}); this shape bucket runs UNSHARDED on "
                    f"one device"
                )
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        vs = lambda rank: NamedSharding(  # noqa: E731
            mesh, P("view", *([None] * (rank - 1)))
        )
        scalar = NamedSharding(mesh, P())
        if mesh.shape.get("model", 1) > 1:
            from stable_virtual_camera_tpu.parallel.param_sharding import (
                tree_shardings,
            )

            params_sh = tree_shardings(self.params, mesh, "model")
        else:
            params_sh = jax.tree_util.tree_map(lambda _: scalar, self.params)
        cond_sh = ChunkConditioning(
            crossattn=vs(3), concat=vs(4), dense=vs(4), replace=vs(4), scale=vs(1)
        )
        plan_sh = {
            k: scalar
            for k in (
                "sigma_hat_raw", "sigma_hat_quant", "t_indices",
                "sigma_next", "noise_coeff", "init_scale",
            )
        }
        in_sh = (params_sh, plan_sh, cond_sh, scalar, scalar) + (
            (scalar,) * n_extra_scalars
        )
        return jax.jit(fn, in_shardings=in_sh, out_shardings=vs(4))

    def sample_from_key(
        self,
        shape: tuple[int, int, int, int],
        plan: SamplingPlan,
        cond: ChunkConditioning,
        base_key: jax.Array,
        pass_chunk,
        progress_cb=None,
        abort_event=None,
        post=None,
    ) -> jnp.ndarray | None:
        """`sample`, but with EVERY per-chunk PRNG op inside the jitted
        program: chunk key = fold_in(fold_in(base_key, pass_id), chunk_id),
        the init/loop split and the initial normal noise are traced — the
        exact op sequence the eager path runs (threefry is deterministic;
        the derived noise/keys are bitwise equal), so results match the
        eager path up to compile-variation ulps (the same pattern
        `sample_many` uses). On dispatch-expensive backends (the axon
        relay charges ~0.5-1 s per eager device op) this deletes four eager
        dispatches per chunk; `pass_chunk` is a (2,) int32 host array
        [pass_id, chunk_id], traced (not static), so one compiled program
        serves every chunk of a pass.

        An AOT artifact pinned for this bucket is composed INSIDE the keyed
        program (`Exported.call` is traceable): the serialized scan still
        runs bit-identically, wrapped by the traced key/noise derivation.

        `post=(name, fn, params)` traces a postprocess (e.g. the VAE's
        uint8 decode, VaeApplier.fused_decode_uint8) into the SAME program:
        one dispatch per chunk instead of scan-then-decode. Single-device
        buckets only (the view-sharded programs keep the separate decode);
        `fn(params, x)` must be traceable and `params` flows as a jit
        argument."""
        T, h, w, C = shape
        self.ensure_quant_calibrated(shape, plan, cond)
        plan_host = plan_as_host(plan)
        pass_chunk = np.asarray(pass_chunk, np.int32)
        sharded_T = (
            self.mesh is not None and T % self.mesh.shape.get("view", 1) == 0
        )
        if post is not None and sharded_T:
            post = None  # sharded buckets keep the separate decode program

        def _derive(pkey, pc):
            key = jax.random.fold_in(jax.random.fold_in(pkey, pc[0]), pc[1])
            key_init, key_loop = jax.random.split(key)
            noise = jax.random.normal(key_init, (T, h, w, C), jnp.float32)
            return noise, key_loop

        def _scan_keyed():
            bucket = (
                "scank" if post is None else f"scank+{post[0]}",
                T, h, w, plan.num_steps,
            )
            if bucket not in self._jitted:
                scan_bucket = ("scan", T, h, w, plan.num_steps)
                inner = (
                    self.artifacts[scan_bucket].call
                    if scan_bucket in self.artifacts
                    else self.make_scan_fn(T)
                )

                if post is None:

                    def run(params, plan_arrays, cond, pkey, pc):
                        noise, key_loop = _derive(pkey, pc)
                        return inner(params, noise, plan_arrays, cond, key_loop)

                    self._jitted[bucket] = self._jit_keyed(run, T)
                else:
                    post_fn = post[1]

                    def run_post(params, plan_arrays, cond, pkey, pc, pparams):
                        noise, key_loop = _derive(pkey, pc)
                        x = inner(params, noise, plan_arrays, cond, key_loop)
                        return post_fn(pparams, x)

                    self._jitted[bucket] = jax.jit(run_post)
            if post is None:
                return self._jitted[bucket](
                    self.params, plan_host, cond, base_key, pass_chunk
                )
            return self._jitted[bucket](
                self.params, plan_host, cond, base_key, pass_chunk, post[2]
            )

        if progress_cb is None and abort_event is None:
            return _scan_keyed()

        stepwise = os.environ.get("SVC_STEPWISE_SAMPLER", "0") == "1"
        sharded = self.mesh is not None and T % self.mesh.shape.get("view", 1) == 0
        pinned = ("scan", T, h, w, plan.num_steps) in self.artifacts
        use_in_scan = (
            not stepwise and not sharded and not pinned and io_callback_supported()
        )
        if use_in_scan:
            bucket = (
                "scank-tracked" if post is None else f"scank-tracked+{post[0]}",
                T, h, w, plan.num_steps,
            )
            if bucket not in self._jitted:
                post_fn = None if post is None else post[1]

                def run_tracked(
                    params, plan_arrays, cond, pkey, pc, handle, *pp, _T=T
                ):
                    noise, key_loop = _derive(pkey, pc)
                    x = euler_edm_sample(
                        self._bound_network(params, cond, _T),
                        noise,
                        plan_arrays,
                        cond,
                        key_loop,
                        num_frames=_T,
                        tick_handle=handle,
                    )
                    return x if post_fn is None else post_fn(pp[0], x)

                self._jitted[bucket] = (
                    self._jit_keyed(run_tracked, T, n_extra_scalars=1)
                    if post is None
                    else jax.jit(run_tracked)
                )
            handle = register_tick(progress_cb, abort_event)
            try:
                extra = () if post is None else (post[2],)
                x = self._jitted[bucket](
                    self.params, plan_host, cond, base_key, pass_chunk,
                    jnp.int32(handle), *extra,
                )
                x.block_until_ready()
            finally:
                unregister_tick(handle)
            if abort_event is not None and abort_event.is_set():
                return None
            return x

        if not stepwise:
            # coarse-progress fallback: single dispatch, chunk-granular ticks
            if abort_event is not None and abort_event.is_set():
                return None
            x = _scan_keyed()
            x.block_until_ready()
            if abort_event is not None and abort_event.is_set():
                return None
            if progress_cb is not None:
                progress_cb(plan.num_steps, plan.num_steps)
            return x

        # stepwise debug path: derive eagerly and reuse the noise-arg loop
        key = jax.random.fold_in(
            jax.random.fold_in(base_key, int(pass_chunk[0])), int(pass_chunk[1])
        )
        key_init, key_loop = jax.random.split(key)
        noise = jax.random.normal(key_init, (T, h, w, C), jnp.float32)
        x = self.sample(
            noise, plan, cond, key_loop,
            progress_cb=progress_cb, abort_event=abort_event,
        )
        if x is None or post is None:
            return x
        return post[1](post[2], x)  # eager post keeps the output contract

    def many_fn(self, N: int, latent_shape, num_steps: int, keys_ndim: int = 2):
        """The jitted N-chunk program for one (N, T, h, w, steps) bucket —
        `run(params, plan_arrays, conds, keys) -> (N, T, h, w, C)` — built
        with 'data'-axis shardings when the mesh applies. Exposed separately
        from `sample_many` so evidence tooling can AOT-lower/compile the
        EXACT serving program with abstract arguments
        (benchmark/fullscale_compile.py)."""
        T, h, w, C = latent_shape
        bucket = ("dp", N, T, h, w, num_steps)
        if bucket not in self._jitted:

            def run(params, plan_arrays, conds, keys, _T=T):
                def one(c, k):
                    k_init, k_loop = jax.random.split(k)
                    noise = jax.random.normal(k_init, (_T, h, w, C), jnp.float32)
                    # FiLM precompute vmaps per chunk; 'data' sharding keeps
                    # each chunk whole on its device group, so the broadcast
                    # apply stays local.
                    return euler_edm_sample(
                        self._bound_network(params, c, _T),
                        noise, plan_arrays, c, k_loop, num_frames=_T,
                    )

                return jax.vmap(one)(conds, keys)

            mesh = self.mesh
            n_data = mesh.shape.get("data", 1) if mesh is not None else 1
            if n_data > 1 and N % n_data == 0:
                from jax.sharding import NamedSharding, PartitionSpec as P

                ds = lambda rank: NamedSharding(  # noqa: E731
                    mesh, P("data", *([None] * (rank - 1)))
                )
                scalar = NamedSharding(mesh, P())
                params_sh = jax.tree_util.tree_map(lambda _: scalar, self.params)
                cond_sh = ChunkConditioning(
                    crossattn=ds(4), concat=ds(5), dense=ds(5), replace=ds(5),
                    scale=ds(2),
                )
                plan_sh = {
                    k: scalar
                    for k in (
                        "sigma_hat_raw", "sigma_hat_quant", "t_indices",
                        "sigma_next", "noise_coeff", "init_scale",
                    )
                }
                self._jitted[bucket] = jax.jit(
                    run,
                    in_shardings=(params_sh, plan_sh, cond_sh, ds(keys_ndim)),
                    out_shardings=ds(5),
                )
            else:
                self._jitted[bucket] = jax.jit(run)
        return self._jitted[bucket]

    def sample_many(self, keys, plan, conds, latent_shape):
        """Denoise N independent chunks in ONE program, vmapped over the
        chunk axis and — when the mesh has a 'data' axis that divides N —
        sharded over it, so each device group denoises different chunks
        concurrently (the engine-level data-parallel fan-out; the reference's
        only scaling story is the sequential chunk loop,
        seva/eval.py:1862-1956).

        keys: (N, ...) stacked PRNG keys, one per chunk (the same key the
        serial path would receive — noise + loop keys split identically
        inside, so data-parallel == serial bit-for-bit).
        conds: ChunkConditioning with a leading N axis on every leaf.
        Returns (N, T, h, w, C) denoised latents (device array)."""
        N = keys.shape[0]
        from stable_virtual_camera_tpu.ops.quant import static_enabled

        if static_enabled():
            self.ensure_quant_calibrated(
                latent_shape, plan,
                jax.tree_util.tree_map(lambda a: a[0], conds),
            )
        fn = self.many_fn(N, latent_shape, plan.num_steps, keys_ndim=keys.ndim)
        return fn(self.params, plan_to_device(plan), conds, keys)


jax.tree_util.register_pytree_node(
    ChunkConditioning,
    lambda c: ((c.crossattn, c.concat, c.dense, c.replace, c.scale), None),
    lambda _, xs: ChunkConditioning(*xs),
)

# jax.export serializes the argument treedef into the AOT artifact
# (models/export.py); custom nodes need an explicit named serializer or
# Exported.serialize() refuses the signature. auxdata is always None here.
from jax import export as _jax_export  # noqa: E402

_jax_export.register_pytree_node_serialization(
    ChunkConditioning,
    serialized_name="stable_virtual_camera_tpu.ChunkConditioning",
    serialize_auxdata=lambda aux: b"",
    deserialize_auxdata=lambda b: None,
)
