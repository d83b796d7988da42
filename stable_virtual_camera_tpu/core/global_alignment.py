"""TPU-native global alignment of pairwise stereo pointmaps.

Replaces the torch ``PointCloudOptimizer`` stage of the reference's DUSt3R
preprocessing (reference seva/modules/preprocessor.py:78-101 runs
``dust3r.cloud_opt.global_aligner`` — 500 Adam steps on the GPU): given
per-edge pointmap/confidence predictions from a pairwise stereo network,
recover per-image intrinsics, c2w poses and globally consistent per-pixel 3D
points. Here the optimization is ONE jitted ``optax.adam`` loop
(``lax.scan`` over steps) so it runs on the device with the rest of the
stack; only the stereo network itself still needs the external package.

Formulation (the published energy, re-derived — not a port):

  variables   q_i, t_i   c2w rotation (quaternion) / translation, image 0
                         pinned to the identity (gauge)
              logd_i     per-pixel log-depth
              logf       log-focal (scalar when ``same_focals``)
              logs_e     per-edge log-scale, mean pinned to 0 (gauge)

  loss        sum_e sum_{v in {1,2}}  conf^e_v *
                 || chi_{img(e,v)} - P_{e.i} @ (exp(logs_e) * X^e_v) ||_2

  chi_i(u,v)  = P_i @ ( d_i(u,v) * K_i^{-1} [u + .5 - W/2, v + .5 - H/2, 1] )

Initialization is host-side numpy: focal by weighted least squares on the
pinhole projection identity, per-image depth from the z-channel of each
image's own best prediction, poses by chaining weighted-Umeyama similarity
fits along a maximum-confidence spanning tree, and per-edge scales by a
closed-form least-squares fit of each prediction to the initialized points.
"""

from __future__ import annotations

import dataclasses

import numpy as np


# ---------------------------------------------------------------------------
# Host-side building blocks (numpy)
# ---------------------------------------------------------------------------


def weighted_umeyama(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray
) -> tuple[float, np.ndarray, np.ndarray]:
    """Weighted similarity fit: (s, R, t) minimizing sum w ||dst - (s R src + t)||^2.

    src, dst: (M, 3); w: (M,) non-negative.
    """
    w = np.asarray(w, np.float64)
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    wsum = w.sum()
    assert wsum > 0, "umeyama needs positive total weight"
    mu_s = (w[:, None] * src).sum(0) / wsum
    mu_d = (w[:, None] * dst).sum(0) / wsum
    cs, cd = src - mu_s, dst - mu_d
    cov = (w[:, None] * cd).T @ cs / wsum  # (3,3)
    U, D, Vt = np.linalg.svd(cov)
    sgn = np.sign(np.linalg.det(U @ Vt))
    S = np.diag([1.0, 1.0, sgn])
    R = U @ S @ Vt
    var_s = (w * (cs**2).sum(-1)).sum() / wsum
    s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    t = mu_d - s * R @ mu_s
    return s, R, t


def estimate_focal(
    pts: np.ndarray, conf: np.ndarray, wh: tuple[float, float] | None = None
) -> float:
    """Weighted LSQ focal from a self-view pointmap (centered principal point).

    Pinhole identity per pixel: (u + .5 - W/2) = f * x / z (same for v/y);
    one scalar f minimizes the stacked weighted system. `wh` is the image's
    REAL (width, height) when the map is padded (padding must carry conf 0);
    the principal point sits at the real center.
    """
    H, W = pts.shape[:2]
    w_real, h_real = wh if wh is not None else (W, H)
    uu, vv = np.meshgrid(
        np.arange(W, dtype=np.float64) + 0.5 - w_real / 2,
        np.arange(H, dtype=np.float64) + 0.5 - h_real / 2,
    )
    z = pts[..., 2]
    valid = z > 1e-6
    w = np.where(valid, conf, 0.0).ravel()
    xz = np.where(valid, pts[..., 0] / np.maximum(z, 1e-6), 0.0).ravel()
    yz = np.where(valid, pts[..., 1] / np.maximum(z, 1e-6), 0.0).ravel()
    num = (w * (uu.ravel() * xz + vv.ravel() * yz)).sum()
    den = (w * (xz**2 + yz**2)).sum()
    if den <= 1e-9 or num <= 0:
        return float(max(H, W))  # degenerate: default-FOV-ish fallback
    return float(num / den)


def _max_spanning_tree(n: int, edges: list[tuple[int, int]], weight: np.ndarray):
    """Prim's maximum spanning tree; returns list of edge indices, rooted at
    the endpoint of the heaviest edge. Asserts connectivity."""
    best = int(np.argmax(weight))
    root = edges[best][0]
    in_tree = {root}
    tree: list[int] = []
    while len(in_tree) < n:
        cand, cand_w = -1, -np.inf
        for eidx, (i, j) in enumerate(edges):
            if (i in in_tree) != (j in in_tree) and weight[eidx] > cand_w:
                cand, cand_w = eidx, weight[eidx]
        if cand < 0:  # data-dependent: must survive python -O
            raise ValueError("pair graph is disconnected")
        i, j = edges[cand]
        in_tree.add(j if i in in_tree else i)
        tree.append(cand)
    return root, tree


def _quat_from_rot(R: np.ndarray) -> np.ndarray:
    """(w, x, y, z) from a rotation matrix (Shepperd's method)."""
    m = R
    tr = np.trace(m)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = [0.25 * s, (m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
             (m[1, 0] - m[0, 1]) / s]
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        q = [(m[2, 1] - m[1, 2]) / s, 0.25 * s, (m[0, 1] + m[1, 0]) / s,
             (m[0, 2] + m[2, 0]) / s]
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        q = [(m[0, 2] - m[2, 0]) / s, (m[0, 1] + m[1, 0]) / s, 0.25 * s,
             (m[1, 2] + m[2, 1]) / s]
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        q = [(m[1, 0] - m[0, 1]) / s, (m[0, 2] + m[2, 0]) / s,
             (m[1, 2] + m[2, 1]) / s, 0.25 * s]
    q = np.asarray(q, np.float64)
    return q / np.linalg.norm(q)


# ---------------------------------------------------------------------------
# Inputs / outputs
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class EdgePreds:
    """Stacked pairwise predictions. For edge e = (i, j), BOTH pointmaps live
    in image i's camera frame (the stereo net's view-1 frame):
    pts1[e] are image i's pixels, pts2[e] are image j's pixels.

    Mixed-resolution image sets (dust3r resizes each image to its own
    aspect-dependent shape) are supported by padding every map to a common
    (H, W) at the bottom/right with confidence 0 and recording each image's
    real size in `img_whs` — padded pixels carry zero loss weight and the
    principal point sits at the real center."""

    i_idx: np.ndarray  # (E,) int
    j_idx: np.ndarray  # (E,) int
    pts1: np.ndarray  # (E, H, W, 3) float32
    conf1: np.ndarray  # (E, H, W) float32, >= 0 (0 on padding)
    pts2: np.ndarray  # (E, H, W, 3)
    conf2: np.ndarray  # (E, H, W)
    img_whs: np.ndarray | None = None  # (N, 2) real (w, h) per image

    @property
    def num_images(self) -> int:
        return int(max(self.i_idx.max(), self.j_idx.max())) + 1

    def whs(self) -> np.ndarray:
        """(N, 2) real (w, h) per image; defaults to the map size."""
        if self.img_whs is not None:
            return np.asarray(self.img_whs, np.float64)
        _, H, W = self.conf1.shape
        return np.tile(np.array([W, H], np.float64), (self.num_images, 1))


@dataclasses.dataclass
class AlignedScene:
    """Same capability surface as dust3r's aligned scene object
    (reference preprocessor.py:95-101 consumes exactly these)."""

    Ks: np.ndarray  # (N, 3, 3) at the working resolution
    c2ws: np.ndarray  # (N, 4, 4)
    pts3d: np.ndarray  # (N, H, W, 3) world-frame points
    conf: np.ndarray  # (N, H, W) aggregated per-pixel confidence
    final_loss: float

    def masks(self, min_conf_thr: float) -> list[np.ndarray]:
        return [c > min_conf_thr for c in self.conf]


# ---------------------------------------------------------------------------
# Initialization (host)
# ---------------------------------------------------------------------------


def _scale_of(pts: np.ndarray, conf: np.ndarray) -> float:
    w = conf.ravel()
    n = np.linalg.norm(pts.reshape(-1, 3), axis=-1)
    return float((w * n).sum() / max(w.sum(), 1e-9))


def _initialize(edges: EdgePreds, same_focals: bool):
    N = edges.num_images
    E, H, W = edges.conf1.shape
    whs = edges.whs()  # (N, 2) real (w, h)

    # each image's own-frame pointmap: its highest-confidence view-1 edge
    mean_c1 = edges.conf1.reshape(E, -1).mean(-1)
    self_edge = np.full(N, -1)
    self_conf = np.full(N, -np.inf)
    for e in range(E):
        i = int(edges.i_idx[e])
        if mean_c1[e] > self_conf[i]:
            self_edge[i], self_conf[i] = e, mean_c1[e]
    if not (self_edge >= 0).all():  # data-dependent: must survive python -O
        raise ValueError(
            "every image must appear as view 1 of some edge (use a "
            "symmetrized pair graph)"
        )
    self_pts = edges.pts1[self_edge]  # (N, H, W, 3), per-image self scale
    self_cw = edges.conf1[self_edge]

    # focal(s) from self predictions
    focals = np.array(
        [estimate_focal(self_pts[i], self_cw[i], wh=tuple(whs[i]))
         for i in range(N)]
    )
    if same_focals:
        wts = np.maximum(self_conf, 1e-3)
        focals[:] = float((focals * wts).sum() / wts.sum())

    # one undirected edge per image pair (best direction by view-1 conf)
    und: dict[tuple[int, int], int] = {}
    for e in range(E):
        i, j = int(edges.i_idx[e]), int(edges.j_idx[e])
        key = (min(i, j), max(i, j))
        if key not in und or mean_c1[e] > mean_c1[und[key]]:
            und[key] = e
    pair_keys = list(und.keys())
    root, tree_pos = _max_spanning_tree(
        N, pair_keys, mean_c1[np.array([und[k] for k in pair_keys])]
    )
    tree_eidx = [und[pair_keys[p]] for p in tree_pos]

    # chain similarities outward from the root over the tree edges.
    # Per-image state: world = R_init (alpha * p_self) + t_init, where p_self
    # are frame-local points at that image's self scale and alpha is the
    # image's depth-scale multiplier relative to the root.
    R_init = np.tile(np.eye(3), (N, 1, 1))
    t_init = np.zeros((N, 3))
    alpha = np.ones(N)
    placed = {root}
    remaining = list(tree_eidx)
    while remaining:
        progress = False
        for e in list(remaining):
            i, j = int(edges.i_idx[e]), int(edges.j_idx[e])
            if (i in placed) == (j in placed):
                continue
            remaining.remove(e)
            progress = True
            # r converts edge-e scale -> image i's self scale (pts1[e] and
            # self_pts[i] are the same pixels in the same frame)
            r = _scale_of(edges.pts1[e], edges.conf1[e]) / max(
                _scale_of(self_pts[i], self_cw[i]), 1e-9
            )
            if i in placed:
                k, m = i, j
                # fit m's self points -> m's pixels in frame k (pts2, edge
                # scale), then rescale the result into k's self scale
                s, R, t = weighted_umeyama(
                    self_pts[m].reshape(-1, 3),
                    edges.pts2[e].reshape(-1, 3),
                    (self_cw[m] * edges.conf2[e]).ravel(),
                )
                s_km, R_km, t_km = s / r, R, t / r
            else:
                k, m = j, i
                # fit k's self points -> k's pixels in frame m (pts2, edge
                # scale). Frame m's self scale differs from edge scale by r
                # (both express image m's frame). Then invert the similarity.
                s, R, t = weighted_umeyama(
                    self_pts[k].reshape(-1, 3),
                    edges.pts2[e].reshape(-1, 3),
                    (self_cw[k] * edges.conf2[e]).ravel(),
                )
                s_mk, t_mk = s / r, t / r  # frame_m@self_m <- frame_k@self_k
                s_km = 1.0 / max(s_mk, 1e-9)
                R_km = R.T
                t_km = -s_km * (R.T @ t_mk)
            R_init[m] = R_init[k] @ R_km
            t_init[m] = R_init[k] @ (alpha[k] * t_km) + t_init[k]
            alpha[m] = alpha[k] * s_km
            placed.add(m)
        assert progress, "tree chaining stalled (disconnected tree?)"
    assert len(placed) == N, "tree chaining failed to place every image"

    depth_init = np.maximum(self_pts[..., 2], 1e-4) * alpha[:, None, None]

    # closed-form per-edge scale against the initialized global points
    chi = _backproject_np(depth_init, focals, R_init, t_init, H, W, whs / 2)
    logs = np.zeros(E)
    for e in range(E):
        i = int(edges.i_idx[e])
        Ri, ti = R_init[i], t_init[i]
        num = den = 0.0
        for pts, cw, tgt in (
            (edges.pts1[e], edges.conf1[e], chi[int(edges.i_idx[e])]),
            (edges.pts2[e], edges.conf2[e], chi[int(edges.j_idx[e])]),
        ):
            rp = pts.reshape(-1, 3) @ Ri.T
            d = tgt.reshape(-1, 3) - ti
            w = cw.ravel()
            num += (w * (d * rp).sum(-1)).sum()
            den += (w * (rp * rp).sum(-1)).sum()
        logs[e] = np.log(max(num / max(den, 1e-9), 1e-3))

    quats = np.stack([_quat_from_rot(R_init[i]) for i in range(N)])
    return quats, t_init, np.log(depth_init), np.log(focals), logs


def _backproject_np(depth, focals, R, t, H, W, pps):
    """pps: (N, 2) per-image principal points (cx, cy) in pixels."""
    uu, vv = np.meshgrid(
        np.arange(W, dtype=np.float64) + 0.5,
        np.arange(H, dtype=np.float64) + 0.5,
    )
    dirs = np.stack(
        [
            (uu[None] - pps[:, 0, None, None]) / focals[:, None, None],
            (vv[None] - pps[:, 1, None, None]) / focals[:, None, None],
            np.ones((1, H, W)).repeat(len(focals), 0),
        ],
        axis=-1,
    )  # (N, H, W, 3)
    cam = depth[..., None] * dirs
    return np.einsum("nab,nhwb->nhwa", R, cam) + t[:, None, None, :]


# ---------------------------------------------------------------------------
# Device-side refinement (jax)
# ---------------------------------------------------------------------------


def _quat_to_rot(q):
    import jax.numpy as jnp

    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y**2 + z**2), 2 * (x * y - w * z),
                       2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x**2 + z**2),
                       2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                       1 - 2 * (x**2 + y**2)], -1),
        ],
        -2,
    )


def _unpack(p, data):
    import jax.numpy as jnp

    q = jnp.concatenate([data["q0"], p["quat"]], 0)
    t = jnp.concatenate([data["t0"], p["trans"]], 0)
    R = _quat_to_rot(q)
    f = jnp.exp(p["logf"])
    f = jnp.broadcast_to(f, (q.shape[0],))
    depth = jnp.exp(p["logd"])
    scales = jnp.exp(p["logs"] - p["logs"].mean())
    return R, t, f, depth, scales


def _loss_fn(p, data):
    import jax.numpy as jnp

    R, t, f, depth, scales = _unpack(p, data)
    xy = (data["uv"][None] - data["pp"][:, None, None, :]) / f[:, None, None, None]
    dirs = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], -1)
    cam = depth[..., None] * dirs
    chi = jnp.einsum("nab,nhwb->nhwa", R, cam) + t[:, None, None, :]
    Ri, ti = R[data["i"]], t[data["i"]]
    sc = scales[:, None, None, None]
    w1 = jnp.einsum("eab,ehwb->ehwa", Ri, sc * data["pts1"]) + ti[:, None, None, :]
    w2 = jnp.einsum("eab,ehwb->ehwa", Ri, sc * data["pts2"]) + ti[:, None, None, :]
    d1 = jnp.sqrt(((chi[data["i"]] - w1) ** 2).sum(-1) + 1e-12)
    d2 = jnp.sqrt(((chi[data["j"]] - w2) ** 2).sum(-1) + 1e-12)
    return ((data["c1"] * d1).sum() + (data["c2"] * d2).sum()) / data["conf_total"]


_REFINER_CACHE: dict = {}


def _get_refiner(niter: int, lr: float, schedule: str):
    """One jitted Adam/scan program per (niter, lr, schedule); shapes
    re-specialize inside jax.jit's own cache, so repeated preprocessing
    calls (a GUI session) skip re-tracing."""
    key = (niter, lr, schedule)
    if key in _REFINER_CACHE:
        return _REFINER_CACHE[key]
    import jax
    import optax

    if schedule == "cosine":
        sched = optax.cosine_decay_schedule(lr, max(niter, 1))
    elif schedule == "linear":
        sched = optax.linear_schedule(lr, 0.0, max(niter, 1))
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    opt = optax.adam(sched)

    @jax.jit
    def run(p, data):
        state = opt.init(p)

        def step(carry, _):
            p, state = carry
            loss, grads = jax.value_and_grad(_loss_fn)(p, data)
            updates, state = opt.update(grads, state, p)
            return (optax.apply_updates(p, updates), state), loss

        (p, _), losses = jax.lax.scan(step, (p, state), None, length=niter)
        return p, losses[-1]

    _REFINER_CACHE[key] = run
    return run


def global_align(
    edges: EdgePreds,
    niter: int = 300,
    lr: float = 0.01,
    schedule: str = "cosine",
    same_focals: bool = True,
    mesh=None,
) -> AlignedScene:
    """Initialize on host, refine with one jitted Adam loop on device.

    With `mesh` (a jax.sharding.Mesh with a "data" axis), the per-edge
    residual work — the bulk of the FLOPs, N*(N-1) edges of H*W*3 points
    each — shards over that axis; parameters stay replicated and GSPMD
    inserts the gradient all-reduces, so complete-graph scenes with many
    images scale across chips."""
    import jax
    import jax.numpy as jnp
    import optax

    N = edges.num_images
    E, H, W = edges.conf1.shape
    quats0, trans0, logd0, logf0, logs0 = _initialize(edges, same_focals)
    if same_focals:
        logf0 = logf0[:1]

    # express the init in the loss's gauge (mean(logs) pinned to 0): shifting
    # every log-scale by -mu is a global rescale of the scene, so depths and
    # translations shift with it — otherwise the optimizer starts at a large
    # inconsistency and "fixes" it by warping the geometry
    mu = float(logs0.mean())
    logs0 = logs0 - mu
    logd0 = logd0 - mu
    trans0 = trans0 * np.exp(-mu)

    # pin image 0's pose (gauge); optimize the rest
    params = {
        "quat": jnp.asarray(quats0[1:], jnp.float32),
        "trans": jnp.asarray(trans0[1:], jnp.float32),
        "logd": jnp.asarray(logd0, jnp.float32),
        "logf": jnp.asarray(logf0, jnp.float32),
        "logs": jnp.asarray(logs0, jnp.float32),
    }
    whs = edges.whs()
    data = {
        "i": jnp.asarray(edges.i_idx, jnp.int32),
        "j": jnp.asarray(edges.j_idx, jnp.int32),
        "pts1": jnp.asarray(edges.pts1, jnp.float32),
        "c1": jnp.asarray(edges.conf1, jnp.float32),
        "pts2": jnp.asarray(edges.pts2, jnp.float32),
        "c2": jnp.asarray(edges.conf2, jnp.float32),
        "q0": jnp.asarray(quats0[:1], jnp.float32),
        "t0": jnp.asarray(trans0[:1], jnp.float32),
        "pp": jnp.asarray(whs / 2, jnp.float32),  # (N, 2) principal points
        "conf_total": jnp.float32(edges.conf1.sum() + edges.conf2.sum()),
    }
    uu, vv = np.meshgrid(
        np.arange(W, dtype=np.float32) + 0.5,
        np.arange(H, dtype=np.float32) + 0.5,
    )
    data["uv"] = jnp.asarray(np.stack([uu, vv], -1))  # (H, W, 2) raw pixels

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        edge_sh = lambda rank: NamedSharding(  # noqa: E731
            mesh, P("data", *([None] * (rank - 1)))
        )
        for k in ("i", "j", "pts1", "c1", "pts2", "c2"):
            data[k] = jax.device_put(data[k], edge_sh(data[k].ndim))
        repl = NamedSharding(mesh, P())
        for k in ("q0", "t0", "pp", "uv", "conf_total"):
            data[k] = jax.device_put(data[k], repl)
        params = jax.device_put(params, repl)

    assert niter >= 1
    run = _get_refiner(niter, lr, schedule)
    p_final, final_loss = run(params, data)

    R, t, f, depth, _ = (np.asarray(x) for x in _unpack(p_final, data))
    chi = _backproject_np(depth.astype(np.float64), f.astype(np.float64),
                          R.astype(np.float64), t.astype(np.float64), H, W,
                          whs / 2)

    Ks = np.zeros((N, 3, 3))
    Ks[:, 0, 0] = f
    Ks[:, 1, 1] = f
    Ks[:, 0, 2] = whs[:, 0] / 2
    Ks[:, 1, 2] = whs[:, 1] / 2
    Ks[:, 2, 2] = 1.0
    c2ws = np.tile(np.eye(4), (N, 1, 1))
    c2ws[:, :3, :3] = R
    c2ws[:, :3, 3] = t

    # per-pixel confidence: max over this image's view-1 edges, matching the
    # role of dust3r's per-image confidence maps in mask construction
    conf = np.zeros((N, H, W), np.float32)
    for e in range(len(edges.i_idx)):
        i = int(edges.i_idx[e])
        conf[i] = np.maximum(conf[i], edges.conf1[e])
        j = int(edges.j_idx[e])
        conf[j] = np.maximum(conf[j], edges.conf2[e])

    return AlignedScene(
        Ks=Ks.astype(np.float32),
        c2ws=c2ws.astype(np.float32),
        pts3d=chi.astype(np.float32),
        conf=conf,
        final_loss=float(final_loss),
    )


def edges_from_dust3r_output(output) -> EdgePreds:
    """Adapt a dust3r ``inference`` result dict (torch tensors) to EdgePreds.

    Expects the standard keys: view1/view2 ``idx``, pred1 ``pts3d``/``conf``,
    pred2 ``pts3d_in_other_view``/``conf`` (reference preprocessor.py:70-77
    feeds exactly this dict to the torch global aligner). Predictions may be
    one stacked (E, H, W, ...) tensor (uniform image sizes) or a per-edge
    list with mixed sizes (dust3r resizes each image to its own
    aspect-dependent shape): mixed sizes are padded bottom/right to the max
    extent with confidence 0 and each image's real (w, h) is recorded."""

    def npy(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    i_idx = np.asarray(output["view1"]["idx"], np.int64)
    j_idx = np.asarray(output["view2"]["idx"], np.int64)

    p1_raw = output["pred1"]["pts3d"]
    c1_raw = output["pred1"]["conf"]
    p2_raw = output["pred2"]["pts3d_in_other_view"]
    c2_raw = output["pred2"]["conf"]

    if not isinstance(p1_raw, (list, tuple)):
        return EdgePreds(
            i_idx=i_idx,
            j_idx=j_idx,
            pts1=npy(p1_raw).astype(np.float32),
            conf1=npy(c1_raw).astype(np.float32),
            pts2=npy(p2_raw).astype(np.float32),
            conf2=npy(c2_raw).astype(np.float32),
        )

    # ragged: per-edge maps sized to each image's own resolution
    p1s = [npy(x).astype(np.float32) for x in p1_raw]
    c1s = [npy(x).astype(np.float32) for x in c1_raw]
    p2s = [npy(x).astype(np.float32) for x in p2_raw]
    c2s = [npy(x).astype(np.float32) for x in c2_raw]
    E = len(p1s)
    H = max(max(p.shape[0] for p in p1s), max(p.shape[0] for p in p2s))
    W = max(max(p.shape[1] for p in p1s), max(p.shape[1] for p in p2s))

    N = int(max(i_idx.max(), j_idx.max())) + 1
    img_whs = np.zeros((N, 2))
    for e in range(E):
        img_whs[int(i_idx[e])] = (p1s[e].shape[1], p1s[e].shape[0])
        img_whs[int(j_idx[e])] = (p2s[e].shape[1], p2s[e].shape[0])

    def pad_pts(maps):
        out = np.zeros((E, H, W, 3), np.float32)
        for e, m in enumerate(maps):
            out[e, : m.shape[0], : m.shape[1]] = m
        return out

    def pad_conf(maps):
        out = np.zeros((E, H, W), np.float32)
        for e, m in enumerate(maps):
            out[e, : m.shape[0], : m.shape[1]] = m
        return out

    return EdgePreds(
        i_idx=i_idx,
        j_idx=j_idx,
        pts1=pad_pts(p1s),
        conf1=pad_conf(c1s),
        pts2=pad_pts(p2s),
        conf2=pad_conf(c2s),
        img_whs=img_whs,
    )
