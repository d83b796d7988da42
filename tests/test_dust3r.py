"""Native DUSt3R stereo network: architecture, converter, pipeline.

The released torch checkpoint is unreachable offline, so parity is
established structurally and against a TORCH MIRROR of the same architecture
built from torch's own nn.Conv2d/ConvTranspose2d/Linear/LayerNorm with the
checkpoint's parameter names (tests the converter's layout mapping — conv
kernel orientation, ConvTranspose semantics, qkv packing — with torch as the
ground truth for every primitive). The attention/RoPE math itself is
transcribed identically on both sides, so the mirror pins implementation
consistency, not the released network's exact behavior; that final check
needs the real weights (documented in models/convert_dust3r.py).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.models.convert_dust3r import (
    convert_dust3r_state_dict,
    expected_torch_keys,
)
from stable_virtual_camera_tpu.models.dust3r import (
    AsymmetricCroCoStereo,
    Dust3rSpec,
    rope_2d,
)

SPEC = Dust3rSpec.tiny()


def _synthetic_state(spec, scale=0.05, seed=0):
    rng = np.random.RandomState(seed)
    state = {}
    for k, shape in expected_torch_keys(spec).items():
        if k.endswith(".bias"):
            state[k] = rng.randn(*shape).astype(np.float32) * 0.01
        elif "norm" in k and k.endswith(".weight") and len(shape) == 1:
            state[k] = 1.0 + rng.randn(*shape).astype(np.float32) * 0.01
        else:
            state[k] = rng.randn(*shape).astype(np.float32) * scale
    return state


# ---------------------------------------------------------------------------
# RoPE


def test_rope_relative_position_invariance():
    """q·k after RoPE depends only on the RELATIVE grid offset."""
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, 1, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 1, 16).astype(np.float32))

    def score(pq, pk):
        qr = rope_2d(q, jnp.asarray([pq], jnp.int32))
        kr = rope_2d(k, jnp.asarray([pk], jnp.int32))
        return np.asarray(jnp.einsum("bhnd,bhmd->bhnm", qr, kr))

    s1 = score((2, 3), (5, 4))
    s2 = score((9, 10), (12, 11))  # same (dy, dx) = (3, 1)
    s3 = score((2, 3), (4, 5))  # different offset
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-5)
    assert not np.allclose(s1, s3, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Converter


def test_converter_total_and_shapes():
    m = AsymmetricCroCoStereo(SPEC)
    params = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 3)), jnp.zeros((1, 48, 32, 3))
    )["params"]
    conv = convert_dust3r_state_dict(_synthetic_state(SPEC), SPEC)

    flat_a = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    flat_b = {
        jax.tree_util.keystr(k): np.asarray(v).shape
        for k, v in jax.tree_util.tree_flatten_with_path(conv)[0]
    }
    assert flat_a == flat_b


# ---------------------------------------------------------------------------
# Torch mirror parity (layout ground truth)


def _torch_mirror(spec):
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    class Interp(tnn.Module):
        def forward(self, x):
            return F.interpolate(
                x, scale_factor=2, mode="bilinear", align_corners=True
            )

    def rope1d(x, pos, base):
        dh = x.shape[-1]
        inv = 1.0 / (base ** (torch.arange(0, dh, 2).float() / dh))
        ang = pos.float()[:, None] * inv[None]
        cos = torch.cat([ang.cos(), ang.cos()], -1)
        sin = torch.cat([ang.sin(), ang.sin()], -1)
        x1, x2 = x.chunk(2, -1)
        rot = torch.cat([-x2, x1], -1)
        return x * cos + rot * sin

    def rope2d(x, pos, base):
        y, xx = x.chunk(2, -1)
        return torch.cat(
            [rope1d(y, pos[:, 0], base), rope1d(xx, pos[:, 1], base)], -1
        )

    def sdpa(q, k, v):
        s = q @ k.transpose(-2, -1) * (q.shape[-1] ** -0.5)
        return torch.softmax(s, dim=-1) @ v

    def heads(x, n):
        b, l, c = x.shape
        return x.reshape(b, l, n, c // n).transpose(1, 2)

    def unheads(x):
        b, h, l, d = x.shape
        return x.transpose(1, 2).reshape(b, l, h * d)

    class Attn(tnn.Module):
        def __init__(self, dim, nheads):
            super().__init__()
            self.qkv = tnn.Linear(dim, 3 * dim)
            self.proj = tnn.Linear(dim, dim)
            self.nheads = nheads

        def forward(self, x, pos):
            q, k, v = self.qkv(x).chunk(3, -1)
            q, k, v = (heads(t, self.nheads) for t in (q, k, v))
            q = rope2d(q, pos, spec.rope_base)
            k = rope2d(k, pos, spec.rope_base)
            return self.proj(unheads(sdpa(q, k, v)))

    class CrossAttn(tnn.Module):
        def __init__(self, dim, nheads):
            super().__init__()
            self.projq = tnn.Linear(dim, dim)
            self.projk = tnn.Linear(dim, dim)
            self.projv = tnn.Linear(dim, dim)
            self.proj = tnn.Linear(dim, dim)
            self.nheads = nheads

        def forward(self, x, mem, pos_q, pos_k):
            q = heads(self.projq(x), self.nheads)
            k = heads(self.projk(mem), self.nheads)
            v = heads(self.projv(mem), self.nheads)
            q = rope2d(q, pos_q, spec.rope_base)
            k = rope2d(k, pos_k, spec.rope_base)
            return self.proj(unheads(sdpa(q, k, v)))

    class Mlp(tnn.Module):
        def __init__(self, dim, hidden):
            super().__init__()
            self.fc1 = tnn.Linear(dim, hidden)
            self.fc2 = tnn.Linear(hidden, dim)

        def forward(self, x):
            return self.fc2(F.gelu(self.fc1(x)))

    LN = lambda d: tnn.LayerNorm(d, eps=1e-6)  # noqa: E731

    class EncBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            d = spec.enc_dim
            self.norm1, self.norm2 = LN(d), LN(d)
            self.attn = Attn(d, spec.enc_heads)
            self.mlp = Mlp(d, int(d * spec.mlp_ratio))

        def forward(self, x, pos):
            x = x + self.attn(self.norm1(x), pos)
            return x + self.mlp(self.norm2(x))

    class DecBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            d = spec.dec_dim
            self.norm1, self.norm2, self.norm3, self.norm_y = (
                LN(d), LN(d), LN(d), LN(d),
            )
            self.attn = Attn(d, spec.dec_heads)
            self.cross_attn = CrossAttn(d, spec.dec_heads)
            self.mlp = Mlp(d, int(d * spec.mlp_ratio))

        def forward(self, x, mem, pos_x, pos_mem):
            x = x + self.attn(self.norm1(x), pos_x)
            x = x + self.cross_attn(self.norm2(x), self.norm_y(mem), pos_x, pos_mem)
            return x + self.mlp(self.norm3(x))

    class RCU(tnn.Module):
        def __init__(self, f):
            super().__init__()
            self.conv1 = tnn.Conv2d(f, f, 3, padding=1)
            self.conv2 = tnn.Conv2d(f, f, 3, padding=1)

        def forward(self, x):
            return x + self.conv2(F.relu(self.conv1(F.relu(x))))

    class Fusion(tnn.Module):
        def __init__(self, f, has_rcu1=True):
            super().__init__()
            if has_rcu1:
                self.resConfUnit1 = RCU(f)
            self.resConfUnit2 = RCU(f)
            self.out_conv = tnn.Conv2d(f, f, 1)
            self.up = Interp()

        def forward(self, x, skip=None):
            if skip is not None:
                x = x + self.resConfUnit1(skip)
            return self.out_conv(self.up(self.resConfUnit2(x)))

    class Scratch(tnn.Module):
        def __init__(self, ld, f):
            super().__init__()
            for i, d in enumerate(ld):
                setattr(self, f"layer{i+1}_rn", tnn.Conv2d(d, f, 3, padding=1, bias=False))
            self.refinenet1 = Fusion(f)
            self.refinenet2 = Fusion(f)
            self.refinenet3 = Fusion(f)
            self.refinenet4 = Fusion(f, has_rcu1=False)

    class Dpt(tnn.Module):
        def __init__(self):
            super().__init__()
            ld, f = spec.dpt_layer_dims, spec.dpt_feature_dim
            din = (spec.enc_dim, spec.dec_dim, spec.dec_dim, spec.dec_dim)
            self.act_1_postprocess = tnn.Sequential(
                tnn.Conv2d(din[0], ld[0], 1), tnn.ConvTranspose2d(ld[0], ld[0], 4, 4)
            )
            self.act_2_postprocess = tnn.Sequential(
                tnn.Conv2d(din[1], ld[1], 1), tnn.ConvTranspose2d(ld[1], ld[1], 2, 2)
            )
            self.act_3_postprocess = tnn.Sequential(tnn.Conv2d(din[2], ld[2], 1))
            self.act_4_postprocess = tnn.Sequential(
                tnn.Conv2d(din[3], ld[3], 1),
                tnn.Conv2d(ld[3], ld[3], 3, stride=2, padding=1),
            )
            self.scratch = Scratch(ld, f)
            self.head = tnn.Sequential(
                tnn.Conv2d(f, f // 2, 3, padding=1),
                Interp(),
                tnn.Conv2d(f // 2, spec.dpt_last_dim, 3, padding=1),
                tnn.ReLU(True),
                tnn.Conv2d(spec.dpt_last_dim, spec.out_channels, 1),
            )

        def forward(self, toks, grid_hw):
            nh, nw = grid_hw
            maps = [
                t.reshape(t.shape[0], nh, nw, t.shape[-1]).permute(0, 3, 1, 2)
                for t in toks
            ]
            l0 = self.act_1_postprocess(maps[0])
            l1 = self.act_2_postprocess(maps[1])
            l2 = self.act_3_postprocess(maps[2])
            l3 = self.act_4_postprocess(maps[3])
            sc = self.scratch
            rn = [sc.layer1_rn(l0), sc.layer2_rn(l1), sc.layer3_rn(l2), sc.layer4_rn(l3)]
            p4 = sc.refinenet4(rn[3])[:, :, : rn[2].shape[2], : rn[2].shape[3]]
            p3 = sc.refinenet3(p4, rn[2])
            p2 = sc.refinenet2(p3, rn[1])
            p1 = sc.refinenet1(p2, rn[0])
            return self.head(p1)

    class HeadWrap(tnn.Module):
        def __init__(self):
            super().__init__()
            self.dpt = Dpt()

    class Mirror(tnn.Module):
        def __init__(self):
            super().__init__()

            class PE(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.proj = tnn.Conv2d(
                        3, spec.enc_dim, spec.patch_size, spec.patch_size
                    )

            self.patch_embed = PE()
            self.enc_blocks = tnn.ModuleList(
                [EncBlock() for _ in range(spec.enc_depth)]
            )
            self.enc_norm = LN(spec.enc_dim)
            self.decoder_embed = tnn.Linear(spec.enc_dim, spec.dec_dim)
            self.dec_blocks = tnn.ModuleList(
                [DecBlock() for _ in range(spec.dec_depth)]
            )
            self.dec_blocks2 = tnn.ModuleList(
                [DecBlock() for _ in range(spec.dec_depth)]
            )
            self.dec_norm = LN(spec.dec_dim)
            self.downstream_head1 = HeadWrap()
            self.downstream_head2 = HeadWrap()

        def encode(self, img):
            x = self.patch_embed.proj(img)  # (B, C, nh, nw)
            b, c, nh, nw = x.shape
            x = x.flatten(2).transpose(1, 2)  # (B, N, C), row-major (nh, nw)
            yy, xx = torch.meshgrid(
                torch.arange(nh), torch.arange(nw), indexing="ij"
            )
            pos = torch.stack([yy.reshape(-1), xx.reshape(-1)], -1)
            for blk in self.enc_blocks:
                x = blk(x, pos)
            return self.enc_norm(x), pos, (nh, nw)

        def forward(self, img1, img2):
            f1, pos1, hw1 = self.encode(img1)
            f2, pos2, hw2 = self.encode(img2)
            outs1, outs2 = [f1], [f2]
            d1, d2 = self.decoder_embed(f1), self.decoder_embed(f2)
            for b1, b2 in zip(self.dec_blocks, self.dec_blocks2):
                d1n = b1(d1, d2, pos1, pos2)
                d2n = b2(d2, d1, pos2, pos1)
                d1, d2 = d1n, d2n
                outs1.append(d1)
                outs2.append(d2)
            outs1[-1] = self.dec_norm(outs1[-1])
            outs2[-1] = self.dec_norm(outs2[-1])
            hk = spec.dpt_hooks
            o1 = self.downstream_head1.dpt([outs1[i] for i in hk], hw1)
            o2 = self.downstream_head2.dpt([outs2[i] for i in hk], hw2)
            return o1, o2

    return Mirror()


@pytest.mark.slow
def test_torch_mirror_parity():
    """Converted params reproduce the torch mirror's raw head outputs —
    validates every layout rule (conv/convT orientation, qkv packing, LN)."""
    import torch

    state = _synthetic_state(SPEC)
    mirror = _torch_mirror(SPEC)
    missing, unexpected = mirror.load_state_dict(
        {k: torch.from_numpy(v) for k, v in state.items()}, strict=True
    )
    assert not missing and not unexpected

    rng = np.random.RandomState(1)
    i1 = rng.rand(2, 32, 48, 3).astype(np.float32) * 2 - 1
    i2 = rng.rand(2, 48, 32, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t1, t2 = mirror(
            torch.from_numpy(i1).permute(0, 3, 1, 2),
            torch.from_numpy(i2).permute(0, 3, 1, 2),
        )
    t1 = t1.permute(0, 2, 3, 1).numpy()
    t2 = t2.permute(0, 2, 3, 1).numpy()

    m = AsymmetricCroCoStereo(SPEC)
    params = convert_dust3r_state_dict(state, SPEC)
    out = m.apply({"params": params}, jnp.asarray(i1), jnp.asarray(i2))

    # apply the SAME postprocess to the torch mirror's raw head outputs
    def post_pts(raw):
        raw = raw.astype(np.float64)
        d = np.linalg.norm(raw, axis=-1, keepdims=True)
        return raw / np.clip(d, 1e-12, None) * np.expm1(d)

    np.testing.assert_allclose(
        np.asarray(out["pred1"]["pts3d"]), post_pts(t1[..., :3]),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred1"]["conf"]), 1.0 + np.exp(t1[..., 3]),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred2"]["pts3d_in_other_view"]), post_pts(t2[..., :3]),
        rtol=2e-3, atol=2e-4,
    )


# ---------------------------------------------------------------------------
# Output contract


def test_full_resolution_outputs_nonsquare():
    m = AsymmetricCroCoStereo(SPEC)
    i1, i2 = jnp.zeros((1, 64, 32, 3)), jnp.zeros((1, 32, 64, 3))
    params = m.init(jax.random.PRNGKey(0), i1, i2)["params"]
    out = m.apply({"params": params}, i1, i2)
    assert out["pred1"]["pts3d"].shape == (1, 64, 32, 3)
    assert out["pred1"]["conf"].shape == (1, 64, 32)
    assert out["pred2"]["pts3d_in_other_view"].shape == (1, 32, 64, 3)
    # conf_mode ('exp', 1, inf): confidences exceed 1 everywhere
    assert float(np.asarray(out["pred1"]["conf"]).min()) >= 1.0


# ---------------------------------------------------------------------------
# Native pipeline end-to-end (stereo net -> native global alignment)


def _write_images(tmp_path, sizes):
    import PIL.Image

    paths = []
    rng = np.random.RandomState(0)
    for i, (w, h) in enumerate(sizes):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = tmp_path / f"img_{i}.png"
        PIL.Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


@pytest.mark.slow
def test_native_pipeline_end_to_end(tmp_path):
    from stable_virtual_camera_tpu.apps.preprocessor import NativeDust3rPipeline

    paths = _write_images(tmp_path, [(80, 60)] * 3)
    pipe = NativeDust3rPipeline(spec=SPEC, init_rng=0)
    imgs, Ks, c2ws, points, colors = pipe.infer_cameras_and_points(
        paths, niter=8, min_conf_thr=1
    )
    assert len(imgs) == 3 and Ks.shape == (3, 3, 3) and c2ws.shape == (3, 4, 4)
    assert np.isfinite(Ks).all() and np.isfinite(c2ws).all()
    assert len(points) == 3 and len(colors) == 3
    for p, c in zip(points, colors):
        assert p.shape[1] == 3 and c.shape[1] == 3 and len(p) == len(c)
    # intrinsics are rescaled to the ORIGINAL resolution: cx ~ W/2 = 40
    assert 10 < Ks[0, 0, 2] < 70


@pytest.mark.slow
def test_native_pipeline_single_image(tmp_path):
    from stable_virtual_camera_tpu.apps.preprocessor import NativeDust3rPipeline

    paths = _write_images(tmp_path, [(64, 64)])
    pipe = NativeDust3rPipeline(spec=SPEC, init_rng=0)
    imgs, Ks, c2ws, points, colors = pipe.infer_cameras_and_points(
        paths, niter=4, min_conf_thr=1
    )
    assert len(imgs) == 1 and Ks.shape == (1, 3, 3) and c2ws.shape == (1, 4, 4)


def test_loader_shapes(tmp_path):
    from stable_virtual_camera_tpu.apps.preprocessor import (
        load_and_preprocess_images,
    )

    paths = _write_images(tmp_path, [(80, 60), (60, 80), (64, 64)])
    out = load_and_preprocess_images(paths, size=64, patch=16)
    # long side -> 64, then floor-crop to /16 multiples
    assert out[0].shape == (48, 64, 3)
    assert out[1].shape == (64, 48, 3)
    assert out[2].shape == (64, 64, 3)
    assert all(o.min() >= -1.0 and o.max() <= 1.0 for o in out)


def test_factory_returns_native_backend():
    from stable_virtual_camera_tpu.apps import preprocessor as P

    if P.dust3r_available():  # pragma: no cover - not in this image
        pytest.skip("external dust3r present")
    pipe = P.make_dust3r_pipeline(spec=SPEC, init_rng=0)
    assert isinstance(pipe, P.NativeDust3rPipeline)


@pytest.mark.slow
def test_native_pipeline_mixed_aspects(tmp_path):
    """Images with different aspect ratios exercise the ragged
    (per-edge-shape) path through edges_from_dust3r_output."""
    from stable_virtual_camera_tpu.apps.preprocessor import NativeDust3rPipeline

    paths = _write_images(tmp_path, [(80, 60), (60, 80), (64, 64)])
    pipe = NativeDust3rPipeline(spec=SPEC, init_rng=0)
    imgs, Ks, c2ws, points, colors = pipe.infer_cameras_and_points(
        paths, niter=6, min_conf_thr=1
    )
    assert isinstance(imgs, list) and len(imgs) == 3  # non-uniform set
    assert {im.shape for im in imgs} == {(48, 64, 3), (64, 48, 3), (64, 64, 3)}
    assert Ks.shape == (3, 3, 3) and c2ws.shape == (3, 4, 4)
    assert np.isfinite(c2ws).all()
    for p, c in zip(points, colors):
        assert p.shape[1] == 3 and len(p) == len(c)
