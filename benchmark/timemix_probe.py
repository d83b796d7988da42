"""A/B the temporal (time-mix) attention core on the real TPU at the ds1
shape: (a) the current batched tiny-einsum (21x21 matmuls batched over
b*S*H — measured ~1 TF/s on the MXU, round-3 trace), vs (b) a grouped
block-diagonal formulation: pack G=6 spatial positions into one
(G*21=126)^2 attention matrix with a -1e30 block mask. 6x wasted FLOPs but
126x126 tiles actually fill the MXU; the masked softmax is exact (the
padding keys underflow to probability zero).

16-iteration dependent scan inside one jit; distinct inputs per timed call;
host transfer as sync (docs/ARCHITECTURE.md relay discipline).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

b, T, S, H, D = 2, 21, 5184, 5, 64
INNER = H * D
N_IT = 16


def tm_current(q, k, v):
    """Current formulation (models/unet.py Attention time_frames path)."""

    def heads_view(t):  # (b*T, S, inner) -> (b, T, S, H, D)
        return t.reshape(b, T, S, H, D)

    qh, kh, vh = heads_view(q), heads_view(k), heads_view(v)
    s = jnp.einsum("bqshd,bkshd->bshqk", qh, kh, preferred_element_type=jnp.float32)
    s = s * (D**-0.5)
    p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    o = jnp.einsum("bshqk,bkshd->bqshd", p, vh)
    return o.reshape(b * T, S, INNER)


def tm_grouped(q, k, v, G=6):
    """Block-diagonal grouped formulation."""
    R = G * T

    def grouped_view(t):  # (b*T, S, inner) -> (b, S/G, H, G*T, D)
        t = t.reshape(b, T, S // G, G, H, D)
        # rows ordered group-major: r = i*T + t_frame
        return t.transpose(0, 2, 4, 3, 1, 5).reshape(b, S // G, H, R, D)

    qg, kg, vg = grouped_view(q), grouped_view(k), grouped_view(v)
    s = jnp.einsum("bghrd,bghsd->bghrs", qg, kg, preferred_element_type=jnp.float32)
    s = s * (D**-0.5)
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // T
    ci = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // T
    s = jnp.where(ri == ci, s, jnp.float32(-1e30))
    p = jax.nn.softmax(s, axis=-1).astype(vg.dtype)
    o = jnp.einsum("bghrs,bghsd->bghrd", p, vg)
    # back to (b*T, S, inner)
    o = o.reshape(b, S // G, H, G, T, D).transpose(0, 4, 1, 3, 2, 5)
    return o.reshape(b * T, S, INNER)


def tm_pallas(q, k, v):
    """Pallas lane-batched kernel (ops/time_attention.py). The packed->bhds
    transposes here are an upper bound on layout cost: in the model the
    projection einsum can write bhds directly from the GEMM epilogue."""
    from stable_virtual_camera_tpu.ops.time_attention import time_attention_bhds

    def to_bhds(t):
        return t.reshape(b * T, S, H, D).transpose(0, 2, 3, 1)

    o = time_attention_bhds(to_bhds(q), to_bhds(k), to_bhds(v), T)
    return o.transpose(0, 3, 1, 2).reshape(b * T, S, INNER)


def make(fn):
    @jax.jit
    def run(q, k, v):
        def body(h, _):
            return fn(h, k, v) + h * jnp.bfloat16(1e-3), ()

        out, _ = jax.lax.scan(body, q, None, length=N_IT)
        return out[0, 0, :2]

    return run


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b * T, S, INNER), jnp.bfloat16)
    k = jax.random.normal(kk, (b * T, S, INNER), jnp.bfloat16)
    v = jax.random.normal(kv, (b * T, S, INNER), jnp.bfloat16)
    for name, fn in [
        ("current", tm_current),
        ("grouped_G6", tm_grouped),
        ("pallas_lane", tm_pallas),
    ]:
        run = make(fn)
        np.asarray(run(q, k, v))  # compile
        times = []
        for i in range(3):
            qi = q + jnp.bfloat16(1e-3 * (i + 1))
            t0 = time.perf_counter()
            np.asarray(run(qi, k, v))
            times.append(time.perf_counter() - t0)
        print(f"{name}: {min(times) / N_IT * 1e3:.2f} ms/layer (min of 3)", flush=True)
    # numerics: identical math, f32 accumulation both ways
    a = np.asarray(tm_current(q, k, v), np.float32)
    for name, fn in [("grouped_G6", tm_grouped), ("pallas_lane", tm_pallas)]:
        c = np.asarray(fn(q, k, v), np.float32)
        print(f"max abs diff [{name}]:", np.abs(a - c).max())


if __name__ == "__main__":
    main()
