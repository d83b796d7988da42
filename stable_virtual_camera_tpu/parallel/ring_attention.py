"""Ring attention over the view/sequence axis.

The sharded sampling path (parallel/sharding.py) lets XLA all-gather the full
K/V for the joint multiview attention — simple and correct, but the gathered
K/V costs O(L_global) memory per chip. Ring attention keeps each chip's K/V
shard resident and rotates shards around the ICI ring with `ppermute`,
combining partial results with the same online-softmax algebra as the flash
kernel — O(L_local) memory, bandwidth fully on the ring.

This is the long-context scaling primitive for the T=80–96 semi-dense regime
(reference docs/CLI_USAGE.md:80-81 reaches those T zero-shot on one GPU; a
mesh makes them cheap). Use inside `jax.shard_map` with the sequence axis
sharded over `axis_name`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def ring_attention(
    q: jnp.ndarray,  # (B, L_local, H, D) — local query shard
    k: jnp.ndarray,  # (B, S_local, H, D) — local key shard
    v: jnp.ndarray,
    axis_name: str,
) -> jnp.ndarray:
    """Exact attention over the globally concatenated sequence; inputs/outputs
    sharded on axis 1 over `axis_name`."""
    n = lax.psum(1, axis_name)
    D = q.shape[-1]
    scale = D**-0.5
    perm = [(i, (i + 1) % n) for i in range(n)]

    def partial_scores(k_blk, v_blk):
        s = (
            jnp.einsum(
                "blhd,bshd->bhls", q, k_blk, preferred_element_type=jnp.float32
            )
            * scale
        )
        m_i = jnp.max(s, axis=-1)
        p = jnp.exp(s - m_i[..., None])
        l_i = jnp.sum(p, axis=-1)
        pv = jnp.einsum(
            "bhls,bshd->bhld", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        return m_i, l_i, pv

    def step(carry, _):
        acc, m, l, k_cur, v_cur = carry
        m_i, l_i, pv = partial_scores(k_cur, v_cur)
        m_new = jnp.maximum(m, m_i)
        corr = jnp.exp(m - m_new)
        corr_i = jnp.exp(m_i - m_new)
        l_new = l * corr + l_i * corr_i
        acc_new = acc * corr[..., None] + pv * corr_i[..., None]
        # rotate the K/V shards around the ring (ICI neighbor exchange)
        k_next = lax.ppermute(k_cur, axis_name, perm)
        v_next = lax.ppermute(v_cur, axis_name, perm)
        return (acc_new, m_new, l_new, k_next, v_next), None

    B, L, H, _ = q.shape
    # mark the initial carry as varying over the ring axis so scan's carry
    # types stay consistent once q/k/v (device-varying) mix in
    acc0 = lax.pcast(jnp.zeros((B, H, L, D), jnp.float32), (axis_name,), to="varying")
    m0 = lax.pcast(
        jnp.full((B, H, L), -jnp.inf, jnp.float32), (axis_name,), to="varying"
    )
    l0 = lax.pcast(jnp.zeros((B, H, L), jnp.float32), (axis_name,), to="varying")
    (acc, m, l, _, _), _ = lax.scan(step, (acc0, m0, l0, k, v), None, length=n)
    out = acc / l[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def ring_sdpa_packed(
    q: jnp.ndarray,  # (B, L_global, W) packed layout, W = heads * 64
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    mesh,
    axis_name: str = "view",
) -> jnp.ndarray:
    """shard_map island for the UNet's joint multiview self-attention under
    view sharding: q/k/v arrive sharded on the (T*h*w) sequence axis and STAY
    sharded — K/V shards rotate around the ICI ring (ppermute) instead of the
    GSPMD all-gather the jit path would insert (O(L_local), not O(L_global),
    memory per chip). Drop-in for sdpa_packed inside a sharded program."""
    from jax.sharding import PartitionSpec as P

    B, L, W = q.shape
    D = W // heads
    spec = P(None, axis_name, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    def attn(q, k, v):
        b, l_loc, _ = q.shape
        out = ring_attention(
            q.reshape(b, l_loc, heads, D),
            k.reshape(b, l_loc, heads, D),
            v.reshape(b, l_loc, heads, D),
            axis_name,
        )
        return out.reshape(b, l_loc, W)

    return attn(q, k, v)


def make_ring_self_attention(mesh, axis_name: str = "view"):
    """shard_map-wrapped ring self-attention: global (B, L, H, D) arrays
    sharded on L over `axis_name`."""
    from jax.sharding import PartitionSpec as P

    spec = P(None, axis_name, None, None)

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    def attn(q, k, v):
        return ring_attention(q, k, v, axis_name)

    return attn
