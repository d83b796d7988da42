"""Pallas flash-attention kernel vs plain einsum attention (interpret mode on
CPU; the compiled path runs on TPU in bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.ops.attention import attention_chunked, attention_xla
from stable_virtual_camera_tpu.ops import flash_attention as fa


@pytest.mark.parametrize("B,L,H,D", [(2, 1296, 3, 64), (1, 1500, 2, 64)])
def test_flash_matches_xla_interpret(B, L, H, D):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    ref = attention_xla(q, k, v)
    out = fa.flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_chunked_matches_xla():
    rng = np.random.default_rng(1)
    B, L, H, D = 2, 2100, 2, 64
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    ref = attention_xla(q, k, v)
    out = attention_chunked(q, k, v, kv_chunk=512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_supported_predicate():
    q = jnp.zeros((2, 2048, 4, 64), jnp.bfloat16)
    assert fa.supported(q, q, q)
    assert not fa.supported(
        jnp.zeros((2, 512, 4, 64)), jnp.zeros((2, 512, 4, 64)), jnp.zeros((2, 512, 4, 64))
    )
    # cross-attention (S != L) unsupported
    assert not fa.supported(
        jnp.zeros((2, 2048, 4, 64)), jnp.zeros((2, 1, 4, 64)), jnp.zeros((2, 1, 4, 64))
    )
