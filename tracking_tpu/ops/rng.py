"""Cheap counter-based per-pixel random fields for the stochastic updates.

SuBSENSE / LOBSTER consume 4-6 independent u32 words per pixel per frame
for their update draws — Bernoulli 1/T events, bank-slot picks, neighbor
picks (``pl/BackgroundSubtractorSuBSENSE.cpp:381-404``, where the reference
simply calls glibc ``rand()``, a weak LCG). ``jax.random.bits`` (threefry)
costs ~0.6 ms/frame for the (4, H, W) field at 720p — pure VPU compute,
>10% of the whole BGS step — buying cryptographic stream quality the
algorithm has no use for.

:func:`field_bits` instead hashes the flat element counter with the
murmur3 32-bit finalizer (full avalanche — every input bit flips every
output bit with p≈1/2 — so adjacent pixels/planes decorrelate completely),
seeded per frame by the same split chain of JAX keys as before: ~8
elementwise integer ops total. Marginals are unchanged (uniform u32 per
pixel, independent across frames via the key); only the stream identity
differs, which nothing relies on. Plain jnp ops ⇒ bit-identical on every
backend, so the CPU/TPU and sharded/unsharded equality properties of the
consumers are preserved (tests/test_mesh.py, tests/test_tpu_golden.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _key_words(key):
    """The two raw u32 words behind a JAX PRNG key (typed or legacy)."""
    kd = key
    if not (hasattr(key, "dtype") and key.dtype == jnp.uint32):
        kd = jax.random.key_data(key)
    kd = kd.astype(jnp.uint32)
    return kd[..., 0], kd[..., 1]


def field_bits(key, shape) -> jnp.ndarray:
    """Uniform u32 field of ``shape``: murmur3 fmix32 over (counter, key)."""
    k0, k1 = _key_words(key)
    n = math.prod(shape)
    x = jax.lax.iota(jnp.uint32, n).reshape(shape)
    x = x * jnp.uint32(0x9E3779B9) + k0
    x = x ^ k1
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def field_randint(key, shape, lo: int, hi: int) -> jnp.ndarray:
    """Uniform i32 field in [lo, hi) — multiply-shift range map of the top
    16 bits (exact for spans ≤ 2**16; power-of-two spans use a mask so the
    full 2**16-grain uniformity survives)."""
    span = hi - lo
    b = field_bits(key, shape)
    if span & (span - 1) == 0 and span <= (1 << 31):
        r = (b & jnp.uint32(span - 1)).astype(jnp.int32)
    else:
        assert span <= 1 << 16, "span too wide for the 16-bit range map"
        r = (
            ((b >> 16).astype(jnp.int32) * jnp.int32(span)) >> 16
        ).astype(jnp.int32)
    return r + jnp.int32(lo)
