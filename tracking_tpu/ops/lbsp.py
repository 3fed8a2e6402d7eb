"""LBSP (Local Binary Similarity Pattern) descriptor — vectorized.

Reference: the 16-bit double-cross pattern of ``pl/LBSP.h:50-97`` +
``pl/LBSP_16bits_dbcross_1ch.i`` (Bilodeau et al., CRV 2013):

     O   O   O          4 ..  3 ..  6
       O O O           .. 15  8 13 ..
     O O X O O    =>    0  9  X 11  1
       O O O           .. 12 10 14 ..
     O   O   O          7 ..  2 ..  5

bit_i = (|neighbor_i − ref| > t). The reference computes this per pixel with
pointer arithmetic; here the 16 neighbor planes are materialized once as
shifted views of the (edge-padded) image and every descriptor against any
reference map (the pixel itself for intra-frame, a background sample for
inter-frame) is 16 vectorized compares — the memory layout TPUs want, and the
neighbor stack is reused across all N background samples in SuBSENSE's
consensus loop.

Border pixels are clamped (edge padding); the LBSP ROI convention excludes a
2-pixel border anyway (``LBSP::validateROI``, ``pl/LBSP.cpp:311-318``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# (x=col, y=row) offsets in bit order 0..15 (LBSP_16bits_dbcross_1ch.i:27-42).
OFFSETS = (
    (-2, 0), (2, 0), (0, -2), (0, 2),
    (-2, 2), (2, -2), (2, 2), (-2, -2),
    (0, 1), (-1, 0), (0, -1), (1, 0),
    (-1, -1), (1, 1), (1, -1), (-1, 1),
)

BITS = 16
BORDER = 2  # LBSP::PATCH_SIZE/2


def neighbor_stack(img: jnp.ndarray) -> jnp.ndarray:
    """u8 [H, W] → int16 [16, H, W]: neighbor value planes in bit order."""
    H, W = img.shape[-2], img.shape[-1]
    pad = [(0, 0)] * (img.ndim - 2) + [(BORDER, BORDER), (BORDER, BORDER)]
    x = jnp.pad(img, pad, mode="edge").astype(jnp.int16)
    planes = []
    for dx, dy in OFFSETS:
        sl = (Ellipsis, slice(BORDER + dy, BORDER + dy + H), slice(BORDER + dx, BORDER + dx + W))
        planes.append(x[sl])
    return jnp.stack(planes, axis=0)


def descriptor_bits(nb: jnp.ndarray, ref: jnp.ndarray, thr: jnp.ndarray) -> jnp.ndarray:
    """bool [16, H, W]: |neighbor − ref| > thr, per bit.

    ref/thr broadcast over the leading bit axis (shape [H, W]).
    """
    return jnp.abs(nb - ref.astype(jnp.int16)[None]) > thr.astype(jnp.int16)[None]


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """bool [16, H, W] → uint16 [H, W] descriptor."""
    weights = (1 << np.arange(BITS, dtype=np.uint32)).astype(np.uint32)
    acc = jnp.tensordot(
        weights, bits.astype(jnp.uint32), axes=([0], [0])
    )
    return acc.astype(jnp.uint16)


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """uint16 [H, W] → bool [16, H, W]."""
    shifts = jnp.arange(BITS, dtype=jnp.uint16).reshape((BITS,) + (1,) * desc.ndim)
    return ((desc[None] >> shifts) & 1).astype(bool)


def compute_descriptor(img: jnp.ndarray, ref: jnp.ndarray, thr: jnp.ndarray) -> jnp.ndarray:
    """Full LBSP: u8 image [H, W], reference map, threshold map → u16 [H, W]."""
    return pack_bits(descriptor_bits(neighbor_stack(img), ref, thr))


def popcount16(x: jnp.ndarray) -> jnp.ndarray:
    """Population count of a uint16 array (SWAR, int32 arithmetic)."""
    v = x.astype(jnp.int32)
    v = v - ((v >> 1) & 0x5555)
    v = (v & 0x3333) + ((v >> 2) & 0x3333)
    v = (v + (v >> 4)) & 0x0F0F
    return (v + (v >> 8)) & 0x1F


def hamming16(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamming distance between u16 descriptor maps (``hdist``,
    ``pl/DistanceUtils.h:286-288``)."""
    return popcount16(jnp.bitwise_xor(a, b))
