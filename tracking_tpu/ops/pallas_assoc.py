"""Pallas TPU kernel: greedy min-cost track<->blob assignment in one call.

The tracker's association (``track/tracker.py _associate``; capability twin
of the legacy CC tracker's nearest-blob matching, ``trackingMain.cpp:633``)
is a greedy loop: repeatedly take the global argmin of a [K, B] cost matrix,
assign that (track, blob) pair, and mask its row/column — stopping when the
min is gated. As an XLA ``lax.while_loop`` each tiny iteration (argmin +
two masked updates on a 32x64 matrix) costs ~45 us of sequential op
overhead — 0.36 ms/frame for a ~8-pair frame, pure loop tax.

Here the WHOLE loop runs inside one kernel invocation: the cost matrix
lives in VMEM/registers, each iteration is a handful of VPU ops, and the
kernel returns the final (assign [K], taken [B]) vectors.

Exactness: identical to the XLA formulation — the argmin tie-break picks
the lowest flat index (min over an iota masked at the min value), matching
``jnp.argmin`` on the flattened matrix; the interpret-mode parity test
(tests/test_track.py) asserts equality against ``_associate``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9  # python float: jnp scalars captured by a kernel trip pallas_call


def _make_kernel(K: int, B: int, n_iter: int):
    def kernel(cost_ref, assign_ref, taken_ref):
        cost = cost_ref[...]  # [K, B] f32 (pre-gated: BIG where invalid)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (K, B), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (K, B), 1)
        flat_i = row_i * B + col_i

        def cond(carry):
            i, ok, _, _, _ = carry
            return (i < n_iter) & ok

        def body(carry):
            i, _, cost, assign, taken = carry
            m = jnp.min(cost)
            ok = m < BIG
            # first (lowest flat index) cell holding the min — matches
            # jnp.argmin's tie-break on the flattened matrix
            at_min = cost == m
            flat = jnp.min(jnp.where(at_min, flat_i, K * B))
            k, b = flat // B, flat % B
            hit_row = row_i == k
            hit_col = col_i == b
            assign = jnp.where(ok & hit_row & hit_col, b, assign)
            taken = jnp.where(ok & hit_col, 1, taken)
            cost = jnp.where(ok & (hit_row | hit_col), BIG, cost)
            return i + 1, ok, cost, assign, taken

        assign0 = jnp.full((K, B), -1, jnp.int32)
        taken0 = jnp.zeros((K, B), jnp.int32)
        _, _, _, assign, taken = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(True), cost, assign0, taken0)
        )
        # row-reduce the per-cell writes back to vectors (each row/col holds
        # its value in every cell it was written to, -1/0 elsewhere)
        assign_ref[...] = jnp.max(assign, axis=1, keepdims=True)
        taken_ref[...] = jnp.max(taken, axis=0, keepdims=True)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def greedy_assign_pallas(cost: jnp.ndarray, interpret: bool = False):
    """Greedy assignment of a pre-gated [K, B] f32 cost matrix (entries >=
    1e9 are ungated/invalid). Returns (assign [K] i32 blob index or -1,
    taken [B] bool)."""
    K, B = cost.shape
    kernel = _make_kernel(K, B, min(K, B))
    assign, taken = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(cost)
    return assign[:, 0], taken[0] != 0
