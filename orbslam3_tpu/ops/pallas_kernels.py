"""Pallas TPU kernels for the hot descriptor ops.

The XLA formulations (ops/brief.py) express Hamming matching as
unpack-bits + f32 matmul; this module provides the direct integer
formulation as a Pallas kernel — XOR + SWAR popcount on the VPU, tiled
over the (N, M) distance matrix with both descriptor blocks resident in
VMEM.  Useful when f32 expansion pressure matters (large map descriptor
banks: the unpacked (P, 256) f32 bank is 32x the packed bytes).

The kernel is numerically identical to brief.hamming_distance (tested
against it); `hamming_distance_pallas(..., interpret=True)` runs on CPU
for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128
TILE_M = 128


def _popcount32(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount of uint32 lanes (Hacker's Delight 5-2)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def _hamming_kernel(a_ref, b_ref, out_ref):
    """One (TILE_N, TILE_M) tile: a (TILE_N, 8) u32, b (TILE_M, 8) u32."""
    acc = jnp.zeros((TILE_N, TILE_M), jnp.uint32)
    for w in range(8):  # static unroll over descriptor words
        aw = a_ref[:, w][:, None]          # (TILE_N, 1)
        bw = b_ref[:, w][None, :]          # (1, TILE_M)
        acc = acc + _popcount32(jax.lax.bitwise_xor(
            jnp.broadcast_to(aw, (TILE_N, TILE_M)),
            jnp.broadcast_to(bw, (TILE_N, TILE_M))))
    out_ref[:, :] = acc.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_distance_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                            interpret: bool = False) -> jnp.ndarray:
    """(Na, 8) x (Nb, 8) uint32 -> (Na, Nb) int32 Hamming distances.

    Pads to 128-multiples (padding rows compare garbage against garbage;
    callers slice the valid region, which this wrapper does)."""
    na, nb = desc_a.shape[0], desc_b.shape[0]
    pa = (-na) % TILE_N
    pb = (-nb) % TILE_M
    A = jnp.pad(desc_a, ((0, pa), (0, 0)))
    B = jnp.pad(desc_b, ((0, pb), (0, 0)))
    grid = (A.shape[0] // TILE_N, B.shape[0] // TILE_M)
    out = pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((A.shape[0], B.shape[0]), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A, B)
    return out[:na, :nb]
