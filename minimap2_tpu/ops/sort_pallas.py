"""Pallas TPU bitonic row sort for anchor keys.

lax.sort on TPU costs ~150ms for (256, 4096) 3-key rows; the same bitonic
network in a Pallas kernel is ~1-2ms: rows live in lanes, the i^j partner
exchange is two static rolls + a bit-select, and the whole network is a
static double loop (log^2(A) compare-exchange stages).

Sorts rows ascending by the lexicographic (k1, k2, k3) uint32 triple.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sort_kernel(k1_ref, k2_ref, k3_ref, o1_ref, o2_ref, o3_ref, *, G, A):
    lane = lax.broadcasted_iota(jnp.int32, (G, A), 1)
    k1 = k1_ref[0]
    k2 = k2_ref[0]
    k3 = k3_ref[0]
    kk = 2
    while kk <= A:
        asc = (lane & kk) == 0
        j = kk >> 1
        while j >= 1:
            bitj = (lane & j) != 0
            def partner(v):
                return jnp.where(bitj, pltpu.roll(v, j, axis=1),
                                 pltpu.roll(v, A - j, axis=1))
            p1, p2, p3 = partner(k1), partner(k2), partner(k3)
            lt = (k1 < p1) | ((k1 == p1)
                              & ((k2 < p2) | ((k2 == p2) & (k3 < p3))))
            gt = (k1 > p1) | ((k1 == p1)
                             & ((k2 > p2) | ((k2 == p2) & (k3 > p3))))
            # lane with bit j clear keeps min (if asc) else max; bit j set
            # keeps the other (boolean algebra: Mosaic rejects select-of-i1)
            bx = bitj ^ asc
            keep_self = (bx & ~gt) | (~bx & ~lt)
            k1 = jnp.where(keep_self, k1, p1)
            k2 = jnp.where(keep_self, k2, p2)
            k3 = jnp.where(keep_self, k3, p3)
            j >>= 1
        kk <<= 1
    o1_ref[0] = k1
    o2_ref[0] = k2
    o3_ref[0] = k3


@functools.partial(jax.jit, static_argnames=("G", "interpret"))
def sort3_rows(k1, k2, k3, *, G=8, interpret=False):
    """Row-wise ascending lexicographic sort of three u32 key planes."""
    B, A = k1.shape
    assert B % G == 0 and (A & (A - 1)) == 0, (B, G, A)
    NB = B // G
    kernel = functools.partial(_sort_kernel, G=G, A=A)
    shape = jax.ShapeDtypeStruct((NB, G, A), jnp.uint32)
    spec = pl.BlockSpec((1, G, A), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[spec] * 3,
        out_specs=(spec,) * 3,
        out_shape=(shape,) * 3,
        interpret=interpret,
    )(k1.reshape(NB, G, A), k2.reshape(NB, G, A), k3.reshape(NB, G, A))
    return tuple(o.reshape(B, A) for o in outs)


def sort3_chunked(k1, k2, k3, *, chunk=2048, keep=1024, G=8,
                  interpret=False):
    """Two-level 3-plane sort for wide rows: sort `chunk`-lane pieces
    independently, then sort the concatenation of each piece's first
    `keep` lanes.  Exact whenever no chunk holds more than `keep` live
    keys (live = key != 0xFFFFFFFF-class sentinels that sort last);
    VMEM-bounded where a single full-width 3-plane bitonic is not
    (scoped-vmem stack overflows beyond ~8k lanes x 6 planes)."""
    B, A = k1.shape
    assert A % chunk == 0 and keep <= chunk
    C = A // chunk

    def rs(x):
        return x.reshape(B * C, chunk)

    s1, s2, s3 = sort3_rows(rs(k1), rs(k2), rs(k3), G=G,
                            interpret=interpret)

    def tk(x):
        return x.reshape(B, C, chunk)[:, :, :keep].reshape(B, C * keep)

    return sort3_rows(tk(s1), tk(s2), tk(s3), G=G, interpret=interpret)


def _sort1_kernel(k1_ref, o1_ref, *, G, A):
    lane = lax.broadcasted_iota(jnp.int32, (G, A), 1)
    k1 = k1_ref[0]
    kk = 2
    while kk <= A:
        asc = (lane & kk) == 0
        j = kk >> 1
        while j >= 1:
            bitj = (lane & j) != 0
            p1 = jnp.where(bitj, pltpu.roll(k1, j, axis=1),
                           pltpu.roll(k1, A - j, axis=1))
            bx = bitj ^ asc
            keep_self = (bx & ~(k1 > p1)) | (~bx & ~(k1 < p1))
            k1 = jnp.where(keep_self, k1, p1)
            j >>= 1
        kk <<= 1
    o1_ref[0] = k1


@functools.partial(jax.jit, static_argnames=("G", "interpret"))
def sort1_rows(k1, *, G=8, interpret=False):
    """Row-wise ascending sort of one u32 key plane (minimizer position
    compaction: cheaper than XLA scatter-compress at (B, 12k+) widths)."""
    B, A = k1.shape
    assert B % G == 0 and (A & (A - 1)) == 0, (B, G, A)
    NB = B // G
    kernel = functools.partial(_sort1_kernel, G=G, A=A)
    shape = jax.ShapeDtypeStruct((NB, G, A), jnp.uint32)
    spec = pl.BlockSpec((1, G, A), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=shape,
        interpret=interpret,
    )(k1.reshape(NB, G, A))
    return out.reshape(B, A)
