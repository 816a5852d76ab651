"""Pallas TPU minimizer-sketch kernel.

Device analogue of mm_sketch (sketch.c:77-143, non-HPC) with the same
minimizer SET semantics as parallel/batch.device_sketch: position i is
emitted iff its hash equals the min of at least one complete w-window
(ties included).  One pass over (G reads x T positions) tiles; the k-mer
lookback and the +-w window context come from neighbouring input blocks,
so every shift is a static slice -- no rolls, no big XLA temporaries.

64-bit hash math runs as (hi, lo) uint32 pairs (see parallel/batch.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UMAX = 0xFFFFFFFF


def _shl64c(hi, lo, s: int):
    if s == 0:
        return hi, lo
    if s < 32:
        return (hi << s) | (lo >> (32 - s)), lo << s
    if s == 32:
        return lo, jnp.zeros_like(lo)
    return lo << (s - 32), jnp.zeros_like(lo)


def _shr64c(hi, lo, s: int):
    if s == 0:
        return hi, lo
    if s < 32:
        return hi >> s, (lo >> s) | (hi << (32 - s))
    if s == 32:
        return jnp.zeros_like(hi), hi
    return jnp.zeros_like(hi), hi >> (s - 32)


def _add64c(ahi, alo, bhi, blo):
    lo = alo + blo
    return ahi + bhi + (lo < alo).astype(jnp.uint32), lo


def _lt64c(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def _hash64_pair(khi, klo, mask_hi, mask_lo):
    mh, ml = jnp.uint32(mask_hi), jnp.uint32(mask_lo)

    def band(hi, lo):
        return hi & mh, lo & ml

    shi, slo = _shl64c(khi, klo, 21)
    khi, klo = band(*_add64c(~khi, ~klo, shi, slo))
    shi, slo = _shr64c(khi, klo, 24)
    khi, klo = khi ^ shi, klo ^ slo
    ahi, alo = _shl64c(khi, klo, 3)
    bhi, blo = _shl64c(khi, klo, 8)
    khi, klo = band(*_add64c(*_add64c(khi, klo, ahi, alo), bhi, blo))
    shi, slo = _shr64c(khi, klo, 14)
    khi, klo = khi ^ shi, klo ^ slo
    ahi, alo = _shl64c(khi, klo, 2)
    bhi, blo = _shl64c(khi, klo, 4)
    khi, klo = band(*_add64c(*_add64c(khi, klo, ahi, alo), bhi, blo))
    shi, slo = _shr64c(khi, klo, 28)
    khi, klo = khi ^ shi, klo ^ slo
    shi, slo = _shl64c(khi, klo, 31)
    return band(*_add64c(khi, klo, shi, slo))


def _sketch_kernel(lens_ref, prev_ref, cur_ref, nxt_ref,
                   hhi_ref, hlo_ref, flag_ref,
                   *, G, T, PADL, PADR, k, w):
    t = pl.program_id(1)
    CT = PADL + T + PADR
    big = jnp.uint32(UMAX)
    # context: [prev tail | cur | next head]; at the edges the clamped
    # neighbour blocks supply garbage that validity masks kill
    def as_i32(x):
        return jnp.zeros(x.shape, jnp.int32) + x
    ctx = jnp.concatenate([as_i32(prev_ref[0, 0, :, T - PADL:]),
                           as_i32(cur_ref[0, 0]),
                           as_i32(nxt_ref[0, 0, :, :PADR])], axis=1)
    qlen = lens_ref[0, :, 0:1]                              # (G, 1)
    lane = lax.broadcasted_iota(jnp.int32, (G, CT), 1)
    abs_pos = lane + (t * T - PADL)

    mask = (1 << (2 * k)) - 1
    mask_hi, mask_lo = mask >> 32, mask & UMAX
    c32 = ctx
    comp = jnp.where(c32 < 4, 3 ^ c32, 0)
    z0 = jnp.zeros((G, CT), jnp.uint32)
    kf_hi = z0
    kf_lo = z0
    kr_hi = z0
    kr_lo = z0
    amb = c32 >= 4
    amb_any = amb
    for j in range(k):
        # code at abs position (pos - j): left shift of the ctx row
        if j == 0:
            cj = c32.astype(jnp.uint32)
            pj = comp.astype(jnp.uint32)
            aj = amb
        else:
            zpad = jnp.zeros((G, j), jnp.int32)
            cj = jnp.concatenate([zpad, c32[:, :-j]], axis=1).astype(jnp.uint32)
            pj = jnp.concatenate([zpad, comp[:, :-j]], axis=1).astype(jnp.uint32)
            aj = jnp.concatenate([zpad, amb[:, :-j].astype(jnp.int32)],
                                 axis=1)
            amb_any = amb_any | (aj != 0)
        shi, slo = _shl64c(jnp.zeros_like(cj), cj, 2 * j)
        kf_hi, kf_lo = kf_hi | shi, kf_lo | slo
        shi, slo = _shl64c(jnp.zeros_like(pj), pj, 2 * (k - 1 - j))
        kr_hi, kr_lo = kr_hi | shi, kr_lo | slo
    kf_hi = kf_hi & jnp.uint32(mask_hi)
    kf_lo = kf_lo & jnp.uint32(mask_lo)
    valid = (~amb_any) & (abs_pos >= k - 1) & (abs_pos < qlen)
    sym = (kf_hi == kr_hi) & (kf_lo == kr_lo)
    valid = valid & ~sym
    z = ~_lt64c(kf_hi, kf_lo, kr_hi, kr_lo)
    mh_hi = jnp.where(z, kr_hi, kf_hi)
    mh_lo = jnp.where(z, kr_lo, kf_lo)
    hhi, hlo = _hash64_pair(mh_hi, mh_lo, mask_hi, mask_lo)
    xhi = jnp.where(valid, hhi, big)
    xlo = jnp.where(valid, hlo, big)

    # wmin[j] = min over [j, j+w): forward shifts within ctx
    wm_hi, wm_lo = xhi, xlo
    for d in range(1, w):
        shh = jnp.concatenate([xhi[:, d:],
                               jnp.full((G, d), big, jnp.uint32)], axis=1)
        shl = jnp.concatenate([xlo[:, d:],
                               jnp.full((G, d), big, jnp.uint32)], axis=1)
        lt = _lt64c(shh, shl, wm_hi, wm_lo)
        wm_hi = jnp.where(lt, shh, wm_hi)
        wm_lo = jnp.where(lt, shl, wm_lo)
    # window complete iff all w member positions are valid slots (ambiguity
    # resets + read bounds); count valid via the same shift trick
    okpos = (~amb_any) & (abs_pos >= k - 1) & (abs_pos < qlen)
    okcnt = okpos.astype(jnp.int32)
    for d in range(1, w):
        okcnt = okcnt + jnp.concatenate(
            [okpos[:, d:].astype(jnp.int32), jnp.zeros((G, d), jnp.int32)],
            axis=1)
    wok = (okcnt == w) & (abs_pos + w - 1 < qlen)
    mx_hi = jnp.where(wok, wm_hi, jnp.uint32(0))
    mx_lo = jnp.where(wok, wm_lo, jnp.uint32(0))
    cv_hi, cv_lo = mx_hi, mx_lo
    anyw = wok
    for d in range(1, w):
        zp = jnp.zeros((G, d), jnp.uint32)
        shh = jnp.concatenate([zp, mx_hi[:, :-d]], axis=1)
        shl = jnp.concatenate([zp, mx_lo[:, :-d]], axis=1)
        swk = jnp.concatenate([jnp.zeros((G, d), jnp.int32),
                               wok[:, :-d].astype(jnp.int32)], axis=1) != 0
        lt = _lt64c(cv_hi, cv_lo, shh, shl)
        cv_hi = jnp.where(lt, shh, cv_hi)
        cv_lo = jnp.where(lt, shl, cv_lo)
        anyw = anyw | swk
    not_max = ~((xhi == big) & (xlo == big))
    is_mini = valid & anyw & (cv_hi == xhi) & (cv_lo == xlo) & not_max

    sl = slice(PADL, PADL + T)
    hhi_ref[0, 0] = hhi[:, sl]
    hlo_ref[0, 0] = hlo[:, sl]
    flag_i = (is_mini[:, sl].astype(jnp.int32)
              | (z[:, sl].astype(jnp.int32) << 1)
              | (valid[:, sl].astype(jnp.int32) << 2))
    flag_ref[0, 0] = flag_i.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("G", "T", "k", "w",
                                             "interpret"))
def sketch_batch(codes, lens, *, G, T, k, w, interpret=False):
    """codes (B, L) u8, lens (B,) i32 -> (hhi, hlo, strand, is_mini)
    planes of shape (B, L) (u32, u32, bool, bool)."""
    B, L = codes.shape
    assert B % G == 0 and L % T == 0
    assert k + w <= min(128, T) and w <= T, (k, w, T)
    NB = B // G
    NT = L // T
    PADL, PADR = 128, 128
    lens_v = jnp.zeros((NB, G, 128), jnp.int32).at[:, :, 0].set(
        lens.reshape(NB, G))
    cb = codes.reshape(NB, G, NT, T).transpose(0, 2, 1, 3)   # (NB,NT,G,T)
    kernel = functools.partial(_sketch_kernel, G=G, T=T, PADL=PADL,
                               PADR=PADR, k=k, w=w)
    out_shapes = tuple(jax.ShapeDtypeStruct((NB, NT, G, T), d)
                       for d in (jnp.uint32, jnp.uint32, jnp.uint8))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NB, NT),
        in_specs=[
            pl.BlockSpec((1, G, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, T),
                         lambda b, t: (b, jnp.maximum(t - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, T), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, T),
                         lambda b, t: (b, jnp.minimum(t + 1, NT - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 1, G, T), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(3)),
    )
    hhi, hlo, flag = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(lens_v, cb, cb, cb)
    def back(x):
        return x.transpose(0, 2, 1, 3).reshape(B, L)
    flag = back(flag)
    return (back(hhi), back(hlo), ((flag >> 1) & 1) != 0, (flag & 1) != 0,
            (flag >> 2) != 0)