"""Batched banded extension DP as a Pallas TPU kernel.

This is the TPU-native equivalent of ksw_extd2_sse (the dominant hot loop of
the reference, SURVEY.md #14/#15): the Suzuki-Kasahara anti-diagonal
difference recurrence, batched over many (query, target) pairs, int8 state in
VMEM, direction bytes streamed to HBM for host traceback.

Semantics are the *same 16-lane-rounded band* as the reference SSE kernel
(and ops/ksw2_np.py), so the device path stays bit-exact with the host oracle:
masks reproduce the st/en block rounding, the score-row storeu coverage, and
the boundary-condition rules.

Grid: (N, R_chunks); each grid step advances RB anti-diagonals for one pair.
State (u,v,x,y,x2,y2,s int8; H int32; ez scalars) persists in scratch across
the R_chunks dimension. Per-diagonal work is a handful of elementwise VPU ops
over the padded target axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF32 = -0x40000000

# ez scalar slots
EZ_MAX, EZ_ZDROP, EZ_MAXQ, EZ_MAXT, EZ_MQE, EZ_MQET, EZ_MTE, EZ_MTEQ, \
    EZ_SCORE, EZ_H0, EZ_LH0T, EZ_LASTST, EZ_LASTEN, EZ_DEAD = range(14)
EZ_N = 16


def _extd2_kernel(lens_ref, qr_ref, sf_ref, p_ref, ez_ref, off_ref,
                  u, v, x, y, x2, y2, s, H, ezs,
                  *, RB, TP, W, q, e, q2, e2, w, zdrop, end_bonus,
                  approx_max, right_mode, sc_mch, sc_mis, sc_N, sc_ambi,
                  with_cigar):
    n = pl.program_id(0)
    rc = pl.program_id(1)
    qlen = lens_ref[0]
    tlen = lens_ref[1]
    qe_pen = q + e
    qe2_pen = q2 + e2
    if e != e2:
        long_thres0 = (q2 - q) // (e - e2) - 1
    else:
        long_thres0 = 0
    if q2 + e2 + long_thres0 * e2 > q + e + long_thres0 * e:
        long_thres0 += 1
    long_thres = long_thres0
    long_diff = long_thres * (e - e2) - (q2 - q) - e2

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, TP), 1)

    @pl.when(rc == 0)
    def _init():
        u[:] = jnp.full((1, TP), -q - e, jnp.int8)
        v[:] = jnp.full((1, TP), -q - e, jnp.int8)
        x[:] = jnp.full((1, TP), -q - e, jnp.int8)
        y[:] = jnp.full((1, TP), -q - e, jnp.int8)
        x2[:] = jnp.full((1, TP), -q2 - e2, jnp.int8)
        y2[:] = jnp.full((1, TP), -q2 - e2, jnp.int8)
        s[:] = jnp.zeros((1, TP), jnp.int8)
        H[:] = jnp.full((1, TP), NEG_INF32, jnp.int32)
        ez = jnp.zeros((EZ_N,), jnp.int32)
        ez = ez.at[EZ_MQE].set(NEG_INF32).at[EZ_MTE].set(NEG_INF32)
        ez = ez.at[EZ_SCORE].set(NEG_INF32)
        ez = ez.at[EZ_MAXQ].set(-1).at[EZ_MAXT].set(-1)
        ez = ez.at[EZ_MQET].set(-1).at[EZ_MTEQ].set(-1)
        ez = ez.at[EZ_LASTST].set(-1).at[EZ_LASTEN].set(-1)
        ezs[:] = ez

    def step(rr, carry):
        r = rc * RB + rr
        ez = ezs[:]
        dead = (ez[EZ_DEAD] != 0) | (r >= qlen + tlen - 1)

        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + w) >> 1)
        band_dead = st0 > en0
        st = st0 // 16 * 16
        en = (en0 + 16) // 16 * 16 - 1

        last_st = ez[EZ_LASTST]
        last_en = ez[EZ_LASTEN]
        # boundary values
        prev_ok = (st - 1 >= last_st) & (st - 1 <= last_en)
        stm1 = jnp.maximum(st - 1, 0)
        x1 = jnp.where(st > 0,
                       jnp.where(prev_ok, x[0, stm1], jnp.int8(-q - e)),
                       jnp.int8(-q - e)).astype(jnp.int8)
        x21 = jnp.where(st > 0,
                        jnp.where(prev_ok, x2[0, stm1], jnp.int8(-q2 - e2)),
                        jnp.int8(-q2 - e2)).astype(jnp.int8)
        v1_edge = jnp.where(r == 0, -q - e,
                            jnp.where(r < long_thres, -e,
                                      jnp.where(r == long_thres, long_diff, -e2)))
        v1 = jnp.where(st > 0,
                       jnp.where(prev_ok, v[0, stm1], jnp.int8(-q - e)),
                       v1_edge.astype(jnp.int8)).astype(jnp.int8)

        # fresh-cell boundary at t == r (only when en >= r)
        at_r = (idx == r) & (en >= r)
        y_cur = jnp.where(at_r, jnp.int8(-q - e), y[:])
        y2_cur = jnp.where(at_r, jnp.int8(-q2 - e2), y2[:])
        u_cur = jnp.where(at_r, v1_edge.astype(jnp.int8), u[:])

        # score row: update coverage [st0, st0 + 16*floor((en0-st0)/16) + 15]
        s_hi = st0 + ((en0 - st0) // 16) * 16 + 15
        scov = (idx >= st0) & (idx <= s_hi)
        qrr_idx = qlen - 1 - r + idx  # index into padded reversed query
        qrr_idx_c = jnp.clip(qrr_idx, 0, qr_ref.shape[1] - 1)
        tq = jnp.take_along_axis(qr_ref[:], qrr_idx_c, axis=1)
        tq = jnp.where(qrr_idx == qrr_idx_c, tq, jnp.uint8(0))
        sq = sf_ref[:]
        eqm = sq == tq
        maskN = (sq == 4) | (tq == 4)
        sval = jnp.where(eqm, jnp.int8(sc_mch), jnp.int8(sc_mis))
        sval = jnp.where(maskN, jnp.int8(sc_N), sval)
        s_cur = jnp.where(scov, sval, s[:])

        # shifted previous-state vectors with boundary inserted at position st
        def shift1(arr, bval):
            rolled = pltpu.roll(arr, 1, axis=1)
            return jnp.where(idx == st, bval, rolled)

        xt1 = shift1(x[:], x1)
        vt1 = shift1(v[:], v1)
        x2t1 = shift1(x2[:], x21)
        ut = u_cur
        z = s_cur
        a = xt1 + vt1
        b = y_cur + ut
        a2 = x2t1 + vt1
        b2 = y2_cur + ut
        if with_cigar:
            if not right_mode:
                d = jnp.where(a > z, jnp.uint8(1), jnp.uint8(0))
                z = jnp.maximum(z, a)
                d = jnp.where(b > z, jnp.uint8(2), d)
                z = jnp.maximum(z, b)
                d = jnp.where(a2 > z, jnp.uint8(3), d)
                z = jnp.maximum(z, a2)
                d = jnp.where(b2 > z, jnp.uint8(4), d)
                z = jnp.maximum(z, b2)
            else:
                d = jnp.where(z > a, jnp.uint8(0), jnp.uint8(1))
                z = jnp.maximum(z, a)
                d = jnp.where(z > b, d, jnp.uint8(2))
                z = jnp.maximum(z, b)
                d = jnp.where(z > a2, d, jnp.uint8(3))
                z = jnp.maximum(z, a2)
                d = jnp.where(z > b2, d, jnp.uint8(4))
                z = jnp.maximum(z, b2)
        else:
            z = jnp.maximum(jnp.maximum(z, a), jnp.maximum(b, jnp.maximum(a2, b2)))
            d = None
        z = jnp.minimum(z, jnp.int8(sc_mch))
        u_new = z - vt1
        v_new = z - ut
        tq1 = z - jnp.int8(q)
        a = a - tq1
        b = b - tq1
        tq2 = z - jnp.int8(q2)
        a2 = a2 - tq2
        b2 = b2 - tq2
        if not right_mode:
            ga, gb, ga2, gb2 = a > 0, b > 0, a2 > 0, b2 > 0
        else:
            ga, gb, ga2, gb2 = a >= 0, b >= 0, a2 >= 0, b2 >= 0
        x_new = jnp.where(ga, a, jnp.int8(0)) - jnp.int8(qe_pen)
        y_new = jnp.where(gb, b, jnp.int8(0)) - jnp.int8(qe_pen)
        x2_new = jnp.where(ga2, a2, jnp.int8(0)) - jnp.int8(qe2_pen)
        y2_new = jnp.where(gb2, b2, jnp.int8(0)) - jnp.int8(qe2_pen)
        if with_cigar:
            d = d | jnp.where(ga, jnp.uint8(0x08), jnp.uint8(0))
            d = d | jnp.where(gb, jnp.uint8(0x10), jnp.uint8(0))
            d = d | jnp.where(ga2, jnp.uint8(0x20), jnp.uint8(0))
            d = d | jnp.where(gb2, jnp.uint8(0x40), jnp.uint8(0))

        live = jnp.logical_not(dead | band_dead)
        m_upd = live & (idx >= st) & (idx <= en)
        u_out = jnp.where(m_upd, u_new, u_cur)
        v_out = jnp.where(m_upd, v_new, v[:])
        x_out = jnp.where(m_upd, x_new, x[:])
        y_out = jnp.where(m_upd, y_new, y_cur)
        x2_out = jnp.where(m_upd, x2_new, x2[:])
        y2_out = jnp.where(m_upd, y2_new, y2_cur)
        u[:] = jnp.where(live | dead, u_out, u_out)  # plain store
        v[:] = v_out
        x[:] = x_out
        y[:] = y_out
        x2[:] = x2_out
        y2[:] = y2_out
        s[:] = jnp.where(live & scov, s_cur, s[:])

        if with_cigar:
            # direction row: W-wide window starting at st
            didx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) + st
            didx_c = jnp.clip(didx, 0, TP - 1)
            drow = jnp.take_along_axis(jnp.where(m_upd, d, jnp.uint8(0)),
                                       didx_c, axis=1)
            p_ref[rr, :] = drow[0]
            off_ref[rr, 0] = jnp.where(live, st, 0)
            off_ref[rr, 1] = jnp.where(live, en, -1)

        # H updates (exact-max mode)
        v32 = v_out.astype(jnp.int32)
        u32 = u_out.astype(jnp.int32)
        Hprev = H[:]
        en0c = jnp.clip(en0, 0, TP - 1)
        en0m1 = jnp.clip(en0 - 1, 0, TP - 1)
        h_en0 = jnp.where(en0 > 0,
                          Hprev[0, en0m1] + u32[0, en0c],
                          Hprev[0, en0c] + v32[0, en0c])
        h_en0 = jnp.where(r == 0, v32[0, 0] - qe_pen, h_en0)
        body_mask = (idx >= st0) & (idx < en0) & (r > 0)
        Hnew = jnp.where(body_mask, Hprev + v32, Hprev)
        Hnew = jnp.where(idx == en0, h_en0, Hnew)
        H[:] = jnp.where(live, Hnew, Hprev)

        # max over [st0, en0]: first maximizer among [st0,en0) beating H[en0]
        cand = jnp.where(body_mask | ((idx == en0) & (r == 0)), Hnew, NEG_INF32)
        cand = jnp.where((idx == en0), jnp.where(r == 0, Hnew, NEG_INF32), cand)
        body_max = jnp.max(jnp.where(body_mask, Hnew, NEG_INF32))
        body_arg = jnp.argmax(jnp.where(body_mask, Hnew, NEG_INF32))
        max_H = jnp.where((r > 0) & (body_max > h_en0), body_max, h_en0)
        max_t = jnp.where((r > 0) & (body_max > h_en0), body_arg.astype(jnp.int32), en0)
        max_H = jnp.where(r == 0, h_en0, max_H)
        max_t = jnp.where(r == 0, 0, max_t)

        # ez updates
        st0c = jnp.clip(st0, 0, TP - 1)
        upd_mte = live & (en0 == tlen - 1) & (Hnew[0, en0c] > ez[EZ_MTE])
        ez = ez.at[EZ_MTE].set(jnp.where(upd_mte, Hnew[0, en0c], ez[EZ_MTE]))
        ez = ez.at[EZ_MTEQ].set(jnp.where(upd_mte, r - en0, ez[EZ_MTEQ]))
        upd_mqe = live & (r - st0 == qlen - 1) & (Hnew[0, st0c] > ez[EZ_MQE])
        ez = ez.at[EZ_MQE].set(jnp.where(upd_mqe, Hnew[0, st0c], ez[EZ_MQE]))
        ez = ez.at[EZ_MQET].set(jnp.where(upd_mqe, st0, ez[EZ_MQET]))
        # zdrop (ksw_apply_zdrop, is_rot=1)
        better = max_H > ez[EZ_MAX]
        ez_max = jnp.where(live & better, max_H, ez[EZ_MAX])
        ez_maxt = jnp.where(live & better, max_t, ez[EZ_MAXT])
        ez_maxq = jnp.where(live & better, r - max_t, ez[EZ_MAXQ])
        tl = max_t - ez[EZ_MAXT]
        ql = (r - max_t) - ez[EZ_MAXQ]
        ldiff = jnp.abs(tl - ql)
        in_quad = (max_t >= ez[EZ_MAXT]) & ((r - max_t) >= ez[EZ_MAXQ])
        zdropped = (live & jnp.logical_not(better) & in_quad
                    & (zdrop >= 0) & (ez[EZ_MAX] - max_H > zdrop + ldiff * e2))
        ez = ez.at[EZ_MAX].set(ez_max).at[EZ_MAXT].set(ez_maxt).at[EZ_MAXQ].set(ez_maxq)
        ez = ez.at[EZ_ZDROP].set(jnp.where(zdropped | (live & band_dead) | (ez[EZ_ZDROP] != 0), 1, 0))
        ez = ez.at[EZ_DEAD].set(jnp.where(zdropped | band_dead | dead, 1, 0))
        fin = live & (r == qlen + tlen - 2) & (en0 == tlen - 1)
        ez = ez.at[EZ_SCORE].set(jnp.where(fin, Hnew[0, jnp.clip(tlen - 1, 0, TP - 1)],
                                           ez[EZ_SCORE]))
        ez = ez.at[EZ_LASTST].set(jnp.where(live, st, ez[EZ_LASTST]))
        ez = ez.at[EZ_LASTEN].set(jnp.where(live, en, ez[EZ_LASTEN]))
        ezs[:] = ez
        return carry

    jax.lax.fori_loop(0, RB, step, 0)
    ez_ref[:] = ezs[:]


@functools.partial(jax.jit, static_argnames=(
    "TP", "QP", "W", "RB", "R", "q", "e", "q2", "e2", "w", "zdrop",
    "end_bonus", "right_mode", "sc_mch", "sc_mis", "sc_N", "with_cigar",
    "interpret"))
def extd2_batch(qr, sf, lens, *, TP, QP, W, RB, R, q, e, q2, e2, w, zdrop,
                end_bonus, right_mode, sc_mch, sc_mis, sc_N,
                with_cigar=True, interpret=False):
    """Run the batched extd2 kernel.

    qr: (N, QP) uint8 reversed queries (zero-padded)
    sf: (N, TP) uint8 targets (zero-padded)
    lens: (N, 2) int32 (qlen, tlen)
    Returns (p, ez, off): p (N, R, W) uint8 direction rows; ez (N, EZ_N) int32;
    off (N, R, 2) int32 block bounds per diagonal.
    """
    N = qr.shape[0]
    RC = (R + RB - 1) // RB
    kernel = functools.partial(
        _extd2_kernel, RB=RB, TP=TP, W=W, q=q, e=e, q2=q2, e2=e2, w=w,
        zdrop=zdrop, end_bonus=end_bonus, approx_max=False,
        right_mode=right_mode, sc_mch=sc_mch, sc_mis=sc_mis, sc_N=sc_N,
        sc_ambi=0, with_cigar=with_cigar)
    out_shapes = (
        jax.ShapeDtypeStruct((N, RC * RB, W), jnp.uint8),
        jax.ShapeDtypeStruct((N, EZ_N), jnp.int32),
        jax.ShapeDtypeStruct((N, RC * RB, 2), jnp.int32),
    )
    grid = (N, RC)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda n, rc: (n, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, QP), lambda n, rc: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TP), lambda n, rc: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, RB, W), lambda n, rc: (n, rc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EZ_N), lambda n, rc: (n, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, RB, 2), lambda n, rc: (n, rc, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, TP), jnp.int8),   # u
            pltpu.VMEM((1, TP), jnp.int8),   # v
            pltpu.VMEM((1, TP), jnp.int8),   # x
            pltpu.VMEM((1, TP), jnp.int8),   # y
            pltpu.VMEM((1, TP), jnp.int8),   # x2
            pltpu.VMEM((1, TP), jnp.int8),   # y2
            pltpu.VMEM((1, TP), jnp.int8),   # s
            pltpu.VMEM((1, TP), jnp.int32),  # H
            pltpu.SMEM((EZ_N,), jnp.int32),  # ez scalars
        ],
        interpret=interpret,
    )(lens, qr, sf)
