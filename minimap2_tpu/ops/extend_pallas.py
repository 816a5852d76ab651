"""Batched banded extension DP as a Pallas TPU kernel.

TPU-native equivalent of ksw_extd2_sse (the reference's dominant hot loop,
SURVEY.md #14/#15): the Suzuki-Kasahara anti-diagonal difference recurrence,
batched over many (query, target) pairs.

Design: band-rolling window. All DP state (u,v,x,y,x2,y2,s int8; H int32)
lives in VMEM as W-wide vectors covering absolute target positions
[st(r), st(r)+W). st advances by 0 or 16 per anti-diagonal (the same 16-lane
block rounding as the SSE kernel), implemented as a conditional static roll,
so per-diagonal work is O(band) VPU lanes regardless of target length.
Direction bytes (one W-row per diagonal) stream to HBM; traceback runs on the
host, with off[r] recomputed analytically (host_band).

Bit-exactness: masks reproduce the reference's st/en block rounding, the
score-row storeu coverage (s persists across diagonals exactly like the SSE
kernel's s buffer), and the boundary rules, so results equal
ops/ksw2_np.ksw_extd2 (itself verified against the C kernel via ctypes).

Grid: (N, R_chunks); scratch persists across the R dimension per pair.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF32 = -0x40000000

EZ_MAX, EZ_ZDROP, EZ_MAXQ, EZ_MAXT, EZ_MQE, EZ_MQET, EZ_MTE, EZ_MTEQ, \
    EZ_SCORE, EZ_LASTST, EZ_DEAD, EZ_NR = range(12)
EZ_N = 16


def host_band(qlen, tlen, w, R):
    """Per-diagonal rounded block bounds (st, en) matching the kernel."""
    rs = np.arange(R)
    st0 = np.maximum(np.maximum(0, rs - qlen + 1), (rs - w + 1) >> 1)
    en0 = np.minimum(np.minimum(tlen - 1, rs), (rs + w) >> 1)
    return st0 // 16 * 16, (en0 + 16) // 16 * 16 - 1


def _extd2_kernel(lens_ref, srow_ref, p_ref, ez_ref,
                  u, v, x, y, x2, y2, s, H, ezs,
                  *, RB, W, q, e, q2, e2, w, zdrop,
                  right_mode, sc_mch, with_cigar):
    n = pl.program_id(0)
    r = pl.program_id(1)
    qlen = lens_ref[2 * n]
    tlen = lens_ref[2 * n + 1]
    qe_pen = q + e
    qe2_pen = q2 + e2
    if e != e2:
        long_thres = (q2 - q) // (e - e2) - 1
    else:
        long_thres = 0
    if q2 + e2 + long_thres * e2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * (e - e2) - (q2 - q) - e2

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    @pl.when(r == 0)
    def _init():
        u[:] = jnp.full((1, W), -q - e, jnp.int32)
        v[:] = jnp.full((1, W), -q - e, jnp.int32)
        x[:] = jnp.full((1, W), -q - e, jnp.int32)
        y[:] = jnp.full((1, W), -q - e, jnp.int32)
        x2[:] = jnp.full((1, W), -q2 - e2, jnp.int32)
        y2[:] = jnp.full((1, W), -q2 - e2, jnp.int32)
        s[:] = jnp.zeros((1, W), jnp.int32)
        H[:] = jnp.full((1, W), NEG_INF32, jnp.int32)
        for _s in range(EZ_N):
            ezs[_s] = 0
        ezs[EZ_MQE] = NEG_INF32
        ezs[EZ_MTE] = NEG_INF32
        ezs[EZ_SCORE] = NEG_INF32
        ezs[EZ_MAXQ] = -1
        ezs[EZ_MAXT] = -1
        ezs[EZ_MQET] = -1
        ezs[EZ_MTEQ] = -1
        ezs[EZ_LASTST] = 0

    def wrap8(val):
        # int8 wrap-around semantics of the reference epi8 arithmetic
        return ((val + 128) & 255) - 128

    def step():
        dead = (ezs[EZ_DEAD] != 0) | (r >= qlen + tlen - 1)
        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + w) >> 1)
        band_dead = st0 > en0
        st = st0 // 16 * 16
        en = (en0 + 16) // 16 * 16 - 1
        last_st = ezs[EZ_LASTST]
        ds16 = (st - last_st == 16) & (r > 0)
        live = jnp.logical_not(dead | band_dead)

        # boundary values at absolute position st-1 (pre-shift lane 15)
        use_prev = ds16 & live
        x15 = x[0, 15]
        x215 = x2[0, 15]
        v15 = v[0, 15]
        x1 = jnp.where(st > 0, jnp.where(use_prev, x15, -q - e), -q - e)
        x21 = jnp.where(st > 0, jnp.where(use_prev, x215, -q2 - e2), -q2 - e2)
        v1_edge = jnp.where(r == 0, -q - e,
                            jnp.where(r < long_thres, -e,
                                      jnp.where(r == long_thres, long_diff, -e2)))
        v1 = jnp.where(st > 0, jnp.where(use_prev, v15, -q - e), v1_edge)

        adv = ds16 & live

        def shifted(arr_ref, fill):
            a_ = arr_ref[:]
            rolled = pltpu.roll(a_, W - 16, axis=1)
            rolled = jnp.where(lane >= W - 16, fill, rolled)
            return jnp.where(adv, rolled, a_)

        u_p = shifted(u, -q - e)
        v_p = shifted(v, -q - e)
        x_p = shifted(x, -q - e)
        y_p = shifted(y, -q - e)
        x2_p = shifted(x2, -q2 - e2)
        y2_p = shifted(y2, -q2 - e2)
        s_p = shifted(s, 0)
        Hroll = pltpu.roll(H[:], W - 16, axis=1)
        Hroll = jnp.where(lane >= W - 16, NEG_INF32, Hroll)
        H_p = jnp.where(adv, Hroll, H[:])

        abs_idx = lane + st
        at_r = (abs_idx == r) & (en >= r)
        y_p = jnp.where(at_r, -q - e, y_p)
        y2_p = jnp.where(at_r, -q2 - e2, y2_p)
        u_p = jnp.where(at_r, v1_edge, u_p)

        # score row with exact storeu coverage; stale bytes persist in s
        s_hi = st0 + ((en0 - st0) // 16) * 16 + 15
        scov = (abs_idx >= st0) & (abs_idx <= s_hi)
        sval = srow_ref[0, 0, 0, :].reshape(1, W)
        s_cur = jnp.where(scov & live, sval, s_p)
        s[:] = s_cur

        z = s_cur
        xt1 = jnp.where(lane == 0, x1, pltpu.roll(x_p, 1, axis=1))
        vt1 = jnp.where(lane == 0, v1, pltpu.roll(v_p, 1, axis=1))
        x2t1 = jnp.where(lane == 0, x21, pltpu.roll(x2_p, 1, axis=1))
        ut = u_p
        a = wrap8(xt1 + vt1)
        b = wrap8(y_p + ut)
        a2 = wrap8(x2t1 + vt1)
        b2 = wrap8(y2_p + ut)
        if with_cigar:
            if not right_mode:
                d = jnp.where(a > z, 1, 0)
                z = jnp.maximum(z, a)
                d = jnp.where(b > z, 2, d)
                z = jnp.maximum(z, b)
                d = jnp.where(a2 > z, 3, d)
                z = jnp.maximum(z, a2)
                d = jnp.where(b2 > z, 4, d)
                z = jnp.maximum(z, b2)
            else:
                d = jnp.where(z > a, 0, 1)
                z = jnp.maximum(z, a)
                d = jnp.where(z > b, d, 2)
                z = jnp.maximum(z, b)
                d = jnp.where(z > a2, d, 3)
                z = jnp.maximum(z, a2)
                d = jnp.where(z > b2, d, 4)
                z = jnp.maximum(z, b2)
        else:
            z = jnp.maximum(jnp.maximum(z, a), jnp.maximum(b, jnp.maximum(a2, b2)))
            d = None
        z = jnp.minimum(z, sc_mch)
        u_new = wrap8(z - vt1)
        v_new = wrap8(z - ut)
        t1 = wrap8(z - q)
        a = wrap8(a - t1)
        b = wrap8(b - t1)
        t2 = wrap8(z - q2)
        a2 = wrap8(a2 - t2)
        b2 = wrap8(b2 - t2)
        if not right_mode:
            ga, gb, ga2, gb2 = a > 0, b > 0, a2 > 0, b2 > 0
        else:
            ga, gb, ga2, gb2 = a >= 0, b >= 0, a2 >= 0, b2 >= 0
        x_new = wrap8(jnp.where(ga, a, 0) - qe_pen)
        y_new = wrap8(jnp.where(gb, b, 0) - qe_pen)
        x2_new = wrap8(jnp.where(ga2, a2, 0) - qe2_pen)
        y2_new = wrap8(jnp.where(gb2, b2, 0) - qe2_pen)

        m_upd = live & (abs_idx >= st) & (abs_idx <= en)
        u_out = jnp.where(m_upd, u_new, u_p)
        v_out = jnp.where(m_upd, v_new, v_p)
        u[:] = u_out
        v[:] = v_out
        x[:] = jnp.where(m_upd, x_new, x_p)
        y[:] = jnp.where(m_upd, y_new, y_p)
        x2[:] = jnp.where(m_upd, x2_new, x2_p)
        y2[:] = jnp.where(m_upd, y2_new, y2_p)

        if with_cigar:
            d = d | jnp.where(ga, 0x08, 0)
            d = d | jnp.where(gb, 0x10, 0)
            d = d | jnp.where(ga2, 0x20, 0)
            d = d | jnp.where(gb2, 0x40, 0)
            p_ref[0, 0, 0, :] = jnp.where(m_upd, d, 0).astype(jnp.uint8)[0]

        # H update (exact-max mode)
        v32 = v_out
        u32 = u_out

        def lane_val(vec, li):
            # dtype pinned: under jax_enable_x64 the default accumulator
            # would be i64, which Mosaic cannot lower
            return jnp.sum(jnp.where(lane == li, vec, 0), dtype=jnp.int32)

        en0l = en0 - st
        h_en0 = jnp.where(en0 > 0,
                          lane_val(H_p, en0l - 1) + lane_val(u32, en0l),
                          lane_val(H_p, en0l) + lane_val(v32, en0l))
        h_en0 = jnp.where(r == 0, v32[0, 0] - qe_pen, h_en0)
        body_mask = (abs_idx >= st0) & (abs_idx < en0) & (r > 0)
        Hnew = jnp.where(body_mask, H_p + v32, H_p)
        Hnew = jnp.where(abs_idx == en0, h_en0, Hnew)
        H[:] = jnp.where(live, Hnew, H_p)

        body_vals = jnp.where(body_mask, Hnew, NEG_INF32)
        body_max = jnp.max(body_vals)
        # first maximizer (C scans ascending with strict '>')
        body_arg = jnp.min(jnp.where(body_vals == body_max, lane, W)) + st
        use_body = (r > 0) & (body_max > h_en0)
        max_H = jnp.where(use_body, body_max, h_en0)
        max_t = jnp.where(use_body, body_arg, en0)
        max_H = jnp.where(r == 0, h_en0, max_H)
        max_t = jnp.where(r == 0, 0, max_t)

        h_at_en0 = lane_val(Hnew, en0l)
        h_at_st0 = lane_val(Hnew, st0 - st)
        upd_mte = live & (en0 == tlen - 1) & (h_at_en0 > ezs[EZ_MTE])
        ezs[EZ_MTE] = jnp.where(upd_mte, h_at_en0, ezs[EZ_MTE])
        ezs[EZ_MTEQ] = jnp.where(upd_mte, r - en0, ezs[EZ_MTEQ])
        upd_mqe = live & (r - st0 == qlen - 1) & (h_at_st0 > ezs[EZ_MQE])
        ezs[EZ_MQE] = jnp.where(upd_mqe, h_at_st0, ezs[EZ_MQE])
        ezs[EZ_MQET] = jnp.where(upd_mqe, st0, ezs[EZ_MQET])
        ez_max0 = ezs[EZ_MAX]
        ez_maxt0 = ezs[EZ_MAXT]
        ez_maxq0 = ezs[EZ_MAXQ]
        better = max_H > ez_max0
        tl = max_t - ez_maxt0
        ql = (r - max_t) - ez_maxq0
        ldiff = jnp.abs(tl - ql)
        in_quad = (max_t >= ez_maxt0) & ((r - max_t) >= ez_maxq0)
        zdropped = (live & jnp.logical_not(better) & in_quad
                    & (zdrop >= 0) & (ez_max0 - max_H > zdrop + ldiff * e2))
        ezs[EZ_MAX] = jnp.where(live & better, max_H, ez_max0)
        ezs[EZ_MAXT] = jnp.where(live & better, max_t, ez_maxt0)
        ezs[EZ_MAXQ] = jnp.where(live & better, r - max_t, ez_maxq0)
        new_zdrop = zdropped | (jnp.logical_not(dead) & band_dead)
        ezs[EZ_ZDROP] = jnp.where(new_zdrop | (ezs[EZ_ZDROP] != 0), 1, 0)
        ezs[EZ_DEAD] = jnp.where(zdropped | band_dead | dead, 1, 0)
        fin = live & (r == qlen + tlen - 2) & (en0 == tlen - 1)
        ezs[EZ_SCORE] = jnp.where(fin, lane_val(Hnew, tlen - 1 - st),
                                  ezs[EZ_SCORE])
        ezs[EZ_LASTST] = jnp.where(live, st, ezs[EZ_LASTST])
        ezs[EZ_NR] = jnp.where(live, r + 1, ezs[EZ_NR])

    step()
    l128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    erow = jnp.zeros((1, 128), jnp.int32)
    for _s in range(EZ_N):
        erow = jnp.where(l128 == _s, ezs[_s], erow)
    ez_ref[0, 0:1, :] = erow


@functools.partial(jax.jit, static_argnames=(
    "TP", "QP", "W", "RB", "R", "q", "e", "q2", "e2", "w", "zdrop",
    "right_mode", "sc_mch", "sc_mis", "sc_N", "with_cigar", "interpret"))
def extd2_batch(qr, sf, lens, *, TP, QP, W, RB, R, q, e, q2, e2, w, zdrop,
                right_mode, sc_mch, sc_mis, sc_N, with_cigar=True,
                interpret=False):
    """Batched extd2. qr: (N, QP) uint8 reversed queries; sf: (N, TP) uint8
    targets; lens: (N, 2) int32 (qlen, tlen). Returns (p, ez): p (N, RC*RB, W)
    direction rows (window starts at host_band st); ez (N, EZ_N) int32."""
    # Mosaic has no 64-bit support; under jax_enable_x64 weak-typed literals
    # become i64 and the lowering recurses.  Force x32 semantics here.
    with jax.enable_x64(False):
        return _extd2_batch_x32(
            qr, sf, lens, TP=TP, QP=QP, W=W, RB=RB, R=R, q=q, e=e, q2=q2,
            e2=e2, w=w, zdrop=zdrop, right_mode=right_mode, sc_mch=sc_mch,
            sc_mis=sc_mis, sc_N=sc_N, with_cigar=with_cigar,
            interpret=interpret)


def _extd2_batch_x32(qr, sf, lens, *, TP, QP, W, RB, R, q, e, q2, e2, w,
                     zdrop, right_mode, sc_mch, sc_mis, sc_N, with_cigar,
                     interpret):
    N = qr.shape[0]
    RC = (R + RB - 1) // RB
    RT = RC * RB

    # Precompute per-diagonal score rows with plain XLA gathers (outside the
    # kernel): srow[n, r, l] = score(target[st(r)+l], query[r-(st(r)+l)]).
    qlen = lens[:, 0:1]                                   # (N, 1)
    tlen = lens[:, 1:2]
    rs = jnp.arange(RT, dtype=jnp.int32)[None, :]         # (1, RT)
    st0 = jnp.maximum(jnp.maximum(0, rs - qlen + 1), (rs - w + 1) >> 1)
    st_r = st0 // 16 * 16                                 # (N, RT)
    lanes = jnp.arange(W, dtype=jnp.int32)
    tpos = st_r[:, :, None] + lanes[None, None, :]        # (N, RT, W)
    qpos = rs[:, :, None] - tpos
    t_ok = (tpos >= 0) & (tpos < TP)
    q_ok = (qpos >= 0) & (qpos < QP)
    # qr is the REVERSED query: query[i] = qr[qlen-1-i]
    qidx = jnp.clip(qlen[:, :, None] - 1 - qpos, 0, QP - 1)
    tcode = jnp.where(t_ok, jnp.take_along_axis(
        sf[:, None, :], jnp.clip(tpos, 0, TP - 1).reshape(N, 1, -1), axis=2
    ).reshape(N, RT, W), jnp.uint8(0))
    qcode = jnp.where(q_ok & (qpos < qlen[:, :, None]), jnp.take_along_axis(
        qr[:, None, :], qidx.reshape(N, 1, -1), axis=2
    ).reshape(N, RT, W), jnp.uint8(0))
    eqm = tcode == qcode
    maskN = (tcode == 4) | (qcode == 4)
    srow = jnp.where(eqm, jnp.int32(sc_mch), jnp.int32(sc_mis))
    srow = jnp.where(maskN, jnp.int32(sc_N), srow).astype(jnp.int32)

    kernel = functools.partial(
        _extd2_kernel, RB=RB, W=W, q=q, e=e, q2=q2, e2=e2, w=w, zdrop=zdrop,
        right_mode=right_mode, sc_mch=sc_mch, with_cigar=with_cigar)
    out_shapes = (
        jax.ShapeDtypeStruct((N, RT, 1, W), jnp.uint8),
        jax.ShapeDtypeStruct((N, 8, 128), jnp.int32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, RT),
        in_specs=[
            pl.BlockSpec((1, 1, 1, W), lambda n, r, lens: (n, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1, W), lambda n, r, lens: (n, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda n, r, lens: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, W), jnp.int32),   # u
            pltpu.VMEM((1, W), jnp.int32),   # v
            pltpu.VMEM((1, W), jnp.int32),   # x
            pltpu.VMEM((1, W), jnp.int32),   # y
            pltpu.VMEM((1, W), jnp.int32),   # x2
            pltpu.VMEM((1, W), jnp.int32),   # y2
            pltpu.VMEM((1, W), jnp.int32),   # s
            pltpu.VMEM((1, W), jnp.int32),   # H
            pltpu.SMEM((EZ_N,), jnp.int32),  # ez scalars
        ],
    )
    p_out, ez_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(lens.reshape(-1), srow.reshape(N, RT, 1, W))
    return p_out.reshape(N, RT, W), ez_out[:, 0, :EZ_N]
