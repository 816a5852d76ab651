"""Pallas TPU chaining-DP kernel.

Device analogue of mg_lchain_dp's bounded backward scan (lchain.c:148-217
with the max_iter window as a fixed ring buffer), replacing the lax.scan
in parallel/batch._chain_scan: one grid step processes AC anchors for BL
reads held in LANES, with the look-back window in SUBLANES, so each anchor
step is a handful of (WND, BL) vector ops instead of an XLA scan step.

Scoring is comput_sc (lchain.c:113-138) with the bit-exact mg_log2
(mmpriv.h:139-147) penalty, identical to the jnp scan; outputs are the
per-anchor chain score f, global predecessor index, and running chain
start coordinates (for backtrack-free extent extraction).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0x40000000


def _mg_log2(x):
    z = x.astype(jnp.float32)
    zi = lax.bitcast_convert_type(z, jnp.uint32)
    log2i = (((zi >> jnp.uint32(23)) & jnp.uint32(255)).astype(jnp.int32)
             - 128).astype(jnp.float32)
    zi = (zi & jnp.uint32(0x007FFFFF)) | jnp.uint32(127 << 23)
    zf = lax.bitcast_convert_type(zi, jnp.float32)
    return log2i + ((jnp.float32(-0.34484843) * zf + jnp.float32(2.02466578))
                    * zf - jnp.float32(0.67487759))


def _chain_kernel(rev_ref, rid_ref, rpos_ref, qpos_ref, span_ref, av_ref,
                  f_ref, pred_ref, qs_ref, rs_ref,
                  fw, revw, ridw, rposw, qposw, spanw, qsw, rsw, jw,
                  *, BL, WND, AC, k, max_dist_x, max_dist_y, bw,
                  chn_pen_gap, chn_pen_skip):
    rc = pl.program_id(1)
    subl = lax.broadcasted_iota(jnp.int32, (WND, BL), 0)

    @pl.when(rc == 0)
    def _init():
        fw[:] = jnp.full((WND, BL), NEG_INF, jnp.int32)
        z = jnp.zeros((WND, BL), jnp.int32)
        revw[:] = z
        ridw[:] = z
        rposw[:] = z
        qposw[:] = z
        spanw[:] = z
        qsw[:] = z
        rsw[:] = z
        jw[:] = jnp.full((WND, BL), -1, jnp.int32)

    def body(i, _):
        a = rc * AC + i
        rv = rev_ref[0, 0, i, :][None, :]                         # (1, BL)
        ri = rid_ref[0, 0, i, :][None, :]
        rp = rpos_ref[0, 0, i, :][None, :]
        qp = qpos_ref[0, 0, i, :][None, :]
        sp = span_ref[0, 0, i, :][None, :]
        ok = av_ref[0, 0, i, :][None, :] != 0

        fw_v = fw[:]
        dq = qp - qposw[:]
        dr = rp - rposw[:]
        same = (revw[:] == rv) & (ridw[:] == ri)
        bad = (dq <= 0) | (dq > max_dist_x)
        bad |= (dr == 0) | (dq > max_dist_y)
        dd = jnp.abs(dr - dq)
        bad |= dd > bw
        bad |= ~same
        dg = jnp.minimum(dr, dq)
        # the PREDECESSOR's q_span caps the gain (comput_sc lchain.c:126)
        sc = jnp.minimum(spanw[:], dg)
        lin = (jnp.float32(chn_pen_gap) * dd.astype(jnp.float32)
               + jnp.float32(chn_pen_skip) * dg.astype(jnp.float32))
        logp = jnp.where(dd >= 1, _mg_log2((dd + 1).astype(jnp.float32)),
                         jnp.float32(0))
        pen = jnp.trunc(lin + jnp.float32(0.5) * logp).astype(jnp.int32)
        need = (dd != 0) | (dg > spanw[:])
        sc = jnp.where(need, sc - pen, sc)
        cand = jnp.where(bad | (fw_v <= NEG_INF // 2), NEG_INF, fw_v + sc)
        bsc = jnp.max(cand, axis=0, keepdims=True)             # (1, BL)
        # tie-break on the largest global anchor j (the C scan walks j
        # descending with a strict '>', so the closest anchor wins ties)
        jw_v = jw[:]
        selj = jnp.max(jnp.where(cand == bsc, jw_v, -1), axis=0,
                       keepdims=True)
        onehot = (jw_v == selj) & (cand == bsc)

        def pick(arr):
            return jnp.max(jnp.where(onehot, arr, NEG_INF), axis=0,
                           keepdims=True)

        use_pred = bsc >= sp
        f_i = jnp.where(use_pred, bsc, sp)
        f_i = jnp.where(ok, f_i, NEG_INF)
        qs_i = jnp.where(use_pred & ok, pick(qsw[:]), qp - sp + 1)
        rs_i = jnp.where(use_pred & ok, pick(rsw[:]), rp - sp + 1)
        pred_i = jnp.where(use_pred & ok, pick(jw[:]), -1)

        f_ref[0, 0, i, :] = f_i[0]
        pred_ref[0, 0, i, :] = pred_i[0]
        qs_ref[0, 0, i, :] = qs_i[0]
        rs_ref[0, 0, i, :] = rs_i[0]

        # ring write at slot a % WND
        slot = lax.rem(a, WND)
        wmask = subl == slot

        def put(ref, val):
            ref[:] = jnp.where(wmask, val, ref[:])

        put(fw, f_i)
        put(revw, rv)
        put(ridw, ri)
        put(rposw, rp)
        put(qposw, qp)
        put(spanw, sp)
        put(qsw, qs_i)
        put(rsw, rs_i)
        put(jw, jnp.full((1, BL), 1, jnp.int32) * a)
        return 0

    lax.fori_loop(0, AC, body, 0)


@functools.partial(jax.jit, static_argnames=(
    "BL", "WND", "AC", "k", "max_dist_x", "max_dist_y", "bw",
    "chn_pen_gap", "chn_pen_skip", "interpret"))
def chain_batch(rev, rid, rpos, qpos, span, av, *, BL, WND, AC, k,
                max_dist_x, max_dist_y, bw, chn_pen_gap, chn_pen_skip,
                interpret=False):
    """Windowed chain DP over sorted anchors.  Inputs (B, A) int32 planes
    (+ av bool); returns (f, pred, qs_a, rs_a) as (B, A) int32."""
    B, A = rpos.shape
    assert B % BL == 0 and A % AC == 0
    NB, NA = B // BL, A // AC

    def tr(x):
        return x.astype(jnp.int32).T.reshape(NA, AC, NB, BL) \
            .transpose(2, 0, 1, 3)      # (NB, NA, AC, BL)

    planes = [tr(rev), tr(rid), tr(rpos), tr(qpos), tr(span), tr(av)]
    kernel = functools.partial(
        _chain_kernel, BL=BL, WND=WND, AC=AC, k=k, max_dist_x=max_dist_x,
        max_dist_y=max_dist_y, bw=bw, chn_pen_gap=chn_pen_gap,
        chn_pen_skip=chn_pen_skip)
    out_shapes = tuple(jax.ShapeDtypeStruct((NB, NA, AC, BL), jnp.int32)
                       for _ in range(4))
    spec = pl.BlockSpec((1, 1, AC, BL), lambda b, rc: (b, rc, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NB, NA),
        in_specs=[spec] * 6,
        out_specs=(spec,) * 4,
        scratch_shapes=[pltpu.VMEM((WND, BL), jnp.int32) for _ in range(9)],
    )
    f, pred, qs_a, rs_a = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*planes)

    def back(x):
        return x.transpose(1, 2, 0, 3).reshape(A, B).T

    return back(f), back(pred), back(qs_a), back(rs_a)
