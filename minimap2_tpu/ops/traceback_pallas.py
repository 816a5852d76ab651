"""Device CIGAR traceback over the extd2 v2 direction matrix.

ksw_backtrack (ksw2.h:130-162, is_rot=1) as a Pallas kernel: the walk
from (t0, q0) to the origin runs inside the sequential RC grid dim,
reading direction bytes straight from the p blocks in VMEM, so the huge
p tensor (R x W per pair) never leaves the device.  The emitted form is
one op byte per anti-diagonal (0 = diag skipped by an M move): since r
strictly decreases during the walk, the non-zero ops in descending-r
order ARE the walk's move sequence, so the host recovers the CIGAR with
a vectorized RLE (no per-base Python loop).

The kernel is diagonal-major: each block iterates its RB diagonals in
descending order ONCE; a pair steps exactly when its current r equals
the iterated diagonal (moves only decrease r, so a pair always lands on
rows not yet visited).  One (G, W) row read + a one-hot byte extract
per diagonal serves all G pairs -- no per-pair scalar loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .extend_pallas2 import wstart_chunk
from .exts_pallas import wstart_q


def _bt_kernel(lens_ref, p_ref, ops_ref, fin_ref, st_s, *, G, W, RB, RC, w,
               splice=False, QP=0):
    """Grid (NG, RCr); rcr walks blocks from the LAST diagonal down.

    splice mode reads exts2_batch direction rows: the window is
    query-edge based (wstart_q), the band is unbounded, and state 3
    (intron) emits op 4 so the decode can label it N."""
    rcr = pl.program_id(1)
    rc = RC - 1 - rcr                  # real block index (descending)
    laneW = lax.broadcasted_iota(jnp.int32, (G, W), 1)
    laneRB = lax.broadcasted_iota(jnp.int32, (G, RB), 1)
    lane128 = lax.broadcasted_iota(jnp.int32, (G, 128), 1)

    qv = lens_ref[0, :, 0:1]           # (G, 1) qlen
    tv = lens_ref[0, :, 1:2]           # (G, 1) tlen

    @pl.when(rcr == 0)
    def _init():
        # start at the global end cell: i = tlen-1 (target), j = qlen-1
        st_s[:, 0:1] = tv - 1
        st_s[:, 1:2] = qv - 1
        st_s[:, 2:3] = jnp.zeros((G, 1), jnp.int32)

    iv = st_s[:, 0:1]
    jv = st_s[:, 1:2]
    sv = st_s[:, 2:3]
    blk_lo = rc * RB

    acc0 = jnp.zeros((G, RB), jnp.int32)

    def body(it, carry):
        iv, jv, sv, acc = carry
        rl = RB - 1 - it               # local diagonal, descending
        r = blk_lo + rl
        rv = iv + jv
        act = (iv >= 0) & (jv >= 0) & (rv == r)          # (G, 1)
        # band bounds of diagonal r (reference st0/en0) and row origin ws
        if splice:
            st0r = jnp.maximum(0, r - qv + 1)
            en0r = jnp.minimum(tv - 1, r)
            wsr = wstart_q(jnp.full((G, 1), r, jnp.int32), QP)
        else:
            st0r = jnp.maximum(jnp.maximum(0, r - qv + 1), (r - w + 1) >> 1)
            en0r = jnp.minimum(jnp.minimum(tv - 1, r), (r + w) >> 1)
            # chunk-uniform window origin (matches extd2 v3 row layout)
            wsr = wstart_chunk(jnp.full((G, 1), r, jnp.int32), w, RB)
        force = jnp.where(iv < st0r, 2, -1)
        force = jnp.where(iv > en0r, 1, force)
        row = jnp.zeros((G, W), jnp.int32) + p_ref[0, 0, rl, :, :]
        col = iv - wsr                                   # (G, 1)
        tmpv = jnp.sum(jnp.where(laneW == col, row, 0), axis=1,
                       keepdims=True, dtype=jnp.int32)
        tmpv = jnp.where(force >= 0, 0, tmpv)
        # ksw_backtrack state machine (ksw2.h:141-147)
        s1 = jnp.where(sv == 0, tmpv & 7,
                       jnp.where((tmpv >> (sv + 2)) & 1, sv, 0))
        s1 = jnp.where(s1 == 0, tmpv & 7, s1)
        s1 = jnp.where(force >= 0, force, s1)
        # moves: state 0 -> M (i--, j--); 1 or 3 -> D/N (i--); 2 -> I (j--)
        is_m = s1 == 0
        is_d = (s1 == 1) | (s1 == 3)
        # op codes: 1=M 2=I 3=D, and in splice mode state 3 -> 4 (N)
        op = jnp.where(is_m, 1, jnp.where(is_d, 3, 2))
        if splice:
            op = jnp.where(s1 == 3, 4, op)
        acc = acc + jnp.where((laneRB == rl) & act, op, 0)
        iv2 = jnp.where(act & (is_m | is_d), iv - 1, iv)
        jv2 = jnp.where(act & (is_m | ~is_d), jv - 1, jv)
        sv2 = jnp.where(act, s1, sv)
        return iv2, jv2, sv2, acc

    iv, jv, sv, acc = lax.fori_loop(0, RB, body, (iv, jv, sv, acc0))
    st_s[:, 0:1] = iv
    st_s[:, 1:2] = jv
    st_s[:, 2:3] = sv
    ops_ref[0, 0] = acc.astype(jnp.uint8)

    @pl.when(rcr == RC - 1)
    def _fin():
        fin_ref[0] = jnp.where(lane128 == 0, iv,
                               jnp.where(lane128 == 1, jv, 0))


@functools.partial(jax.jit, static_argnames=("G", "W", "RB", "R", "w",
                                             "splice", "QP", "interpret"))
def traceback_batch(p, lens, *, G, W, RB, R, w, splice=False, QP=0,
                    interpret=False):
    """p: (NG, RC, RB, G, W) u8 direction rows from extd2_batch2
    (with_cigar=True, global mode); lens: (N, 2) i32 [qlen, tlen].

    Returns (ops (N, RC*RB) u8, fin (N, 2) i32 leftover [i, j]).  The
    walk starts at (tlen-1, qlen-1); decode with decode_ops."""
    NG, RC, RB_, G_, W_ = p.shape
    assert (RB_, G_, W_) == (RB, G, W)
    N = lens.shape[0]
    lens_v = jnp.zeros((NG, G, 128), jnp.int32)
    pad = NG * G - N
    lp = jnp.concatenate([lens, jnp.zeros((pad, 2), jnp.int32)], 0) \
        if pad else lens
    lens_v = lens_v.at[:, :, 0].set(lp[:, 0].reshape(NG, G))
    lens_v = lens_v.at[:, :, 1].set(lp[:, 1].reshape(NG, G))
    kernel = functools.partial(_bt_kernel, G=G, W=W, RB=RB, RC=RC, w=w,
                               splice=splice, QP=QP)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NG, RC),
        in_specs=[
            pl.BlockSpec((1, G, 128), lambda n, rcr: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RB, G, W),
                         lambda n, rcr: (n, RC - 1 - rcr, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, G, RB),
                         lambda n, rcr: (n, RC - 1 - rcr, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 128), lambda n, rcr: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((G, 128), jnp.int32)],
    )
    ops, fin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((NG, RC, G, RB), jnp.uint8),
                   jax.ShapeDtypeStruct((NG, G, 128), jnp.int32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(lens_v, p)
    ops = ops.transpose(0, 2, 1, 3).reshape(NG * G, RC * RB)[:N]
    fin = fin.reshape(NG * G, 128)[:N, :2]
    return ops, fin


CIG_FROM_OP = np.array([255, 0, 1, 2, 3], np.uint8)  # 1=M 2=I 3=D 4=N


def decode_ops(ops_row: np.ndarray, fin_i: int, fin_j: int,
               splice: bool = False, long_thres: int = 0) -> list[int]:
    """ops (R,) u8 + leftover (i, j) -> forward cigar (len<<4|op) list,
    replicating ksw_backtrack's push+reverse (ksw2.h:155-161)."""
    nz = np.nonzero(ops_row)[0]
    mv = CIG_FROM_OP[ops_row[nz]]          # ascending r = reversed walk
    cig: list[int] = []
    # tails first (they are pushed last, so they lead after the reverse)
    if fin_i >= 0:
        # leading deletion; N when intron-sized (ksw2.h:156)
        lead_op = 3 if (splice and fin_i >= long_thres) else 2
        cig.append((fin_i + 1) << 4 | lead_op)
    if fin_j >= 0:
        cig.append((fin_j + 1) << 4 | 1)   # leading insertion
    if len(mv):
        # RLE over the ascending-r move sequence
        brk = np.nonzero(np.diff(mv))[0]
        starts = np.concatenate([[0], brk + 1])
        ends = np.concatenate([brk + 1, [len(mv)]])
        for s, e in zip(starts, ends):
            op = int(mv[s])
            ln = int(e - s)
            if cig and (cig[-1] & 0xF) == op:
                cig[-1] += ln << 4
            else:
                cig.append(ln << 4 | op)
    return cig
