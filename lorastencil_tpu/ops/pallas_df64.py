"""df64 (double-float) 2-D stencil Pallas kernel: fp64-GRADE on the TPU
at kernel speed.

The XLA df64 path (ops/df64.py) re-reads ~4 HBM planes per tap group and
is HBM-bound; this kernel is the TPU answer to the reference's "fp64
stencils at tensor-core rate" thesis (``/root/reference/src/1d/1d_utils.h:44``
``DATA_TYPE double``; fp64 WMMA kernels ``src/2d/gpu.cu:31-273``): the
(hi, lo) window streams into VMEM ONCE per tile (double-buffered DMA, the
same pipeline as the fp32 kernel) and the whole error-free tap chain --
Veltkamp-split exact partial products, TwoSum accumulation, ~30 VPU
flops/tap/cell (ops/df64.py's dense_step semantics) -- runs on VMEM
values.  HBM traffic drops to the fp32 kernel's 2x (pair state), so the
measured ceiling is the VPU flop rate, not bandwidth.

Numerics: identical formulation to ops/df64.dense_step (the tap body is
built so FMA contraction CANNOT change any value -- every runtime product
is exact, rounded correction terms only enter plain adds); state is
stacked (2, Mp, Np) fp32 (hi, lo) pairs on the engine's internal 2-D
layout.  Accuracy contract ~1e-14/step, verified on device
(tests/test_df64.py gates interpret mode; PERF.md records the device run).

Algorithms:
  * 'vpu_roll': DENSE tap set, shifted operands as (8,128)-aligned
    cyclic ``pltpu.roll`` at the full window extent (Mosaic lowers
    misaligned sub-extent slices to costlier rotate+select chains; wrap
    garbage creeps <= radius into the guard margin and the final
    interior slice cuts it off -- the fp32 kernel's round-2 argument);
  * 'vpu_sep': SEPARABLE low-rank form -- the reference's own thesis
    (axis-separated rank-1 terms + sparse residue,
    ``/root/reference/src/2d/gpu.cu:224-264``) applied to the pair
    state: per term, a df64 column conv into an intermediate pair, one
    Veltkamp re-split, a df64 row conv, plus the residue; symmetric
    taps ±d fold into one product via an exact pair add.  Cuts the
    EFT flop count ~2x for star2d1r (33 dense taps -> 5+5 conv taps +
    8 residue points, pairs folded); picked by 'auto' when its static
    op count wins (_pick_algorithm);
  * 'vpu': dense statically shifted window slices at the tile extent
    (less arithmetic, costlier shifts -- measured slower than rolls).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.shapes import StencilSpec
from .df64 import df_add, two_sum, veltkamp_split
from .layout import Layout2D


def _tap_table(spec: StencilSpec):
    """Static per-tap constants: (dr, dc, w_h, w_l, b_h, b_l) with
    w_h + w_l == the fp64 tap exactly and b_h + b_l == w_h exactly on
    <= 12 mantissa bits each (Veltkamp halves -- partial products with
    12-bit state halves are exact in fp32)."""
    S = spec.dense_coeffs()
    r = spec.radius
    taps = []
    for idx in np.argwhere(np.abs(S) > 0):
        w64 = np.float64(S[tuple(idx)])
        wh = np.float32(w64)
        wl = np.float32(w64 - np.float64(wh))
        bh, bl = veltkamp_split(wh)  # NumPy in, NumPy out
        taps.append((int(idx[0]) - r, int(idx[1]) - r,
                     float(wh), float(wl), float(bh), float(bl)))
    return tuple(taps)


def _split_weight(w64):
    """fp64 weight -> (w_h, w_l, b_h, b_l): w_h + w_l == w exactly,
    b_h + b_l == w_h exactly on <= 12 mantissa bits each."""
    wh = np.float32(np.float64(w64))
    wl = np.float32(np.float64(w64) - np.float64(wh))
    bh, bl = veltkamp_split(wh)
    return (float(wh), float(wl), float(bh), float(bl))


def _fold_taps(taps):
    """Odd-length 1-D taps -> static folded entries.

    ('single', d, w4): one tap at offset d;
    ('pair', d, w4):   taps at +d and -d with EQUAL weight -- folded
    into one product via an exact pair add (x[+d] (+) x[-d]), halving
    the product/accumulate work for the symmetric coefficients every
    registry shape has."""
    taps = [float(t) for t in taps]
    r = (len(taps) - 1) // 2
    entries = []
    if taps[r] != 0.0:
        entries.append(("single", 0, _split_weight(taps[r])))
    for d in range(1, r + 1):
        wp, wm = taps[r + d], taps[r - d]
        if wp == wm:
            if wp != 0.0:
                entries.append(("pair", d, _split_weight(wp)))
        else:
            if wp != 0.0:
                entries.append(("single", d, _split_weight(wp)))
            if wm != 0.0:
                entries.append(("single", -d, _split_weight(wm)))
    return tuple(entries)


def _sep_plan(spec: StencilSpec):
    """Static separable plan: ((col_ops|None, row_ops|None) per term,
    folded residue entries).  Residue pairs fold offset o with -o when
    the weights match (the star2d1r residue is fully point-symmetric:
    +1 at (+-3,0),(0,+-3); -1 at (+-2,+-2))."""
    terms = []
    for term in spec.terms:
        terms.append(tuple(
            None if t is None else _fold_taps(t) for t in term.taps))
    items = [(tuple(int(o) for o in off), float(w))
             for off, w in spec.residue]
    used = set()
    res = []
    for i, (off, w) in enumerate(items):
        if i in used:
            continue
        neg = tuple(-o for o in off)
        j = next((k for k in range(i + 1, len(items))
                  if k not in used and items[k][0] == neg
                  and items[k][1] == w), None)
        if j is not None and off != neg:
            used.add(j)
            res.append(("pair", off, _split_weight(w)))
        else:
            res.append(("single", off, _split_weight(w)))
    return tuple(terms), tuple(res)


# static per-elem op-cost weights for the auto pick AND the df64
# roofline (units calibrated so tools/df64_eft_probe.py -- which issues
# exactly one full-product 'pair' entry = 48 units -- measures the
# achievable units/s on device; round 5).  The final arbiter for the
# auto pick is the device A/B in PERF.md.
_COST_PRODUCT = 20.0  # _tap_product + the accumulating df_add
_COST_FOLD = 13.0     # df_add of two rolled pairs
_COST_SPLIT = 3.0     # veltkamp_split
_COST_ROLL = 3.0      # one pltpu.roll of a window plane


def _entry_cost(kind: str, d, w4, nroll_single: int = 3,
                roll_cost: float = _COST_ROLL) -> float:
    """Cost of ONE folded tap entry, pricing the code path _pair_conv /
    conv_axis actually takes (round 5: the old model charged full
    SPLIT+PRODUCT for the w == +-1 shortcuts, which skip the product
    entirely -- honest 2-D device rows then implied rates ABOVE the
    independent probe ceiling).

    ``d`` may be an int offset (axis entries) or an offset tuple (2-D
    residue entries); ``nroll_single``: rolls a full-product single
    needs per shifted view unit (3: hs, hl, l).  ``roll_cost``: pass 0
    for the ARITHMETIC-ONLY cost (the roofline's governing model --
    the tools/df64_eft_probe.py triple measured rolls overlapping with
    the EFT arithmetic in real kernels, so the sustainable ceiling is
    the pure-arithmetic rate, the df64 analog of DMA hiding under
    compute)."""
    unit = 1.0 if isinstance(d, int) else float(sum(1 for o in d if o))
    is_zero = (d == 0) if isinstance(d, int) else not any(d)
    w_pm1 = (abs(w4[0]), w4[1]) == (1.0, 0.0)
    if kind == "pair":
        # 4 distinct rolls (h, l at +-d) + the exact pair fold
        cost = 4 * unit * roll_cost + _COST_FOLD
        if w_pm1:
            return cost + _COST_FOLD  # accumulate only (no product)
        return cost + _COST_SPLIT + _COST_PRODUCT  # split zh + product
    if is_zero:
        # center tap: hoisted split (charged by the caller), product
        # on the pre-split halves (or a bare accumulate for w == +-1)
        return _COST_FOLD if w_pm1 else _COST_PRODUCT
    if w_pm1:
        # shifted pair itself: h + l rolls, accumulate
        return 2 * unit * roll_cost + _COST_FOLD
    return nroll_single * unit * roll_cost + _COST_PRODUCT


def _sep_cost(spec: StencilSpec, roll_cost: float = _COST_ROLL) -> float:
    terms, res = _sep_plan(spec)
    cost = _COST_SPLIT  # hoisted split of the input hi
    for axes in terms:
        for ai, ops in enumerate(axes):
            if ops is None:
                continue
            for kind, d, w4 in ops:
                cost += _entry_cost(kind, d, w4, roll_cost=roll_cost)
            if ai > 0:
                cost += _COST_SPLIT  # re-split of the intermediate
    for kind, off, w4 in res:
        cost += _entry_cost(kind, off, w4, roll_cost=roll_cost)
    return cost


def _dense_cost(spec: StencilSpec,
                roll_cost: float = _COST_ROLL) -> float:
    S = spec.dense_coeffs()
    idxs = np.argwhere(np.abs(S) > 0)
    drs = {int(i[0]) for i in idxs}
    cost = len(drs) * 4 * roll_cost  # memoized row rolls of 4 views
    for idx in idxs:
        r = spec.radius
        if int(idx[1]) - r:
            cost += 4 * roll_cost
        cost += _COST_PRODUCT
    return cost


def pick_algorithm(spec: StencilSpec) -> str:
    """'auto' resolution for the 2-D pair kernel: separable when its
    static op count beats the dense roll path (e.g. star2d1r 33 dense
    taps vs 2x5-tap convs + 8-point residue, pairs folded)."""
    return "vpu_sep" if _sep_cost(spec) < _dense_cost(spec) else (
        "vpu_roll")


def df64_cost_per_cell(spec: StencilSpec, algorithm: str,
                       arith_only: bool = False) -> float:
    """Static cost units/cell/step of the pair kernel that actually
    runs for ``spec``.

    ``arith_only=True`` excludes the roll ops: that is the ROOFLINE
    model (governing bound = arithmetic units x the probe-derived
    MEASURED['vpu_df64_arith_units_teraops'] rate -- rolls overlap
    with the EFT arithmetic in real kernels per the
    tools/df64_eft_probe.py axis triple).  With rolls priced (the
    default) the cost ranks algorithm choices for pick_algorithm.

    1-D walks the lanes kernel's real folded-tap entries (one aligned
    roll per view per tap); 3-D and 2-D 'vpu_sep' use the separable
    plan cost (the 3-D slab kernel runs the same _sep_plan per plane);
    2-D roll/slice paths use the dense-chain cost."""
    roll_cost = 0.0 if arith_only else _COST_ROLL
    if spec.ndim == 1:
        from .pallas_1d import _dense_taps

        cost = _COST_SPLIT  # hoisted split of hi
        for kind, d, w4 in _fold_taps(_dense_taps(spec)):
            cost += _entry_cost(kind, d, w4, roll_cost=roll_cost)
        return cost
    if spec.ndim == 3 or algorithm == "vpu_sep":
        return _sep_cost(spec, roll_cost=roll_cost)
    return _dense_cost(spec, roll_cost=roll_cost)


def _pair_scale(zh, zl, w4, split=None):
    """(zh, zl) * w for a static split weight w4 = (w_h, w_l, b_h, b_l).

    EXACT shortcuts for w == +-1 (identity / negation of both words --
    zero flops resp. two); otherwise the exact-partial-product multiply,
    splitting zh on the fly unless ``split`` carries precomputed
    (zhs, zhl) halves."""
    w_h, w_l = w4[0], w4[1]
    if (w_h, w_l) == (1.0, 0.0):
        return zh, zl
    if (w_h, w_l) == (-1.0, 0.0):
        return -zh, -zl
    zhs, zhl = veltkamp_split(zh) if split is None else split
    return _tap_product(zhs, zhl, zl, zh, (0, 0) + w4)


def _tap_product(xs, xl2, xlo, x, tap):
    """Exact-partial-product df64 multiply of a shifted state pair by a
    static tap (ops/df64.dense_step's one_tap body; see its FMA-hazard
    docstring -- contraction cannot change any value here)."""
    _, _, w_h, w_l, b_h, b_l = tap
    q1 = xs * b_h
    q3 = xl2 * b_h
    c = xlo * w_h
    if w_l != 0.0:
        c = c + x * w_l
    if b_l != 0.0:
        q2 = xs * b_l
        q4 = xl2 * b_l
        t1, u1 = two_sum(q2, q3)
        ph, pe = two_sum(q1, t1)
        pl_ = pe + ((u1 + q4) + c)
    else:
        ph, pe = two_sum(q1, q3)
        pl_ = pe + c
    return ph, pl_


def dense_pair_conv(hi, lo, his, hil, taps):
    """One dense df64 stencil application at the FULL extent of the
    pair state: aligned cyclic rolls; row rolls of the four state views
    are memoized across taps sharing dr.  Wrap garbage reaches
    ``radius`` cells from each edge -- callers mask / slice it off
    (guard >= radius).  ``his``/``hil`` are the exact 12-bit halves of
    ``hi`` (split hoisted, shared by every tap's partials).  Shared by
    the tiled window kernel and the resident kernel."""
    WR, WC = hi.shape
    views = (his, hil, lo, hi)
    rowroll = {}

    def rolled(dr, dc):
        if (dr, 0) not in rowroll:
            rowroll[(dr, 0)] = tuple(
                pltpu.roll(v, (-dr) % WR, 0) if dr else v
                for v in views)
        vs = rowroll[(dr, 0)]
        if dc:
            vs = tuple(pltpu.roll(v, (-dc) % WC, 1) for v in vs)
        return vs

    acc_h = jnp.zeros((WR, WC), jnp.float32)
    acc_l = jnp.zeros((WR, WC), jnp.float32)
    for tap in taps:
        xs, xl2, xlo, x = rolled(tap[0], tap[1])
        ph, pl_ = _tap_product(xs, xl2, xlo, x, tap)
        acc_h, acc_l = df_add(acc_h, acc_l, ph, pl_)
    return acc_h, acc_l


def sep_pair_conv(hi, lo, his, hil, spec):
    """One SEPARABLE low-rank df64 stencil application at the FULL
    extent of the pair state: per term a df64 column conv into an
    intermediate pair, ONE Veltkamp re-split, a df64 row conv; then the
    sparse residue.  Symmetric taps +-d fold into one product via an
    exact-class pair add.  Wrap garbage composes: the col conv dirties
    <= radius rows at the edge, the row conv <= radius cols -- both
    inside the guard margin callers cut off (guard >= radius).  Shared
    by the tiled window kernel and the resident kernel."""
    WR, WC = hi.shape
    terms, res_entries = _sep_plan(spec)
    cache = {}

    def rolled(tag, arr, dr, dc):
        key = (tag, dr, dc)
        if key not in cache:
            v = arr
            if dr % WR:
                v = pltpu.roll(v, (-dr) % WR, 0)
            if dc % WC:
                v = pltpu.roll(v, (-dc) % WC, 1)
            cache[key] = v
        return cache[key]

    def conv_axis(ops, axis, vh, vl, vhs, vhl, tag):
        """df64 1-D correlation along `axis` of the pair (vh, vl);
        vhs/vhl are the exact 12-bit halves of vh (split hoisted by
        the caller, shared across this axis's taps)."""
        ah = al = None
        for kind, d, w4 in ops:
            dr, dc = (d, 0) if axis == 0 else (0, d)
            if kind == "pair":
                zh, zl = df_add(
                    rolled(tag + "h", vh, dr, dc),
                    rolled(tag + "l", vl, dr, dc),
                    rolled(tag + "h", vh, -dr, -dc),
                    rolled(tag + "l", vl, -dr, -dc))
                ph, pl_ = _pair_scale(zh, zl, w4)
            elif d == 0:
                ph, pl_ = _pair_scale(vh, vl, w4, split=(vhs, vhl))
            elif (abs(w4[0]), w4[1]) == (1.0, 0.0):
                # w == +-1: the shifted pair itself (no product)
                ph, pl_ = _pair_scale(rolled(tag + "h", vh, dr, dc),
                                      rolled(tag + "l", vl, dr, dc),
                                      w4)
            else:
                xs = rolled(tag + "hs", vhs, dr, dc)
                xl2 = rolled(tag + "hl", vhl, dr, dc)
                xlo = rolled(tag + "l", vl, dr, dc)
                # xs + xl2 == the rolled vh, exactly (split identity)
                ph, pl_ = _pair_scale(xs + xl2, xlo, w4,
                                      split=(xs, xl2))
            ah, al = ((ph, pl_) if ah is None
                      else df_add(ah, al, ph, pl_))
        if ah is None:
            ah = al = jnp.zeros((WR, WC), jnp.float32)
        return ah, al

    acc_h = acc_l = None
    for t_i, (col_ops, row_ops) in enumerate(terms):
        if col_ops is not None:
            yh, yl = conv_axis(col_ops, 0, hi, lo, his, hil, "x")
        else:
            yh, yl = hi, lo
        if row_ops is not None:
            if col_ops is None:
                yhs, yhl, tag = his, hil, "x"
            else:
                yhs, yhl = veltkamp_split(yh)
                tag = f"y{t_i}"
            yh, yl = conv_axis(row_ops, 1, yh, yl, yhs, yhl, tag)
        acc_h, acc_l = ((yh, yl) if acc_h is None
                        else df_add(acc_h, acc_l, yh, yl))
    for kind, off, w4 in res_entries:
        dr, dc = off
        if kind == "pair":
            zh, zl = df_add(rolled("xh", hi, dr, dc),
                            rolled("xl", lo, dr, dc),
                            rolled("xh", hi, -dr, -dc),
                            rolled("xl", lo, -dr, -dc))
            ph, pl_ = _pair_scale(zh, zl, w4)
        elif (dr, dc) == (0, 0):
            ph, pl_ = _pair_scale(hi, lo, w4, split=(his, hil))
        elif (abs(w4[0]), w4[1]) == (1.0, 0.0):
            ph, pl_ = _pair_scale(rolled("xh", hi, dr, dc),
                                  rolled("xl", lo, dr, dc), w4)
        else:
            xs = rolled("xhs", his, dr, dc)
            xl2 = rolled("xhl", hil, dr, dc)
            xlo = rolled("xl", lo, dr, dc)
            ph, pl_ = _pair_scale(xs + xl2, xlo, w4,
                                  split=(xs, xl2))
        acc_h, acc_l = ((ph, pl_) if acc_h is None
                        else df_add(acc_h, acc_l, ph, pl_))
    if acc_h is None:
        acc_h = acc_l = jnp.zeros((WR, WC), jnp.float32)
    return acc_h, acc_l


def _df64_kernel(
    in_hbm,
    donor_hbm,  # aliased to out; never read
    *rest,
    spec: StencilSpec,
    layout: Layout2D,
    taps,
    algorithm: str,
    has_bounds: bool,
):
    bounds_ref = None
    if has_bounds:
        bounds_ref = rest[0]
        rest = rest[1:]
    out_hbm = rest[0]
    win = rest[1]       # (2, 2, TM+2HR, TN+2HC) dbl-buffered pair windows
    out_tile = rest[2]  # (2, 2, TM, TN)
    sem_in = rest[3]
    sem_out = rest[4]

    TM, TN = layout.tile
    m, n = layout.interior
    r0, c0 = layout.origin
    HR, HC = layout.guard
    WR, WC = TM + 2 * HR, TN + 2 * HC

    gi, gj = layout.grid
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    idx = ti * gj + tj
    total = gi * gj
    slot = jax.lax.rem(idx, jnp.int32(2))

    def in_dma(t_i, t_j, s):
        return pltpu.make_async_copy(
            in_hbm.at[
                :,
                pl.ds(r0 + t_i * TM - HR, WR),
                pl.ds(c0 + t_j * TN - HC, WC),
            ],
            win.at[s],
            sem_in.at[s],
        )

    def out_dma(t_i, t_j, s):
        return pltpu.make_async_copy(
            out_tile.at[s],
            out_hbm.at[:, pl.ds(r0 + t_i * TM, TM),
                       pl.ds(c0 + t_j * TN, TN)],
            sem_out.at[s],
        )

    # double-buffered window prefetch (the fp32 kernel's pipeline)
    @pl.when(idx == 0)
    def _prologue():
        in_dma(0, 0, 0).start()

    nidx = idx + 1
    nti = jax.lax.div(nidx, jnp.int32(gj))
    ntj = jax.lax.rem(nidx, jnp.int32(gj))

    @pl.when(nidx < total)
    def _prefetch():
        in_dma(nti, ntj, jax.lax.rem(nidx, jnp.int32(2))).start()

    in_dma(ti, tj, slot).wait()

    W = win[pl.ds(slot, 1)][0]  # (2, WR, WC)
    hi, lo = W[0], W[1]
    # hoisted exact halves of hi (shared by every tap's partials)
    his, hil = veltkamp_split(hi)

    if has_bounds:
        b_rlo, b_rhi = bounds_ref[0], bounds_ref[1]
        b_clo, b_chi = bounds_ref[2], bounds_ref[3]
    else:
        b_rlo, b_rhi, b_clo, b_chi = 0, m, 0, n

    def mask(val, er, ec):
        R, C = TM + 2 * er, TN + 2 * ec
        gr = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) + ti * TM - er
        gc = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + tj * TN - ec
        val = val * ((gr >= b_rlo) & (gr < b_rhi)).astype(val.dtype)
        return val * ((gc >= b_clo) & (gc < b_chi)).astype(val.dtype)

    if algorithm == "vpu_roll":
        acc_h, acc_l = dense_pair_conv(hi, lo, his, hil, taps)
        acc_h = mask(acc_h, HR, HC)[HR: HR + TM, HC: HC + TN]
        acc_l = mask(acc_l, HR, HC)[HR: HR + TM, HC: HC + TN]
    elif algorithm == "vpu_sep":
        acc_h, acc_l = sep_pair_conv(hi, lo, his, hil, spec)
        acc_h = mask(acc_h, HR, HC)[HR: HR + TM, HC: HC + TN]
        acc_l = mask(acc_l, HR, HC)[HR: HR + TM, HC: HC + TN]
    else:  # 'vpu': statically shifted slices at the tile extent
        acc_h = jnp.zeros((TM, TN), jnp.float32)
        acc_l = jnp.zeros((TM, TN), jnp.float32)
        for tap in taps:
            dr, dc = tap[0], tap[1]
            sl = (slice(HR + dr, HR + dr + TM),
                  slice(HC + dc, HC + dc + TN))
            ph, pl_ = _tap_product(his[sl], hil[sl], lo[sl], hi[sl], tap)
            acc_h, acc_l = df_add(acc_h, acc_l, ph, pl_)
        acc_h = mask(acc_h, 0, 0)
        acc_l = mask(acc_l, 0, 0)

    @pl.when(idx >= 2)
    def _drain_prev():
        pti = jax.lax.div(idx - 2, jnp.int32(gj))
        ptj = jax.lax.rem(idx - 2, jnp.int32(gj))
        out_dma(pti, ptj, slot).wait()

    out_tile[slot, 0] = acc_h
    out_tile[slot, 1] = acc_l
    out_dma(ti, tj, slot).start()

    for q in range(2):
        @pl.when((idx == total - 1) & (total >= q + 1))
        def _drain_tail(q=q):
            pti = jax.lax.div(idx - q, jnp.int32(gj))
            ptj = jax.lax.rem(idx - q, jnp.int32(gj))
            out_dma(pti, ptj, jax.lax.rem(idx - q, jnp.int32(2))).wait()


@functools.partial(
    jax.jit,
    static_argnames=("spec", "layout", "interpret", "algorithm"),
)
def df64_step(
    cur2: jax.Array,
    donor2: jax.Array,
    spec: StencilSpec,
    layout: Layout2D,
    interpret: bool = False,
    algorithm: str = "vpu_roll",
    bounds: "jax.Array | None" = None,
) -> jax.Array:
    """One df64 stencil step on stacked (2, Mp, Np) fp32 internal state.

    ``donor2`` is the zero-ringed spare buffer (aliased to the output:
    halo cells decay to zero after the step, reference semantics).
    ``bounds`` (optional, (4,) int32): dynamic global-interior bounds in
    local coordinates for domain-decomposed runs."""
    layout.validate()
    assert cur2.ndim == 3 and cur2.shape[0] == 2, cur2.shape
    assert cur2.dtype == jnp.float32
    if interpret and layout.grid == (1, 1):
        # XLA:CPU inlines the trip-1 grid-emulation loop and its
        # elemental fusion re-expands the df64 tap chain per use --
        # compile time explodes (>5 min vs ~2 s at >= 2 tiles; the
        # engine splits default tiles, see StencilEngine._build_layout)
        raise ValueError(
            "df64 interpret mode needs a >= 2-tile grid (single-tile "
            "grids hit an XLA:CPU compile blowup); split the tile or "
            "use backend='xla'")
    if algorithm not in ("vpu", "vpu_roll", "vpu_sep"):
        raise ValueError(
            f"df64 kernel algorithm must be 'vpu', 'vpu_roll' or "
            f"'vpu_sep', got {algorithm!r} (the MXU has no error-free "
            f"product path)")
    assert spec.radius <= min(layout.guard), "window guard < radius"
    TM, TN = layout.tile
    taps = _tap_table(spec)
    kernel = functools.partial(
        _df64_kernel,
        spec=spec, layout=layout, taps=taps, algorithm=algorithm,
        has_bounds=bounds is not None,
    )
    bounds_args = [] if bounds is None else [jnp.asarray(bounds, jnp.int32)]
    bounds_specs = [] if bounds is None else [
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    HR, HC = layout.guard
    return pl.pallas_call(
        kernel,
        grid=layout.grid,
        out_shape=jax.ShapeDtypeStruct(cur2.shape, cur2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + bounds_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, TM + 2 * HR, TN + 2 * HC), jnp.float32),
            pltpu.VMEM((2, 2, TM, TN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
    )(cur2, donor2, *bounds_args)


def _resident_pair_2d_kernel(in_ref, out_ref, *, spec, layout: Layout2D,
                             taps, algorithm: str, steps: int):
    """ALL ``steps`` df64 timesteps on a VMEM-resident 2-D pair grid
    (the 2-D twin of pallas_df64_1d._resident_pair_kernel).

    Each step is one full-buffer pair conv (dense rolls or the
    separable plan) + the interior mask; wrap garbage reaches <= radius
    cells from the buffer edge, which the guard ring keeps outside the
    interior, and the mask re-zeroes it every step (the reference's
    decaying Dirichlet-0 halo).  Steps go through the (aliased) output
    ref -- value chains across the run make Mosaic keep every step's
    EFT temporaries live at once -- and the out VMEM buffer starts
    UNINITIALIZED on the real backend despite the HBM alias (the 1-D
    resident pair kernel's measured gotcha, PERF r9 8b), so it seeds
    from in_ref first."""
    m, n = layout.interior
    r0, c0 = layout.origin
    R, C = layout.shape
    gr = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) - r0
    gc = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) - c0
    rmask = ((gr >= 0) & (gr < m)).astype(jnp.float32)
    cmask = ((gc >= 0) & (gc < n)).astype(jnp.float32)

    out_ref[0] = in_ref[0]
    out_ref[1] = in_ref[1]

    def body(_, carry):
        hi = out_ref[0]
        lo = out_ref[1]
        his, hil = veltkamp_split(hi)
        if algorithm == "vpu_sep":
            acc_h, acc_l = sep_pair_conv(hi, lo, his, hil, spec)
        else:
            acc_h, acc_l = dense_pair_conv(hi, lo, his, hil, taps)
        out_ref[0] = acc_h * rmask * cmask
        out_ref[1] = acc_l * rmask * cmask
        return carry

    jax.lax.fori_loop(0, steps, body, 0)


# whole-pair-grid residency cap: buffer bytes (both pair planes).
# DEFAULT 0 (off): the round-5 device sweep measured the resident pair
# kernel SLOWER than the tiled pair pipeline at every small-grid size
# (star2d1r df64: 2.3 vs 2.9 at 64x128, 4.1 vs 4.4 at 128x256, 4.5-3.8
# vs 5.7-5.0 at 512x512/256x256) -- the tiled path's whole run is
# already one jitted program (see pallas_2d.RESIDENT_2D_BYTES).
# Available for A/B via LORASTENCIL_RESIDENT2D_PAIR_KB.
RESIDENT_PAIR_2D_BYTES = int(os.environ.get(
    "LORASTENCIL_RESIDENT2D_PAIR_KB", "0")) * 1024


def fits_resident_pair_2d(layout) -> bool:
    if not isinstance(layout, Layout2D) or layout.extra_row_tiles:
        return False
    R, C = layout.shape
    return 2 * R * C * 4 <= RESIDENT_PAIR_2D_BYTES


@functools.partial(
    jax.jit,
    static_argnames=("spec", "layout", "interpret", "algorithm", "steps"),
)
def stencil2d_resident_pair(
    cur2: jax.Array,
    spec: StencilSpec,
    layout: Layout2D,
    steps: int,
    interpret: bool = False,
    algorithm: str = "vpu_sep",
) -> jax.Array:
    """ALL ``steps`` df64 timesteps in ONE kernel on a VMEM-resident
    2-D pair grid.

    The small-grid fast path (round-5 VERDICT item 6): one dispatch per
    RUN instead of one ~1 ms tunnel dispatch per step -- the df64 twin
    of the reference's small-grid CHECK regime running at L2-resident
    launch rate (``/root/reference/src/2d/main.cu:282-328``)."""
    layout.validate()
    assert cur2.ndim == 3 and cur2.shape[0] == 2, cur2.shape
    assert cur2.dtype == jnp.float32
    assert fits_resident_pair_2d(layout), "pair grid too large"
    assert spec.radius <= min(layout.guard), "guard ring < radius"
    if algorithm not in ("vpu", "vpu_roll", "vpu_sep"):
        raise ValueError(
            f"df64 kernel algorithm must be 'vpu', 'vpu_roll' or "
            f"'vpu_sep', got {algorithm!r}")
    kernel = functools.partial(
        _resident_pair_2d_kernel, spec=spec, layout=layout,
        taps=_tap_table(spec),
        algorithm="vpu_sep" if algorithm == "vpu_sep" else "vpu_roll",
        steps=steps,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(cur2.shape, cur2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
    )(cur2)


def _vmem_limit() -> int:
    from .pallas_2d import vmem_limit_bytes

    return vmem_limit_bytes()
