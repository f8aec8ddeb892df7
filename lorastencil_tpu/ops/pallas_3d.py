"""3-D low-rank stencil Pallas kernel (2.5-D blocking).

TPU-native re-design of the reference's 3-D engines
(``/root/reference/src/3d/gpu_star.cu:22-133``, ``gpu_box.cu:21-140``):
each grid step owns one (TM, TN) in-plane tile *for all z* and sweeps the
z axis inside the kernel with a rotating window buffer (the reference's
rotating shared-memory plane pipeline), so each input plane is read from
HBM exactly once per timestep.

Pipeline per z iteration (computing output plane z from planes z-1..z+1):
  * a 4-slot rotating window buffer: plane z+2's DMA was started two
    iterations ago; plane z+3's DMA starts before waiting on z+2, so the
    next plane streams in during compute (the reference's cp.async
    double-buffering, ``gpu_box.cu:21-40``, TPU-style);
  * terms whose z-taps span planes and have a real in-plane conv
    (box3d1r) evaluate the plane conv ONCE per input plane into a
    per-term rotating conv buffer (the reference's rotbuf + scratch
    reuse, ``gpu_box.cu:126-139``);
  * identity-plane terms (star3d1r's z+-1 copies, ``gpu_star.cu:44-54``)
    read window slices; z-centered terms evaluate on the center window;
  * output plane writes double-buffer (drain one plane behind).

In-plane convolutions run on the VPU as exact-fp32 shifted multiply-adds
(``algorithm='vpu'``, default -- bf16 MXU passes cost accuracy) or as
banded MXU GEMMs (``algorithm='mxu'``, band_gemm.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.shapes import StencilSpec
from .band_gemm import apply_spec_vpu, plane_conv, term_band_mats
from .layout import LANE, SUBLANE, Layout3D

WIN_SLOTS = 4  # 3 live planes + 1 streaming in


@dataclasses.dataclass(frozen=True)
class _Plane2D:
    """Adapter exposing one 3-D term's in-plane taps as a 2-axis spec for
    apply_spec_vpu (terms + residue fields only)."""
    terms: tuple
    residue: tuple = ()


def _classify_terms(spec: StencilSpec):
    buffered, identity_z, center = [], [], []
    for i, t in enumerate(spec.terms):
        assert len(t.taps) == 3
        tz = t.taps[0]
        plane_identity = t.taps[1] is None and t.taps[2] is None
        if tz is None:
            center.append(i)
        elif plane_identity:
            identity_z.append(i)
        else:
            buffered.append(i)
    return buffered, identity_z, center


def _stencil3d_kernel(
    in_hbm, donor_hbm, *rest,
    spec: StencilSpec, layout: Layout3D, mats_meta,
    compute_dtype, precision, algorithm,
):
    n_mats = sum(int(a) + int(b) for a, _, b, _ in mats_meta)
    mat_refs = rest[:n_mats]
    out_hbm = rest[n_mats]
    win = rest[n_mats + 1]       # (WIN_SLOTS, TM + 16, TN + 256)
    convbuf = rest[n_mats + 2]   # (n_buffered, 3, TM, TN)
    out_tile = rest[n_mats + 3]  # (2, TM, TN)
    sem_in = rest[n_mats + 4]    # (WIN_SLOTS,)
    sem_out = rest[n_mats + 5]   # (2,)

    TM, TN = layout.tile
    H = layout.interior[0]
    m, n = layout.interior[1], layout.interior[2]
    z0, r0, c0 = layout.origin
    HR, HC = SUBLANE, LANE
    Hp = H + 2 * layout.halo[0]
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    buffered_idx, identity_idx, center_idx = _classify_terms(spec)
    term_mats = {}
    mi = 0
    for t_idx, (has_a, rr, has_b, rc) in enumerate(mats_meta):
        A = B = None
        if has_a:
            A = mat_refs[mi][:]
            mi += 1
        if has_b:
            B = mat_refs[mi][:]
            mi += 1
        term_mats[t_idx] = (A, B, rr, rc)

    UNROLL = 12  # lcm(window ring 4, conv ring 3): slots static per phase

    def plane_dma(zp, slot):
        return pltpu.make_async_copy(
            in_hbm.at[
                zp,
                pl.ds(r0 + ti * TM - HR, TM + 2 * HR),
                pl.ds(c0 + tj * TN - HC, TN + 2 * HC),
            ],
            win.at[slot],
            sem_in.at[slot],
        )

    def out_dma(z, s):
        return pltpu.make_async_copy(
            out_tile.at[s],
            out_hbm.at[z0 + z, pl.ds(r0 + ti * TM, TM),
                       pl.ds(c0 + tj * TN, TN)],
            sem_out.at[s],
        )

    def read_win(slot):
        # static slot -> a view; dynamic slot -> a VMEM copy (avoid!)
        if isinstance(slot, int):
            return win[slot]
        return win[pl.ds(slot, 1)][0]

    def conv_term(t_idx, X):
        if algorithm == "vpu":
            term = spec.terms[t_idx]
            from ..models.shapes import SeparableTerm
            plane_term = SeparableTerm(taps=(term.taps[1], term.taps[2]))
            return apply_spec_vpu(X, _Plane2D(terms=(plane_term,)),
                                  (HR, HC), (0, 0), TM, TN)
        A, B, rr, rc = term_mats[t_idx]
        return plane_conv(X, A, B, rr, rc, HR, HC, TM, TN,
                          compute_dtype, precision)

    # interior mask: separable row/col float vectors (cheap, exact)
    gr = jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0) + ti * TM
    gc = jax.lax.broadcasted_iota(jnp.int32, (1, TN), 1) + tj * TN
    rm = (gr < m).astype(jnp.float32)
    cm = (gc < n).astype(jnp.float32)

    # ---- prologue: stream planes 0..2 (clamped), conv 0 and 1 ----------
    dmas = [plane_dma(min(zp, Hp - 1), zp % WIN_SLOTS) for zp in range(3)]
    for d in dmas:
        d.start()
    dmas[0].wait()
    dmas[1].wait()
    for b, t_idx in enumerate(buffered_idx):
        convbuf[b, 0] = conv_term(t_idx, read_win(0))
        convbuf[b, 1] = conv_term(t_idx, read_win(1))

    # ---- z sweep, unrolled by 12 so every ring index is static ---------
    def sub_iter(z, phase):
        """One output plane; `phase` = static z % UNROLL, so window (mod
        4), conv (mod 3) and out (mod 2) ring slots are compile-time
        constants and scratch reads are views, not VMEM copies."""
        zp2 = z + 2
        slot2 = (phase + 2) % WIN_SLOTS
        nslot = (phase + 3) % WIN_SLOTS

        @pl.when(z + 3 < Hp)
        def _():
            plane_dma(z + 3, nslot).start()

        plane_dma(zp2, slot2).wait()
        for b, t_idx in enumerate(buffered_idx):
            convbuf[b, (phase + 2) % 3] = conv_term(t_idx, read_win(slot2))

        acc = jnp.zeros((TM, TN), jnp.float32)
        zc_phase = phase + 1              # center input plane phase
        for t_idx in center_idx:
            acc = acc + conv_term(t_idx, read_win(zc_phase % WIN_SLOTS))
        for b, t_idx in enumerate(buffered_idx):
            tz = spec.terms[t_idx].taps[0]
            for dz in (-1, 0, 1):
                w = float(tz[1 + dz])
                if w != 0.0:
                    acc = acc + w * convbuf[b, (zc_phase + dz) % 3]
        for t_idx in identity_idx:
            tz = spec.terms[t_idx].taps[0]
            for dz in (-1, 0, 1):
                w = float(tz[1 + dz])
                if w != 0.0:
                    Xs = read_win((zc_phase + dz) % WIN_SLOTS)
                    acc = acc + w * Xs[HR: HR + TM, HC: HC + TN].astype(
                        jnp.float32)
        for (dz, dr, dc), w in spec.residue:
            Xs = read_win((zc_phase + dz) % WIN_SLOTS)
            acc = acc + w * Xs[
                HR + dr: HR + dr + TM, HC + dc: HC + dc + TN
            ].astype(jnp.float32)

        acc = acc * rm * cm
        oslot = phase % 2

        @pl.when(z >= 2)
        def _():
            out_dma(z - 2, oslot).wait()

        out_tile[oslot] = acc.astype(out_tile.dtype)
        out_dma(z, oslot).start()

        @pl.when(z == H - 1)
        def _():
            out_dma(z, oslot).wait()

        @pl.when((z == H - 1) & (H >= 2))
        def _():
            out_dma(z - 1, (phase + 1) % 2).wait()

    def block(bi, _):
        z0b = bi * UNROLL
        for phase in range(UNROLL):
            z = z0b + phase

            @pl.when(z < H)
            def _():
                sub_iter(z, phase)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(H, UNROLL), block, 0)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "layout", "compute_dtype", "precision",
                     "interpret", "algorithm"),
)
def stencil3d_step(
    cur: jax.Array,
    donor: jax.Array,
    spec: StencilSpec,
    layout: Layout3D,
    compute_dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    algorithm: str = "vpu",
) -> jax.Array:
    layout.validate()
    TM, TN = layout.tile

    np_dtype = np.dtype(cur.dtype)
    mats_meta = []
    mat_args = []
    for term in spec.terms:
        A, B = (None, None) if algorithm == "vpu" else \
            term_band_mats(term, np_dtype)
        rr = (len(term.taps[1]) - 1) // 2 if term.taps[1] is not None else 0
        rc = (len(term.taps[2]) - 1) // 2 if term.taps[2] is not None else 0
        mats_meta.append((A is not None, rr, B is not None, rc))
        if A is not None:
            mat_args.append(jnp.asarray(A))
        if B is not None:
            mat_args.append(jnp.asarray(B))
    mats_meta = tuple(mats_meta)

    buffered_idx, _, _ = _classify_terms(spec)
    n_buf = max(1, len(buffered_idx))

    kernel = functools.partial(
        _stencil3d_kernel,
        spec=spec, layout=layout, mats_meta=mats_meta,
        compute_dtype=compute_dtype, precision=precision,
        algorithm=algorithm,
    )
    return pl.pallas_call(
        kernel,
        grid=layout.grid,
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(mat_args),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((WIN_SLOTS, TM + 2 * SUBLANE, TN + 2 * LANE),
                       cur.dtype),
            pltpu.VMEM((n_buf, 3, TM, TN), jnp.float32),
            pltpu.VMEM((2, TM, TN), cur.dtype),
            pltpu.SemaphoreType.DMA((WIN_SLOTS,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cur, donor, *mat_args)
