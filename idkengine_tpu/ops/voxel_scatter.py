"""Dense per-cell max-scatter — the TPU-native `imageAtomicMax`.

Role in the reference: the voxelizer writes each fragment's radiance into
the 3D grid with `imageAtomicMax` (flicker-free winner-takes-max combine,
/root/reference/IDKEngine/Resource/Shaders/VXGI/Voxelize/fragment.glsl:68-80,
Voxelizer.cs:109-208). XLA's `scatter-max` on TPU costs ~90 ns/update with
no fast path for sorted or unique indices (tools/bench_scatter.py) — 94 ms
for the 1M-update VXGI injection, 7-27x the reference's whole voxelize pass.

TPU-native re-design (no atomics, no per-element scatter):

  1. sort updates by cell id (`jax.lax.sort`, multi-operand);
  2. per-cell max via a SEGMENTED MAX SCAN (associative_scan over
     (start_flag, value) pairs) keeping the max only at each segment's
     last element, zero elsewhere — after this, SUM-combine == MAX-combine
     because every cell's max appears exactly once (values must be >= 0);
  3. a Pallas kernel turns the sorted, deduped update stream into dense
     grid blocks with ONE-HOT MATMULS on the MXU: for a block of
     SUBROWS*128 cells, a (K, SUBROWS) row-one-hot contracted against a
     (K, 128) lane-masked value matrix yields the block's dense (SUBROWS,
     128) update image. Each grid program owns a disjoint block (updates
     are sorted, so per-block update ranges come from one searchsorted),
     accumulating sub-batches of K updates with double-buffered DMA.
     Out-of-block cells (the padding sentinel, or rounding slop) simply
     miss the row one-hot — no explicit masking needed.

Every output element is the sum of at most ONE nonzero product, so the
matmul is exact in f32, and exact-to-bf16-rounding in bf16 (the one-hot is
exact in either dtype); bf16 halves MXU time and matches the reference's
rgba16f storage precision.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KSUB = 1024  # updates per in-kernel sub-batch (MXU contraction depth)


def _segmented_max_keep_last(cell_sorted, vals_sorted):
    """Per-segment max over runs of equal sorted cells; the max lands on
    each run's LAST element, all other elements become 0."""
    start = jnp.concatenate(
        [jnp.ones((1,), bool), cell_sorted[1:] != cell_sorted[:-1]])[:, None]

    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.maximum(va, vb))

    _, run_max = jax.lax.associative_scan(op, (start, vals_sorted))
    is_end = jnp.concatenate(
        [cell_sorted[1:] != cell_sorted[:-1], jnp.ones((1,), bool)])
    return jnp.where(is_end[..., None], run_max, 0.0)


def _make_kernel(nch: int, subrows: int, compute_dtype):
    def kernel(starts_ref, cells_hbm, vals_hbm, out_ref,
               cbuf0, cbuf1, vbuf0, vbuf1, sems):
        i = pl.program_id(0)
        s = starts_ref[i]
        e = starts_ref[i + 1]
        base = i * subrows * 128
        nb = (e - s + KSUB - 1) // KSUB
        bufs = ((cbuf0, vbuf0), (cbuf1, vbuf1))

        def start_dma(j, b):
            off = s + j * KSUB
            cb, vb = bufs[b]
            pltpu.make_async_copy(cells_hbm.at[pl.ds(off, KSUB)],
                                  cb, sems.at[2 * b]).start()
            pltpu.make_async_copy(vals_hbm.at[pl.ds(off, KSUB)],
                                  vb, sems.at[2 * b + 1]).start()

        @pl.when(nb > 0)
        def _():
            start_dma(0, 0)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (KSUB, 128), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (KSUB, subrows), 1)

        def body(j, acc):
            for b in (0, 1):
                @pl.when(jax.lax.rem(j, 2) == b)
                def _(b=b):
                    cb, vb = bufs[b]
                    pltpu.make_async_copy(
                        cells_hbm.at[pl.ds(s + j * KSUB, KSUB)], cb,
                        sems.at[2 * b]).wait()
                    pltpu.make_async_copy(
                        vals_hbm.at[pl.ds(s + j * KSUB, KSUB)], vb,
                        sems.at[2 * b + 1]).wait()

            @pl.when(j + 1 < nb)
            def _():
                for b in (0, 1):
                    @pl.when(jax.lax.rem(j + 1, 2) == b)
                    def _(b=b):
                        start_dma(j + 1, b)

            def consume(b):
                def inner(acc):
                    cb, vb = bufs[b]
                    # out-of-block locs (incl. the sentinel padding) match
                    # no row => contribute nothing
                    loc = cb[:] - base                        # (KSUB,1)
                    lane1h = jnp.where(lane_iota == (loc & 127), 1.0, 0.0)
                    row1h = jnp.where(row_iota == (loc >> 7),
                                      1.0, 0.0).astype(compute_dtype)
                    outs = []
                    for ch in range(nch):
                        v = vb[:, ch:ch + 1]                  # (KSUB,1)
                        mc = (lane1h * v).astype(compute_dtype)
                        outs.append(jax.lax.dot_general(
                            row1h, mc, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32))
                    return acc + jnp.concatenate(outs, axis=1)
                return inner

            return jax.lax.cond(jax.lax.rem(j, 2) == 0,
                                consume(0), consume(1), acc)

        acc0 = jnp.zeros((subrows, nch * 128), jnp.float32)
        acc = jax.lax.fori_loop(0, nb, body, acc0)
        for ch in range(nch):
            out_ref[ch, 0] = acc[:, ch * 128:(ch + 1) * 128]

    return kernel


@partial(jax.jit, static_argnames=("n_cells", "bf16", "interpret"))
def scatter_max_dense(cell, vals, n_cells: int, bf16: bool = False,
                      interpret: bool = False):
    """Per-cell MAX of non-negative values into a dense (C, n_cells) grid.

    cell: (N,) int32 in [0, n_cells); vals: (C, N) float32, all >= 0.
    Equivalent to `zeros((C, n_cells)).at[:, cell].max(vals)` (the XLA
    form this replaces — ~90 ns/update vs a few ns here at 1M updates).
    n_cells must be a multiple of 128; bf16 rounds values to bfloat16
    (matches the reference's rgba16f voxel storage).
    """
    assert n_cells % 128 == 0, n_cells
    nch = vals.shape[0]
    n = cell.shape[0]
    subrows = min(128, n_cells // 128)
    assert n_cells % (subrows * 128) == 0, (n_cells, subrows)
    nblocks = n_cells // (subrows * 128)

    order = (cell, *(vals[c] for c in range(nch)))
    sorted_ops = jax.lax.sort(order, num_keys=1)
    cs = sorted_ops[0]
    vs = jnp.stack(sorted_ops[1:], axis=-1)  # (N, C)
    vs = _segmented_max_keep_last(cs, vs)

    pad = (-n) % KSUB + KSUB
    cs = jnp.concatenate([cs, jnp.full((pad,), n_cells, jnp.int32)])
    vs = jnp.concatenate([vs, jnp.zeros((pad, nch), vs.dtype)])

    bounds = jnp.arange(nblocks + 1, dtype=jnp.int32) * (subrows * 128)
    starts = jnp.searchsorted(cs, bounds, side="left").astype(jnp.int32)

    compute_dtype = jnp.bfloat16 if bf16 else jnp.float32
    out = pl.pallas_call(
        _make_kernel(nch, subrows, compute_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((nch, 1, subrows, 128),
                                   lambda i, starts: (0, i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((KSUB, 1), jnp.int32),
                pltpu.VMEM((KSUB, 1), jnp.int32),
                pltpu.VMEM((KSUB, nch), jnp.float32),
                pltpu.VMEM((KSUB, nch), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nch, nblocks, subrows, 128),
                                       jnp.float32),
        interpret=interpret,
    )(starts, cs[:, None], vs)
    return out.reshape(nch, n_cells)
