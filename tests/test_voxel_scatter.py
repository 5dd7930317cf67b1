"""voxel_scatter.scatter_max_dense vs the XLA scatter-max oracle.

The kernel is the TPU-native replacement for the voxelizer's
imageAtomicMax (ref: Resource/Shaders/VXGI/Voxelize/fragment.glsl:68-80);
here it runs in Pallas interpret mode on the CPU test platform.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idkengine_tpu.ops.voxel_scatter import scatter_max_dense


def _oracle(cell, vals, n_cells):
    return jnp.zeros((vals.shape[0], n_cells)).at[:, cell].max(vals)


@pytest.mark.parametrize("n,n_cells", [(1, 128), (700, 2048),
                                       (5000, 16384), (3000, 128 * 256)])
def test_matches_xla_scatter_max(n, n_cells):
    rng = np.random.default_rng(n)
    cell = jnp.asarray(rng.integers(0, n_cells, n), jnp.int32)
    vals = jnp.asarray(rng.uniform(0, 10, (4, n)), jnp.float32)
    got = scatter_max_dense(cell, vals, n_cells, interpret=True)
    want = _oracle(cell, vals, n_cells)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_heavy_duplicates_one_cell():
    # all updates land in one cell: max must win, not sum
    n_cells = 4096
    cell = jnp.full((999,), 77, jnp.int32)
    vals = jnp.asarray(np.linspace(0, 5, 999 * 2).reshape(2, 999),
                       jnp.float32)
    got = scatter_max_dense(cell, vals, n_cells, interpret=True)
    want = _oracle(cell, vals, n_cells)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware-mode (interpret=False) Mosaic DMA "
                           "layout is only checkable on a real TPU")
@pytest.mark.parametrize("n,n_cells,nch", [
    (700, 2048, 4),            # single block, single sub-batch
    (5000, 16384, 4),          # single block, multiple GS*128 sub-batches
    (300_000, 128 * 16384, 4),  # 128 blocks, straddling rows
    # n_cells > 2^24: cell ids are NOT exact in f32 — exercises the
    # integer (crow & 127) lane extraction (advisor r3 medium finding)
    (20_000, (1 << 24) + 2 * 128 * 128, 1),
])
def test_hardware_mode_matches_oracle(n, n_cells, nch):
    rng = np.random.default_rng(n)
    # bias ids toward the top of the grid so the >2^24 case hits inexact-
    # in-f32 ids with certainty
    cell = jnp.asarray(n_cells - 1 - rng.integers(0, n_cells, n), jnp.int32)
    vals = jnp.asarray(rng.uniform(0, 10, (nch, n)), jnp.float32)
    got = scatter_max_dense(cell, vals, n_cells, interpret=False)
    want = _oracle(cell, vals, n_cells)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bf16_mode_rounds_values_only():
    rng = np.random.default_rng(3)
    n, n_cells = 2000, 8192
    cell = jnp.asarray(rng.integers(0, n_cells, n), jnp.int32)
    vals = jnp.asarray(rng.uniform(0, 100, (3, n)), jnp.float32)
    got = scatter_max_dense(cell, vals, n_cells, bf16=True, interpret=True)
    want = _oracle(cell, vals, n_cells)
    # each element is a single product: exact up to bf16 rounding of vals
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-2, atol=1e-6)
