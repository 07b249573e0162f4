"""Pallas TPU kernel: in-place row scatter via 8-row-block DMA.

XLA:TPU lowers a row scatter into a large table as a full-table pass
(bandwidth-bound: ~1.8 ms per scatter at 1M x 256 on v5e, measured in
round 2 -- see docs/benchmarks.md). The row-sparse optimizer runs six
such scatters per step, so at msd-big scale the scatters are 82% of
the step.

This kernel writes only the 8-row blocks that contain updated rows:
Mosaic cannot DMA single rows of an (8, 128)-tiled HBM table (the
round-1 blocker), but 8-row-aligned block DMAs are expressible. The
host-side plan (pure XLA, O(W log W)) groups the updated rows by
block, gathers those blocks, merges the new rows in, and the kernel
DMAs the merged blocks back into the aliased table -- traffic is
O(touched blocks), not O(table).

Layout requirements: table rows % 8 == 0 and features % 128 == 0 --
exactly what sparse-instantiated models guarantee (models/base.pad_dim
/ pad_features). Row ids must be in-bounds; duplicates are allowed iff
they carry identical payloads (true for the union's sentinel tail).

Status: EXPERIMENTAL / UNWIRED. Correct (device-verified vs the XLA
scatter) but measured SLOWER on v5e at every realistic shape
(value per donated scatter call, 1M x 256 table):

  W=16384: XLA 1.83 ms   this kernel 3.19 ms
  W= 4096: XLA 0.90 ms   this kernel 1.44 ms
  W= 1024: XLA 0.81 ms   this kernel 0.87 ms

XLA's scatter floor is a single full-table write pass (~0.8 ms =
800 MB at HBM speed) and its emitter adds only the W-proportional
read-modify traffic above that; this kernel's gather+merge prep and
per-block DMA overheads exceed the full-pass savings until the touched
fraction is far below anything the training workload produces. Kept
(with tests/test_block_scatter.py) as the baseline to re-measure when
Mosaic DMA overheads change.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 8
# blocks written per grid step; DMA issue overhead amortizes across the
# batch while VMEM holds K * 8 * d floats (K=32, d=256 -> 256 KB)
BLOCKS_PER_STEP = 128


def _write_kernel(ids_ref, n_ref, table_in_ref, blocks_ref, table_ref,
                  sems, *, K):
  del table_in_ref  # aliased with table_ref; kernel only writes
  i = pl.program_id(0)
  n_real = n_ref[0]
  dmas = []
  for k in range(K):
    g = i * K + k
    bid = ids_ref[g]
    start = pl.multiple_of(bid * BLOCK_ROWS, BLOCK_ROWS)
    dma = pltpu.make_async_copy(
        blocks_ref.at[k],
        table_ref.at[pl.ds(start, BLOCK_ROWS), :],
        sems.at[k])
    dmas.append((g, dma))

    @pl.when(g < n_real)
    def _():
      dma.start()

  for g, dma in dmas:
    @pl.when(g < n_real)
    def _():
      dma.wait()


def plan_block_scatter(ids, num_rows, width):
  """Host-side (XLA) plan shared across tables updated with one id set.

  Args:
    ids: int32 [W] row ids (in-bounds; duplicates must carry identical
      payloads).
    num_rows: table row count (multiple of 8).
    width: static number of plan slots (>= number of distinct blocks;
      W always suffices).

  Returns a dict consumed by :func:`apply_block_scatter`.
  """
  n_blocks = num_rows // BLOCK_ROWS
  b_of = ids // BLOCK_ROWS
  # distinct touched blocks, padded with the out-of-range block id
  # n_blocks (skipped by the kernel's n_real guard)
  ublocks, inv = jnp.unique(b_of, size=width, fill_value=n_blocks,
                            return_inverse=True)
  n_real = jnp.sum(ublocks < n_blocks).astype(jnp.int32)
  pad = (-width) % BLOCKS_PER_STEP
  if pad:
    ublocks = jnp.concatenate(
        [ublocks, jnp.full((pad,), n_blocks, ublocks.dtype)])
  return {'ublocks': ublocks.astype(jnp.int32),
          'inv': inv.astype(jnp.int32),
          'row_in_block': (ids % BLOCK_ROWS).astype(jnp.int32),
          'n_real': jnp.reshape(n_real, (1,)),
          'gather_ids': jnp.minimum(ublocks, n_blocks - 1)}


def apply_block_scatter(table, plan, new_rows):
  """``table.at[ids].set(new_rows)`` touching only the blocks in plan.

  ``table`` is donated/aliased: the untouched rows are never read or
  written.
  """
  N, d = table.shape
  assert N % BLOCK_ROWS == 0 and d % 128 == 0, (N, d)
  U = plan['ublocks'].shape[0]
  K = BLOCKS_PER_STEP

  # gather the touched blocks and merge the new rows in (content of the
  # pad/never-written gather slots is irrelevant)
  blocks = table.reshape(N // BLOCK_ROWS, BLOCK_ROWS, d).at[
      plan['gather_ids']].get(mode='promise_in_bounds')
  blocks = blocks.at[plan['inv'], plan['row_in_block']].set(new_rows)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,  # (ublocks, n_real)
      grid=(U // K,),
      in_specs=[
          pl.BlockSpec(memory_space=pltpu.ANY),      # table (aliased)
          pl.BlockSpec((K, BLOCK_ROWS, d), lambda i, *_: (i, 0, 0),
                       memory_space=pltpu.VMEM),     # merged blocks
      ],
      out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
      scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
  )
  return pl.pallas_call(
      functools.partial(_write_kernel, K=K),
      out_shape=jax.ShapeDtypeStruct((N, d), table.dtype),
      grid_spec=grid_spec,
      input_output_aliases={2: 0},  # table (after 2 scalar-prefetch args)
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary',)),
  )(plan['ublocks'], plan['n_real'], table, blocks)


def supported(table_shape, backend=None):
  """True when the kernel's layout requirements hold on this backend."""
  N, d = table_shape
  if N % BLOCK_ROWS or d % 128:
    return False
  backend = backend or jax.default_backend()
  return backend in ('tpu', 'axon')
