"""Experimental 8-row-block scatter kernel: interpret-mode equivalence
with the XLA scatter (the kernel is unwired -- see its docstring)."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import recoder_tpu.experiments.block_scatter as bs


def test_block_scatter_matches_xla_set():
  orig = pl.pallas_call

  def interpreted(*a, **k):
    k['interpret'] = True
    return orig(*a, **k)

  with mock.patch.object(pl, 'pallas_call', interpreted):
    rng = np.random.default_rng(0)
    N, d, W = 1024, 128, 96
    table = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    ids = np.sort(rng.choice(N - 8, W, False)).astype(np.int32)
    # sentinel-style duplicate tail with identical payloads
    ids = np.concatenate([ids, np.full(16, N - 1, np.int32)])
    rows = rng.normal(size=(len(ids), d)).astype(np.float32)
    rows[W:] = rows[W]

    want = np.asarray(table).copy()
    want[ids] = rows

    plan = bs.plan_block_scatter(jnp.asarray(ids), N, width=len(ids))
    got = bs.apply_block_scatter(table, plan, jnp.asarray(rows))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_supported_gate():
  assert not bs.supported((1001, 128), backend="tpu")   # ragged rows
  assert not bs.supported((1024, 200), backend='tpu')   # ragged features
  assert not bs.supported((1024, 128), backend='cpu')
  assert bs.supported((1024, 128), backend='tpu')
