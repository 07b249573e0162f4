"""Fused decode+loss Pallas kernel vs the XLA composition (interpret
mode on CPU): loss values and all three gradients must match."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recoder_tpu.ops import losses as L
from recoder_tpu.experiments.pallas_loss import TILE_U, fused_decode_loss, supported


@pytest.fixture
def problem():
  rng = np.random.default_rng(0)
  B, d, U = 32, 24, 2 * TILE_U
  h = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
  rows = jnp.asarray(rng.normal(size=(U, d)).astype(np.float32))
  brows = jnp.asarray(rng.normal(size=(U,)).astype(np.float32))
  target = jnp.asarray((rng.random((B, U)) < 0.1).astype(np.float32))
  rowm = jnp.asarray((np.arange(B) < B - 2).astype(np.float32))
  colm = jnp.asarray((np.arange(U) < U - 37).astype(np.float32))
  return h, rows, brows, target, rowm, colm


@pytest.mark.parametrize('kind,confidence', [
    ('mse', 0.0), ('mse', 3.0), ('logistic', 0.0)])
def test_fused_matches_composed(problem, kind, confidence):
  h, rows, brows, target, rowm, colm = problem

  def composed(h, rows, brows):
    s = h @ rows.T + brows[None, :]
    if kind == 'mse':
      e = L.mse_loss(s, target, confidence=confidence,
                     row_mask=rowm, col_mask=colm)
    else:
      e = L.logistic_loss(s, target, row_mask=rowm, col_mask=colm)
    return jnp.sum(e)

  def fused(h, rows, brows):
    return fused_decode_loss(h, rows, brows, target, rowm, colm,
                             kind, confidence, True)

  ref, gref = jax.value_and_grad(composed, argnums=(0, 1, 2))(h, rows, brows)
  got, ggot = jax.value_and_grad(fused, argnums=(0, 1, 2))(h, rows, brows)

  np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
  for a, b in zip(ggot, gref):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-3, atol=1e-4)


def test_supported_predicate():
  assert supported('mse', 4 * TILE_U)
  assert supported('logistic', TILE_U)
  assert not supported('logloss', TILE_U)
  assert not supported('mse', TILE_U + 1)
