"""ops/spd.py: blocked batched Cholesky / SPD solve vs LAPACK.

The blocked recursion is the same Cholesky arithmetic up to f32
reduction order (module docstring), so it must match numpy/scipy to
f32 conditioning-scaled tolerances on random SPD batches — including
non-power-of-two d (identity padding) and matrix right-hand sides.
"""

import numpy as np
import pytest

from recoder_tpu.ops.spd import cholesky_blocked, spd_solve


def _spd_batch(b, d, seed, cond_boost=0.0):
  rng = np.random.default_rng(seed)
  f = rng.standard_normal((b, d + 8, d)).astype(np.float32) / np.sqrt(d)
  a = np.einsum('blk,blm->bkm', f, f).astype(np.float32)
  a += (0.05 + cond_boost) * np.eye(d, dtype=np.float32)
  return a


@pytest.mark.parametrize('d', [4, 16, 24, 64, 128, 130])
def test_cholesky_blocked_matches_lapack(d):
  a = _spd_batch(7, d, seed=d)
  l = np.asarray(cholesky_blocked(a))
  assert l.shape == a.shape
  ref = np.linalg.cholesky(a.astype(np.float64))
  scale = np.abs(ref).max()
  np.testing.assert_allclose(l, ref, atol=2e-5 * scale, rtol=2e-4)
  # strictly lower triangular output (upper half exactly zero)
  assert not np.triu(l, k=1).any()


@pytest.mark.parametrize('d,k', [(16, None), (128, None), (96, 3)])
def test_spd_solve_matches_lapack(d, k):
  a = _spd_batch(5, d, seed=d + 100)
  rng = np.random.default_rng(1)
  b = rng.standard_normal((5, d) if k is None
                          else (5, d, k)).astype(np.float32)
  x = np.asarray(spd_solve(a, b))
  assert x.shape == b.shape
  ref = np.linalg.solve(a.astype(np.float64),
                        b[..., None] if k is None else b)
  ref = ref[..., 0] if k is None else ref
  # residual check is the conditioning-independent statement
  res = np.einsum('bij,b...j->b...i' if k is None else 'bij,bjk->bik',
                  a, x) - b
  assert np.abs(res).max() < 1e-3 * np.abs(b).max()
  np.testing.assert_allclose(x, ref, atol=5e-4 * np.abs(ref).max(),
                             rtol=5e-3)


def test_spd_solve_matches_stock_path():
  """Same arithmetic as cholesky + two triangular solves, up to f32
  reduction order: the iALS swap-in criterion."""
  import jax
  import jax.numpy as jnp

  a = _spd_batch(9, 64, seed=3)
  rng = np.random.default_rng(2)
  b = rng.standard_normal((9, 64)).astype(np.float32)
  chol = jnp.linalg.cholesky(jnp.asarray(a))
  y = jax.scipy.linalg.solve_triangular(chol, jnp.asarray(b)[..., None],
                                        lower=True)
  ref = np.asarray(jax.scipy.linalg.solve_triangular(
      chol, y, lower=True, trans=1))[..., 0]
  got = np.asarray(spd_solve(a, b))
  np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max(),
                             rtol=1e-4)
