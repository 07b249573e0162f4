"""exact_top_k (recoder_tpu.ops.topk): must equal lax.top_k exactly --
values always, indices up to tie order -- including the mass-tie
overflow fallback, since eval metric parity rides on it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from recoder_tpu.ops import topk


def _assert_same(s, k, **kw):
  v_ref, i_ref = lax.top_k(s, k)
  v, i = topk.exact_top_k(s, k, **kw)
  np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
  # indices may legally differ on exact ties; values at the returned
  # indices must match the reference values slot-for-slot
  picked = np.take_along_axis(np.asarray(s), np.asarray(i), axis=-1)
  np.testing.assert_array_equal(picked, np.asarray(v_ref))
  # and no index may repeat within a row
  flat = np.asarray(i).reshape(-1, k)
  assert all(len(set(r)) == k for r in flat)


def test_random_wide():
  s = jax.random.normal(jax.random.PRNGKey(0), (7, 20000))
  _assert_same(s, 100)


def test_tie_heavy_quantized():
  # bf16-quantized scores produce many exact ties around the threshold
  s = jax.random.normal(jax.random.PRNGKey(1), (5, 16384))
  s = s.astype(jnp.bfloat16).astype(jnp.float32)
  _assert_same(s, 50)


def test_constant_rows_trigger_fallback():
  # every element ties: candidate count = width >> oversample*k, so the
  # cond must take the exact full-width branch
  s = jnp.ones((3, 16384))
  _assert_same(s, 10)


def test_mixed_salvage_rows():
  # a few degenerate (all-tied) rows among clean ones exercises the
  # per-row salvage branch and its merge-back scatter specifically
  s = np.array(jax.random.normal(jax.random.PRNGKey(7), (16, 16384)))
  # row 0 failing is the regression case: an in-range nonzero fill
  # value would let duplicate fill-slot writes clobber its correction
  s[0] = 0.5
  s[3] = 1.0
  s[11] = -2.0
  _assert_same(jnp.asarray(s), 25)


def test_salvage_overflow_falls_back():
  # more failing rows than the salvage buffer -> batch-wide exact sort
  s = jnp.ones((8, 16384))
  _assert_same(s, 10, salvage_rows=4)


def test_rows_with_mostly_neg_inf():
  # recommend masks seen/pad items to -inf; keep exactness when finite
  # entries are sparse (and when fewer than k are finite)
  s = jnp.full((4, 16384), -jnp.inf)
  s = s.at[:, ::97].set(jax.random.normal(jax.random.PRNGKey(2),
                                          (4, len(range(0, 16384, 97)))))
  _assert_same(s, 64)


def test_small_width_passthrough():
  s = jax.random.normal(jax.random.PRNGKey(3), (4, 512))
  v, i = topk.exact_top_k(s, 16)
  v_ref, i_ref = lax.top_k(s, 16)
  np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
  np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_dispatcher_modes():
  s = jax.random.normal(jax.random.PRNGKey(4), (3, 16384))
  v_sort, _ = topk.top_k(s, 20, mode='sort')
  v_exact, _ = topk.top_k(s, 20, mode='exact')
  np.testing.assert_array_equal(np.asarray(v_exact), np.asarray(v_sort))
  v_approx, i_approx = topk.top_k(s, 20, mode='approx')
  assert v_approx.shape == (3, 20) and i_approx.shape == (3, 20)
  with pytest.raises(ValueError, match='unknown top-k mode'):
    topk.top_k(s, 20, mode='nope')


def test_under_jit_and_3d():
  s = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 16384))
  v, i = jax.jit(lambda x: topk.exact_top_k(x, 32))(s)
  v_ref, _ = lax.top_k(s, 32)
  np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
  assert i.shape == (2, 3, 32)


def test_nan_rows_match_lax_topk():
  """NaN rows defeat count-certification (NaN >= t is False on both
  sides); they must take the exact path so results still match
  lax.top_k everywhere."""
  s = np.array(jax.random.normal(jax.random.PRNGKey(6), (4, 16384)))
  s[1, ::7] = np.nan
  s[3, :] = np.nan
  s = jnp.asarray(s)
  v, i = topk.exact_top_k(s, 20)
  v_ref, i_ref = lax.top_k(s, 20)
  np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
  np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_fractional_oversample_keeps_k_candidates():
  """oversample < 1 must never request fewer than k candidates."""
  s = jax.random.normal(jax.random.PRNGKey(7), (2, 16384))
  v, _ = topk.exact_top_k(s, 100, oversample=0.25)
  v_ref, _ = lax.top_k(s, 100)
  np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
