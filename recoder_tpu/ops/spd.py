"""Batched SPD solves that keep the MXU busy.

XLA:TPU lowers ``jnp.linalg.cholesky`` through an expander whose
within-block path is the unblocked column loop: d sequential steps,
each masking-and-updating the WHOLE [..., d, d] tensor. For the iALS
workload ([B~1e5, 128, 128] systems) that is ~d full-tensor HBM passes
— measured 3.03 s of a 3.13 s half-sweep at the ML-20M shape while the
arithmetic is only ~0.6 TFLOP (tools/ials_breakdown.py). The batched
triangular solves share the structure.

This module replaces the O(d) sequential full-tensor loop with a
recursive 2x2 blocking (right-looking Cholesky): all cross-block work
becomes batched matmuls (MXU), and only [..., base, base] diagonal
factorizations remain on XLA's sequential path — sequential traffic
shrinks by (base/d)^2. The arithmetic is the SAME Cholesky up to
f32 reduction order (Schur complements accumulate via dot instead of
rank-1 updates), so results match the stock path to ~1e-6 relative —
differential-tested against numpy/LAPACK in tests/test_spd.py.

No reference analog (the reference's torch models have no batched
solves); built for models/ials.py and exported for any future
batched-normal-equations user.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_HI = jax.lax.Precision.HIGHEST


def _mm(x, y):
  return jnp.matmul(x, y, precision=_HI)


def _t(x):
  return jnp.swapaxes(x, -1, -2)


def _chol(a, base):
  d = a.shape[-1]
  if d <= base:
    return jnp.linalg.cholesky(a)
  h = d // 2
  a11 = a[..., :h, :h]
  a21 = a[..., h:, :h]
  a22 = a[..., h:, h:]
  l11 = _chol(a11, base)
  # L21 solves L21 @ L11^T = A21 (a RIGHT lower-transposed system)
  l21 = _solve_right_lt(l11, a21, base)
  s = a22 - _mm(l21, _t(l21))  # Schur complement, one batched matmul
  l22 = _chol(s, base)
  top = jnp.concatenate(
      [l11, jnp.zeros(l11.shape[:-2] + (h, d - h), l11.dtype)], axis=-1)
  bot = jnp.concatenate([l21, l22], axis=-1)
  return jnp.concatenate([top, bot], axis=-2)


def _solve_right_lt(l, b, base):
  """X @ L^T = B for X, with L lower-triangular [..., h, h] and
  B [..., m, h]. Cross-block work is batched matmul; diagonal blocks
  fall through to lax triangular_solve."""
  h = l.shape[-1]
  if h <= base:
    return jax.lax.linalg.triangular_solve(
        l, b, left_side=False, lower=True, transpose_a=True)
  k = h // 2
  l11 = l[..., :k, :k]
  l21 = l[..., k:, :k]
  l22 = l[..., k:, k:]
  x1 = _solve_right_lt(l11, b[..., :k], base)
  x2 = _solve_right_lt(l22, b[..., k:] - _mm(x1, _t(l21)), base)
  return jnp.concatenate([x1, x2], axis=-1)


def _solve_lower(l, b, base, transpose):
  """L y = b (transpose=False) or L^T x = b (True); b [..., d, k]."""
  d = l.shape[-1]
  if d <= base:
    return jax.lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=transpose)
  h = d // 2
  l11 = l[..., :h, :h]
  l21 = l[..., h:, :h]
  l22 = l[..., h:, h:]
  b1, b2 = b[..., :h, :], b[..., h:, :]
  if not transpose:
    y1 = _solve_lower(l11, b1, base, False)
    y2 = _solve_lower(l22, b2 - _mm(l21, y1), base, False)
    return jnp.concatenate([y1, y2], axis=-2)
  x2 = _solve_lower(l22, b2, base, True)
  x1 = _solve_lower(l11, b1 - _mm(_t(l21), x2), base, True)
  return jnp.concatenate([x1, x2], axis=-2)


def _pad_pow2(d, base):
  """Smallest base * 2^k >= d (the recursion halves down to base)."""
  p = base
  while p < d:
    p *= 2
  return p


def cholesky_blocked(a, base=16):
  """Batched lower Cholesky of SPD ``a`` [..., d, d].

  Pads d up to base * 2^k with an identity diagonal (the padded
  factor is block-diagonal [L, I], sliced away), so any d is legal.
  """
  d = a.shape[-1]
  p = _pad_pow2(d, base)
  if p != d:
    pad = [(0, 0)] * (a.ndim - 2) + [(0, p - d), (0, p - d)]
    a = jnp.pad(a, pad) + jnp.diag(
        jnp.concatenate([jnp.zeros(d, a.dtype), jnp.ones(p - d, a.dtype)]))
  l = _chol(a, base)
  return l[..., :d, :d] if p != d else l


def _chol_solve_kernel(a_ref, b_ref, x_ref, m, ut, _PANEL=None,
                       _REFINE=0):
  """Per-block in-VMEM Cholesky solve: R systems' [d, d] matrices are
  factorized, forward- and back-substituted without ever leaving
  VMEM. XLA's expander spends ~d full HBM passes per solve (module
  docstring); here the d-step column loop runs on VPU registers and
  HBM sees each system exactly twice (read A/b, write x).

  Upper-factor orientation so every step touches a ROW (a sublane
  slice — dynamic LANE slices are cross-lane shuffles): A = U^T U;
  step k scales row k and subtracts the rank-1 outer product from
  rows > k (their stale sub-diagonal lanes are never read again: row
  k' is masked to lanes >= k' before use, and the update column mask
  is unnecessary for the same reason)."""
  R, d, _ = a_ref.shape
  m[:] = a_ref[:]
  lanes = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
  rows = jax.lax.broadcasted_iota(jnp.int32, (1, d, 1), 1)

  def lane_pick(v, k):
    # v [R, d] -> v[:, k] as [R] (masked reduce; dynamic lane index)
    return jnp.sum(jnp.where(lanes == k, v, 0.0), axis=1)

  if _PANEL is None:
    def fact(k, _):
      row = m[:, pl.ds(k, 1), :][:, 0, :]  # [R, d]
      inv = 1.0 / jnp.sqrt(lane_pick(row, k))
      urow = jnp.where(lanes >= k, row * inv[:, None], 0.0)
      m[:, pl.ds(k, 1), :] = urow[:, None, :]
      # rank-1 trailing update, row mask folded into the VECTOR (rows
      # <= k get a zero coefficient) instead of masking the [d, d]
      # tensor — one fewer full-tile op per step
      c = jnp.where(lanes > k, urow, 0.0)
      m[:] = m[:] - c[:, :, None] * urow[:, None, :]
      return 0
    jax.lax.fori_loop(0, d, fact, 0, unroll=False)
  else:
    # MXU-panel factorization: the d-step rank-1 loop only touches
    # the P panel rows ([R, P, d] VPU work instead of [R, d, d]);
    # each panel's trailing update is ONE batched matmul on the MXU.
    # Static unroll: every slice below has compile-time bounds.
    P = _PANEL
    for p0 in range(0, d, P):
      for k in range(p0, p0 + P):
        row = m[:, k, :]  # [R, d]
        inv = 1.0 / jnp.sqrt(row[:, k])
        urow = jnp.where(lanes >= k, row * inv[:, None], 0.0)
        m[:, k, :] = urow
        if k + 1 < p0 + P:
          c = urow[:, k + 1:p0 + P]  # update stays inside the panel
          m[:, k + 1:p0 + P, :] -= c[:, :, None] * urow[:, None, :]
      if p0 + P < d:
        upanel = m[:, p0:p0 + P, :]  # [R, P, d] finished U rows
        # C[j, t] = U[p0+t, j] for trailing rows j: the panel rows'
        # trailing lanes, transposed
        c = jnp.swapaxes(upanel, 1, 2)[:, p0 + P:, :]  # [R, d-p0-P, P]
        m[:, p0 + P:, :] -= jax.lax.dot_general(
            c, upanel, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

  ut[:] = jnp.swapaxes(m[:], 1, 2)
  # diag of U once: [R, d]
  eye = rows == jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2)
  diag = jnp.sum(jnp.where(eye, m[:], 0.0), axis=2)

  def fwd(k, y):  # U^T y = b (forward substitution over U's rows)
    yk = lane_pick(y, k) / lane_pick(diag, k)
    urow = m[:, pl.ds(k, 1), :][:, 0, :]
    y = y - yk[:, None] * jnp.where(lanes > k, urow, 0.0)
    return jnp.where(lanes == k, yk[:, None], y)

  def bwd(i, y):  # U x = y (backward; U's column k = ut's row k)
    k = d - 1 - i
    xk = lane_pick(y, k) / lane_pick(diag, k)
    utrow = ut[:, pl.ds(k, 1), :][:, 0, :]
    y = y - xk[:, None] * jnp.where(lanes < k, utrow, 0.0)
    return jnp.where(lanes == k, xk[:, None], y)

  def solve(rhs):
    y = jax.lax.fori_loop(0, d, fwd, rhs, unroll=False)
    return jax.lax.fori_loop(0, d, bwd, y, unroll=False)

  x = solve(b_ref[:])
  for _ in range(_REFINE):
    # iterative refinement with the ORIGINAL A (still resident in
    # a_ref): the Mosaic MXU panel update runs bf16-pass matmuls
    # (~1e-4 relative factor error); one exact-residual correction
    # through the same factor squares that error away. The residual
    # matvec reads A from VMEM — no extra HBM traffic.
    r = b_ref[:] - jax.lax.dot_general(
        a_ref[:], x[:, :, None], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)[..., 0]
    x = x + solve(r)
  x_ref[:] = x


def _spd_solve_pallas(a, b, rows_per_block=32, panel=None,
                      refine=0):
  """TPU fast path for vector-rhs :func:`spd_solve` (d a multiple of
  128, the f32 lane width). Batch is padded to the block size with
  identity systems."""
  from jax.experimental.pallas import tpu as pltpu

  import functools as _ft

  B, d, _ = a.shape
  R = rows_per_block
  bp = -(-B // R) * R
  if bp != B:
    eye = jnp.broadcast_to(jnp.eye(d, dtype=a.dtype), (bp - B, d, d))
    a = jnp.concatenate([a, eye], axis=0)
    b = jnp.concatenate([b, jnp.zeros((bp - B, d), b.dtype)], axis=0)
  x = pl.pallas_call(
      _ft.partial(_chol_solve_kernel, _PANEL=panel, _REFINE=refine),
      grid=(bp // R,),
      in_specs=[
          pl.BlockSpec((R, d, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM),
          pl.BlockSpec((R, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((R, d), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((bp, d), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((R, d, d), jnp.float32),
          pltpu.VMEM((R, d, d), jnp.float32),
      ],
      cost_estimate=pl.CostEstimate(
          flops=int(3 * R * d * d * d),
          bytes_accessed=int(R * d * d * 4 + 2 * R * d * 4),
          transcendentals=int(R * d)),
  )(a, b)
  return x[:B]


def _pallas_eligible(a, b, vec):
  d = a.shape[-1]
  if not (vec and a.ndim == 3 and d % 128 == 0 and d <= 256):
    return False
  try:
    return jax.devices()[0].platform != 'cpu'
  except Exception:
    return False


def spd_solve(a, b, base=16, impl='auto'):
  """Solve ``a @ x = b`` for batched SPD ``a`` [..., d, d].

  ``b`` is [..., d] or [..., d, k]; returns x with b's shape. The
  exact-solve replacement for cholesky + two solve_triangular calls:
  identical arithmetic up to f32 reduction order, ~(d/base)^2 less
  sequential-path HBM traffic (module docstring).

  ``impl``: 'auto' uses the in-VMEM Pallas kernel on accelerators for
  3-D vector-rhs batches with d a multiple of 128 (the measured fast
  path; falls back to the blocked recursion elsewhere), 'blocked' or
  'pallas' force a path.
  """
  vec = b.ndim == a.ndim - 1
  if impl not in ('auto', 'blocked', 'pallas'):
    raise ValueError(f'unknown impl {impl!r}')
  if impl == 'pallas' or (impl == 'auto' and _pallas_eligible(a, b, vec)):
    return _spd_solve_pallas(a, b)
  if vec:
    b = b[..., None]
  d = a.shape[-1]
  p = _pad_pow2(d, base)
  if p != d:
    pad_a = [(0, 0)] * (a.ndim - 2) + [(0, p - d), (0, p - d)]
    a = jnp.pad(a, pad_a) + jnp.diag(
        jnp.concatenate([jnp.zeros(d, a.dtype), jnp.ones(p - d, a.dtype)]))
    b = jnp.pad(b, [(0, 0)] * (b.ndim - 2) + [(0, p - d), (0, 0)])
  l = _chol(a, base)
  y = _solve_lower(l, b, base, transpose=False)
  x = _solve_lower(l, y, base, transpose=True)
  if p != d:
    x = x[..., :d, :]
  return x[..., 0] if vec else x
