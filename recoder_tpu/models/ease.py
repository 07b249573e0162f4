"""EASE: closed-form shallow autoencoder (Steck, WWW'19).

A beyond-parity addition (the reference ships only the SGD-trained
DynamicAutoencoder and MatrixFactorization, reference nn.py:68,283):
EASE is the strongest known *linear* collaborative-filtering model on
the ML-20M-class benchmarks the reference targets, and its training is
one closed-form solve instead of an epoch loop -- on TPU the O(n^3)
inverse runs on the MXU in seconds for catalogs where SGD needs
minutes.

Math (arXiv:1905.03375): with X the [users, items] binarized
interaction matrix and G = X^T X,

    P = (G + lam * I)^{-1}
    B[i, j] = -P[i, j] / P[j, j],   diag(B) = 0

scores = X @ B. The zero diagonal is the whole trick: it forbids the
trivial self-reconstruction solution, so B learns item-item structure.

Scope: ``fit(gram='auto')`` accumulates the Gram matrix chunk-wise on
the accelerator (padded-COO scatter + MXU matmul; Precision.HIGH for
binary data -- exact AND the fastest measured tier, HIGHEST for
float-valued, see _device_gram) and falls back to the host scipy
sparse product on the CPU backend. The cubic solve is a Newton-Schulz
matmul inverse on accelerators (XLA:TPU's cholesky cannot compile
wide operands) and LAPACK Cholesky on CPU (see _solve_b). One v5e
fits catalogs to ~27-30k items (41k measured OOM); ``fit(mesh=...)``
row-shards every solve buffer over the mesh 'model' axis for wider
catalogs. The ceiling is enforced explicitly: fit raises past
``max_items`` rather than OOM-crashing mid-solve.
"""

import jax
import jax.numpy as jnp
import numpy as np

import recoder_tpu
from recoder_tpu.checkpoint import load_checkpoint, save_checkpoint


def _b_from_p(p):
  """EASE weights from the inverse: B = -P/diag(P), zero diagonal."""
  b = -p / jnp.diag(p)[None, :]
  return b - jnp.diag(jnp.diag(b))  # exact-zero diagonal


# module-level jitted solvers: a closure jitted inside a method would
# recompile on EVERY fit() (jax.jit caches on function identity)
@jax.jit
def _cholesky_solve(g, lam):
  g = g + lam * jnp.eye(g.shape[0], dtype=g.dtype)
  chol = jax.scipy.linalg.cholesky(g, lower=True)
  p = jax.scipy.linalg.cho_solve(
      (chol, True), jnp.eye(g.shape[0], dtype=g.dtype))
  return _b_from_p(p)


@jax.jit
def _newton_solve(g, lam):
  a = g + lam * jnp.eye(g.shape[0], dtype=g.dtype)
  p, resid, iters = _newton_inverse(a)
  return _b_from_p(p), resid, iters


def _newton_solve_sharded(g, lam, mesh):
  """Newton-Schulz solve with every [n, n] buffer row-sharded over the
  mesh's 'model' axis.

  The iteration is nothing but [n, n] matmuls, so GSPMD partitions it
  directly: A and X live row-sharded (1/model_ways per chip), each
  A @ X contracts a sharded dimension (XLA inserts the collective),
  and the result stays row-sharded. This lifts EASE past the
  single-chip width ceiling (measured: 41k items OOMs one v5e, the
  solve holds ~4 [n, n] f32 buffers) -- on an 8-way 'model' axis the
  per-chip residency divides by 8. Numerical equality with the
  single-device solve is gate-tested on the virtual CPU mesh
  (tests/test_ease.py::test_ease_sharded_solve_matches).
  """
  from jax.sharding import NamedSharding, PartitionSpec

  rows = NamedSharding(mesh, PartitionSpec('model', None))
  fn = _SHARDED_SOLVE_CACHE.get(mesh)
  if fn is None:
    def solve(g, lam):
      a = g + lam * jnp.eye(g.shape[0], dtype=g.dtype)
      a = jax.lax.with_sharding_constraint(a, rows)
      p, resid, iters = _newton_inverse(a, constraint=rows)
      return _b_from_p(p), resid, iters

    fn = _cache_put(_SHARDED_SOLVE_CACHE, mesh,
                    jax.jit(solve, in_shardings=(rows, None),
                            out_shardings=((rows, None, None))))
  return fn(jax.device_put(g, rows), jnp.float32(lam))


# one jitted sharded solver per mesh (a fresh closure per fit would
# recompile every call; jax.jit caches on function identity).
# Bounded: entries hold compiled executables and strong mesh refs, so
# an unbounded dict leaks across catalog-width sweeps (bench_ease
# --items loops) -- oldest-insertion eviction keeps the common
# repeat-fit case cached without growing forever.
_SHARDED_SOLVE_CACHE = {}

# one jitted Gram accumulator per (slab shape, precision, sharding) —
# same pitfall: a closure jitted inside _device_gram would recompile
# on every fit() / bench warm pass. Bounded like the solver cache.
_GRAM_ACCUM_CACHE = {}

_CACHE_MAXSIZE = 8


def _cache_put(cache, key, value):
  while len(cache) >= _CACHE_MAXSIZE:
    cache.pop(next(iter(cache)))
  cache[key] = value
  return value


def _gram_accumulator(chunk_users, n_items, precision, rows_sharding):
  key = (chunk_users, n_items, precision, rows_sharding)
  fn = _GRAM_ACCUM_CACHE.get(key)
  if fn is None:
    def accumulate(g, rows, cols, vals):
      slab = jnp.zeros((chunk_users, n_items), jnp.float32)
      slab = slab.at[rows, cols].add(vals, mode='drop')
      out = g + jnp.matmul(slab.T, slab, precision=precision)
      if rows_sharding is not None:
        out = jax.lax.with_sharding_constraint(out, rows_sharding)
      return out

    fn = _cache_put(_GRAM_ACCUM_CACHE, key, jax.jit(accumulate))
  return fn


def _newton_inverse(a, tol=1e-9, coarse_tol=1.5e-5, max_coarse=80,
                    max_refine=6, constraint=None):
  """Newton-Schulz inverse of an SPD matrix: X_{k+1} = X_k(2I - A X_k).

  Init X_0 = I/||A||_1: for SPD A the eigenvalues of X_0 A land in
  (0, 1], which guarantees monotone quadratic convergence. Runs inside
  one jitted while_loop pair: a coarse phase at Precision.HIGH (the
  fastest f32-matmul tier on the measured v5e -- three-pass bf16
  decomposition, 47.9 TFLOP/s vs 8.1 for DEFAULT) and a refinement
  phase at Precision.HIGHEST (six-pass f32-effective) that squares the
  residual each step. Residuals are the TRUE per-entry RMS of I - A X,
  i.e. ``||I - A X||_F / n`` -- a width-invariant metric, so the
  tolerances do not tighten as the catalog grows (Frobenius/sqrt(n),
  the r4 original, is sqrt(n) x the entry RMS and made the fixed
  acceptance threshold unreachable at 41k-wide mesh solves).

  Both phases carry the previous residual and exit on STALL (the
  residual failed to strictly decrease). In exact arithmetic the
  residual is monotone: R_{k+1} = R_k^2 in the commuting eigenbasis,
  so every step shrinks it -- SLOWLY at first (per-step ratio
  rho^(2^k) with rho = 1 - lam/||A||, close to 1 for early k -- a
  fixed must-halve-per-step test would abort here), then
  quadratically. The only way the measured residual stops decreasing
  is the precision floor, where more n^3 matmuls cannot help. ``tol``
  is therefore aspirational -- the refinement phase runs until the
  f32 floor and stops, instead of burning all ``max_refine``
  iterations against a fixed unreachable tolerance.

  Returns (x, rms_residual, total_iters) -- the caller decides whether
  the residual is acceptable (traced code cannot raise).
  """
  n = a.shape[0]
  eye = jnp.eye(n, dtype=a.dtype)
  scale = jnp.float32(n)

  def phase(precision, tol, max_iter):
    def cond(s):
      _, r, r_prev, i = s
      # stall = failed to strictly decrease (the precision floor);
      # slow early convergence still decreases monotonically
      return (r > tol) & (i < max_iter) & ((i == 0) | (r < r_prev))

    def body(s):
      x, r_old, _, i = s
      ax = jnp.matmul(a, x, precision=precision)
      # residual of the INPUT x; the returned x is one step better
      r = jnp.linalg.norm(ax - eye) / scale
      x = 2.0 * x - jnp.matmul(x, ax, precision=precision)
      if constraint is not None:
        # keep the iterate row-sharded across loop steps (a mesh solve
        # must not let GSPMD drift the loop carry to replicated)
        x = jax.lax.with_sharding_constraint(x, constraint)
      return x, r, r_old, i + 1

    return cond, body

  inf = jnp.float32(jnp.inf)
  x0 = eye / jnp.max(jnp.sum(jnp.abs(a), axis=1))
  c1, b1 = phase(jax.lax.Precision.HIGH, coarse_tol, max_coarse)
  x, r, _, i = jax.lax.while_loop(c1, b1, (x0, inf, inf, jnp.int32(0)))
  c2, b2 = phase(jax.lax.Precision.HIGHEST, tol, max_refine)
  x, r, _, j = jax.lax.while_loop(c2, b2, (x, r, inf, jnp.int32(0)))
  # the loop exits on the PRE-update residual; report the live one
  r = jnp.linalg.norm(jnp.matmul(a, x, precision=jax.lax.Precision.HIGHEST)
                      - eye) / scale
  return x, r, i + j


class EASE:
  """Embarrassingly Shallow Autoencoder.

  Usage::

      model = EASE(lam=200.0)
      model.fit(train_matrix)                # scipy.sparse CSR
      recs = model.recommend(users_interactions, num_recommendations=10)

  Plugs into the existing evaluation stack through
  :class:`recoder_tpu.recommender.InferenceRecommender` (it exposes the
  same ``recommend(users_interactions, num_recommendations)`` contract
  as :class:`recoder_tpu.model.Recoder`).

  Args:
    lam (float): L2 regularization of the item-item solve. The paper's
      sweet spot for ML-20M-class data is 200-500.
  """

  def __init__(self, lam=200.0):
    self.lam = float(lam)
    self.num_items = None
    self.item_weights = None  # B [items, items], zero diagonal

  # -- training ----------------------------------------------------------

  def fit(self, train_matrix, gram='auto', max_items=65536,
          solve='auto', mesh=None):
    """Closed-form fit from a ``scipy.sparse`` user-item matrix.

    Both halves run on the default JAX device when it is an
    accelerator: the Gram accumulates chunk-wise on the MXU (each user
    chunk ships as padded COO triplets — a few MB — and densifies with
    one scatter, so G += Xc^T @ Xc; the host sparse product this
    replaces took ~48 s at ML-20M scale vs ~2 s warm on one v5e), and
    the inverse runs the Newton-Schulz matmul iteration (see
    :meth:`_solve_b`; the r4 receipt: 15.9 s warm fit at 20,108
    items).

    Args:
      train_matrix: ``scipy.sparse`` [users, items].
      gram ('auto' | 'device' | 'host'): where to accumulate X^T X.
        'auto' picks the device path on accelerators and the host
        sparse product on the CPU backend (dense chunk matmuls are a
        bad CPU trade).
      max_items (int): explicit guard on the [items, items] working
        set. The solve holds ~4 [items, items] f32 buffers
        (measured: 41k items OOMs one 16 GB v5e; the single-chip
        ceiling is ~27-30k) -- past this EASE on one chip is the
        wrong model class; shard the solve with ``mesh`` or use the
        SGD families. Raise the bound deliberately if the memory is
        really there.
      solve ('auto' | 'cholesky' | 'newton'): inverse algorithm, see
        :meth:`_solve_b`. 'auto' = LAPACK Cholesky on the CPU backend,
        Newton-Schulz matmul iteration on accelerators (XLA:TPU's
        cholesky lowering cannot compile wide catalogs).
      mesh: optional ('data', 'model') mesh; row-shards every solve
        buffer over 'model' so per-chip residency divides by
        model_ways -- the past-one-chip-HBM option (41k-wide B on an
        8-chip slice is ~0.85 GiB/chip/buffer). Forces newton.
    """
    m = train_matrix.tocsr().astype(np.float32)
    if m.shape[1] > max_items:
      raise ValueError(
          f'EASE is dense [items, items]: {m.shape[1]} items needs '
          f'~{3 * m.shape[1] ** 2 * 4 / 2 ** 30:.0f} GiB for G/P/B, '
          f'past the max_items={max_items} guard. EASE targets '
          f'catalogs <= ~60k items; use DynamicAutoencoder/MultVAE '
          f'for larger catalogs, or pass max_items= explicitly if '
          f'the memory is really there.')
    self.num_items = m.shape[1]
    if gram not in ('auto', 'device', 'host'):
      raise ValueError(f'unknown gram mode {gram!r}')
    if gram == 'auto':
      gram = 'host' if jax.default_backend() == 'cpu' else 'device'
    if gram == 'device':
      g = self._device_gram(m, mesh=mesh)
    else:
      g = jnp.asarray(np.asarray((m.T @ m).todense(), dtype=np.float32))
    self.item_weights = self._solve_b(g, method=solve, mesh=mesh)
    return self

  def _solve_b(self, g, method='auto', mesh=None):
    """B from a precomputed Gram matrix.

    method ('auto' | 'cholesky' | 'newton'): 'cholesky' is the LAPACK
    factorization -- exact and fast on the CPU backend, but XLA:TPU's
    cholesky lowering OOMs at compile on wide catalogs (measured r4:
    20,224 wide wants 119 GB of rematerialized update-slice temps on a
    16 GB v5e). 'newton' is the TPU-native route: a Newton-Schulz
    inverse -- nothing but [n, n] matmuls on the MXU, so it compiles at
    any width that fits HBM. Coarse phase at Precision.HIGH (the
    fastest measured f32 tier on v5e), then HIGHEST refinement passes;
    quadratic convergence squares the residual each refinement step,
    driving it below f32 round-off in a couple of iterations.
    'auto' = cholesky on the CPU backend, newton elsewhere.

    mesh: a ('data', 'model') mesh (recoder_tpu.parallel.make_mesh)
    shards every [n, n] solve buffer row-wise over 'model' -- the
    past-one-chip-HBM configuration (see _newton_solve_sharded).
    Forces the newton method.
    """
    if mesh is not None:
      b, resid, iters = _newton_solve_sharded(g, self.lam, mesh)
      return self._check_newton(b, resid, iters)
    if method == 'auto':
      method = 'cholesky' if jax.default_backend() == 'cpu' else 'newton'
    if method == 'cholesky':
      return _cholesky_solve(g, jnp.float32(self.lam))

    assert method == 'newton', method
    b, resid, iters = _newton_solve(g, jnp.float32(self.lam))
    return self._check_newton(b, resid, iters)

  @staticmethod
  def _check_newton(b, resid, iters):
    resid = float(resid)
    if not resid < 1e-4:  # also catches NaN
      raise RuntimeError(
          f'Newton-Schulz inverse did not converge (RMS residual '
          f'{resid:.2e} after {int(iters)} iterations); the Gram is '
          f'too ill-conditioned for this lam -- raise lam or pass '
          f"solve='cholesky' (host) to fit()")
    return b

  def _device_gram(self, m, chunk_users=8192, mesh=None):
    """G = X^T X accumulated on device from padded-COO user chunks.

    Pad slots use row index ``chunk_users`` — out of bounds for the
    [chunk_users, items] slab, dropped by the scatter — so every chunk
    reuses one compiled program at a fixed nnz budget.

    With ``mesh``, G accumulates ROW-SHARDED over the mesh 'model'
    axis from the first chunk (the slab stays replicated; the matmul's
    [items, items] output partitions row-wise), so no chip ever holds
    the full [items, items] matrix — required past ~60k items where G
    alone exceeds one chip's HBM, and it hands the solve its operand
    already in the sharded layout.

    Matmul precision: Precision.HIGH (three-pass bf16 decomposition)
    for binarized data -- 0/1 inputs are EXACT in bf16 and the f32
    accumulator is exact far past ML-20M user counts, so HIGH loses
    nothing; it is also the FASTEST f32-matmul tier on the measured
    v5e (47.9 TFLOP/s vs 26.9 HIGHEST and 8.1 DEFAULT at [8192^2],
    docs/benchmarks.md r4). General float values fit() accepts pay
    Precision.HIGHEST for the extra mantissa passes.
    """
    n_users, n_items = m.shape
    binary = bool(np.all(m.data == 1.0))
    precision = (jax.lax.Precision.HIGH if binary
                 else jax.lax.Precision.HIGHEST)
    chunk_users = min(int(chunk_users), n_users)
    starts = range(0, n_users, chunk_users)
    nnz_budget = max(
        int(m.indptr[min(s + chunk_users, n_users)] - m.indptr[s])
        for s in starts)

    rows_sharding = None
    if mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec
      rows_sharding = NamedSharding(mesh, PartitionSpec('model', None))

    accumulate = _gram_accumulator(chunk_users, n_items, precision,
                                   rows_sharding)

    g = jnp.zeros((n_items, n_items), jnp.float32)
    if rows_sharding is not None:
      g = jax.device_put(g, rows_sharding)
    for s in starts:
      e = min(s + chunk_users, n_users)
      lo, hi = int(m.indptr[s]), int(m.indptr[e])
      rows = np.full(nnz_budget, chunk_users, np.int32)  # pad: OOB row
      cols = np.zeros(nnz_budget, np.int32)
      vals = np.zeros(nnz_budget, np.float32)
      rows[:hi - lo] = np.repeat(
          np.arange(e - s, dtype=np.int32),
          np.diff(m.indptr[s:e + 1]).astype(np.int64))
      cols[:hi - lo] = m.indices[lo:hi]
      vals[:hi - lo] = m.data[lo:hi]
      g = accumulate(g, jnp.asarray(rows), jnp.asarray(cols),
                     jnp.asarray(vals))
    return g

  # -- inference ---------------------------------------------------------

  def predict(self, users_interactions, return_input=False):
    """Dense reconstruction scores [B, num_items] for a batch of users.

    ``return_input=True`` returns the device copy of the input slab so
    callers (the seen-item mask below) don't re-upload it — per-batch
    host->device transfers dominate EASE inference on high-latency
    tunnels."""
    assert self.item_weights is not None, 'call fit() or load() first'
    x = np.asarray(
        users_interactions.interactions_matrix.todense(),
        dtype=np.float32)
    if x.shape[1] != self.num_items:
      raise ValueError(f'input has {x.shape[1]} items, model was fit '
                       f'on {self.num_items}')
    xd = jnp.asarray(x)
    scores = xd @ self.item_weights
    return (scores, xd) if return_input else scores

  def _topk_unseen(self, users_interactions, num_recommendations):
    scores, xd = self.predict(users_interactions, return_input=True)
    scores = jnp.where(xd > 0, -jnp.inf, scores)
    k = min(int(num_recommendations), self.num_items)
    vals, idx = jax.lax.top_k(scores, k)
    vals, idx = np.asarray(vals), np.asarray(idx)
    # a user with fewer than k unseen items gets -inf-scored seen items
    # in the tail: trim them instead of recommending watched items
    return [row[np.isfinite(v)] for row, v in zip(idx, vals)]

  def recommend(self, users_interactions, num_recommendations):
    """Top-k unseen items per user (same contract as Recoder.recommend)."""
    return self._topk_unseen(users_interactions, num_recommendations)

  def recommend_async(self, users_interactions, num_recommendations):
    """Evaluator-pipeline variant (same results as :meth:`recommend`)."""
    return self._topk_unseen(users_interactions, num_recommendations)

  # -- checkpointing -----------------------------------------------------

  def save(self, path):
    """Write the fitted weights + hyperparameters to ``path`` (npz,
    crash-safe atomic swap like every other checkpoint here)."""
    assert self.item_weights is not None, 'nothing to save: fit() first'
    save_checkpoint(path, {'item_weights': np.asarray(self.item_weights)},
                    {'model': 'ease', 'lam': self.lam,
                     'num_items': self.num_items,
                     'recoder_version': recoder_tpu.__version__})
    return path

  def load(self, path):
    """Restore a model saved by :meth:`save`."""
    arrays, meta = load_checkpoint(path)
    if meta.get('model') != 'ease':
      raise ValueError(f'{path} is not an EASE checkpoint: {meta}')
    self.lam = float(meta['lam'])
    self.num_items = int(meta['num_items'])
    self.item_weights = jnp.asarray(arrays['item_weights'])
    return self
