"""iALS: implicit-feedback alternating least squares (Hu, Koren,
Volinsky, ICDM'08).

A beyond-parity addition (the reference ships only SGD-trained models,
reference nn.py:68,283): iALS is the classic production-scale
collaborative-filtering baseline for implicit data — no epoch loop, no
learning rate, and, revisited with tuned regularization, it stays
competitive with the VAE families on the ML-20M-class benchmarks
(Rendle et al., "Revisiting the Performance of iALS on Item
Recommendation Benchmarks", RecSys'21).

Math: with R the [users, items] raw interaction matrix, preference
``p = (r > 0)`` and confidence ``c = 1 + alpha * r``, iALS minimizes

    sum_{u,i} c_ui (p_ui - x_u . y_i)^2
      + sum_u reg_u ||x_u||^2 + sum_i reg_i ||y_i||^2

by alternating exact per-row solves. Each user solve is

    (Y^T Y + Y_u^T (C_u - I) Y_u + reg_u I) x_u = Y_u^T c_u

where Y_u are the factor rows of the user's items — the classic HKV
trick: the dense Gram ``Y^T Y`` is shared across all users and each
user only adds corrections for their observed items (items are
symmetric). ``reg_scaling='frequency'`` scales ``reg_u = lam *
(|I_u| + 1)`` (Rendle'21's frequency-scaled L2, the robust default);
``'none'`` is the constant-lam HKV original.

TPU mapping (nothing in the hot path but MXU contractions and a
batched d x d Cholesky):

- The shared Gram ``F^T F`` is one [n, d]^T [n, d] matmul.
- Rows are solved in BATCHES: gather the padded per-row factor slabs
  ``F[cols] -> [B, L, d]`` and form every correction with one einsum
  ``A = G + einsum('bl,bld,ble->bde', c-1, F, F)`` — a batched MXU
  contraction — plus ``b = einsum('bl,bld->bd', c, F)``.
- The B systems solve together with one batched Cholesky +
  two batched triangular solves at width d (64-512): tiny dense
  linear algebra XLA:TPU compiles happily (the EASE finding — cholesky
  cannot compile at 20k width — does not bite at embedding widths).
- Static shapes: rows are sorted by nnz and chunked greedily under an
  element budget, with both the batch B and the padded row length L
  on power-of-two ladders, so the whole fit compiles O(log^2) distinct
  programs regardless of the nnz distribution. Padded slots carry
  zero weights and gather a zero factor row, so they contribute
  exactly nothing (same padding discipline as the training pipeline,
  data/device_pipeline.py).

Serving is FOLD-IN: ``recommend(users_interactions, k)`` solves the
query users' factors against the fitted item factors with the exact
training solve (so a training user's fold-in factor reproduces their
trained factor bit-for-bit), scores ``x @ Y^T``, masks seen items and
top-ks — the same contract as :class:`recoder_tpu.model.Recoder` and
:class:`recoder_tpu.models.EASE`, so the shared evaluator stack
(InferenceRecommender + RecommenderEvaluator) applies unchanged.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

import recoder_tpu
from recoder_tpu.checkpoint import load_checkpoint, save_checkpoint
from recoder_tpu.ops.spd import spd_solve


def _pow2_ceil(n):
  return 1 << max(0, int(np.ceil(np.log2(max(1, int(n))))))


def _pow2_floor(n):
  return 1 << max(0, int(np.floor(np.log2(max(1, int(n))))))


def _solve_rows_from_slab(f, gram, valid, vals, alpha, reg):
  """Batched HKV row solve from an already-gathered factor slab.

  f: [B, L, d] per-row factor slabs (pad slots are ZERO rows).
  gram: [d, d] unregularized F^T F (shared across rows).
  valid: [B, L] 1.0 where the slot holds a real observation, 0.0 pad.
  vals: [B, L] f32 raw interaction values (pad 0).
  alpha: scalar confidence slope; the weights derive on device
    (w_a = alpha * vals, w_b = w_a + valid) so the resident chunk
    plan ships 8 bytes per padded slot instead of 12.
  reg:  [B] f32 per-row L2 (lam, frequency-scaled or not).

  Returns [B, d] solved factors.
  """
  d = f.shape[-1]
  w_a = alpha * vals  # confidence minus one (pad slots: vals == 0)
  w_b = w_a + valid  # full confidence
  # A_b = G + sum_l w_a[b,l] f[b,l,:] f[b,l,:]^T + reg_b I  (SPD)
  a = gram[None] + jnp.einsum('bl,bld,ble->bde', w_a, f, f,
                              precision=jax.lax.Precision.HIGHEST)
  a = a + reg[:, None, None] * jnp.eye(d, dtype=a.dtype)
  b = jnp.einsum('bl,bld->bd', w_b, f,
                 precision=jax.lax.Precision.HIGHEST)
  # blocked batched Cholesky solve (ops/spd.py): stock jnp cholesky +
  # solve_triangular was 97% of the half-sweep at the ML-20M shape —
  # XLA's sequential expander re-touches the whole [B, d, d] tensor
  # per column (tools/ials_breakdown.py: solve 3032 -> 1958 ms
  # measured on the v5e; same arithmetic up to f32 reduction order,
  # differential-tested vs LAPACK in tests/test_spd.py)
  return spd_solve(a, b, base=32)


# Module-level jitted solve: jax.jit caches per (B, L, d) shape bucket
# (a closure jitted inside fit() would recompile on every call).
@jax.jit
def _solve_rows(factors_pad, gram, cols, vals, alpha, reg):
  """:func:`_solve_rows_from_slab` after gathering the slab from
  [n + 1, d] opposite-side factors with a trailing ZERO row — pad
  slots gather it (cols == n), so they add nothing even before the
  zero weights."""
  f = jnp.take(factors_pad, cols, axis=0)  # [B, L, d]
  n = factors_pad.shape[0] - 1
  valid = (cols < n).astype(vals.dtype)
  return _solve_rows_from_slab(f, gram, valid, vals, alpha, reg)


def _solve_rows_into_impl(out, factors_pad, gram, rows, cols, vals,
                          alpha, reg):
  """:func:`_solve_rows` + on-device scatter of the chunk's factors
  into the [n_rows, d] result (pad row ids >= n_rows drop), so a full
  sweep never leaves the device. Single shared body: the module jit
  below and the per-mesh jit in :func:`_mesh_solve_into` must stay
  the same kernel or the two fit modes could silently diverge."""
  x = _solve_rows(factors_pad, gram, cols, vals, alpha, reg)
  return out.at[rows].set(x, mode='drop')


# Module-level jitted solve: jax.jit caches per (B, L, d) shape bucket.
_solve_rows_into = jax.jit(_solve_rows_into_impl)


@jax.jit
def _gram(factors):
  return jnp.matmul(factors.T, factors,
                    precision=jax.lax.Precision.HIGHEST)


def _sm(fn, mesh, in_specs, out_specs, checked=True):
  try:
    from jax import shard_map as sm
  except ImportError:
    from jax.experimental.shard_map import shard_map as sm
  kw = {}
  if not checked:
    # the item solve writes all-gathered values into a replicated
    # output — identical on every device, but the varying-mesh-axes
    # checker cannot prove it (flag name differs across jax versions)
    import inspect
    params = inspect.signature(sm).parameters
    kw['check_vma' if 'check_vma' in params else 'check_rep'] = False
  return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)


@functools.lru_cache(maxsize=4)
def _user_sharded_fns(mesh):
  """shard_map'd half-sweep kernels for ``factor_sharding='users'``.

  User factors live ROW-SHARDED over every mesh device ([N_pad, d],
  N_pad a multiple of the device count, rows >= num_users zero) — the
  lever for user counts whose [n, d] factor matrix outgrows one
  chip's HBM. Item factors stay replicated (catalogs are the small
  axis at factorization widths). The two half-sweeps differ in which
  side they must fetch:

  - user solve: gathers ITEM factors (replicated — plain local
    ``take``), writes row-sharded output. Per chunk: each device
    solves its batch shard, one [B, d] all-gather, owners scatter
    their rows locally.
  - item solve: gathers USER factors (row-sharded) with the same
    owner-slice discipline as the training pipeline's 'data'-sharded
    tables (data/device_pipeline.py `_row_fetch`: a GSPMD gather on
    the sharded operand would all-gather the ENTIRE factor matrix).
    Per chunk: each batch shard's ([b, L] ids, [b, L, d] slab) pair
    rides a ``ppermute`` ring — every device adds its owned rows as
    the pair visits, and after D hops the complete slab is home.
    The transient working set is the LOCAL [b, L, d] slab (it
    divides by the device count, matching fit()'s chunk_elems
    contract — an all-gather + psum_scatter would materialize the
    full [B, L, d] on every device), and the wire bytes equal one
    reduce-scatter. Then the local batched solve + [B, d]
    all-gather into the replicated item output.

  Per-row arithmetic is untouched, so results are numerically
  identical to the single-device fit (gate-tested).
  """
  from jax.sharding import NamedSharding, PartitionSpec as P

  axes = tuple(mesh.axis_names)
  sizes = [mesh.shape[a] for a in axes]
  rows_sharding = NamedSharding(mesh, P(axes, None))
  rep = NamedSharding(mesh, P())

  def flat_idx():
    idx = jnp.int32(0)
    for name, size in zip(axes, sizes):
      idx = idx * size + jax.lax.axis_index(name)
    return idx

  def user_local(out_loc, item_f_pad, gram, rows, cols, vals, alpha, reg):
    x = _solve_rows(item_f_pad, gram, cols, vals, alpha, reg)  # [b, d]
    i = flat_idx()
    per = out_loc.shape[0]
    x_all = jax.lax.all_gather(x, axes, axis=0, tiled=True)
    rows_all = jax.lax.all_gather(rows, axes, axis=0, tiled=True)
    owner = rows_all // per
    # non-owned rows redirect to the OOB index `per` and drop
    loc = jnp.where(owner == i, rows_all - i * per, per)
    return out_loc.at[loc].set(x_all, mode='drop')

  n_dev = int(np.prod(sizes))
  ring = [(s, (s + 1) % n_dev) for s in range(n_dev)]

  def item_local(out_rep, user_f_loc, gram, rows, cols, vals, alpha,
                 reg, nvalid):
    i = flat_idx()
    per = user_f_loc.shape[0]

    def contrib(c):
      owner = c // per
      mine = owner == i
      loc = jnp.where(mine, c - i * per, 0)
      p = jnp.take(user_f_loc, loc, axis=0)  # [b, L, d]
      return jnp.where(mine[..., None], p, 0.0)

    # Ring reduce: each shard's ([b, L] ids, [b, L, d] slab) pair
    # visits every device once (any single D-cycle works regardless
    # of ppermute's axis linearization) and is home after D hops.
    # Every [b, L] slot has exactly ONE owner, so the accumulation
    # adds zeros elsewhere — bit-exact vs a monolithic gather. The
    # transient stays the LOCAL [b, L, d] slab; an all-gather +
    # psum_scatter would put the full [B, L, d] on every device,
    # defeating the mode's per-device HBM contract.
    c, slab = cols, contrib(cols)
    for _ in range(n_dev - 1):
      c = jax.lax.ppermute(c, axes, ring)
      slab = jax.lax.ppermute(slab, axes, ring)
      slab = slab + contrib(c)
    if n_dev > 1:
      slab = jax.lax.ppermute(slab, axes, ring)  # final hop home
    valid = (cols < nvalid).astype(vals.dtype)
    x = _solve_rows_from_slab(slab, gram, valid, vals, alpha, reg)
    x_all = jax.lax.all_gather(x, axes, axis=0, tiled=True)
    rows_all = jax.lax.all_gather(rows, axes, axis=0, tiled=True)
    return out_rep.at[rows_all].set(x_all, mode='drop')

  user_solve = jax.jit(_sm(
      user_local, mesh,
      in_specs=(P(axes, None), P(), P(), P(axes), P(axes, None),
                P(axes, None), P(), P(axes)),
      out_specs=P(axes, None)))
  item_solve = jax.jit(_sm(
      item_local, mesh,
      in_specs=(P(), P(axes, None), P(), P(axes), P(axes, None),
                P(axes, None), P(), P(axes), P()),
      out_specs=P(), checked=False))
  # Gram of the row-sharded user factors: contraction over the sharded
  # dimension — GSPMD inserts the psum, output replicated. Padded zero
  # rows contribute nothing.
  gram = jax.jit(
      lambda uf: jnp.matmul(uf.T, uf,
                            precision=jax.lax.Precision.HIGHEST),
      out_shardings=rep)
  zeros = jax.jit(
      lambda n, d: jnp.zeros((n, d), jnp.float32),
      static_argnums=(0, 1), out_shardings=rows_sharding)
  return {'user_solve': user_solve, 'item_solve': item_solve,
          'gram': gram, 'zeros': zeros, 'rows_sharding': rows_sharding,
          'rep': rep}


@functools.lru_cache(maxsize=4)
def _mesh_solve_into(mesh):
  """Per-mesh jitted :func:`_solve_rows_into` for the sharded fit.

  The batched row solves are embarrassingly parallel over the chunk
  batch axis: every per-row reduction (the ``l`` einsum axis, the
  d x d Cholesky) stays within a row, so sharding B over ALL mesh
  devices partitions the compute without changing any per-row
  arithmetic — mesh and single-device fits are numerically identical
  (gate: tests/test_ials.py::test_ials_mesh_fit_matches_single).
  The opposite-side factors and the shared Gram are replicated (they
  are the [n, d] / [d, d] broadcasts every row needs); the scatter of
  the chunk's [B, d] solutions into the replicated result is the only
  cross-device traffic XLA inserts (~one all-gather of the factor
  matrix per half-sweep, which rides ICI).

  ``lru_cache`` keyed on the (hashable) mesh: a closure jitted per
  fit() would recompile every call; bounded so catalog-width sweeps
  cannot accumulate executables (same pitfall as ease.py's caches).
  """
  rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
  return jax.jit(_solve_rows_into_impl, out_shardings=rep)


class IALS:
  """Implicit-feedback weighted matrix factorization via ALS.

  Usage::

      model = IALS(embedding_size=128, alpha=30.0, lam=3e-3)
      model.fit(train_matrix)                # scipy.sparse, raw counts
      recs = model.recommend(users_interactions, num_recommendations=10)

  Plugs into the evaluation stack through
  :class:`recoder_tpu.recommender.InferenceRecommender` (same
  ``recommend`` contract as :class:`recoder_tpu.model.Recoder`).

  Args:
    embedding_size (int): factor dimensionality d.
    alpha (float): confidence slope, ``c = 1 + alpha * r`` (HKV eq. 2).
    lam (float): L2 regularization base.
    sweeps (int): alternating solve sweeps (each sweep = one exact
      user-side solve + one exact item-side solve; the objective
      decreases monotonically, 5-15 is typical).
    reg_scaling ('frequency' | 'none'): 'frequency' scales each row's
      L2 by ``(nnz + 1)`` (Rendle'21); 'none' is constant ``lam``.
    init_scale (float): stddev of the item-factor init,
      ``N(0, init_scale^2 / d)`` per Rendle'21.
    seed (int): init PRNG seed.
  """

  def __init__(self, embedding_size=128, alpha=30.0, lam=3e-3, sweeps=10,
               reg_scaling='frequency', init_scale=1.0, seed=0):
    if reg_scaling not in ('frequency', 'none'):
      raise ValueError(f'unknown reg_scaling {reg_scaling!r}')
    self.embedding_size = int(embedding_size)
    self.alpha = float(alpha)
    self.lam = float(lam)
    self.sweeps = int(sweeps)
    self.reg_scaling = reg_scaling
    self.init_scale = float(init_scale)
    self.seed = int(seed)
    self.num_items = None
    self.num_users = None
    self.user_factors = None  # [num_users, d] (training users)
    self.item_factors = None  # [num_items, d]

  # -- training ----------------------------------------------------------

  def fit(self, train_matrix, sweeps=None, chunk_elems=1 << 21,
          callback=None, mesh=None, factor_sharding=None):
    """Alternating exact solves from a ``scipy.sparse`` [users, items]
    matrix of raw interaction values (binary or counts).

    Args:
      train_matrix: ``scipy.sparse`` [users, items]; values feed the
        confidence ``c = 1 + alpha * r``.
      sweeps: override the constructor's sweep count.
      chunk_elems: element budget for one solve batch's gathered slab
        (B * L; the transient device working set is
        ~``chunk_elems * d * 8`` bytes — ~2 GiB at d=128). The
        RESIDENT cost of the cached chunk plans is ~8 bytes per padded
        nnz per side (~160 MB at ML-20M), independent of this budget.
        Under a mesh both costs divide by the device count (each
        device holds its batch shard).
      callback: optional ``f(sweep)`` called after each sweep (for
        per-sweep eval hooks).
      mesh: optional ``jax.sharding.Mesh`` (single-controller; all
        devices addressable). The row solves shard over EVERY mesh
        device along the chunk batch axis — iALS parallelism is over
        rows, so both mesh axes contribute — with the opposite-side
        factors replicated. Numerically identical to the
        single-device fit (the per-row reductions are not sharded);
        equality is gate-tested on the virtual 8-device CPU mesh.
      factor_sharding (None | 'users'): 'users' additionally stores
        the USER factors row-sharded over the mesh (requires
        ``mesh``) — the lever for user counts whose [n, d] factor
        matrix outgrows one chip's HBM. Item factors stay replicated.
        Numerically identical too (see :func:`_user_sharded_fns`);
        ``user_factors`` then carries zero pad rows up to a multiple
        of the device count (``save``/``objective`` trim them).
    """
    import scipy.sparse as sp

    if factor_sharding not in (None, 'users'):
      raise ValueError(f'unknown factor_sharding {factor_sharding!r}')
    if factor_sharding == 'users' and mesh is None:
      raise ValueError("factor_sharding='users' requires a mesh")
    m = sp.csr_matrix(train_matrix, copy=True).astype(np.float32)
    m.eliminate_zeros()  # an explicit zero is NOT an observation
    if m.nnz and m.data.min() < 0:
      raise ValueError('iALS confidence c = 1 + alpha * r needs '
                       'non-negative interaction values')
    n_users, n_items = m.shape
    self.num_items = n_items
    self.num_users = n_users
    d = self.embedding_size
    sweeps = self.sweeps if sweeps is None else int(sweeps)
    if factor_sharding == 'users':
      return self._fit_users_sharded(m, sweeps, chunk_elems, callback,
                                     mesh)

    rng = np.random.default_rng(self.seed)
    # users start at zero: the first user solve is then EXACT given the
    # item init (x = 0 is what the solve returns for empty rows too)
    item_f = jnp.asarray(
        rng.standard_normal((n_items, d)).astype(np.float32)
        * (self.init_scale / np.sqrt(d)))
    if mesh is not None:
      item_f = jax.device_put(
          item_f,
          jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))

    # chunk plans are epoch-invariant: build + ship once, every sweep
    # runs off the resident device tensors (measured 4.5x per warm
    # sweep at ML-20M scale on one v5e, 17.7 -> 3.96 s — the streamed
    # path re-paid host staging + transfers per sweep)
    user_plan = self._chunk_plan(m, chunk_elems, mesh=mesh)
    item_plan = self._chunk_plan(m.T.tocsr(), chunk_elems, mesh=mesh)
    for sweep in range(sweeps):
      user_f = self._solve_side(None, item_f, plan=user_plan, mesh=mesh)
      item_f = self._solve_side(None, user_f, plan=item_plan, mesh=mesh)
      if callback is not None:
        self.user_factors, self.item_factors = user_f, item_f
        callback(sweep)
    # final user half-sweep: stored user factors are exact against the
    # FINAL item factors (so fold_in on a training user's history
    # reproduces their stored factor bit-for-bit, and U @ V^T scores
    # use a consistent pair)
    self.user_factors = self._solve_side(None, item_f, plan=user_plan,
                                         mesh=mesh)
    self.item_factors = item_f
    return self

  def _fit_users_sharded(self, m, sweeps, chunk_elems, callback, mesh):
    """The ``factor_sharding='users'`` fit loop: user factors
    row-sharded [N_pad, d] over every mesh device, item factors
    replicated; half-sweep kernels in :func:`_user_sharded_fns`."""
    n_users, n_items = m.shape
    d = self.embedding_size
    D = mesh.size
    fns = _user_sharded_fns(mesh)
    # +1: the sentinel row (id == n_users) must exist and stay zero;
    # then pad to an equal per-device shard
    n_pad = -(-(n_users + 1) // D) * D

    rng = np.random.default_rng(self.seed)
    item_f = jax.device_put(
        jnp.asarray(rng.standard_normal((n_items, d)).astype(np.float32)
                    * (self.init_scale / np.sqrt(d))), fns['rep'])
    user_plan = self._chunk_plan(m, chunk_elems, mesh=mesh)
    item_plan = self._chunk_plan(m.T.tocsr(), chunk_elems, mesh=mesh)
    alpha = jnp.float32(self.alpha)
    nvalid = jnp.int32(n_users)

    def user_half(item_f):
      item_f_pad = jax.device_put(
          jnp.concatenate([item_f, jnp.zeros((1, d), item_f.dtype)], 0),
          fns['rep'])
      gram_i = _gram(item_f)
      out = fns['zeros'](n_pad, d)
      for c in user_plan['chunks']:
        out = fns['user_solve'](out, item_f_pad, gram_i, c['rows'],
                                c['cols'], c['vals'], alpha, c['reg'])
      return out

    def item_half(user_f):
      gram_u = fns['gram'](user_f)
      out = jax.device_put(jnp.zeros((n_items, d), jnp.float32),
                           fns['rep'])
      for c in item_plan['chunks']:
        out = fns['item_solve'](out, user_f, gram_u, c['rows'],
                                c['cols'], c['vals'], alpha, c['reg'],
                                nvalid)
      return out

    for sweep in range(sweeps):
      user_f = user_half(item_f)
      item_f = item_half(user_f)
      if callback is not None:
        self.user_factors, self.item_factors = user_f, item_f
        callback(sweep)
    # final user half-sweep, same contract as the replicated fit
    self.user_factors = user_half(item_f)  # [n_pad, d] row-sharded
    self.item_factors = item_f
    return self

  def _chunk_plan(self, csr, chunk_elems=1 << 21, mesh=None):
    """Epoch-invariant padded chunk tensors for :meth:`_solve_side`.

    The chunk structure depends only on the CSR — NOT on the factors —
    so fit() builds each side's plan ONCE and every sweep reuses the
    resident device tensors (the same resident-data design as the
    training pipeline, data/device_pipeline.py: the first measured
    ML-20M fit spent ~99% of each warm sweep re-building and
    re-shipping these arrays — 17.7 s/sweep streamed vs the ~10s-of-ms
    device math).

    Rows are nnz-sorted and chunked greedily with power-of-two batch B
    and padded row length L, so the compiled-program count stays
    O(log^2) for any nnz distribution; B is bounded by BOTH the
    [B, L, d] gathered slab and the [B, d, d] systems tensor. Returns
    ``{'chunks': [...], 'n_rows': int}``; each chunk holds device
    arrays rows / cols / vals / reg (8 bytes per padded slot + 8 per
    row — the confidence weights derive on device from vals).
    """
    n_rows, n = csr.shape
    d = self.embedding_size
    if mesh is None:
      shard_b = shard_bl = None
    else:
      # shard the batch axis over EVERY mesh device (iALS parallelism
      # is over rows; both mesh axes contribute ways)
      axes = tuple(mesh.axis_names)
      shard_b = jax.sharding.NamedSharding(
          mesh, jax.sharding.PartitionSpec(axes))
      shard_bl = jax.sharding.NamedSharding(
          mesh, jax.sharding.PartitionSpec(axes, None))
    nnz = np.diff(csr.indptr).astype(np.int64)
    order = np.argsort(-nnz, kind='stable')
    chunks = []
    i = 0
    while i < n_rows:
      L = max(8, _pow2_ceil(nnz[order[i]]))
      if L > chunk_elems:
        raise ValueError(
            f'row nnz {int(nnz[order[i]])} exceeds chunk_elems='
            f'{chunk_elems}; raise chunk_elems (device working set is '
            f'~chunk_elems * d * 8 bytes)')
      # the gathered slab is [B, L, d] AND the systems tensor is
      # [B, d, d]: bound B by BOTH so neither exceeds the budget
      B = max(1, min(_pow2_floor(chunk_elems // L),
                     _pow2_floor(chunk_elems // d)))
      if mesh is not None and B % mesh.size:
        # every device needs an equal batch shard; B is a power of two
        # so this only triggers for tail chunks smaller than the mesh
        # (the pad rows scatter out of bounds and drop)
        B = -(-B // mesh.size) * mesh.size
      rows = order[i:i + B]
      i += len(rows)

      cols = np.full((B, L), n, np.int32)
      vals = np.zeros((B, L), np.float32)
      # vectorized padded gather of the chunk's CSR slices (a per-row
      # Python loop costs seconds per sweep at 100k+ rows)
      ks = nnz[rows]
      total = int(ks.sum())
      if total:
        rowpos = np.repeat(np.arange(len(rows)), ks)
        colpos = np.arange(total) - np.repeat(np.cumsum(ks) - ks, ks)
        src = np.repeat(csr.indptr[rows], ks) + colpos
        cols[rowpos, colpos] = csr.indices[src]
        vals[rowpos, colpos] = csr.data[src]
      if self.reg_scaling == 'frequency':
        reg = self.lam * (ks.astype(np.float32) + 1.0)
        reg = np.pad(reg, (0, B - len(rows)), constant_values=self.lam)
      else:
        reg = np.full(B, self.lam, np.float32)
      # pad row ids scatter out of bounds -> dropped by mode='drop'
      rows_pad = np.full(B, n_rows, np.int32)
      rows_pad[:len(rows)] = rows

      if shard_b is None:
        chunks.append({'rows': jnp.asarray(rows_pad),
                       'cols': jnp.asarray(cols),
                       'vals': jnp.asarray(vals),
                       'reg': jnp.asarray(reg)})
      else:
        chunks.append({'rows': jax.device_put(rows_pad, shard_b),
                       'cols': jax.device_put(cols, shard_bl),
                       'vals': jax.device_put(vals, shard_bl),
                       'reg': jax.device_put(reg, shard_b)})
    return {'chunks': chunks, 'n_rows': n_rows}

  def _solve_side(self, csr, factors, chunk_elems=1 << 21, plan=None,
                  mesh=None):
    """Solve every row of ``csr`` against the opposite-side
    ``factors``; returns the new [rows, d] factor matrix (device).

    With ``plan`` (a cached :meth:`_chunk_plan`), ``csr`` is ignored
    and the whole solve runs off resident device tensors — per-chunk
    batched solves scattering into the result on device, no host
    round trips inside a sweep. With ``mesh`` (plan must have been
    built with the same mesh) the solves shard over the chunk batch
    axis; see :func:`_mesh_solve_into`.
    """
    if plan is None:
      plan = self._chunk_plan(csr, chunk_elems, mesh=mesh)
    d = factors.shape[1]
    factors_pad = jnp.concatenate(
        [factors, jnp.zeros((1, d), factors.dtype)], axis=0)
    gram = _gram(factors)
    alpha = jnp.float32(self.alpha)
    out = jnp.zeros((plan['n_rows'], d), jnp.float32)
    solve_into = _solve_rows_into
    if mesh is not None:
      rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
      factors_pad = jax.device_put(factors_pad, rep)
      gram = jax.device_put(gram, rep)
      out = jax.device_put(out, rep)
      solve_into = _mesh_solve_into(mesh)
    for c in plan['chunks']:
      out = solve_into(out, factors_pad, gram, c['rows'],
                       c['cols'], c['vals'], alpha, c['reg'])
    return out

  def objective(self, train_matrix):
    """The exact iALS objective on the fitted factors (host math;
    diagnostic — ALS decreases it monotonically every half-sweep)."""
    import scipy.sparse as sp

    assert self.item_factors is not None, 'call fit() first'
    m = sp.csr_matrix(train_matrix, copy=True).astype(np.float64)
    m.eliminate_zeros()  # same convention as fit(): an explicit zero
    # is NOT an observation (it would otherwise count as a c=1, s=1
    # cell and inflate the frequency-scaled reg nnz counts, making
    # this diagnostic disagree with the objective ALS minimized)
    # [:n_users] trims the factor_sharding='users' zero pad rows
    u = np.asarray(self.user_factors, np.float64)[:m.shape[0]]
    v = np.asarray(self.item_factors, np.float64)

    # sum over ALL pairs of 1 * (0 - x.y)^2 = tr(U^T U V^T V), then
    # correct the observed cells from 1*(x.y)^2 to c*(1 - x.y)^2
    gu, gv = u.T @ u, v.T @ v
    total = float(np.sum(gu * gv))
    coo = m.tocoo()
    s = np.einsum('nd,nd->n', u[coo.row], v[coo.col])
    c = 1.0 + self.alpha * coo.data
    total += float(np.sum(c * (1.0 - s) ** 2 - s ** 2))
    nnz_u = np.diff(m.indptr)
    nnz_v = np.diff(m.tocsc().indptr)
    if self.reg_scaling == 'frequency':
      ru = self.lam * (nnz_u + 1.0)
      rv = self.lam * (nnz_v + 1.0)
    else:
      ru = np.full(m.shape[0], self.lam)
      rv = np.full(m.shape[1], self.lam)
    total += float(ru @ np.einsum('nd,nd->n', u, u))
    total += float(rv @ np.einsum('nd,nd->n', v, v))
    return total

  # -- inference ---------------------------------------------------------

  def fold_in(self, users_interactions):
    """Query-user factors [B, d] solved against the fitted item
    factors with the exact training solve (a training user's history
    reproduces their trained factor)."""
    assert self.item_factors is not None, 'call fit() or load() first'
    m = users_interactions.interactions_matrix.tocsr().astype(np.float32)
    m.eliminate_zeros()  # same convention as fit()
    if m.nnz and m.data.min() < 0:
      # same validation as fit(): c = 1 + alpha * r needs r >= 0; a
      # negative value would make the per-row system indefinite and
      # jnp.linalg.cholesky returns NaN instead of raising, so
      # predict()/recommend() would silently emit garbage
      raise ValueError('iALS fold-in requires non-negative '
                       'interaction values')
    if m.shape[1] != self.num_items:
      raise ValueError(f'input has {m.shape[1]} items, model was fit '
                       f'on {self.num_items}')
    return self._solve_side(m, self.item_factors)

  def predict(self, users_interactions, return_input=False):
    """Dense scores [B, num_items] via fold-in + one MXU matmul."""
    x = self.fold_in(users_interactions)
    scores = jnp.matmul(x, self.item_factors.T,
                        precision=jax.lax.Precision.HIGHEST)
    if return_input:
      xd = jnp.asarray(np.asarray(
          users_interactions.interactions_matrix.todense(), np.float32))
      return scores, xd
    return scores

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
    """Write fitted factors + hyperparameters to ``path`` (npz,
    crash-safe atomic swap like every other checkpoint here)."""
    assert self.item_factors is not None, 'nothing to save: fit() first'
    n = self.num_users or self.user_factors.shape[0]
    save_checkpoint(
        path,
        # [:n] trims the factor_sharding='users' zero pad rows, so the
        # checkpoint format is identical across fit modes
        {'user_factors': np.asarray(self.user_factors)[:n],
         'item_factors': np.asarray(self.item_factors)},
        {'model': 'ials', 'embedding_size': self.embedding_size,
         'alpha': self.alpha, 'lam': self.lam, 'sweeps': self.sweeps,
         'reg_scaling': self.reg_scaling, 'num_items': self.num_items,
         'recoder_version': recoder_tpu.__version__})
    return path

  def load(self, path):
    """Restore a model saved by :meth:`save`."""
    arrays, meta = load_checkpoint(path)
    if meta.get('model') != 'ials':
      raise ValueError(f'{path} is not an iALS checkpoint: {meta}')
    self.embedding_size = int(meta['embedding_size'])
    self.alpha = float(meta['alpha'])
    self.lam = float(meta['lam'])
    self.sweeps = int(meta['sweeps'])
    self.reg_scaling = str(meta['reg_scaling'])
    self.num_items = int(meta['num_items'])
    self.user_factors = jnp.asarray(arrays['user_factors'])
    self.item_factors = jnp.asarray(arrays['item_factors'])
    self.num_users = int(self.user_factors.shape[0])
    return self
