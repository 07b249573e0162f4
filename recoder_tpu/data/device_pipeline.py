"""On-device data pipeline: CSR resident in HBM, batches built inside jit.

The reference builds every mini-batch on the host (scipy slicing +
np.unique, data.py:203-251) and ships it to the device each step
(model.py:457-458). On TPU -- especially through a high-latency host
tunnel -- per-step host->device transfers dominate the step time, so
this pipeline uploads the training CSR **once** and reconstructs the
reference's exact batch semantics on device, inside the jitted train
step:

  1. epoch shuffle: ``jax.random.permutation`` over users, on device;
  2. mega-batch gather: each step slices ``num_sampling_users`` users'
     interactions out of the flat CSR arrays with vectorized
     searchsorted indexing (no host round trip);
  3. item-union negative sampling: sort + first-occurrence ranking
     reproduces ``np.unique(..., return_inverse=True)`` (data.py:220)
     with static shapes: the union is scattered into a fixed-width
     ``items`` vector padded with the sentinel id;
  4. densify: scatter the slice's (row, compressed-col, value) triplets
     into the [batch, union] slab.

All shapes are static (budgets with safety margins, overflow truncates
the rare oversized mega-batch tail); one compiled program serves the
whole run.
"""

import functools
import logging
import math

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


class FusedPipelineUnavailable(ValueError):
  """This configuration cannot be served by the fused device pipeline
  (e.g. precompute tables past the byte budget with a target matrix);
  the trainer catches this and falls back to the host loader."""


def _exact_block_budget(indptr, n_blocks, mega, n_users):
  """Max nnz over the fixed contiguous user blocks, 1024-aligned."""
  edges = np.minimum(np.arange(n_blocks + 1) * mega, n_users)
  block_nnz = indptr[edges[1:]] - indptr[edges[:-1]]
  budget = max(int(block_nnz.max()), 1)
  return (budget + 1023) // 1024 * 1024


def _padded_counts_starts(indptr, n_pad, n_users):
  """Per-user nnz counts and CSR row starts, padded with empty users."""
  counts_pad = np.zeros(n_pad, np.int32)
  counts_pad[:n_users] = np.diff(indptr)
  starts_pad = np.zeros(n_pad, np.int32)
  starts_pad[:n_users] = indptr[:-1]
  return counts_pad, starts_pad


class DeviceDataSource:
  """A training CSR matrix resident on device, sliceable inside jit.

  Args:
    matrix (scipy.sparse.csr_matrix): user-item interactions.
    batch_size (int): users per compute batch.
    num_sampling_users (int): mega-batch size (>= batch_size, multiple).
    num_items (int): logical catalog size (pad sentinel id).
    union_width (int): static width of the item-union vector.
    mega_nnz_budget (int, optional): static nnz budget per mega-batch;
      defaults to 1.1x the worst sampled window, aligned to 1024.
    binary (bool, optional): force value-free (all-ones) mode; detected
      from the data when None.
    mesh (jax.sharding.Mesh, optional): when given, the resident CSR
      arrays live across the mesh so the batch build runs SPMD; the
      trainer's sharding constraint on the densified slab then splits
      the users axis over 'data' and the model math splits tables over
      'model'. By default the arrays are replicated (zero
      communication -- the right trade while they fit HBM); past
      ``SHARD_TABLES_BYTE_BUDGET`` the blocks-mode tables and CSR
      shard over the 'data' axis instead (``table_sharding``), with
      per-step shard_map owner-slice + psum fetches, so per-chip
      residency scales 1/data_ways for pod-scale catalogs.
    shuffle (str): 'users' (default) draws every mega-batch as a fresh
      random user subset (the reference's RandomSampler semantics,
      data.py:121-126): M-length gathers assemble the scattered CSR
      rows. 'blocks' keeps users in fixed contiguous mega-batch blocks
      and shuffles only the block ORDER each epoch: the block's CSR
      range is contiguous, so two dynamic_slices replace the gathers
      (the profiled ~8 ns/element scalar-core cost), and -- because the
      co-batch groups are fixed -- each block's item union, inverse
      column map, and row-owner vector are precomputed on host at init
      and served per step as contiguous row fetches (no on-device
      sort/unique at all; ``union_width`` is right-sized to the exact
      max block union). Trade-off: each user keeps the same co-batch
      group across epochs, so the negative-sampling mix does not
      refresh -- measured convergence comparison in docs/benchmarks.md;
      offered as an opt-in.
    table_sharding ('auto' | 'data' | None): storage layout of the
      blocks-mode tables and CSR on a multi-chip mesh -- see the
      ``mesh`` entry. 'auto' (default) shards past the byte budget;
      'data' forces sharding; None forces replication.
  """

  #: replicated resident bytes past which 'auto' table sharding
  #: engages (per chip; tables + CSR replicated on every chip is the
  #: right trade until they crowd model + slab out of HBM)
  SHARD_TABLES_BYTE_BUDGET = 2 << 30

  def __init__(self, matrix, batch_size, num_sampling_users, num_items,
               union_width, mega_nnz_budget=None, binary=None, mesh=None,
               shuffle='users', num_random_negatives=0, seed=0,
               target_matrix=None, table_sharding='auto'):
    assert shuffle in ('users', 'blocks'), shuffle
    if target_matrix is not None and (shuffle != 'blocks'
                                      or num_random_negatives):
      # the dual-CSR path is served entirely from precomputed block
      # tables (both sides need exact unions); other configurations
      # keep the host loader (reference data.py:146-158 collates input
      # and target independently -- that is what the tables replicate)
      raise ValueError('target_matrix requires shuffle="blocks" '
                       'without random negatives')
    self.shuffle = shuffle
    self.mesh = mesh
    self.num_random_negatives = int(num_random_negatives)
    # >HBM catalogs: shard the big resident arrays (block tables +
    # blocks-mode CSR) over the mesh 'data' axis instead of
    # replicating them per chip. Fetches go through shard_map (owner
    # shard slices locally, one [M]-sized psum broadcasts) -- a plain
    # GSPMD dynamic_slice on a sharded operand all-gathers the WHOLE
    # table per step (verified on the virtual mesh), which is worse
    # than replication. 'auto' engages past SHARD_TABLES_BYTE_BUDGET;
    # blocks mode only (the users-mode per-epoch tables stay
    # replicated -- their build is a batched all-blocks pass).
    self._data_ways = 1
    if mesh is not None and 'data' in mesh.shape:
      self._data_ways = int(mesh.shape['data'])
    self.table_sharding = None
    self._want_table_sharding = table_sharding
    matrix = matrix.tocsr()
    self.num_users_total = matrix.shape[0]
    self.num_items = num_items
    self.batch_size = batch_size
    self.mega = num_sampling_users
    assert self.mega % batch_size == 0
    self.slices_per_mega = self.mega // batch_size
    self.steps_per_epoch = math.ceil(self.num_users_total / batch_size)
    self.union_width = union_width

    indptr = matrix.indptr.astype(np.int32)
    counts = np.diff(indptr)

    if mega_nnz_budget is None:
      if shuffle == 'blocks':
        # blocks are fixed contiguous user ranges: the max block nnz is
        # exact, no overflow possible
        mega_nnz_budget = _exact_block_budget(
            indptr, math.ceil(self.num_users_total / self.mega),
            self.mega, self.num_users_total)
      else:
        # estimate from random shuffled windows (what training actually
        # draws); a 12% margin over a 128-sample max makes overflow --
        # which truncates that mega-batch's tail and triggers a
        # budget-grow rebuild -- rare. Budget size scales every
        # [n_blocks, M] pass of the epoch-table build and the
        # per-step densify, so a tight estimate matters (the earlier
        # 32-sample/25% margin left ~12% pure padding at ML-20M shape).
        rng = np.random.default_rng(4321)
        n = self.num_users_total
        window = min(self.mega, n)
        max_win = 1
        for _ in range(128):
          idx = rng.choice(n, size=window, replace=False)
          max_win = max(max_win, int(counts[idx].sum()))
        mega_nnz_budget = int(max_win * 1.12) + 256
        mega_nnz_budget = (mega_nnz_budget + 1023) // 1024 * 1024
    self.mega_nnz_budget = mega_nnz_budget

    if binary is None:
      binary = bool(np.all(matrix.data == 1.0))
    self.binary = binary
    # dense-slab cache eligibility (see maybe_cache_slabs): the mask
    # recovered from a cached slab (any(slab != 0)) only matches the
    # triplet-scatter mask when no stored value is an explicit zero,
    # and bf16 storage is only used when every value round-trips
    # exactly (binary data trivially satisfies both)
    self.d_slab = None
    self._slab_width = None
    self._slab_packed = False
    self._slab_request = None  # the request that established the cache
    if binary:
      self._vals_all_nonzero = True
      self._vals_bf16_exact = True
    else:
      # computed lazily on the first maybe_cache_slabs call: the two
      # full-nnz host passes would otherwise tax every non-binary
      # source construction (incl. MSD-scale and overflow rebuilds)
      # that never uses the cache. matrix.data is held by reference,
      # not copied.
      self._vals_all_nonzero = None
      self._vals_bf16_exact = None
      self._host_vals = matrix.data

    # pad user axis so any perm slice of length `mega` is valid;
    # sentinel users have zero interactions
    n_pad = math.ceil(self.num_users_total / self.mega) * self.mega
    counts_pad, starts_pad = _padded_counts_starts(
        indptr, n_pad, self.num_users_total)

    self.n_blocks = n_pad // self.mega

    # decide table sharding before the big arrays land on device
    if (shuffle == 'blocks' and self._data_ways > 1
        and self._want_table_sharding is not None):
      nnz_bytes = matrix.nnz * (4 if binary else 8)
      table_bytes = self.n_blocks * (2 * self.mega_nnz_budget
                                     + self.union_width) * 4
      if target_matrix is not None:
        table_bytes *= 2  # target side is the same order of magnitude
      if (self._want_table_sharding == 'data'
          or (self._want_table_sharding == 'auto'
              and nnz_bytes + table_bytes
              > self.SHARD_TABLES_BYTE_BUDGET)):
        self.table_sharding = 'data'

    cols = matrix.indices.astype(np.int32)
    vals = matrix.data.astype(np.float32)
    if shuffle == 'blocks':
      # pad the nnz axis so a budget-wide dynamic_slice starting at any
      # block start stays in range (dynamic_slice would otherwise clamp
      # the start and misalign the block)
      cols = np.concatenate([cols, np.full(self.mega_nnz_budget,
                                           num_items, np.int32)])
      vals = np.concatenate([vals, np.zeros(self.mega_nnz_budget,
                                            np.float32)])

    put = self._put
    self.d_counts = put(jnp.asarray(counts_pad))
    self.d_starts = put(jnp.asarray(starts_pad))
    # counts and starts interleaved: the epoch-table build reads both
    # per shuffled user, and one row-gather of [n, 2] costs about half
    # of two element-gathers on the TPU scalar core. Only the
    # users-mode epoch build consumes it -- blocks sources skip the
    # duplicate storage
    self.d_cs = (put(jnp.asarray(
        np.stack([counts_pad, starts_pad], axis=1)))
        if shuffle == 'users' else None)
    if self.table_sharding is not None:
      self.d_cols = self._put_csr_chunks(cols)
      self.d_vals = None if binary else self._put_csr_chunks(vals)
    else:
      self.d_cols = put(jnp.asarray(cols))
      self.d_vals = None if binary else put(jnp.asarray(vals))
    self.n_pad = n_pad
    if self.num_random_negatives:
      self._d_negkey = put(jax.random.PRNGKey(seed + 7))

    # blocks mode with no random negatives: co-batch groups are FIXED,
    # so each block's item union, inverse column map, and row-owner
    # vector are epoch-invariant -- precompute them on host once and
    # serve each step with three contiguous row fetches instead of an
    # on-device sort/unique/scatter chain (see build_batch)
    self._precomputed = None
    if shuffle == 'blocks' and not self.num_random_negatives:
      tables, W = self._block_tables(matrix.indices.astype(np.int32),
                                     indptr, counts_pad,
                                     self.mega_nnz_budget)
      if tables is not None:
        self._precomputed = tables
        self.union_width = W

    # optional second CSR: per-user TARGET interactions (reference
    # data.py:146-158 -- input and target windows are collated
    # INDEPENDENTLY, each with its own np.unique union). Served from
    # precomputed block tables only (constructor guard above).
    self._tg = None
    if target_matrix is not None:
      if self._precomputed is None:
        raise FusedPipelineUnavailable(
            'target_matrix needs the precomputed block tables '
            '(input side exceeded the byte budget)')
      self._init_target_side(target_matrix, n_pad)

    # 'users' mode: the union/owner tables are not epoch-invariant,
    # but the epoch PERMUTATION is known at epoch start -- so the same
    # tables the blocks mode precomputes once are built per epoch ON
    # DEVICE in ONE batched jit call (epoch_state): a [n_blocks, M]
    # sort replaces the per-step lax.sort, and every step then runs
    # the table-fetch path (blocks-mode cost) while keeping the
    # reference's fresh-random-co-batch semantics (data.py:121-126).
    # Measured at ML-20M shape (v5e): 234 per-step sorts cost
    # ~0.46 ms each spread over the epoch and hold the step at
    # ~3.2 ms; the batched build costs ~0.15 s once per epoch and
    # drops the step to the ~1.7 ms blocks rate. A host-side build
    # (numpy + upload) was measured FAR worse through the tunneled
    # runtime (113 MB/epoch upload -> 133 b/s vs 306) and rejected.
    self._seed = seed
    self._epoch_states = {}
    self._epoch_build_fn = None
    bytes_per_epoch = self.n_blocks * (2 * self.mega_nnz_budget
                                       + self.union_width + 3) * 4
    if not self.binary:
      bytes_per_epoch += self.n_blocks * self.mega_nnz_budget * 4
    # current + prefetched epoch tables are alive at once
    self.users_precompute = (
        shuffle == 'users' and not self.num_random_negatives
        and target_matrix is None
        and 2 * bytes_per_epoch <= self.PRECOMPUTE_BYTE_BUDGET)

  def _init_target_side(self, target_matrix, n_pad):
    target_matrix = target_matrix.tocsr()
    assert target_matrix.shape[0] == self.num_users_total, \
        'target matrix must cover the same users'
    t_indptr = target_matrix.indptr.astype(np.int32)
    M_tg = _exact_block_budget(t_indptr, self.n_blocks, self.mega,
                               self.num_users_total)
    counts_pad, starts_pad = _padded_counts_starts(
        t_indptr, n_pad, self.num_users_total)

    tables, W_tg = self._block_tables(
        target_matrix.indices.astype(np.int32), t_indptr, counts_pad,
        M_tg)
    if tables is None:
      raise FusedPipelineUnavailable(
          'target-side block tables exceed the byte budget')

    binary = bool(np.all(target_matrix.data == 1.0))
    vals = np.concatenate([target_matrix.data.astype(np.float32),
                           np.zeros(M_tg, np.float32)])
    put = self._put
    if binary:
      d_vals = None
    elif self.table_sharding is not None:
      d_vals = self._put_csr_chunks(vals, halo=M_tg)
    else:
      d_vals = put(jnp.asarray(vals))
    self._tg = {
        'M': M_tg, 'W': W_tg, 'binary': binary, 'pre': tables,
        'd_counts': put(jnp.asarray(counts_pad)),
        'd_starts': put(jnp.asarray(starts_pad)),
        'd_vals': d_vals,
    }

  #: precomputed block tables are skipped past this many bytes
  #: (u_rel + inverse + union tables, before mesh replication)
  PRECOMPUTE_BYTE_BUDGET = 2 << 30

  def _block_tables(self, cols, indptr, counts_pad, M):
    """Host-side per-block union precompute ('blocks' mode).

    For every fixed user block of one CSR: ``np.unique(block_cols,
    return_inverse=True)`` (the reference's negative-sampling union,
    data.py:220) and the flat-slot -> user-row map. Returns
    ``(tables, W)`` with ``W`` the exact maximum block union aligned
    up to 128 lanes (replacing a sampled width estimate's safety
    margin), or ``(None, None)`` past the byte budget."""
    nb, S = self.n_blocks, self.mega
    sentinel = self.num_items
    n_users = self.num_users_total

    uniques, inverses = [], []
    for b in range(nb):
      lo, hi = b * S, min((b + 1) * S, n_users)
      c = cols[indptr[lo]:indptr[hi]]
      u, inv = np.unique(c, return_inverse=True)
      uniques.append(u)
      inverses.append(inv.astype(np.int32))

    w_exact = max((len(u) for u in uniques), default=1)
    W = (w_exact + 127) // 128 * 128
    # sharding spreads the tables over the data ways: the per-chip
    # budget scales accordingly
    ways = self._data_ways if self.table_sharding is not None else 1
    if nb * (2 * M + W) * 4 > ways * self.PRECOMPUTE_BYTE_BUDGET:
      return None, None
    if max((len(inv) for inv in inverses), default=0) > M:
      # an explicit (caller-starved) budget smaller than a block's nnz:
      # the runtime path truncates and reports overflow; the tables
      # cannot represent a truncated block, so fall back to it
      return None, None

    u_rel = np.full((nb, M), S, np.int32)
    cmp = np.zeros((nb, M), np.int32)
    unions = np.full((nb, W), sentinel, np.int32)
    widths = np.zeros((nb,), np.int32)
    for b in range(nb):
      u, inv = uniques[b], inverses[b]
      n = len(inv)
      cmp[b, :n] = inv
      unions[b, :len(u)] = u
      widths[b] = len(u)
      u_rel[b, :n] = np.repeat(
          np.arange(S, dtype=np.int32), counts_pad[b * S:(b + 1) * S])

    if self.table_sharding is not None:
      put_big = self._put_block_table
    else:
      put_big = lambda a: self._put(jnp.asarray(a))
    return {
        'u_rel': put_big(u_rel),
        'cmp': put_big(cmp),
        'unions': put_big(unions),
        'widths': self._put(jnp.asarray(widths)),  # tiny: replicated
    }, W

  def _put(self, arr):
    if self.mesh is None:
      return jax.device_put(arr)
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.device_put(arr, NamedSharding(self.mesh, P()))

  # -- 'data'-sharded table storage (>HBM catalogs) ---------------------

  @staticmethod
  def _shard_map(fn, mesh, in_specs, out_specs):
    try:
      from jax import shard_map as sm
    except ImportError:
      from jax.experimental.shard_map import shard_map as sm
    return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

  def _put_block_table(self, arr):
    """[n_blocks, X] table row-sharded over 'data' (block rows padded
    to a multiple of the data ways)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    D = self._data_ways
    nb = arr.shape[0]
    nb_pad = -(-nb // D) * D
    if nb_pad != nb:
      arr = np.concatenate(
          [arr, np.zeros((nb_pad - nb,) + arr.shape[1:], arr.dtype)])
    return jax.device_put(jnp.asarray(arr),
                          NamedSharding(self.mesh, P('data', None)))

  def _put_csr_chunks(self, arr, halo=None):
    """Flat CSR array as [D, chunk + halo] rows sharded over 'data':
    row d covers the global range [d*chunk, d*chunk + chunk + halo),
    so any halo-wide contiguous slice lives wholly on its owner shard
    (``arr`` arrives already sentinel-padded by ``halo``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    D = self._data_ways
    halo = self.mega_nnz_budget if halo is None else halo
    base = len(arr) - halo
    chunk = max(-(-base // D), 1)
    padded = np.full(D * chunk + halo, arr[-1], arr.dtype)
    padded[:len(arr)] = arr
    rows = np.stack([padded[d * chunk: d * chunk + chunk + halo]
                     for d in range(D)])
    return jax.device_put(jnp.asarray(rows),
                          NamedSharding(self.mesh, P('data', None)))

  def _row_fetch(self, table, block, width):
    """One [width] row of a block table, by (traced) block index.

    Replicated tables use a plain dynamic_slice. Sharded tables go
    through shard_map -- the owner shard slices locally and a
    [width]-sized psum broadcasts the row. (A GSPMD dynamic_slice on
    the sharded operand would all-gather the ENTIRE table per step --
    verified on the virtual mesh -- which defeats the sharding.)
    """
    if self.table_sharding is None:
      return jax.lax.dynamic_slice(table, (block, 0), (1, width))[0]
    from jax.sharding import PartitionSpec as P

    def local(chunk, blk):
      per = chunk.shape[0]
      idx = jax.lax.axis_index('data')
      owner = blk // per
      lb = jnp.where(owner == idx, blk - owner * per, 0)
      row = jax.lax.dynamic_slice(chunk, (lb, 0), (1, width))
      row = jnp.where(owner == idx, row, jnp.zeros_like(row))
      return jax.lax.psum(row, 'data')

    return self._shard_map(local, self.mesh,
                           (P('data', None), P()), P())(table, block)[0]

  def _csr_range(self, arr, start, width):
    """``width`` contiguous elements of a flat CSR array starting at a
    (traced) offset; sharded arrays resolve via the halo chunks."""
    if self.table_sharding is None:
      return jax.lax.dynamic_slice(arr, (start,), (width,))
    from jax.sharding import PartitionSpec as P
    chunk_len = arr.shape[1] - width

    def local(chunk, st):
      idx = jax.lax.axis_index('data')
      owner = jnp.minimum(st // chunk_len, self._data_ways - 1)
      ls = jnp.where(owner == idx, st - owner * chunk_len, 0)
      seg = jax.lax.dynamic_slice(chunk[0], (ls,), (width,))
      seg = jnp.where(owner == idx, seg, jnp.zeros_like(seg))
      return jax.lax.psum(seg, 'data')

    return self._shard_map(local, self.mesh,
                           (P('data', None), P()), P())(arr, start)

  # -- passing the resident arrays as jit ARGUMENTS ---------------------
  # A jitted step that merely closes over the CSR + table arrays ships
  # them inside the serialized program (hundreds of MB at MSD scale --
  # the axon remote-compile tunnel rejects it outright with HTTP 413,
  # and every source rebuild forces a retrace). The trainer instead
  # fetches `device_arrays()` once and passes the pytree as a step
  # argument; `bound()` temporarily rebinds the attributes to the
  # traced values while `build_batch` runs under trace.

  _ARRAY_ATTRS = ('d_counts', 'd_starts', 'd_cs', 'd_cols', 'd_vals',
                  'd_slab', '_d_negkey', '_precomputed', '_tg')

  def device_arrays(self):
    """The device-resident pytree the fused step needs, for passing
    as a jit argument (see class comment above). Array leaves only:
    the static entries of ``_tg`` (budgets, binary flag) must stay
    Python values, not traced arrays."""
    out = {}
    for name in self._ARRAY_ATTRS:
      v = getattr(self, name, None)
      if v is None:
        continue
      if name == '_tg':
        v = {k: x for k, x in v.items()
             if k in ('pre', 'd_counts', 'd_starts', 'd_vals')
             and x is not None}
      out[name] = v
    return out

  def bound(self, arrays):
    """Context manager: rebind the resident-array attributes to the
    (possibly traced) values in ``arrays`` for the duration."""
    import contextlib

    @contextlib.contextmanager
    def cm():
      saved = {name: getattr(self, name, None) for name in arrays}
      try:
        for name, v in arrays.items():
          if name == '_tg':
            v = {**self._tg, **v}
          setattr(self, name, v)
        yield
      finally:
        for name, v in saved.items():
          setattr(self, name, v)
    return cm()

  def epoch_permutation(self, key):
    """Per-epoch shuffle state: shuffled user ids padded with sentinel
    users ('users' mode), or shuffled block indices ('blocks' mode).

    The partially-filled tail block (present when num_users is not a
    multiple of the mega size) is PINNED to the last permutation slot:
    steps_per_epoch = ceil(num_users / batch_size) only covers every
    real user if the block whose trailing slices are pure padding is
    the one that gets cut off -- a shuffled tail block mid-epoch would
    waste its pad slices and silently skip the real slices of whichever
    block landed last."""
    if self.shuffle == 'blocks':
      if self.n_pad > self.num_users_total and self.n_blocks > 1:
        head = jax.random.permutation(key, self.n_blocks - 1)
        perm = jnp.concatenate(
            [head, jnp.array([self.n_blocks - 1], head.dtype)])
      else:
        perm = jax.random.permutation(key, self.n_blocks)
      return self._put(perm.astype(jnp.int32))
    perm = jax.random.permutation(key, self.num_users_total)
    pad = jnp.arange(self.num_users_total, self.n_pad, dtype=perm.dtype)
    return self._put(jnp.concatenate([perm, pad]).astype(jnp.int32))

  # -- resident dense-slab cache (full-decode mode) ---------------------
  # In full-decode mode a user's dense input row is [catalog]-wide raw
  # column ids -- independent of which mega-batch the user lands in.
  # The whole densified matrix [n_pad, catalog_pad] is therefore
  # EPOCH-INVARIANT and can be cached in HBM once: each step then
  # fetches its B rows with one contiguous dynamic_slice (blocks mode)
  # or one row gather (users mode) instead of running the ~8 ns/element
  # scalar-core triplet scatter (~0.43 ms of the 1.08 ms step at ML-20M
  # shape), and the users-mode per-epoch table build disappears
  # entirely. Storage is bf16 when every value round-trips exactly
  # (binary data always does; the step upcasts to the compute dtype, so
  # the slab values -- and hence the gradients -- are bit-identical to
  # the scatter path's), else f32. The capacity trade is the point:
  # ~4.7 GiB at ML-20M shape on a 16 GiB chip, auto-declined when it
  # does not fit (or at MSD-class catalogs, where full decode is not
  # selected anyway).

  #: fraction of currently-free HBM the 'auto' cache may claim
  SLAB_CACHE_HBM_FRACTION = 0.5

  def maybe_cache_slabs(self, width, request='auto'):
    """Build (or decline) the resident dense-slab cache for
    full-decode steps at catalog width ``width``.

    ``request``: 'auto' enables it when eligible and within the HBM
    budget; True skips the budget check; 'packed' forces the
    bit-packed tier (binary data only); False disables. Returns
    whether the cache is active. Eligibility: single-slice mega
    batches (the full-decode loss mask must span the whole mega, and
    it is recovered from the slab), no 'data'-sharded CSR storage, and
    no explicit zero values (an explicit zero cannot be represented in
    a dense slab, so the recovered mask would differ).

    Two storage tiers. The DENSE tier stores values directly (bf16
    when every value round-trips exactly, else f32); steps fetch B
    rows with no further work. The PACKED tier (binary data only)
    stores one BIT per cell -- 16x smaller than bf16, ~2.5 GiB at
    MSD's 571k x 41k vs the ineligible ~44 GiB -- and each step
    unpacks its B rows with a shift/and (exact for 0/1 values, so
    gradients stay bit-identical to the scatter path's). 'auto'
    prefers dense within budget and falls back to packed; the unpack
    is one extra VPU pass but the row fetch reads 1/16th the bytes."""
    if request is False:
      self.d_slab = None
      self._slab_width = None
      self._slab_packed = False
      self._slab_request = None
      return False
    if request not in ('auto', True, 'packed'):
      raise ValueError(
          f'slab_cache={request!r}: expected one of False (off), '
          f"'auto' (budget-checked), True (force the dense tier) or "
          f"'packed' (force the 1-bit tier, binary data only)")
    width = int(width)
    if self.d_slab is not None and self._slab_width == width:
      # reuse unless a forced request names the OTHER tier
      if not ((request is True and self._slab_packed)
              or (request == 'packed' and not self._slab_packed)):
        return True
    reason = None
    if self.slices_per_mega != 1:
      reason = 'num_sampling_users > batch_size'
    elif self.table_sharding is not None:
      reason = "'data'-sharded CSR storage"
    elif request == 'packed' and not self.binary:
      reason = "slab_cache='packed' requires binary (all-ones) values"
    else:
      if self._vals_all_nonzero is None:  # deferred from __init__
        data_f32 = self._host_vals.astype(np.float32)
        self._vals_all_nonzero = bool(np.all(data_f32 != 0.0))
        self._vals_bf16_exact = bool(np.array_equal(
            data_f32.astype(jnp.bfloat16).astype(np.float32), data_f32))
      if not self._vals_all_nonzero:
        reason = 'matrix stores explicit zero values'
    dtype = jnp.bfloat16 if self._vals_bf16_exact else jnp.float32
    packed = request == 'packed'
    if reason is None and not packed:
      nbytes = self.n_pad * width * jnp.dtype(dtype).itemsize
      if request is not True and nbytes > self._slab_cache_budget():
        if self.binary and width % 32 == 0 \
            and self.n_pad * (width // 32) * 4 <= self._slab_cache_budget():
          packed = True  # dense over budget; the 1-bit tier fits
        else:
          reason = ('%.2f GiB exceeds the free-HBM budget '
                    '(slab_cache=True forces it)' % (nbytes / 2**30))
    if reason is None and packed and width % 32 != 0:
      reason = 'packed tier needs width %% 32 == 0 (got %d)' % width
    if reason is not None:
      log.info('dense-slab cache disabled: %s', reason)
      self.d_slab = None
      self._slab_width = None
      self._slab_packed = False
      self._slab_request = None
      return False
    # free any prior slab BEFORE building its replacement: both tiers
    # resident at once during a tier/width switch makes the build's
    # OOM more likely, and the old cache is superseded either way
    self.d_slab = None
    self._slab_width = None
    self._slab_packed = False
    try:
      if packed:
        slab = self._put(self._build_slab_cache_packed(width))
      else:
        slab = self._put(self._build_slab_cache(width, dtype))
      # surface an allocator failure HERE, via a host fetch (the one
      # sync that is reliable through the tunneled runtime)
      np.asarray(jax.device_get(slab[:1, :1]))
    except Exception as e:  # RESOURCE_EXHAUSTED etc.: fall back to
      # the scatter path rather than failing the run -- the budget
      # check is a heuristic (memory_stats is unavailable on some
      # backends), so the build itself is the final arbiter
      log.warning('dense-slab cache build failed (%s); falling back '
                  'to the per-step scatter', e)
      self.d_slab = None
      self._slab_width = None
      self._slab_packed = False
      self._slab_request = None
      return False
    self.d_slab = slab
    self._slab_width = width
    self._slab_packed = packed
    self._slab_request = request
    # per-epoch fd table states are superseded by the cache
    for k in [k for k in self._epoch_states if k[1]]:
      del self._epoch_states[k]
    log.info('dense-slab cache enabled: [%d, %d] %s (%.2f GiB)',
             self.n_pad, width,
             'bit-packed' if packed else jnp.dtype(dtype).name,
             slab.size * slab.dtype.itemsize / 2**30)
    return True

  def _slab_cache_budget(self):
    try:
      stats = jax.local_devices()[0].memory_stats() or {}
      limit = stats.get('bytes_limit')
      if limit:
        free = limit - stats.get('bytes_in_use', 0)
        return max(0, int(self.SLAB_CACHE_HBM_FRACTION * free))
    except Exception:  # backends without memory stats
      pass
    # no stats (axon/CPU): assume a 16 GiB-class chip with half kept
    # free for the working set; a wrong guess is recoverable -- the
    # build itself OOM-falls-back in maybe_cache_slabs
    return 8 << 30

  def _build_slab_cache(self, width, out_dtype):
    """One batched on-device densify of the whole resident CSR into
    [n_pad, width] (storage dtype cast at the end). The owner map
    comes from scatter-marks + cumsum over the flat nnz axis -- the
    same formulation the per-step build uses (build_batch)."""
    def build(arrays):
      with self.bound(arrays):
        cols = self.d_cols
        n = cols.shape[0]
        # starts of empty users coincide with their successor's: the
        # stacked marks make the cumsum skip them, which is correct
        # (no flat slot belongs to an empty user). Only REAL users'
        # starts participate -- sentinel pad users carry start 0
        # (_padded_counts_starts), which would shift the whole owner
        # map; their slab rows stay zero because no slot maps to them.
        starts = jax.lax.slice(self.d_starts, (0,),
                               (self.num_users_total,))
        marks = jnp.zeros((n,), jnp.int32).at[starts].add(
            1, mode='drop')
        u = jnp.cumsum(marks) - 1
        vals = (jnp.ones((n,), jnp.float32) if self.binary
                else self.d_vals)
        vals = jnp.where(cols < self.num_items, vals, 0.0)
        # scatter straight in the storage dtype: each cell receives at
        # most ONE add (tocsr() canonicalizes duplicates), and bf16
        # storage is only chosen when every value is exactly
        # representable, so 0 + v is exact -- and the build's peak HBM
        # is the final cache size, not f32-slab + cast copy
        slab = jnp.zeros((self.n_pad, width), out_dtype)
        return slab.at[u, cols].add(vals.astype(out_dtype), mode='drop')

    arrays = {k: v for k, v in self.device_arrays().items()
              if k in ('d_counts', 'd_starts', 'd_cols', 'd_vals')}
    return jax.jit(build)(arrays)

  def _build_slab_cache_packed(self, width):
    """One batched on-device densify of the whole resident CSR into
    bit-packed [n_pad, width // 32] uint32 words (col -> bit
    ``col & 31`` of word ``col >> 5``). tocsr() canonicalizes
    duplicates, so each (user, col) bit is set by at most ONE scatter
    slot and add == bitwise-OR exactly (distinct powers of two never
    carry). Sentinel / out-of-catalog cols route to word index
    n_words, dropped by the scatter (the dense build zeroes their
    VALUES instead; a packed slab must drop the bit itself or the
    recovered loss mask would include a padding column)."""
    n_words = width // 32

    def build(arrays):
      with self.bound(arrays):
        cols = self.d_cols
        n = cols.shape[0]
        starts = jax.lax.slice(self.d_starts, (0,),
                               (self.num_users_total,))
        marks = jnp.zeros((n,), jnp.int32).at[starts].add(
            1, mode='drop')
        u = jnp.cumsum(marks) - 1
        word = jnp.where(cols < self.num_items, cols >> 5, n_words)
        bit = jnp.left_shift(jnp.uint32(1),
                             (cols & 31).astype(jnp.uint32))
        packed = jnp.zeros((self.n_pad, n_words), jnp.uint32)
        return packed.at[u, word].add(bit, mode='drop')

    arrays = {k: v for k, v in self.device_arrays().items()
              if k in ('d_counts', 'd_starts', 'd_cols')}
    return jax.jit(build)(arrays)

  @staticmethod
  def _unpack_rows(packed):
    """[B, W/32] uint32 -> [B, W] bf16 zeros/ones (exact). One VPU
    shift/and fusion; bit b of word w is column ``w * 32 + b``."""
    B, n_words = packed.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.astype(jnp.bfloat16).reshape(B, n_words * 32)

  def _build_fd_from_cache(self, perm, step_idx, neg_step=None):
    """Full-decode step payload straight off the dense-slab cache: one
    B-row fetch (plus a bit-unpack in the packed tier), no triplet
    scatter, no overflow possible."""
    B, S, W = self.batch_size, self.mega, self._slab_width
    Wf = W // 32 if self._slab_packed else W  # fetch width
    m = step_idx  # slices_per_mega == 1 enforced at cache build
    if self.shuffle == 'blocks':
      block = perm[m]
      ustart = block * S
      slab = jax.lax.dynamic_slice(self.d_slab, (ustart, 0), (B, Wf))
      slice_users = ustart + jnp.arange(B, dtype=jnp.int32)
    else:
      slice_users = jax.lax.dynamic_slice(perm, (m * B,), (B,))
      # pad users index zero rows of the cache (rows >= num_users_total)
      slab = jnp.take(self.d_slab,
                      jnp.minimum(slice_users, self.n_pad - 1), axis=0)
    if self._slab_packed:
      slab = self._unpack_rows(slab)
    num_users = jnp.sum(slice_users < self.num_users_total)
    slice_users = jnp.minimum(slice_users, self.num_users_total)
    out = {
        'slab': slab, 'users': slice_users,
        'num_users': jnp.maximum(num_users, 1).astype(jnp.float32),
        'items': None, 'width_valid': jnp.int32(0), 'union_width': None,
        'overflow': jnp.zeros((2,), jnp.int32),
        'fd': True, 'fd_mask_from_slab': True,
    }
    if self.num_random_negatives:
      key = jax.random.fold_in(
          self._d_negkey, step_idx if neg_step is None else neg_step)
      out['fd_rand_ids'] = jax.random.randint(
          key, (self.num_random_negatives,), 0, self.num_items,
          jnp.int32)
    return out

  # -- per-epoch precomputed tables ('users' mode) ----------------------

  def prefetch_epoch(self, epoch, full_decode=False):
    """Dispatch the on-device build of ``epoch``'s users-mode tables
    (no-op unless this source precomputes). jit dispatch is async, so
    this only enqueues device work; the trainer calls it for e+1 at
    the start of epoch e so the build rides the device queue."""
    if not self.users_precompute or (epoch, full_decode) in \
        self._epoch_states:
      return
    if full_decode and self.d_slab is not None:
      return  # the dense-slab cache serves fd steps without tables
    self._epoch_states[(epoch, full_decode)] = \
        self._users_epoch_state(epoch, full_decode)

  def epoch_state(self, epoch, full_decode=False):
    """The per-epoch pytree the fused step consumes in 'users'
    precompute mode: permutation + owner/overflow tables (plus the
    union tables, or the raw mega cols in full-decode mode), built on
    device by one batched jit call (~0.15 s/epoch at ML-20M shape vs
    ~0.46 ms/step of per-step sorts; the full-decode build skips the
    sort entirely). Returns None when this source does not precompute
    (caller falls back to :meth:`epoch_permutation`)."""
    if not self.users_precompute:
      return None
    if full_decode and self.d_slab is not None:
      # cache mode needs no tables -- but it draws the SAME host
      # permutation the table build would, so toggling the cache never
      # changes the epoch's user order (trajectories stay comparable).
      # Run the stale-epoch sweep here too: a prior non-cached run's
      # final table set would otherwise stay resident beside the slab.
      for k in [k for k in self._epoch_states if k[0] < epoch]:
        del self._epoch_states[k]
      return {'perm': self._host_epoch_perm(epoch)}
    self.prefetch_epoch(epoch, full_decode)
    state = self._epoch_states[(epoch, full_decode)]
    for k in [k for k in self._epoch_states if k[0] < epoch]:
      del self._epoch_states[k]  # free the previous epoch's tables
    return state

  def _host_epoch_perm(self, epoch):
    # the permutation comes from host numpy: ~1 ms + a 4*n-byte upload
    # vs ~70 ms for jax.random.permutation on device (a single-row
    # 100k+-key sort badly underutilizes the TPU sort unit)
    rng = np.random.default_rng([self._seed + 1, epoch])
    perm = np.concatenate(
        [rng.permutation(self.num_users_total).astype(np.int32),
         np.arange(self.num_users_total, self.n_pad, dtype=np.int32)])
    return self._put(jnp.asarray(perm))

  def _users_epoch_state(self, epoch, full_decode=False):
    perm = self._host_epoch_perm(epoch)
    if self._epoch_build_fn is None:
      # the CSR arrays enter as jit ARGUMENTS (same rule as the fused
      # step, see device_arrays): closing over them bakes them into the
      # program as constants -- a duplicate HBM copy at trace time
      # (observed OOMing the epoch build at 8M items) and hundreds of
      # serialized MB at MSD scale
      def _build(perm, arrays, fd):
        with self.bound(arrays):
          return (self._build_epoch_tables_fd(perm) if fd
                  else self._build_epoch_tables(perm))
      self._epoch_build_fn = {
          fd: jax.jit(functools.partial(_build, fd=fd))
          for fd in (False, True)
      }
    arrays = {k: v for k, v in self.device_arrays().items()
              if k in ('d_cs', 'd_cols', 'd_vals')}
    state = dict(self._epoch_build_fn[bool(full_decode)](perm, arrays))
    state['perm'] = perm
    return state

  def _epoch_gather_stage(self, perm):
    """Shared prefix of the batched epoch-table builds: per-mega
    owner map and the gathered raw mega cols, [nb, M]."""
    S, M = self.mega, self.mega_nnz_budget
    nb = self.n_blocks
    sentinel = self.num_items

    perm2 = perm.reshape(nb, S)
    cs = self.d_cs[perm2]                            # [nb, S, 2]
    counts, starts = cs[..., 0], cs[..., 1]
    cum = jnp.cumsum(counts, axis=1)
    total = cum[:, -1]                               # [nb]
    offsets = cum - counts
    rows_s = jnp.broadcast_to(jnp.arange(nb)[:, None], (nb, S))
    marks = jnp.zeros((nb, M), jnp.int32) \
        .at[rows_s, offsets].add(1, mode='drop')
    u_of_j = jnp.cumsum(marks, axis=1) - 1           # [nb, M]
    j = jnp.arange(M, dtype=jnp.int32)[None, :]
    valid = j < total[:, None]
    adjust = starts - offsets                        # [nb, S]
    # adjust[u_of_j] as a piecewise-constant fill (scatter the deltas
    # at each user's segment start, cumsum): a take_along_axis gather
    # here costs ~11 ns/element on the TPU scalar core (~130 ms at
    # ML-20M shape); the scatter+cumsum form is ~1 ms
    prev = jnp.concatenate(
        [jnp.zeros((nb, 1), jnp.int32), adjust[:, :-1]], axis=1)
    fill = jnp.zeros((nb, M), jnp.int32) \
        .at[rows_s, offsets].add(adjust - prev, mode='drop')
    src = jnp.cumsum(fill, axis=1) + j
    src = jnp.where(valid, src, 0)
    cols = jnp.where(valid, self.d_cols[src], sentinel)
    return u_of_j, valid, cols, src, total

  def _build_epoch_tables_fd(self, perm):
    """Full-decode epoch tables: the gather stage only (owner map +
    raw mega cols + overflow) -- no sort, no union compression (the
    step decodes the full catalog and masks the loss columns)."""
    S, M = self.mega, self.mega_nnz_budget
    u_of_j, valid, cols, src, total = self._epoch_gather_stage(perm)
    state = {
        'u_rel': jnp.where(valid, u_of_j, S),
        'cols_raw': cols,
        'overflow': jnp.stack(
            [jnp.maximum(total - M, 0),
             jnp.zeros_like(total)], axis=1).astype(jnp.int32),
    }
    if not self.binary:
      state['vals'] = jnp.where(valid, self.d_vals[src], 0.0)
    return state

  def _build_epoch_tables(self, perm):
    """One epoch's users-mode tables, built on device in one batched
    pass: the per-mega ``np.unique`` union semantics of
    :meth:`_unique_union`, vectorized over all ``n_blocks`` megas
    ([nb, M] sort + scatters). When the catalog and the nnz budget
    both fit 16 bits, the (col, slot) pair packs into one uint32 so
    the sort moves one operand instead of two."""
    S, M, W = self.mega, self.mega_nnz_budget, self.union_width
    nb = self.n_blocks
    sentinel = self.num_items

    u_of_j, valid, cols, src, total = self._epoch_gather_stage(perm)
    j = jnp.arange(M, dtype=jnp.int32)[None, :]
    iota = jnp.broadcast_to(j, (nb, M))
    if sentinel <= 0xFFFF and M <= 0x10000:
      packed = ((cols.astype(jnp.uint32) << 16)
                | iota.astype(jnp.uint32))
      spacked = jax.lax.sort(packed, dimension=1)
      sc = (spacked >> 16).astype(jnp.int32)
      order = (spacked & 0xFFFF).astype(jnp.int32)
    else:
      sc, order = jax.lax.sort((cols, iota), dimension=1, num_keys=1)
    first = jnp.concatenate(
        [jnp.ones((nb, 1), bool), sc[:, 1:] != sc[:, :-1]], axis=1)
    ranks = (jnp.cumsum(first, axis=1) - 1).astype(jnp.int32)
    rows_m = jnp.broadcast_to(jnp.arange(nb)[:, None], (nb, M))
    unions = jnp.full((nb, W), sentinel, jnp.int32) \
        .at[rows_m, jnp.where(first, ranks, W)].set(sc, mode='drop')
    cmp = jnp.zeros((nb, M), jnp.int32).at[rows_m, order].set(ranks)
    widths_true = jnp.sum(jnp.logical_and(first, sc != sentinel),
                          axis=1).astype(jnp.int32)
    state = {
        'u_rel': jnp.where(valid, u_of_j, S),
        'cmp': cmp,
        'unions': unions,
        'widths': jnp.minimum(widths_true, W),
        'overflow': jnp.stack(
            [jnp.maximum(total - M, 0),
             jnp.maximum(widths_true - W, 0)], axis=1).astype(jnp.int32),
    }
    if not self.binary:
      state['vals'] = jnp.where(valid, self.d_vals[src], 0.0)
    return state

  # -- pure batch construction (called inside the jitted step) ----------

  def _unique_union(self, cols_m, valid, sentinel, M):
    """np.unique(cols, return_inverse=True) with static shapes: one
    lax.sort of the cols carrying an iota payload; first-occurrence
    mask + cumsum ranks; inverse scatter. O(M log M), independent of
    catalog size.

    (A catalog-sized presence-table formulation -- scatter-max presence
    + rank cumsum, O(M + num_items), no sort -- was measured at 4.31 vs
    3.93 ms/step at ML-20M scale and removed; TPU scatter cost exceeds
    the sort's.)
    """
    del valid
    sorted_cols, order = jax.lax.sort(
        (cols_m, jnp.arange(M, dtype=jnp.int32)), num_keys=1)
    first = jnp.concatenate([
        jnp.ones((1,), bool), sorted_cols[1:] != sorted_cols[:-1]])
    ranks_sorted = (jnp.cumsum(first) - 1).astype(jnp.int32)
    items = jnp.full((self.union_width,), sentinel, jnp.int32)
    items = items.at[jnp.where(first, ranks_sorted,
                               self.union_width)].set(
        sorted_cols, mode='drop')
    compressed = jnp.zeros((M,), jnp.int32).at[order].set(ranks_sorted)
    width_valid = jnp.sum(jnp.logical_and(first, sorted_cols != sentinel))
    return items, compressed, width_valid

  def build_batch(self, perm, step_idx, negative_sampling=True,
                  neg_step=None, full_decode=False):
    """Build one compute batch's dense inputs on device.

    Returns a dict: input_dense [B, W], items [W] (or None), masks and
    valid counts -- the same payload the host collator produces, built
    without leaving the device.

    ``neg_step`` seeds the random-negative draw (defaults to
    ``step_idx``; the trainer passes the GLOBAL step so the extra
    negatives refresh across epochs).

    ``perm`` may be an :meth:`epoch_state` pytree ('users' precompute
    mode): negative-sampling steps are then served entirely from the
    per-epoch tables; other configurations fall back to the general
    path using its permutation.

    ``full_decode`` (negative sampling only): emit RAW catalog column
    ids and no union -- the step decodes against the full item tables
    and masks the loss to the mega's columns, trading a slightly
    wider slab for zero union build, zero table-row gathers, and a
    pure-matmul backward (measured 1.73x on fwd+bwd at ML-20M shape,
    experiments/coo_forward.py). The trainer auto-selects it when the
    padded catalog is at most ~4x the union width.
    """
    if full_decode and negative_sampling and self.d_slab is not None:
      p = perm['perm'] if isinstance(perm, dict) else perm
      return self._build_fd_from_cache(p, step_idx, neg_step)
    if isinstance(perm, dict):
      if 'cols_raw' in perm:
        assert full_decode and negative_sampling
        return self._build_fd_from_epoch_tables(perm, step_idx)
      if negative_sampling and self._precomputed is None:
        return self._build_from_epoch_tables(perm, step_idx)
      perm = perm['perm']
    B = self.batch_size
    S = self.mega
    M = self.mega_nnz_budget
    spm = self.slices_per_mega
    sentinel = self.num_items

    m = step_idx // spm
    s = step_idx % spm

    if self.shuffle == 'blocks':
      # contiguous user block: the CSR range is contiguous too, so two
      # dynamic_slices replace the M-length gathers of 'users' mode
      # (the profiled scalar-core cost of the pipeline)
      block = perm[m]
      ustart = block * S
      counts = jax.lax.dynamic_slice(self.d_counts, (ustart,), (S,))
      nnz_start = jax.lax.dynamic_slice(self.d_starts, (ustart,), (1,))[0]
    else:
      users = jax.lax.dynamic_slice(perm, (m * S,), (S,))        # [S]
      counts = self.d_counts[users]                               # [S]
      starts = self.d_starts[users]                               # [S]
    cum = jnp.cumsum(counts)                                      # [S] incl.
    total = cum[-1]
    offsets = cum - counts                                        # excl.

    j = jnp.arange(M, dtype=jnp.int32)
    valid = j < total

    fd = bool(full_decode) and negative_sampling
    fd_rand_ids = None
    pre = self._precomputed if negative_sampling else None
    if pre is not None and fd:
      # full-decode blocks mode: owner map from the tables, RAW cols
      # straight off the contiguous CSR range -- no union fetch at all
      u_of_j = self._row_fetch(pre['u_rel'], block, M)
      compressed = jnp.where(
          valid, self._csr_range(self.d_cols, nnz_start, M), sentinel)
      items = None
      width_valid = jnp.int32(0)
      W = None
    elif pre is not None:
      # epoch-invariant block tables (host-precomputed at init): three
      # contiguous row fetches replace the sort/unique/scatter union
      # build and the marks+cumsum owner map of the general path
      u_of_j = self._row_fetch(pre['u_rel'], block, M)
      compressed = self._row_fetch(pre['cmp'], block, M)
      items = self._row_fetch(pre['unions'], block, self.union_width)
      width_valid = pre['widths'][block]
      W = self.union_width
    else:
      # u_of_j (owner user of flat slot j) via segment marks + cumsum:
      # a vectorized-searchsorted here costs ~4 ms at M~50k on TPU, the
      # scatter+cumsum form ~0.5 ms.
      marks = jnp.zeros((M,), jnp.int32).at[offsets].add(1, mode='drop')
      u_of_j = jnp.cumsum(marks) - 1

      if self.shuffle == 'blocks':
        cols_m = jnp.where(valid,
                           self._csr_range(self.d_cols, nnz_start, M),
                           sentinel)                                # [M]
      else:
        # flat gather indices for the mega-batch's nnz, budget M. The
        # per-slot CSR source index needs starts[u] - offsets[u];
        # profiling shows each M-length gather costs ~0.4 ms, so the
        # two are pre-combined into one adjustment table.
        u_clip = jnp.minimum(u_of_j, S - 1)
        adjust = starts - offsets                                   # [S]
        src = adjust[u_clip] + j
        src = jnp.where(valid, src, 0)
        cols_m = jnp.where(valid, self.d_cols[src], sentinel)       # [M]

      if negative_sampling and fd:
        # full decode: raw catalog ids, no union compression; random
        # negatives only need to join the loss MASK (see the trainer)
        compressed = cols_m
        items = None
        width_valid = jnp.int32(0)
        W = None
        if self.num_random_negatives:
          key = jax.random.fold_in(
              self._d_negkey, step_idx if neg_step is None else neg_step)
          fd_rand_ids = jax.random.randint(
              key, (self.num_random_negatives,), 0, self.num_items,
              jnp.int32)
      elif negative_sampling:
        R = self.num_random_negatives
        if R:
          # extra uniform-random negative items widen the union beyond
          # the mega-batch's own interactions -- coverage for catalogs
          # where in-batch unions touch a tiny item fraction (the CBNS
          # motivation, arXiv:2110.15154, re-cast for the union trick:
          # negatives here are decode columns, not cached embeddings).
          # The ids join the UNION ONLY (values scatter from the [:M]
          # slots), so their input/target columns are exactly zero.
          key = jax.random.fold_in(
              self._d_negkey, step_idx if neg_step is None else neg_step)
          rand_ids = jax.random.randint(key, (R,), 0, self.num_items,
                                        jnp.int32)
          union_in = jnp.concatenate([cols_m, rand_ids])
          items, compressed_ext, width_valid = self._unique_union(
              union_in, valid, sentinel, M + R)
          compressed = compressed_ext[:M]
        else:
          items, compressed, width_valid = self._unique_union(
              cols_m, valid, sentinel, M)
        W = self.union_width
      else:
        compressed = cols_m
        items = None
        width_valid = jnp.int32(self.num_items)
        W = None  # caller decides padded catalog width

    # slice s of the mega-batch
    lo_u, hi_u = s * B, s * B + B
    start_s = offsets[lo_u]
    # hi_u = s*B + B <= spm*B = S always (mega % batch_size == 0 is
    # asserted at construction), so cum[hi_u - 1] is always in range
    end_s = cum[hi_u - 1]
    rows_m = u_of_j - lo_u
    in_slice = jnp.logical_and(j >= start_s, j < end_s)
    in_slice = jnp.logical_and(in_slice, valid)
    rows_m = jnp.where(in_slice, rows_m, B)      # OOB row -> dropped
    if self.binary:
      vals_m = in_slice.astype(jnp.float32)
    elif self.shuffle == 'blocks':
      vals_m = jnp.where(in_slice,
                         self._csr_range(self.d_vals, nnz_start, M),
                         0.0)
    else:
      vals_m = jnp.where(in_slice, self.d_vals[src], 0.0)

    if self.shuffle == 'blocks':
      slice_users = ustart + s * B + jnp.arange(B, dtype=jnp.int32)
    else:
      slice_users = jax.lax.dynamic_slice(perm, (m * S + s * B,), (B,))
    num_users = jnp.sum(slice_users < self.num_users_total)
    # sentinel (pad) users may exceed the model's padded user axis:
    # clamp to the sentinel row `num_users_total`
    slice_users = jnp.minimum(slice_users, self.num_users_total)

    # overflow accounting: [0] = interactions beyond the nnz budget
    # (mega-batch tail truncated), [1] = union members beyond
    # union_width (highest-id items dropped). Zero in normal operation;
    # the trainer accumulates these per epoch, warns, and rebuilds the
    # source with grown budgets (silent data loss is not acceptable).
    nnz_dropped = jnp.maximum(total - M, 0).astype(jnp.int32)
    if negative_sampling and not fd:
      union_dropped = jnp.maximum(width_valid - self.union_width,
                                  0).astype(jnp.int32)
    else:
      union_dropped = jnp.int32(0)  # fd has no union to overflow
    # drops are mega-batch-level quantities; report them only on the
    # mega's FIRST slice so the epoch sums aren't inflated by
    # slices_per_mega (the max counters are unaffected either way)
    first_slice = (s == 0).astype(jnp.int32)
    overflow = jnp.stack([nnz_dropped, union_dropped]) * first_slice

    out = {
        'rows': rows_m, 'cols': compressed, 'vals': vals_m,
        'items': items, 'users': slice_users,
        'num_users': jnp.maximum(num_users, 1).astype(jnp.float32),
        'width_valid': width_valid,
        'union_width': W,
        'overflow': overflow,
    }
    if fd:
      out['fd'] = True
      out['fd_mask_from_slab'] = (self.slices_per_mega == 1
                                  and self.binary
                                  and fd_rand_ids is None)
      if fd_rand_ids is not None:
        out['fd_rand_ids'] = fd_rand_ids

    if self._tg is not None:
      if not negative_sampling:
        raise ValueError('dual-CSR fused batches require '
                         'negative_sampling=True (full-catalog target '
                         'runs use the host loader)')
      out.update(self._build_target_side(block, ustart, lo_u, hi_u))
    return out

  def _build_from_epoch_tables(self, state, step_idx):
    """Users-mode step from the per-epoch tables: the same payload as
    the general path, with the CSR gathers, ``lax.sort`` union build,
    and owner-map cumsum all replaced by contiguous table row fetches
    (the blocks-mode fast path, now under a fresh permutation each
    epoch)."""
    B, S = self.batch_size, self.mega
    M, W = self.mega_nnz_budget, self.union_width
    spm = self.slices_per_mega
    m = step_idx // spm
    s = step_idx % spm

    u_of_j = jax.lax.dynamic_slice(state['u_rel'], (m, 0), (1, M))[0]
    compressed = jax.lax.dynamic_slice(state['cmp'], (m, 0), (1, M))[0]
    items = jax.lax.dynamic_slice(state['unions'], (m, 0), (1, W))[0]
    width_valid = state['widths'][m]

    lo_u, hi_u = s * B, s * B + B
    # padded slots carry owner S, outside every slice range
    in_slice = jnp.logical_and(u_of_j >= lo_u, u_of_j < hi_u)
    rows_m = jnp.where(in_slice, u_of_j - lo_u, B)
    if self.binary:
      vals_m = in_slice.astype(jnp.float32)
    else:
      vals_row = jax.lax.dynamic_slice(state['vals'], (m, 0), (1, M))[0]
      vals_m = jnp.where(in_slice, vals_row, 0.0)

    slice_users = jax.lax.dynamic_slice(state['perm'],
                                        (m * S + s * B,), (B,))
    num_users = jnp.sum(slice_users < self.num_users_total)
    slice_users = jnp.minimum(slice_users, self.num_users_total)

    first_slice = (s == 0).astype(jnp.int32)
    overflow = jax.lax.dynamic_slice(state['overflow'], (m, 0),
                                     (1, 2))[0] * first_slice
    return {
        'rows': rows_m, 'cols': compressed, 'vals': vals_m,
        'items': items, 'users': slice_users,
        'num_users': jnp.maximum(num_users, 1).astype(jnp.float32),
        'width_valid': width_valid,
        'union_width': W,
        'overflow': overflow,
    }

  def _build_fd_from_epoch_tables(self, state, step_idx):
    """Users-mode full-decode step from the gather-only epoch tables:
    owner map + raw mega cols, no union at all (see build_batch)."""
    B, S = self.batch_size, self.mega
    M = self.mega_nnz_budget
    spm = self.slices_per_mega
    m = step_idx // spm
    s = step_idx % spm

    u_of_j = jax.lax.dynamic_slice(state['u_rel'], (m, 0), (1, M))[0]
    compressed = jax.lax.dynamic_slice(state['cols_raw'], (m, 0),
                                       (1, M))[0]
    lo_u, hi_u = s * B, s * B + B
    in_slice = jnp.logical_and(u_of_j >= lo_u, u_of_j < hi_u)
    rows_m = jnp.where(in_slice, u_of_j - lo_u, B)
    if self.binary:
      vals_m = in_slice.astype(jnp.float32)
    else:
      vals_row = jax.lax.dynamic_slice(state['vals'], (m, 0), (1, M))[0]
      vals_m = jnp.where(in_slice, vals_row, 0.0)

    slice_users = jax.lax.dynamic_slice(state['perm'],
                                        (m * S + s * B,), (B,))
    num_users = jnp.sum(slice_users < self.num_users_total)
    slice_users = jnp.minimum(slice_users, self.num_users_total)

    first_slice = (s == 0).astype(jnp.int32)
    overflow = jax.lax.dynamic_slice(state['overflow'], (m, 0),
                                     (1, 2))[0] * first_slice
    return {
        'rows': rows_m, 'cols': compressed, 'vals': vals_m,
        'items': None, 'users': slice_users,
        'num_users': jnp.maximum(num_users, 1).astype(jnp.float32),
        'width_valid': jnp.int32(0),
        'union_width': None,
        'overflow': overflow,
        'fd': True,
        'fd_mask_from_slab': (spm == 1 and self.binary),
    }

  def _build_target_side(self, block, ustart, lo_u, hi_u):
    """Target-side slab triplets for the same user block, from the
    target CSR's own precomputed block tables (independent union,
    reference data.py:146-158 semantics)."""
    tgt = self._tg
    S, B = self.mega, self.batch_size
    Mt, Wt, pre = tgt['M'], tgt['W'], tgt['pre']
    counts = jax.lax.dynamic_slice(tgt['d_counts'], (ustart,), (S,))
    nnz_start = jax.lax.dynamic_slice(tgt['d_starts'], (ustart,), (1,))[0]
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts
    j = jnp.arange(Mt, dtype=jnp.int32)
    valid = j < total

    u_of_j = self._row_fetch(pre['u_rel'], block, Mt)
    compressed = self._row_fetch(pre['cmp'], block, Mt)
    items = self._row_fetch(pre['unions'], block, Wt)
    width_valid = pre['widths'][block]

    start_s = offsets[lo_u]
    # hi_u = s*B + B <= spm*B = S always (mega % batch_size == 0 is
    # asserted at construction), so cum[hi_u - 1] is always in range
    end_s = cum[hi_u - 1]
    rows = u_of_j - lo_u
    in_slice = jnp.logical_and(jnp.logical_and(j >= start_s, j < end_s),
                               valid)
    rows = jnp.where(in_slice, rows, B)
    if tgt['binary']:
      vals = in_slice.astype(jnp.float32)
    else:
      vals = jnp.where(in_slice,
                       self._csr_range(tgt['d_vals'], nnz_start, Mt),
                       0.0)
    return {'tg_rows': rows, 'tg_cols': compressed, 'tg_vals': vals,
            'tg_items': items, 'tg_width_valid': width_valid}
