"""The Recoder trainer: train / evaluate / predict / recommend / checkpoint.

Parity with reference recoder/model.py:22-559, re-architected for TPU:

  * One jitted train step per (union-bucket, nnz-bucket) shape, with
    donated params/optimizer buffers. Densification of the sparse batch
    happens on-device (reference densifies via torch.sparse on the host
    boundary, model.py:457-472).
  * Dense path: ``jax.grad`` over all params + torch-rule optimizers
    (recoder_tpu.optim.Optimizer).
  * Sparse path (``model.sparse=True``): gradients are taken w.r.t. the
    gathered embedding rows only, and applied with row-sparse Adam
    scatter updates -- cost O(|union| x d) per step regardless of
    catalog size (reference: torch sparse grads + optim.SparseAdam,
    model.py:109-138).
  * Evaluation: full-catalog scores + seen-item masking + on-device
    ``lax.top_k`` (reference model.py:525-544), metrics vectorized per
    batch.
  * MultiStepLR(gamma=0.1) with the reference's epoch-start stepping
    quirk preserved (model.py:327-330,364-365): during epoch ``e`` the
    decay exponent counts milestones <= e-1.
"""

import logging
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from recoder_tpu import __version__
from recoder_tpu.checkpoint import load_checkpoint, save_checkpoint
from recoder_tpu.data import (BatchCollator, RecommendationDataLoader)
from recoder_tpu.metrics import RecommenderEvaluator
from recoder_tpu.models.base import FactorizationModel
from recoder_tpu.ops import losses as losses_lib
from recoder_tpu.optim import (Optimizer, SparseRowAdam, fold_dual_union,
                               make_weight_decay_tree)

log = logging.getLogger('recoder_tpu')
if not log.handlers:
  _h = logging.StreamHandler()
  _h.setFormatter(logging.Formatter('%(asctime)s %(levelname)s %(message)s'))
  log.addHandler(_h)
  log.setLevel(logging.INFO)


def _adapt_array(ref, new):
  """Coerce a checkpoint array onto a target param/state leaf.

  Shapes differ only when a checkpoint from a sparse-instantiated model
  (lane-padded feature axis, models/base.pad_features) is loaded into a
  dense one or vice versa: pad columns are zeros by construction, so
  slicing or re-padding the feature axis is exact.

  Checkpoint arrays destined for mesh-sharded leaves are placed onto
  the target leaf's sharding, so a reload under a mesh keeps tables
  row-sharded instead of silently collapsing them onto one device.
  Single-device leaves stay uncommitted (free to join any placement)."""
  new = jnp.asarray(new, ref.dtype)
  if new.shape != ref.shape:
    if new.ndim == ref.ndim == 2 and new.shape[0] == ref.shape[0]:
      k = min(new.shape[1], ref.shape[1])
      new = jnp.zeros(ref.shape, ref.dtype).at[:, :k].set(new[:, :k])
    else:
      new = new.reshape(ref.shape)
  if len(ref.sharding.device_set) > 1:
    return jax.device_put(new, ref.sharding)
  return new


def _multistep_lr(base_lr, milestones, epoch, gamma=0.1):
  """LR for 1-based ``epoch`` under the reference's scheduler stepping."""
  if not milestones:
    return base_lr
  count = sum(1 for m in milestones if m <= epoch - 1)
  return base_lr * (gamma ** count)


class Recoder:
  """Trains/evaluates a :class:`recoder_tpu.models.FactorizationModel`.

  Args:
    model (FactorizationModel): the factorization model to train.
    num_items (int, optional): catalog size; inferred from the first
      training dataset if None.
    num_users (int, optional): user count; inferred if None.
    optimizer_type (str): 'sgd' | 'adam' | 'adagrad' | 'rmsprop'.
    loss (str or recoder_tpu.ops.losses.Loss): 'mse' | 'logistic' |
      'logloss', or a Loss instance (must be sum-reduced and accept
      row/col masks).
    loss_params (dict, optional): extra loss params when ``loss`` is str.
    use_cuda (bool): accepted for API parity with the reference and
      ignored -- device placement follows the JAX default backend (TPU
      when present).
    user_based / item_based (bool): consistency checks between the model
      and datasets (reference model.py:238-250).
    seed (int): RNG seed for init and dropout streams.
    mesh (jax.sharding.Mesh, optional): a ('data', 'model') mesh from
      :func:`recoder_tpu.parallel.make_mesh`. When given, embedding
      tables are row-sharded over 'model', the batch users axis over
      'data', and training steps run SPMD over the mesh.
    eval_item_chunk (int, optional): score the catalog in contiguous
      slices of this many items during recommend/evaluate instead of
      one ``[B, num_items]`` matmul, carrying a running top-k. Caps
      inference HBM at ``O(B x chunk)`` so multi-million-item catalogs
      evaluate without the dense slab. Auto-enabled (chunk 2**18) when
      the padded catalog exceeds ``AUTO_CHUNK_ITEMS``; pass 0 to force
      the monolithic path.
    eval_compute_dtype (str, optional): matmul dtype for inference
      forwards only (e.g. 'bfloat16' for MXU-rate eval of a model
      trained in float32). Training numerics are unaffected.
    eval_topk (str): top-k strategy for recommend/evaluate --
      'exact' (default; threshold-certified fast top-k,
      recoder_tpu.ops.topk), 'sort' (plain lax.top_k), or 'approx'
      (raw approx_max_k at ~0.95 recall; serving-only).
    opt_state_dtype (str, optional): storage dtype for optimizer
      moment buffers ('bfloat16' halves the optimizer's full-table
      HBM traffic -- the dominant dense-step stage per the
      docs/benchmarks.md roofline). None (default) keeps f32 state
      with bit-exact torch trajectories. Update math always runs in
      f32; only storage is rounded. Quality-gated for adam (30-epoch
      tests/test_model.py row); sgd/adagrad/rmsprop raise rather than
      run an ungated numerics mode (adagrad's monotone 'sum' would
      silently freeze the LR in bf16 -- optim.Optimizer). The
      construction arg wins over a checkpoint's stored state dtype on
      reload (same convention as compute_dtype).
  """

  #: padded catalog size beyond which recommend() defaults to chunked
  #: scoring. Measured on v5e (docs/benchmarks.md): with the certified
  #: fast top-k the monolithic path wins up to ~1M items (189.5 vs
  #: 204.5 ms at 1M x B=500) but stops compiling around 8M, where
  #: chunked runs in O(B x chunk) memory; the auto threshold sits at 2M.
  AUTO_CHUNK_ITEMS = 2 ** 21
  AUTO_CHUNK_WIDTH = 2 ** 18

  def __init__(self, model: FactorizationModel,
               num_items=None, num_users=None,
               optimizer_type='sgd', loss='mse',
               loss_params=None, use_cuda=False,
               user_based=True, item_based=True,
               seed=42, mesh=None,
               eval_item_chunk=None, eval_compute_dtype=None,
               eval_topk='exact', opt_state_dtype=None):
    del use_cuda
    self.opt_state_dtype = opt_state_dtype
    self.mesh = mesh
    self.eval_item_chunk = eval_item_chunk
    self.eval_compute_dtype = eval_compute_dtype
    self.eval_topk = eval_topk
    self.model = model
    self.num_items = num_items
    self.num_users = num_users
    self.optimizer_type = optimizer_type
    self.loss = loss
    self.loss_params = loss_params if loss_params else {}
    self.user_based = user_based
    self.item_based = item_based
    self.seed = seed

    self.optimizer = None
    self.opt_state = None
    self.sparse_adam = None
    self.sparse_states = {}
    self.current_epoch = 1
    self.items = None
    self.users = None
    self.loss_module = None

    self._model_initialized = False
    self._pending_opt_arrays = None
    self._base_rng = jax.random.PRNGKey(seed)
    self._global_step = 0
    self._step_fns = {}
    self._loss_fns = {}
    self._recommend_fns = {}
    self._train_iterator = None
    self._train_iterator_key = None
    self._iters_consumed = 0
    self._profiling = False
    self._overflow_rebuild = None
    # guards the read-modify-write below: overflow notes arrive from
    # concurrent async epoch-log threads (only epochs <= e-2 are joined)
    self._overflow_note_lock = threading.Lock()

  # ------------------------------------------------------------------
  # initialization
  # ------------------------------------------------------------------

  def _init_model(self):
    if self._model_initialized:
      return
    self.model.init_model(self.num_items, self.num_users, seed=self.seed)
    if self.mesh is not None:
      from recoder_tpu.parallel import shard_params
      self.model.params = shard_params(self.model.params, self.model,
                                       self.mesh)
    self._model_initialized = True

  def _init_loss_module(self):
    if isinstance(self.loss, losses_lib.Loss):
      self.loss_module = self.loss
    elif self.loss == 'logistic':
      self.loss_module = losses_lib.LogisticLoss(reduction='sum',
                                                 **self.loss_params)
    elif self.loss == 'mse':
      self.loss_module = losses_lib.MSELoss(reduction='sum',
                                            **self.loss_params)
    elif self.loss == 'logloss':
      self.loss_module = losses_lib.MultinomialNLLLoss(reduction='sum')
    elif self.loss is None:
      raise ValueError('No loss function defined')
    else:
      raise ValueError(f'Unknown loss function {self.loss}')

  def _split_params(self):
    """Split model params into (dense_subtree, sparse_table_paths)."""
    sparse_paths = set(self.model.sparse_param_paths())
    dense = {k: v for k, v in self.model.params.items()
             if k not in sparse_paths}
    return dense, tuple(sorted(sparse_paths))

  def _init_optimizer(self, weight_decay):
    dense_params, sparse_paths = self._split_params()

    if sparse_paths and self.optimizer_type != 'adam':
      raise ValueError('Sparse gradients optimization only supported '
                       'with adam (sparse row-wise Adam)')

    # continued training on the same instance keeps optimizer moments
    # (reference model.py:101-107 stashes and reloads the state dict)
    prev_opt_state = self.opt_state
    prev_sparse_states = self.sparse_states

    wd_tree = make_weight_decay_tree(dense_params, weight_decay)
    self.optimizer = Optimizer(self.optimizer_type, weight_decay=wd_tree,
                               state_dtype=self.opt_state_dtype)
    self.opt_state = self.optimizer.init(dense_params)
    self.sparse_adam = SparseRowAdam(state_dtype=self.opt_state_dtype)
    self.sparse_states = {p: self.sparse_adam.init(self.model.params[p])
                          for p in sparse_paths}

    if prev_opt_state is not None:
      if (jax.tree_util.tree_structure(prev_opt_state)
          == jax.tree_util.tree_structure(self.opt_state)):
        # cast carried moments to the fresh init's storage dtypes
        # (no-op unless opt_state_dtype changed on a live instance)
        self.opt_state = jax.tree_util.tree_map(
            lambda ref, prev: jnp.asarray(prev, ref.dtype),
            self.opt_state, prev_opt_state)
      else:
        # optimizer_type changed on a live instance (directly or via
        # init_from_model_file): carried-over moments belong to the
        # old update rule's state tree
        log.warning('optimizer state structure changed '
                    '(optimizer_type switch); optimizer state reset')
    if prev_sparse_states:
      self.sparse_states = {
          p: jax.tree_util.tree_map(lambda ref, prev:
                                    jnp.asarray(prev, ref.dtype),
                                    self.sparse_states[p], prev)
          if p in self.sparse_states else prev
          for p, prev in prev_sparse_states.items()}

    if self._pending_opt_arrays is not None:
      opt, sparse = self._pending_opt_arrays
      try:
        if opt is not None:  # a pre-training checkpoint carries no
          # optimizer state -- start fresh without the mismatch warning
          self.opt_state = jax.tree_util.tree_map(_adapt_array,
                                                  self.opt_state, opt)
        for p in sparse_paths:
          if p in sparse:
            self.sparse_states[p] = jax.tree_util.tree_map(
                _adapt_array, self.sparse_states[p], sparse[p])
      except ValueError:
        # checkpoint saved under the other optimizer split (sparse vs
        # dense model instantiation): weights still load; moments
        # restart fresh. Re-init explicitly -- the failed adapt may
        # have landed partially, and the pre-adapt value could be a
        # carried-over previous state rather than a fresh init.
        self.opt_state = self.optimizer.init(dense_params)
        self.sparse_states = {p: self.sparse_adam.init(self.model.params[p])
                              for p in sparse_paths}
        log.warning('checkpoint optimizer state does not match this '
                    "model's sparse/dense split; optimizer state reset")
      self._pending_opt_arrays = None

  def _init_training(self, train_dataset, weight_decay):
    if self.items is None:
      self.items = np.asarray(train_dataset.items)
    else:
      self.items = np.unique(np.append(self.items, train_dataset.items))

    if self.users is None:
      self.users = np.asarray(train_dataset.users)
    else:
      self.users = np.unique(np.append(self.users, train_dataset.users))

    if self.item_based and self.num_items is None:
      self.num_items = int(np.max(self.items)) + 1
    elif self.item_based:
      assert self.num_items >= int(np.max(self.items)) + 1, \
          'The largest item id should be smaller than number of items. ' \
          'If your model is not item based, set item_based=False.'

    if self.user_based and self.num_users is None:
      self.num_users = int(np.max(self.users)) + 1
    elif self.user_based:
      assert self.num_users >= int(np.max(self.users)) + 1, \
          'The largest user id should be smaller than number of users. ' \
          'If your model is not user based, set user_based=False.'

    self._init_model()
    # f32 is the reference trajectory; bf16 params are a quality-gated
    # training mode (storage rounds per step in the optimizer, math
    # stays f32 -- optim.Optimizer.update; gate: tests/test_model.py
    # params_dtype row + docs/benchmarks.md). Anything else (f16 has
    # a narrow exponent and would need loss scaling) is refused.
    bad = [p for p, v in self.model.params.items()
           if jnp.issubdtype(v.dtype, jnp.floating)
           and v.dtype not in (jnp.float32, jnp.bfloat16)]
    if bad:
      raise ValueError(
          f'training requires float32 or bfloat16 params; {bad[:3]} '
          f'are {self.model.params[bad[0]].dtype}')
    self._init_optimizer(weight_decay=weight_decay)
    self._init_loss_module()
    # compiled step fns captured the optimizer's weight-decay tree and
    # the loss module at trace time; a later train() with different
    # values would silently run the OLD trace (same shapes = no
    # retrace), so invalidate the jit caches when they change
    # the key holds the loss OBJECT (strong reference), not id(): a
    # gc'd module's id can be reused by a new one, silently matching
    # the stale trace. Custom modules compare by identity (default
    # __eq__), strings by value -- both are the right invalidation.
    # optimizer_type and loss_params are keyed too: init_from_model_file
    # can swap both on a live instance, and the compiled step baked the
    # old update rule / loss constants at trace time.
    trace_key = (float(weight_decay), self.loss,
                 self.optimizer_type,
                 tuple(sorted(self.loss_params.items())))
    if getattr(self, '_step_trace_key', None) not in (None, trace_key):
      self._step_fns = {}
      self._loss_fns = {}
    self._step_trace_key = trace_key

  # ------------------------------------------------------------------
  # batch staging
  # ------------------------------------------------------------------

  def _stage_batch(self, input_batch, target_batch):
    """Convert host Batches into the jit-ready array dict + static key."""
    d = {
        'in_rows': input_batch.rows, 'in_cols': input_batch.cols,
        'in_vals': input_batch.vals,
        'in_users': input_batch.users,
        'in_items': input_batch.items,      # None when full catalog
        'in_valid_users': np.float32(input_batch.num_users),
        'in_valid_width': np.int32(input_batch.num_items_in_batch),
    }
    if target_batch is not None:
      d['tg_rows'] = target_batch.rows
      d['tg_cols'] = target_batch.cols
      d['tg_vals'] = target_batch.vals
      d['tg_items'] = target_batch.items
      d['tg_valid_width'] = np.int32(target_batch.num_items_in_batch)
    return d

  def _to_device(self, staged):
    """Move a staged batch to device (sharded when a mesh is set)."""
    if self.mesh is not None:
      from recoder_tpu.parallel import shard_batch
      return shard_batch(staged, self.mesh)
    return {k: (jax.device_put(v) if v is not None else None)
            for k, v in staged.items()}

  def _cpu_mesh_serialize(self):
    """True when executions must be kept one-in-flight: a multi-device
    mesh on the XLA:CPU backend. CPU cross-module collectives deadlock
    when several executions (or an overlapped host transfer) contend
    for the host's thread pool on small machines -- observed as a
    rendezvous termination timeout on a 1-core host. Real mesh runs
    are on TPU, where async dispatch is unaffected."""
    return (self.mesh is not None and self.mesh.devices.size > 1
            and jax.default_backend() == 'cpu')

  def _device_batch_iter(self, dataloader, depth=6):
    """Stage + transfer batches to device on a background thread.

    Host->device copies ride a high-latency tunnel on some platforms
    (~10 ms per batch observed on the axon TPU client); overlapping
    them with the compute dispatch loop is worth ~5x throughput.
    Yields (device_batch_dict, has_target).

    Under a CPU mesh (tests, dryruns) staging is synchronous -- see
    _cpu_mesh_serialize.
    """
    if self._cpu_mesh_serialize():
      for input_batch, target_batch in dataloader:
        staged = self._stage_batch(input_batch, target_batch)
        yield self._to_device(staged), target_batch is not None
      return
    import queue as _queue
    q = _queue.Queue(maxsize=depth)
    # an abandoned consumer (train() switching datasets/batch_size drops
    # the persistent iterator) must release the producer: a bare
    # q.put() would block forever, leaking the thread plus up to
    # depth+1 device-resident staged batches
    stop = threading.Event()

    def _put(item):
      while not stop.is_set():
        try:
          q.put(item, timeout=0.2)
          return True
        except _queue.Full:
          continue
      return False

    def producer():
      try:
        for input_batch, target_batch in dataloader:
          if stop.is_set():
            return
          staged = self._stage_batch(input_batch, target_batch)
          staged = self._to_device(staged)
          if not _put(('ok', (staged, target_batch is not None))):
            return
        _put(('done', None))
      except BaseException as e:  # propagate into the training loop
        _put(('err', e))

    threading.Thread(target=producer, daemon=True).start()
    try:
      while True:
        kind, payload = q.get()
        if kind == 'done':
          return
        if kind == 'err':
          raise payload
        yield payload
    finally:
      stop.set()  # runs on close()/GC of the generator too

  def _shard_batch(self, dense):
    """Constrain a [batch, width] operand to the mesh's data axis (the
    one batch layout both the scatter and slab input paths must agree
    on)."""
    if self.mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec as P
      dense = jax.lax.with_sharding_constraint(
          dense, NamedSharding(self.mesh, P('data', None)))
    return dense

  def _densify(self, rows, cols, vals, batch_pad, width):
    dtype = getattr(self.model, 'compute_dtype', None) or jnp.float32
    dense = jnp.zeros((batch_pad, width), dtype)
    dense = dense.at[rows, cols].add(vals.astype(dtype), mode='drop')
    return self._shard_batch(dense)

  def _apply_extra_kwargs(self):
    """Optional kwargs for model.apply, filtered by its signature
    (cached): built-in models take the sorted-unique gather promise;
    custom models with the bare documented signature get nothing."""
    extra = getattr(self, '_apply_extra', None)
    if extra is None:
      import inspect
      try:
        params = inspect.signature(self.model.apply).parameters
        accepts = ('items_sorted_unique' in params
                   or any(p.kind == inspect.Parameter.VAR_KEYWORD
                          for p in params.values()))
      except (TypeError, ValueError):
        accepts = True
      extra = {'items_sorted_unique': True} if accepts else {}
      self._apply_extra = extra
    return extra

  def _forward_loss(self, params, batch, rng, training, gathered=None,
                    step=None):
    """Pure loss for one staged batch (used by train, validate).

    ``step`` is the traced global-step counter, passed to aux-loss
    models (``model.has_aux``, e.g. MultVAE's KL annealing) during
    training.
    """
    model = self.model
    has_aux = training and getattr(model, 'has_aux', False)
    B = batch['in_users'].shape[0]
    in_items = batch.get('in_items', None)
    in_width = (in_items.shape[0] if in_items is not None
                else model.num_items_padded)
    if 'in_slab' in batch:
      # dense-slab cache (device_pipeline.maybe_cache_slabs): the slab
      # arrives pre-built; the storage dtype only ever holds exactly-
      # representable values, so the upcast reproduces the scatter
      # path's slab bit-for-bit
      dtype = getattr(model, 'compute_dtype', None) or jnp.float32
      input_dense = self._shard_batch(batch['in_slab'].astype(dtype))
    else:
      input_dense = self._densify(batch['in_rows'], batch['in_cols'],
                                  batch['in_vals'], B, in_width)

    if 'tg_rows' in batch:
      tg_items = batch.get('tg_items', None)
      tg_width = (tg_items.shape[0] if tg_items is not None
                  else model.num_items_padded)
      target_dense = self._densify(batch['tg_rows'], batch['tg_cols'],
                                   batch['tg_vals'], B, tg_width)
      tg_valid_width = batch['tg_valid_width']
    else:
      tg_items = in_items
      target_dense = input_dense
      tg_valid_width = batch['in_valid_width']
      tg_width = in_width

    # item-union id vectors from the collators are ascending + unique
    # (np.unique semantics) with a sentinel tail -- promise it to XLA.
    # The promise kwarg is passed only when the model accepts it:
    # custom models implementing exactly the documented
    # FactorizationModel.apply signature must keep working
    kwargs = dict(input_users=batch['in_users'], input_items=in_items,
                  target_items=tg_items, rng=rng, training=training,
                  **self._apply_extra_kwargs())
    if has_aux:
      kwargs['step'] = step
    if gathered is None:
      out = model.apply(params, input_dense, **kwargs)
    else:
      out = model.apply_gathered(params, gathered, input_dense, **kwargs)
    aux_vec = None
    if has_aux:
      out, aux_vec = out  # per-user aux loss (e.g. beta-scaled KL)

    row_mask = (jnp.arange(B) < batch['in_valid_users']).astype(jnp.float32)
    if batch.get('fd', False):
      # full-decode negative sampling: the loss columns are the
      # mega-batch's item union (exactly the union path's columns),
      # expressed as a dense mask over the padded catalog instead of a
      # compressed axis. Binary single-slice megas read it off the
      # already-built slab; otherwise one scatter of the raw mega cols
      # builds it (sentinel-padded slots land on column num_items,
      # which the logical-catalog clamp below masks back out).
      if batch.get('fd_mask_from_slab', False):
        present = jnp.any(input_dense != 0, axis=0)
      else:
        present = jnp.zeros((tg_width,), bool) \
            .at[batch['in_cols']].set(True, mode='drop')
      if 'fd_rand_ids' in batch:
        present = present.at[batch['fd_rand_ids']].set(True,
                                                       mode='drop')
      col_mask = jnp.logical_and(
          present, jnp.arange(tg_width) < model.num_items) \
          .astype(jnp.float32)
    else:
      col_valid = (tg_valid_width if tg_items is not None
                   else model.num_items)
      col_mask = (jnp.arange(tg_width) < col_valid).astype(jnp.float32)

    loss = self.loss_module(out, target_dense,
                            row_mask=row_mask, col_mask=col_mask)
    if aux_vec is not None:
      loss = loss + jnp.sum(aux_vec * row_mask)
    return loss / batch['in_valid_users']

  # ------------------------------------------------------------------
  # jitted steps
  # ------------------------------------------------------------------

  def _dense_step_math(self, params, opt_state, batch, lr, rng,
                       step=None):
    """One dense-optimizer update (pure; traced inside jit)."""
    def loss_fn(p):
      return self._forward_loss(p, batch, rng, training=True, step=step)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_params, new_opt_state = self.optimizer.update(
        grads, opt_state, params, lr)
    return new_params, new_opt_state, loss

  def _sparse_step_math(self, params, opt_state, sparse_states, batch,
                        lr, rng, step=None):
    """One sparse-path update: grads w.r.t. gathered rows, row-sparse
    Adam scatter into the tables (pure; traced inside jit)."""
    model = self.model
    sparse_paths = tuple(sorted(model.sparse_param_paths()))
    in_items = batch.get('in_items', None)
    tg_items = batch.get('tg_items', in_items)
    in_users = batch['in_users']
    if in_users is not None and getattr(model, 'num_users', None):
      # host-loader batches pad the users vector with user id 0
      # (loader.py); a sparse user-table update must not write row 0's
      # moments from those slots (zero grads still decay m/v and race
      # a genuine row-0 update). Redirect pad slots to the sentinel
      # row `num_users` (always present: pad_dim is strictly greater),
      # whose moments stay exactly zero -- same convention as the item
      # unions' sentinel padding. The fused pipeline already pads with
      # the sentinel; this mask is a no-op there.
      B = in_users.shape[0]
      valid = jnp.arange(B) < batch['in_valid_users']
      in_users = jnp.where(valid, in_users, model.num_users)
    entries = model.sparse_entries(input_users=in_users,
                                   input_items=in_items,
                                   target_items=tg_items)
    from recoder_tpu.ops.gather_matmul import take_rows
    # item unions are sorted+unique; user id slices are not
    union_ids = {id(x) for x in (in_items, tg_items) if x is not None}
    gathered = {name: take_rows(params[path], ids,
                                sorted_unique=id(ids) in union_ids)
                for name, path, ids in entries}
    dense_params = {k: v for k, v in params.items()
                    if k not in sparse_paths}

    def loss_fn(dp, g):
      return self._forward_loss({**dp}, batch, rng, training=True,
                                gathered=g, step=step)

    loss, (dense_grads, gathered_grads) = jax.value_and_grad(
        loss_fn, argnums=(0, 1))(dense_params, gathered)

    new_dense, new_opt_state = self.optimizer.update(
        dense_grads, opt_state, dense_params, lr)

    new_params = dict(new_dense)
    new_sparse_states = dict(sparse_states)
    tables = {p: params[p] for p in sparse_paths}
    by_path = {}
    for name, path, ids in entries:
      by_path.setdefault(path, []).append((name, ids))
    for path, uses in by_path.items():
      if len(uses) == 2:
        # one table used by two row sets (tied decoder + a separate
        # target union): coalesce into ONE SparseAdam step like torch
        # (see optim.fold_dual_union); both unions are sorted unique
        # with sentinel tail padding
        (n1, ids1), (n2, ids2) = uses
        assert ids1 is not None and ids2 is not None, \
            'tied full-table uses must collapse in sparse_entries'
        spare = tables[path].shape[0] - 1  # pad row: pad_dim is strict
        ids_cat, grads_cat = fold_dual_union(
            ids1, gathered_grads[n1], ids2, gathered_grads[n2], spare)
        tables[path], new_sparse_states[path] = (
            self.sparse_adam.update_rows(tables[path],
                                         new_sparse_states[path],
                                         ids_cat, grads_cat, lr))
      else:
        (name, ids), = uses
        tables[path], new_sparse_states[path] = (
            self.sparse_adam.update_rows(tables[path],
                                         new_sparse_states[path],
                                         ids, gathered_grads[name], lr))
    new_params.update(tables)
    return new_params, new_opt_state, new_sparse_states, loss

  def _get_step_fn(self, has_target, sparse):
    cache_key = ('step', has_target, sparse)
    if cache_key in self._step_fns:
      return self._step_fns[cache_key]

    if not sparse:
      def step(params, opt_state, batch, lr, step_idx):
        rng = jax.random.fold_in(self._base_rng, step_idx)
        return self._dense_step_math(params, opt_state, batch, lr, rng,
                                     step=step_idx)

      fn = jax.jit(step, donate_argnums=(0, 1))
    else:
      def step(params, opt_state, sparse_states, batch, lr, step_idx):
        rng = jax.random.fold_in(self._base_rng, step_idx)
        return self._sparse_step_math(params, opt_state, sparse_states,
                                      batch, lr, rng, step=step_idx)

      fn = jax.jit(step, donate_argnums=(0, 1, 2))

    self._step_fns[cache_key] = fn
    return fn

  def _get_fused_step_fn(self, source, negative_sampling, sparse,
                         steps=1, full_decode=False):
    """A step that builds its batch on device from a resident CSR
    (recoder_tpu.data.device_pipeline) -- no per-step host transfer.

    ``steps > 1`` compiles a ``lax.scan`` of that many consecutive
    steps per dispatch (losses come back as a ``[steps]`` vector).
    Identical math to the single-step path -- the scan body folds the
    rng from the same device-side global-step counter -- it only
    amortizes per-call host/tunnel dispatch cost, which dominates on
    small hosts (measured: 438 -> 457 batches/s on a 1-core host;
    within noise on many-core hosts, docs/benchmarks.md)."""
    # keyed by the source object too: the compiled fn closes over the
    # source's device arrays, so a new source needs a fresh trace.
    # The slab-cache flag changes the traced program (slab fetch vs
    # triplet scatter), so it keys the trace as well.
    cache_key = ('fused', negative_sampling, sparse, steps, full_decode,
                 source.d_slab is not None)
    cached = self._step_fns.get(cache_key)
    if cached is not None and cached[0] is source:
      return cached[1]
    # a new source supersedes ALL fused entries, not just this key's:
    # an entry under a key this run never requests again (e.g. the
    # d_slab flag flipped) would otherwise pin the old source -- and
    # its multi-GiB slab/CSR arrays -- for the trainer's lifetime
    self._step_fns = {k: v for k, v in self._step_fns.items()
                      if k[0] != 'fused' or v[0] is source}

    def build(perm, step_idx, global_step, src):
      with source.bound(src):
        b = source.build_batch(perm, step_idx,
                               negative_sampling=negative_sampling,
                               neg_step=global_step,
                               full_decode=full_decode)
      d = {
          'in_users': b['users'], 'in_items': b['items'],
          'in_valid_users': b['num_users'],
          'in_valid_width': b['width_valid'],
      }
      if 'slab' in b:  # dense-slab cache: the input arrives pre-built
        d['in_slab'] = b['slab']
      else:
        d.update({'in_rows': b['rows'], 'in_cols': b['cols'],
                  'in_vals': b['vals']})
      for k in ('fd', 'fd_mask_from_slab', 'fd_rand_ids'):
        if k in b:
          d[k] = b[k]
      if 'tg_rows' in b:  # dual-CSR (target-dataset) source
        d.update({'tg_rows': b['tg_rows'], 'tg_cols': b['tg_cols'],
                  'tg_vals': b['tg_vals'], 'tg_items': b['tg_items'],
                  'tg_valid_width': b['tg_width_valid']})
      return d, b['overflow']

    def roll(carry, overflow):
      # donated int32[6] step carry: [step_in_epoch, global_step,
      # sum_nnz, sum_union, max_nnz, max_union] -- counters advance on
      # device (no per-step scalar uploads; each upload costs a
      # tunnel round trip), overflow aggregates for one epoch-end fetch
      return jnp.concatenate([carry[:2] + 1,
                              carry[2:4] + overflow,
                              jnp.maximum(carry[4:6], overflow)])

    if not sparse:
      def one_step(params, opt_state, carry, perm, lr, src):
        rng = jax.random.fold_in(self._base_rng, carry[1])
        batch, overflow = build(perm, carry[0], carry[1], src)
        new_params, new_opt_state, loss = self._dense_step_math(
            params, opt_state, batch, lr, rng, step=carry[1])
        return new_params, new_opt_state, loss, roll(carry, overflow)

      if steps == 1:
        fn = jax.jit(one_step, donate_argnums=(0, 1, 2))
      else:
        def multi_step(params, opt_state, carry, perm, lr, src):
          def body(c, _):
            p, o, cr = c
            p, o, loss, cr = one_step(p, o, cr, perm, lr, src)
            return (p, o, cr), loss
          (params, opt_state, carry), losses = jax.lax.scan(
              body, (params, opt_state, carry), None, length=steps)
          return params, opt_state, losses, carry

        fn = jax.jit(multi_step, donate_argnums=(0, 1, 2))
    else:
      def one_step(params, opt_state, sparse_states, carry, perm, lr,
                   src):
        rng = jax.random.fold_in(self._base_rng, carry[1])
        batch, overflow = build(perm, carry[0], carry[1], src)
        new_params, new_opt_state, new_sparse, loss = (
            self._sparse_step_math(params, opt_state, sparse_states,
                                   batch, lr, rng, step=carry[1]))
        return (new_params, new_opt_state, new_sparse, loss,
                roll(carry, overflow))

      if steps == 1:
        fn = jax.jit(one_step, donate_argnums=(0, 1, 2, 3))
      else:
        def multi_step(params, opt_state, sparse_states, carry, perm,
                       lr, src):
          def body(c, _):
            p, o, s, cr = c
            p, o, s, loss, cr = one_step(p, o, s, cr, perm, lr, src)
            return (p, o, s, cr), loss
          ((params, opt_state, sparse_states, carry), losses) = (
              jax.lax.scan(body,
                           (params, opt_state, sparse_states, carry),
                           None, length=steps))
          return params, opt_state, sparse_states, losses, carry

        fn = jax.jit(multi_step, donate_argnums=(0, 1, 2, 3))

    self._step_fns[cache_key] = (source, fn)
    return fn

  def _get_val_loss_fn(self):
    # keyed by the resolved chunk: a later eval_item_chunk change must
    # re-dispatch (recommend()'s cache is keyed the same way)
    chunk = self._resolve_eval_chunk()
    key = ('val', chunk)
    if key not in self._loss_fns:
      def val_loss(params, batch):
        return self._forward_loss(params, batch, rng=None, training=False)
      dense_fn = jax.jit(val_loss)
      chunked_fn = None
      if chunk is not None and isinstance(self.loss, str):
        # custom Loss modules stay on the dense path: their semantics
        # over a partial item axis aren't knowable here
        def chunked(params, batch):
          return self._chunked_val_loss(params, batch, chunk)
        chunked_fn = jax.jit(chunked)

      def dispatch(params, batch):
        full_catalog = (batch.get('in_items') is None
                        and batch.get('tg_items') is None)
        if chunked_fn is not None and full_catalog:
          return chunked_fn(params, batch)
        return dense_fn(params, batch)

      self._loss_fns[key] = dispatch
    return self._loss_fns[key]

  def _chunked_val_loss(self, params, batch, chunk):
    """Full-catalog validation loss in O(B x chunk) memory.

    ``_forward_loss`` densifies ``[B, num_items_padded]``; at the
    multi-million-item scale where recommend() already chunks
    (``eval_item_chunk`` / ``AUTO_CHUNK_ITEMS``), that slab exceeds
    HBM. This path encodes once from COO (``encode_coo``) and streams
    ``decode_slice`` chunks, accumulating the same sum-reduced loss:
    one pass for the elementwise losses (mse / logistic), two for the
    multinomial NLL (streaming logsumexp for the partition function,
    then the NLL pass). Equality vs the dense path is gate-tested at
    small scale (tests/test_chunked_eval.py).
    """
    from recoder_tpu.ops.losses import _NEG_INF
    model = self.model
    B = batch['in_users'].shape[0]
    W = model.num_items_padded
    C = chunk
    n_chunks = -(-model.num_items // C)  # ceil; last chunk clamped
    rows, cols = batch['in_rows'], batch['in_cols']
    vals = batch['in_vals']
    if 'tg_rows' in batch:
      t_rows, t_cols, t_vals = (batch['tg_rows'], batch['tg_cols'],
                                batch['tg_vals'])
    else:
      t_rows, t_cols, t_vals = rows, cols, vals
    h = model.encode_coo(params, rows, cols, vals, B,
                         input_users=batch['in_users'])
    row_mask = (jnp.arange(B) < batch['in_valid_users']) \
        .astype(jnp.float32)[:, None]

    def chunk_out_tgt(i):
      start = jnp.minimum(i * C, W - C)
      out = model.decode_slice(params, h, start, C).astype(jnp.float32)
      c = t_cols - start
      ok = (c >= 0) & (c < C) & (t_rows < B)
      tgt = jnp.zeros((B + 1, C), jnp.float32)
      tgt = tgt.at[jnp.where(ok, t_rows, B),
                   jnp.where(ok, c, 0)].add(
          jnp.where(ok, t_vals.astype(jnp.float32), 0.0))[:B]
      # valid = inside the logical catalog and not re-covered by the
      # clamped last chunk's overlap
      col_ids = start + jnp.arange(C)[None, :]
      valid = (col_ids < model.num_items) & (col_ids >= i * C)
      return out, tgt, valid

    if self.loss == 'logloss':
      def lse_body(i, carry):
        m, s = carry
        out, _, valid = chunk_out_tgt(i)
        logits = jnp.where(valid, out, _NEG_INF)
        new_m = jnp.maximum(m, jnp.max(logits, axis=1, keepdims=True))
        s = (s * jnp.exp(m - new_m)
             + jnp.sum(jnp.exp(logits - new_m), axis=1, keepdims=True))
        return new_m, s

      m, s = jax.lax.fori_loop(
          0, n_chunks, lse_body,
          (jnp.full((B, 1), _NEG_INF, jnp.float32),
           jnp.zeros((B, 1), jnp.float32)))
      log_denom = m + jnp.log(s)

      def nll_body(i, acc):
        out, tgt, valid = chunk_out_tgt(i)
        logits = jnp.where(valid, out, _NEG_INF)
        loss = -tgt * (logits - log_denom)
        return acc + jnp.sum(loss * row_mask * valid)

      total = jax.lax.fori_loop(0, n_chunks, nll_body, jnp.float32(0))
    else:
      confidence = getattr(self.loss_module, 'confidence', 0.0)

      def body(i, acc):
        out, tgt, valid = chunk_out_tgt(i)
        if self.loss == 'mse':
          w = 1.0 + confidence * (tgt > 0).astype(jnp.float32)
          loss = w * jnp.square(out - tgt)
        else:  # 'logistic'
          loss = (jnp.maximum(out, 0.0) - out * tgt
                  + jnp.log1p(jnp.exp(-jnp.abs(out))))
        return acc + jnp.sum(loss * row_mask * valid)

      total = jax.lax.fori_loop(0, n_chunks, body, jnp.float32(0))
    return total / batch['in_valid_users']

  def _resolve_eval_chunk(self):
    """Effective item-chunk width for inference (None = monolithic)."""
    chunk = self.eval_item_chunk
    W = self.model.num_items_padded
    if chunk is None and W is not None and W > self.AUTO_CHUNK_ITEMS:
      chunk = self.AUTO_CHUNK_WIDTH
    if not chunk:  # None or 0
      return None
    return min(int(chunk), W)

  def _get_recommend_fn(self, k):
    """Full-catalog score -> mask seen -> top-k, on device.

    Two lowering strategies behind one cache key:
      * monolithic -- one ``[B, W]`` score matrix + one top-k (fastest
        when the slab fits HBM);
      * chunked (``eval_item_chunk``) -- encode once from COO, then
        ``lax.fori_loop`` over catalog slices carrying a running
        top-k merge; peak memory O(B x chunk) instead of O(B x W).
    Both honor ``eval_compute_dtype`` (inference-only matmul dtype).
    """
    chunk = self._resolve_eval_chunk()
    cd = self.eval_compute_dtype
    topk_mode = self.eval_topk
    key = (k, chunk, cd, topk_mode)
    if key in self._recommend_fns:
      return self._recommend_fns[key]
    model = self.model
    from recoder_tpu.ops.topk import top_k as fast_top_k

    if chunk is None:
      # pass compute_dtype only when set: custom models written to the
      # documented FactorizationModel.apply signature need not accept it
      cd_kw = {} if cd is None else {'compute_dtype': cd}

      def recommend(params, rows, cols, vals, users):
        B = users.shape[0]
        W = model.num_items_padded
        input_dense = self._densify(rows, cols, vals, B, W)
        out = model.apply(params, input_dense, input_users=users,
                          training=False, **cd_kw)
        out = jnp.where(input_dense > 0, -jnp.inf, out)
        col_ids = jnp.arange(W)[None, :]
        out = jnp.where(col_ids < model.num_items, out, -jnp.inf)
        top_vals, top_idx = fast_top_k(out, k, mode=topk_mode)
        return top_idx, top_vals
    else:
      if chunk < k:
        raise ValueError(f'eval_item_chunk ({chunk}) must be >= '
                         f'num_recommendations ({k})')

      def recommend(params, rows, cols, vals, users):
        B = users.shape[0]
        W = model.num_items_padded
        C = chunk
        # cover the LOGICAL catalog only: chunks entirely inside the
        # pad region are all -inf and would defeat the certified
        # top-k's fast path (t = -inf fails every row)
        n_chunks = -(-model.num_items // C)  # ceil; last chunk clamped
        h = model.encode_coo(params, rows, cols, vals, B,
                             input_users=users, compute_dtype=cd)

        def chunk_scores(h_rows, i, row_map, n_rows):
          """Masked scores for chunk ``i`` over ``h_rows``'s users.

          ``row_map`` remaps global COO row ids into [0, n_rows) (or
          ``n_rows`` to drop) so the seen-item scatter works for row
          subsets (the salvage pass) as well as the full batch."""
          start = jnp.minimum(i * C, W - C)
          s = model.decode_slice(params, h_rows, start, C,
                                 compute_dtype=cd)
          c = cols - start
          ok = (c >= 0) & (c < C) & (rows < B)
          r2 = row_map.at[jnp.where(ok, rows, B)].get(
              mode='promise_in_bounds')
          r2 = jnp.where(ok, r2, n_rows)
          seen = jnp.zeros((n_rows + 1, C), jnp.float32)
          seen = seen.at[r2, jnp.where(ok, c, 0)].add(
              jnp.where(ok, vals.astype(jnp.float32), 0.0))[:n_rows]
          s = jnp.where(seen > 0, -jnp.inf, s)
          # valid columns: inside the logical catalog AND not already
          # covered by an earlier chunk (clamped last-chunk overlap)
          col_ids = start + jnp.arange(C)[None, :]
          valid = (col_ids < model.num_items) & (col_ids >= i * C)
          return jnp.where(valid, s, -jnp.inf).astype(jnp.float32), start

        id_map = jnp.arange(B + 1, dtype=jnp.int32)

        def merge_loop(h_rows, row_map, n_rows,
                       chunk_topk=jax.lax.top_k):
          """Per-chunk top-k + running merge, used by 'sort' mode, the
          'approx' mode (chunk_topk=approx), the salvage rows, and the
          full fallback. The merge breaks value ties by LOWEST global
          item id ((value desc, index asc) lexicographic sort), which
          is exactly lax.top_k's tie order on the monolithic path --
          and therefore also guarantees k DISTINCT real item ids even
          when a user has fewer than k finite-scored items (the init
          sentinels carry index W and lose every tie to real entries;
          chunk 0 alone contributes k distinct real positions)."""
          def body(i, carry):
            best_vals, best_idx = carry
            s, start = chunk_scores(h_rows, i, row_map, n_rows)
            c_vals, c_idx = chunk_topk(s, k)
            merged_v = jnp.concatenate([best_vals, c_vals], axis=1)
            merged_i = jnp.concatenate(
                [best_idx, c_idx.astype(jnp.int32) + start], axis=1)
            neg_v, idx, = jax.lax.sort((-merged_v, merged_i), num_keys=2,
                                       dimension=1)
            return -neg_v[:, :k], idx[:, :k]

          init = (jnp.full((n_rows, k), -jnp.inf, jnp.float32),
                  jnp.full((n_rows, k), W, jnp.int32))
          return jax.lax.fori_loop(0, n_chunks, body, init)

        if topk_mode != 'exact':
          if topk_mode == 'sort':
            top_vals, top_idx = merge_loop(h, id_map, B)
          else:
            top_vals, top_idx = merge_loop(
                h, id_map, B,
                chunk_topk=lambda s, kk: fast_top_k(s, kk, mode=topk_mode))
          return top_idx, top_vals

        # -- 'exact': globally-certified approx candidates ------------
        # Per-chunk certification fails too often at chunk widths (the
        # approx bin count shrinks with width), so certify GLOBALLY:
        # collect approx candidates across all chunks, take t from the
        # merged top-k, then one counting pass over re-computed chunk
        # scores proves (per row) that every element >= t is a
        # candidate. Failed rows are re-ranked by the exact merge loop
        # over just those rows; > salvage-buffer failures fall back to
        # the full exact merge loop. Always exact.
        k2 = min(4 * k, C)
        F = min(64, B)

        def collect_body(i, carry):
          cv, ci = carry
          s, start = chunk_scores(h, i, id_map, B)
          av, ai = jax.lax.approx_max_k(s, k2, recall_target=0.99)
          cv = jax.lax.dynamic_update_slice(cv, av, (0, i * k2))
          ci = jax.lax.dynamic_update_slice(
              ci, ai.astype(jnp.int32) + start, (0, i * k2))
          return cv, ci

        cv, ci = jax.lax.fori_loop(
            0, n_chunks, collect_body,
            (jnp.full((B, n_chunks * k2), -jnp.inf, jnp.float32),
             jnp.zeros((B, n_chunks * k2), jnp.int32)))
        top_vals, sel = jax.lax.top_k(cv, k)
        top_idx = jnp.take_along_axis(ci, sel, axis=1)
        t = top_vals[:, -1:]
        cnt_cand = jnp.sum((cv >= t).astype(jnp.int32), axis=1)

        def count_body(i, carry):
          cnt, has_nan = carry
          s, _ = chunk_scores(h, i, id_map, B)
          return (cnt + jnp.sum((s >= t).astype(jnp.int32), axis=1),
                  has_nan | jnp.isnan(s).any(axis=1))

        cnt_all, row_has_nan = jax.lax.fori_loop(
            0, n_chunks, count_body,
            (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool)))
        # NaN rows cannot be certified by counting (NaN >= t is False
        # on both sides while top_k ranks NaN first) -- salvage them
        failed = (cnt_all != cnt_cand) | row_has_nan
        nfail = jnp.sum(failed.astype(jnp.int32))

        def no_salvage(_):
          return top_vals, top_idx

        def salvage(_):
          # fill slots use the out-of-range row id B+1: truly dropped
          # by every scatter below (B itself is in bounds for the
          # (B+1,)-sized inv and would clobber its sentinel slot),
          # clipped on the h/top gather (garbage rows whose writes are
          # dropped on merge-back)
          fail_idx = jnp.nonzero(failed, size=F, fill_value=B + 1)[0]
          fail_idx = fail_idx.astype(jnp.int32)
          h_f = h.at[fail_idx].get(mode='clip')
          inv = jnp.full((B + 1,), F, jnp.int32).at[fail_idx].set(
              jnp.arange(F, dtype=jnp.int32), mode='drop')
          sv, si = merge_loop(h_f, inv, F)
          return (top_vals.at[fail_idx].set(sv, mode='drop'),
                  top_idx.at[fail_idx].set(si, mode='drop'))

        def full(_):
          return merge_loop(h, id_map, B)

        top_vals, top_idx = jax.lax.cond(
            nfail == 0, no_salvage,
            lambda op: jax.lax.cond(nfail <= F, salvage, full, op),
            operand=None)
        return top_idx, top_vals

    fn = jax.jit(recommend)
    self._recommend_fns[key] = fn
    return fn

  # ------------------------------------------------------------------
  # training loop
  # ------------------------------------------------------------------

  def train(self, train_dataset, val_dataset=None,
            lr=0.001, weight_decay=0, num_epochs=1,
            iters_per_epoch=None, batch_size=64, lr_milestones=None,
            negative_sampling=False, num_sampling_users=0, num_data_workers=0,
            model_checkpoint_prefix=None, checkpoint_freq=0,
            eval_freq=0, eval_num_recommendations=None,
            eval_num_users=None, metrics=None, eval_batch_size=None,
            profile_dir=None, profile_steps=(10, 30), shuffle='users',
            num_random_negatives=0, fused_steps_per_call='auto',
            progress=False, full_decode='auto', slab_cache='auto',
            table_sharding='auto'):
    """Train the model (argument semantics mirror the reference
    model.py:256-347; see that docstring for parameter meanings).

    TPU additions: ``profile_dir`` captures a jax.profiler trace of
    global steps ``profile_steps=(start, stop)`` viewable in
    TensorBoard/Perfetto; per-epoch wall time and steps/s are always
    logged. ``shuffle='blocks'`` selects the block-shuffle sampling
    mode of the fused pipeline (faster step, fixed co-batch groups --
    see DeviceDataSource). ``num_random_negatives`` appends that many
    uniform-random item ids to each step's item union as extra
    zero-target negatives (coverage for catalogs where in-batch unions
    touch a tiny item fraction; decode cost grows with the union
    width). Requires ``negative_sampling=True``.
    ``fused_steps_per_call`` scan-batches that many consecutive fused
    steps into one dispatch (identical math; losses logged per step),
    amortizing per-call host/tunnel overhead. Default 'auto' = 16 in
    blocks mode (measured +2% and lower variance) and 1 in users mode
    (the scan measurably HURTS the gather-heavy users-mode step:
    242 vs 306 batches/s at ML-20M shape -- see docs/benchmarks.md).
    Profiling runs always dispatch per step.
    ``progress=True`` paints a per-step tqdm bar with a running-loss
    postfix (reference model.py:381,412-415). The bar is fed by a
    lagging background thread fetching already-complete losses, so it
    never syncs the device pipeline (recoder_tpu.progress).
    ``full_decode`` ('auto' | True | False): with negative sampling on
    the fused dense path, decode against the FULL item tables and mask
    the loss to the mega-batch's columns instead of gathering the
    union's table rows. Identical loss and gradients (same columns,
    same values); the backward becomes pure MXU matmuls instead of
    table scatter-adds -- measured 1.73x on fwd+bwd at ML-20M shape
    (experiments/coo_forward.py). 'auto' selects it when the padded
    catalog is at most 4x the union width (the slab passes grow with
    catalog width, so union gathering wins again on MSD-class
    catalogs where union << catalog).
    ``slab_cache`` ('auto' | True | 'packed' | False): with full
    decode, cache the densified matrix [num_users_padded,
    num_items_padded] in HBM once and fetch each step's rows from it
    instead of scattering the CSR triplets -- identical slab values,
    hence identical gradients. Dense tier stores bf16 when every
    value round-trips exactly, else f32; for binary data a bit-packed
    tier stores 1 bit/cell (16x smaller -- ~2.5 GiB at MSD's
    571k x 41k where the bf16 slab is an ineligible ~44 GiB) and
    steps unpack their rows with an exact shift/and. 'auto' enables
    the dense tier when eligible and within half the free HBM
    (~4.7 GiB at ML-20M shape), falling back to packed for binary
    data; True skips the budget check (dense); 'packed' forces the
    bit-packed tier; False disables. See
    DeviceDataSource.maybe_cache_slabs."""
    backend = jax.default_backend()
    log.info('%s Mode', backend.upper())
    for param, value in self.model.model_params().items():
      log.info('Model %s: %s', param, value)
    log.info('Initial Learning Rate: %s', lr)
    log.info('Weight decay: %s', weight_decay)
    log.info('Batch Size: %s', batch_size)
    log.info('Optimizer: %s', self.optimizer_type)
    log.info('LR milestones: %s', lr_milestones)
    log.info('Loss Function: %s', self.loss)

    if num_sampling_users == 0:
      num_sampling_users = batch_size
    if eval_batch_size is None:
      eval_batch_size = batch_size

    assert num_sampling_users >= batch_size \
        and num_sampling_users % batch_size == 0, \
        'number of sampling users should be a multiple of the batch size'
    if num_random_negatives and not negative_sampling:
      raise ValueError('num_random_negatives requires negative_sampling')

    self._init_training(train_dataset, weight_decay=weight_decay)

    train_dataloader = RecommendationDataLoader(
        train_dataset, batch_size=batch_size,
        negative_sampling=negative_sampling,
        num_sampling_users=num_sampling_users,
        num_workers=num_data_workers, seed=self.seed,
        num_random_negatives=num_random_negatives)
    if val_dataset is not None:
      val_dataloader = RecommendationDataLoader(
          val_dataset, batch_size=batch_size,
          negative_sampling=negative_sampling,
          num_sampling_users=num_sampling_users,
          num_workers=num_data_workers, seed=self.seed + 1,
          num_random_negatives=num_random_negatives)
    else:
      val_dataloader = None

    num_batches = len(train_dataloader)
    if iters_per_epoch is None:
      iters_per_epoch = num_batches

    sparse = bool(self.model.sparse_param_paths())

    # Fused on-device pipeline: resident CSR + batch construction inside
    # the jitted step; used whenever the training data is a plain
    # interactions matrix (the hot configuration), and for TARGET
    # datasets (two CSRs) in blocks mode, where both sides' unions are
    # served from precomputed block tables. Under a mesh the CSR is
    # replicated and the build runs SPMD (see DeviceDataSource).
    fused_source = None
    target_matrix = train_dataset.target_interactions_matrix
    fused_ok = (target_matrix is None
                or (shuffle == 'blocks' and negative_sampling
                    and not num_random_negatives))
    if fused_ok:
      # cache holds strong references to both matrices, so identity
      # comparison cannot alias garbage-collected objects
      matrix = train_dataset.interactions_matrix
      src_cfg = (batch_size, num_sampling_users, self.mesh, shuffle,
                 num_random_negatives, target_matrix is not None,
                 table_sharding)
      cached = getattr(self, '_fused_source_cache', None)
      if (cached is not None and cached[0] is matrix
          and cached[1] == src_cfg
          and (len(cached) > 3 and cached[3] is target_matrix
               or target_matrix is None)):
        fused_source = cached[2]
      else:
        from recoder_tpu.data.device_pipeline import (
            DeviceDataSource, FusedPipelineUnavailable)
        union_width = (train_dataloader.batch_collator.fixed_union_width
                       or train_dataloader._estimate_widths()[0])
        try:
          fused_source = DeviceDataSource(
              matrix, batch_size=batch_size,
              num_sampling_users=num_sampling_users,
              num_items=self.num_items,
              union_width=union_width, mesh=self.mesh, shuffle=shuffle,
              num_random_negatives=num_random_negatives, seed=self.seed,
              target_matrix=target_matrix,
              table_sharding=table_sharding)
          self._fused_source_cache = (matrix, src_cfg, fused_source,
                                      target_matrix)
        except FusedPipelineUnavailable as e:
          # e.g. block tables past the byte budget with a target
          # matrix -- fall back to the host loader
          log.info('fused pipeline unavailable (%s); using host loader',
                   e)
          fused_source = None
    if fused_source is not None:
      num_batches = fused_source.steps_per_epoch

    fd = False
    if fused_source is not None and negative_sampling and not sparse \
        and train_dataset.target_interactions_matrix is None \
        and full_decode is not False:
      if full_decode is True:
        fd = True
      else:  # 'auto': slab passes scale with the catalog width, the
        # union gathers/scatters with the table size -- break-even
        # bracketed by measurement (docs/benchmarks.md): fd wins 1.7x
        # at ratios 1.26x (ML-20M) and 2.9x (MSD), loses 1.8x at 6.3x
        fd = (self.model.num_items_padded
              <= 4 * fused_source.union_width)
    if fd:
      # trade HBM capacity for the per-step triplet scatter: cache the
      # (epoch-invariant) densified matrix once and fetch B rows per
      # step (device_pipeline.maybe_cache_slabs; 'auto' declines past
      # the free-HBM budget)
      fused_source.maybe_cache_slabs(self.model.num_items_padded,
                                     request=slab_cache)
    elif fused_source is not None:
      # a slab left by a previous full-decode run is dead HBM weight
      # on any non-fd path (and would force the scan-dispatch
      # heuristic onto the general users-mode step) -- drop it
      fused_source.maybe_cache_slabs(0, request=False)

    # a partially-consumed iterator only carries over into a train()
    # call with the same dataset and batching config (resuming the
    # reference's partial-epoch semantics); anything else restarts it
    iter_key = (train_dataset, batch_size, num_sampling_users,
                negative_sampling, shuffle, num_random_negatives,
                fused_source is not None, fd,
                fused_source is not None and fused_source.d_slab
                is not None)
    if getattr(self, '_train_iterator_key', None) != iter_key:
      self._train_iterator = None
      self._iters_consumed = 0
      self._train_iterator_key = iter_key

    self._progress_reporter = None
    try:
      self._train_epochs(
          num_epochs, lr, lr_milestones, iters_per_epoch, num_batches,
          fused_source, negative_sampling, sparse, fd, shuffle,
          fused_steps_per_call, profile_dir, profile_steps,
          train_dataset, train_dataloader, batch_size,
          num_sampling_users, progress, val_dataloader, eval_freq,
          metrics, eval_num_recommendations, eval_num_users,
          eval_batch_size, model_checkpoint_prefix, checkpoint_freq)
    finally:
      if self._progress_reporter is not None:
        self._progress_reporter.close()
        self._progress_reporter = None

    if self._profiling:  # window extended past the last step
      jax.profiler.stop_trace()
      self._profiling = False

  def _train_epochs(self, num_epochs, lr, lr_milestones, iters_per_epoch,
                    num_batches, fused_source, negative_sampling, sparse,
                    fd, shuffle, fused_steps_per_call, profile_dir,
                    profile_steps, train_dataset, train_dataloader,
                    batch_size, num_sampling_users, progress,
                    val_dataloader, eval_freq, metrics,
                    eval_num_recommendations, eval_num_users,
                    eval_batch_size, model_checkpoint_prefix,
                    checkpoint_freq):
    # async epoch-log threads (loss fetch + overflow note) joined with
    # bounded staleness: the thread from two epochs back is joined at
    # each epoch start, so an overflow noted in epoch e deterministically
    # triggers its rebuild by epoch e+2 (the device is at most ~1 epoch
    # behind the host there, so the join adds no pipeline bubble, while
    # an unjoined thread could otherwise lag past the end of a short run
    # and silently drop the rebuild)
    pending_logs = []
    for epoch in range(self.current_epoch, num_epochs + 1):
      self.current_epoch = epoch
      for ep, th in list(pending_logs):
        if ep <= epoch - 2:
          th.join()
          pending_logs.remove((ep, th))
      epoch_lr = _multistep_lr(lr, lr_milestones, epoch)
      lr_arr = jnp.float32(epoch_lr)
      epoch_losses = []
      epoch_overflows = []
      t0 = time.time()
      reporter = None

      def _start_progress(total):
        # one reporter object serves the whole train() call: per-epoch
        # objects would either leak concurrent bars or need a
        # pipeline-draining join per epoch (recoder_tpu.progress)
        if not progress:
          return None
        desc = f'Epoch {epoch}/{num_epochs}'
        if self._progress_reporter is None:
          from recoder_tpu.progress import ProgressReporter
          self._progress_reporter = ProgressReporter(total, desc)
        else:
          self._progress_reporter.reset(total, desc)
        return self._progress_reporter

      if fused_source is not None and self._overflow_rebuild is not None:
        fused_source = self._rebuild_fused_source(
            fused_source, train_dataset, batch_size, num_sampling_users)
        if self._train_iterator is not None and self._iters_consumed:
          # a retained partial-epoch iterator carries epoch state
          # (permutation / per-epoch tables) shaped for the OLD
          # budgets; feeding it to a step traced for the new ones
          # fails at trace time. Restart the epoch instead.
          log.info('budget rebuild mid-epoch: restarting the epoch '
                   '(%d consumed batches re-run)', self._iters_consumed)
        self._train_iterator = None
        self._iters_consumed = 0

      if fused_source is not None:
        if (self._train_iterator is None
            or self._iters_consumed >= num_batches):
          # users-mode precompute: per-epoch tables dispatched on
          # device (prefetched one epoch ahead below); None falls back
          # to the on-device union build with a device permutation
          state = (fused_source.epoch_state(epoch, full_decode=fd)
                   if negative_sampling else None)
          if state is None:
            perm_key = jax.random.fold_in(
                jax.random.PRNGKey(self.seed + 1), epoch)
            state = fused_source.epoch_permutation(perm_key)
          self._train_iterator = ('fused', state)
          self._iters_consumed = 0
          # prefetch only when a fresh iterator was just drawn: a
          # retained partial-epoch iterator means the next refill will
          # ask for a LATER epoch's state, and unconditional per-epoch
          # prefetches would pile unused table sets up in HBM
          if negative_sampling and epoch < num_epochs:
            fused_source.prefetch_epoch(epoch + 1, full_decode=fd)
        _, perm = self._train_iterator

        iters_to_process = min(iters_per_epoch,
                               num_batches - self._iters_consumed)
        src_arrays = fused_source.device_arrays()
        serialize = self._cpu_mesh_serialize()
        # scan-batched dispatch amortizes per-call host/tunnel cost;
        # profiling forces single-step calls so the trace window's
        # step boundaries stay host-visible. 'auto': scan whenever the
        # step runs the table-fetch path (blocks mode, or users mode
        # with per-epoch tables) -- the general users-mode step
        # measurably loses optimizations inside a scan body
        # (242 vs 306 batches/s, docs/benchmarks.md)
        if fused_steps_per_call in (None, 'auto'):
          table_step = (shuffle == 'blocks'
                        or fused_source.d_slab is not None
                        or (negative_sampling
                            and fused_source.users_precompute))
          fused_steps_per_call = 16 if table_step else 1
        spc = 1 if profile_dir is not None else max(
            1, int(fused_steps_per_call))
        # device-side step carry (counters + overflow); one upload per
        # epoch, one fetch at epoch end
        carry = fused_source._put(jnp.asarray(
            [self._iters_consumed, self._global_step, 0, 0, 0, 0],
            jnp.int32))
        reporter = _start_progress(iters_to_process)
        remaining = iters_to_process
        while remaining > 0:
          block = spc if remaining >= spc else 1
          step_fn = self._get_fused_step_fn(fused_source,
                                            negative_sampling, sparse,
                                            steps=block,
                                            full_decode=fd)
          self._maybe_profile(profile_dir, profile_steps)
          self._iters_consumed += block
          self._global_step += block
          remaining -= block
          if not sparse:
            dense_params, _ = self._split_params()
            new_params, self.opt_state, loss, carry = step_fn(
                dense_params, self.opt_state, carry, perm, lr_arr,
                src_arrays)
            self.model.params = new_params
          else:
            (self.model.params, self.opt_state, self.sparse_states,
             loss, carry) = step_fn(self.model.params, self.opt_state,
                                    self.sparse_states, carry, perm,
                                    lr_arr, src_arrays)
          if serialize:
            jax.block_until_ready(loss)
          epoch_losses.append(loss)  # scalar (block 1) or [block] vector
          if reporter is not None:
            reporter.put(block, loss)
        if iters_to_process:
          epoch_overflows.append(carry[2:])
      else:
        if (self._train_iterator is None
            or self._iters_consumed >= num_batches):
          self._train_iterator = self._device_batch_iter(train_dataloader)
          self._iters_consumed = 0

        iters_to_process = min(iters_per_epoch,
                               num_batches - self._iters_consumed)
        reporter = _start_progress(iters_to_process)

        for _ in range(iters_to_process):
          self._maybe_profile(profile_dir, profile_steps)
          try:
            device_batch, has_target = next(self._train_iterator)
          except StopIteration:
            break
          self._iters_consumed += 1
          loss = self._train_step(device_batch, has_target, lr_arr, sparse)
          if self._cpu_mesh_serialize():
            jax.block_until_ready(loss)
          epoch_losses.append(loss)
          if reporter is not None:
            reporter.put(1, loss)

      # mean loss reduced on device; the host fetch happens on a logger
      # thread so the next epoch's dispatch isn't blocked by the
      # round trip (the fetch would otherwise drain the whole pipeline)
      mean_loss_arr = (jnp.mean(jnp.concatenate(
          [jnp.atleast_1d(l) for l in epoch_losses]))
                       if epoch_losses else None)
      # [sum_nnz, sum_union, max_nnz, max_union] -- already accumulated
      # on device inside the fused step (donated carry)
      overflow_arr = epoch_overflows[0] if epoch_overflows else None
      dt = time.time() - t0
      prefix = (f'Epoch {epoch}/{num_epochs} (lr={epoch_lr:g}) '
                f'[{iters_to_process} it, {dt:.2f}s, '
                f'{iters_to_process / max(dt, 1e-9):.1f} it/s]')
      sync_log = (eval_freq > 0 and epoch % eval_freq == 0) \
          or epoch == num_epochs
      if sync_log or mean_loss_arr is None:
        mean_loss = (float(mean_loss_arr)
                     if mean_loss_arr is not None else float('nan'))
        msg = f'{prefix} loss={mean_loss:.5f}'
        if overflow_arr is not None:
          self._note_overflow(np.asarray(overflow_arr))
      else:
        import threading as _threading

        def _log_epoch(arr=mean_loss_arr, ov=overflow_arr, p=prefix):
          log.info('%s loss=%.5f', p, float(arr))
          if ov is not None:
            self._note_overflow(np.asarray(ov))

        _th = _threading.Thread(target=_log_epoch, daemon=True)
        _th.start()
        pending_logs.append((epoch, _th))
        msg = None

      if eval_freq > 0 and epoch % eval_freq == 0 and val_dataloader is not None:
        val_loss = self._validate(val_dataloader)
        msg += f' val_loss={val_loss:.5f}'
        if metrics is not None and eval_num_recommendations is not None:
          results = self._evaluate(val_dataloader.dataset,
                                   num_recommendations=eval_num_recommendations,
                                   metrics=metrics, batch_size=eval_batch_size,
                                   num_users=eval_num_users)
          for metric in results:
            msg += f' {metric}={np.mean(results[metric]):.4f}'

      if msg is not None:
        log.info(msg)

      if model_checkpoint_prefix and \
          ((checkpoint_freq > 0 and epoch % checkpoint_freq == 0)
           or epoch == num_epochs):
        self.save_state(model_checkpoint_prefix)
    for _, th in pending_logs:  # deterministic post-train state
      th.join()

  def reset_training_state(self):
    """Re-initialize model params and optimizer state in place.

    Compiled step functions are kept -- shapes are unchanged, so a
    subsequent ``train`` pays zero recompilation. Used for warm-started
    benchmarking (bench_quality.py) and hyperparameter restarts."""
    self.model.init_model(self.num_items, self.num_users, seed=self.seed)
    if self.mesh is not None:
      from recoder_tpu.parallel import shard_params
      self.model.params = shard_params(self.model.params, self.model,
                                       self.mesh)
    self._model_initialized = True
    self.opt_state = None
    self.sparse_states = {}
    self._pending_opt_arrays = None
    self.current_epoch = 1
    self._global_step = 0
    self._train_iterator = None
    self._train_iterator_key = None
    self._iters_consumed = 0
    self._overflow_rebuild = None

  def _note_overflow(self, overflow):
    """Record device-pipeline overflow counts fetched at epoch end.

    overflow is [sum_nnz, sum_union, max_step_nnz, max_step_union]
    for the epoch. Any nonzero count means the fixed budgets censored
    training data this epoch; we warn and schedule a source rebuild
    with grown budgets (applied at the next epoch boundary, where a
    recompile is cheap relative to silent data loss)."""
    nnz_dropped, union_dropped = int(overflow[0]), int(overflow[1])
    if nnz_dropped == 0 and union_dropped == 0:
      return
    log.warning(
        'device pipeline overflow this epoch: %d interactions truncated, '
        '%d union items dropped; growing budgets and rebuilding the '
        'on-device source', nnz_dropped, union_dropped)
    # elementwise max with any pending note: the async epoch-log
    # threads may deliver epochs out of order, and a late small
    # overflow must not shrink the budget a larger one already asked
    # for (that would force a second warn+rebuild cycle)
    with self._overflow_note_lock:
      prev = self._overflow_rebuild or (0, 0)
      self._overflow_rebuild = (max(prev[0], int(overflow[2])),
                                max(prev[1], int(overflow[3])))

  def _rebuild_fused_source(self, fused_source, train_dataset, batch_size,
                            num_sampling_users):
    """Replace the on-device source with grown budgets after overflow."""
    from recoder_tpu.data.device_pipeline import DeviceDataSource
    with self._overflow_note_lock:
      max_nnz_dropped, max_union_dropped = self._overflow_rebuild
      self._overflow_rebuild = None
    new_budget = fused_source.mega_nnz_budget
    new_width = fused_source.union_width
    if max_nnz_dropped:
      # the worst step needed budget + max_nnz_dropped slots; add 10%
      new_budget = max(int(new_budget * 1.5),
                       int((new_budget + max_nnz_dropped) * 1.1))
      new_budget = (new_budget + 1023) // 1024 * 1024
    if max_union_dropped:
      new_width = max(int(new_width * 1.25),
                      int((new_width + max_union_dropped) * 1.1))
      new_width = min((new_width + 63) // 64 * 64, self.num_items)
    log.info('rebuilding device source: mega_nnz_budget %d -> %d, '
             'union_width %d -> %d', fused_source.mega_nnz_budget,
             new_budget, fused_source.union_width, new_width)
    # carry the dense-slab cache across the rebuild: free the old
    # source's slab FIRST (both resident at once could not fit), purge
    # fused step fns still referencing the old source, then re-request
    # on the new source below
    slab_width = fused_source._slab_width
    # re-apply the request that ESTABLISHED the cache, not a guess:
    # a user-forced slab_cache=True must stay forced across the
    # rebuild (mapping it back to 'auto' would re-run the budget
    # heuristic that the user explicitly overrode)
    slab_req = fused_source._slab_request or 'auto'
    fused_source.maybe_cache_slabs(0, request=False)
    self._step_fns = {k: v for k, v in self._step_fns.items()
                      if k[0] != 'fused'}
    target_matrix = train_dataset.target_interactions_matrix
    fused_source = DeviceDataSource(
        train_dataset.interactions_matrix, batch_size=batch_size,
        num_sampling_users=num_sampling_users, num_items=self.num_items,
        union_width=new_width, mega_nnz_budget=new_budget, mesh=self.mesh,
        shuffle=fused_source.shuffle,
        num_random_negatives=fused_source.num_random_negatives,
        seed=self.seed, target_matrix=target_matrix,
        table_sharding=fused_source._want_table_sharding)
    self._fused_source_cache = (
        train_dataset.interactions_matrix,
        (batch_size, num_sampling_users, self.mesh, fused_source.shuffle,
         fused_source.num_random_negatives, target_matrix is not None,
         fused_source._want_table_sharding),
        fused_source, target_matrix)
    if slab_width is not None and \
        not fused_source.maybe_cache_slabs(slab_width, request=slab_req):
      log.warning('dense-slab cache not re-established after the '
                  'overflow rebuild; continuing on the scatter path')
    return fused_source

  @property
  def fused_data_source(self):
    """The live fused on-device data source, or None.

    Public accessor for introspection (which pipeline served the last
    ``train`` call, whether sharded table storage engaged, the realized
    union width/budgets) without reaching into the private cache tuple.
    """
    cached = getattr(self, '_fused_source_cache', None)
    return cached[2] if cached is not None else None

  def _maybe_profile(self, profile_dir, profile_steps):
    """Start/stop a jax.profiler trace window around global steps."""
    if profile_dir is None:
      return
    start, stop = profile_steps
    if self._global_step == start and not self._profiling:
      jax.profiler.start_trace(profile_dir)
      self._profiling = True
      log.info('profiler trace started (step %d) -> %s',
               self._global_step, profile_dir)
    elif self._global_step >= stop and self._profiling:
      jax.profiler.stop_trace()
      self._profiling = False
      log.info('profiler trace stopped (step %d)', self._global_step)

  def _train_step(self, batch, has_target, lr_arr, sparse):
    step_fn = self._get_step_fn(has_target, sparse)
    step_idx = np.int32(self._global_step)
    self._global_step += 1
    if not sparse:
      dense_params, _ = self._split_params()
      new_params, self.opt_state, loss = step_fn(
          dense_params, self.opt_state, batch, lr_arr, step_idx)
      self.model.params = new_params
    else:
      new_params, self.opt_state, self.sparse_states, loss = step_fn(
          self.model.params, self.opt_state, self.sparse_states,
          batch, lr_arr, step_idx)
      self.model.params = new_params
    return loss

  def _validate(self, val_dataloader):
    val_loss_fn = self._get_val_loss_fn()
    serialize = self._cpu_mesh_serialize()
    losses = []
    for batch, _ in self._device_batch_iter(val_dataloader):
      loss = val_loss_fn(self.model.params, batch)
      if serialize:
        jax.block_until_ready(loss)
      losses.append(loss)
    if not losses:
      return float('nan')
    # single host sync at the end, not one per batch
    return float(jnp.mean(jnp.stack(losses)))

  # ------------------------------------------------------------------
  # inference / evaluation
  # ------------------------------------------------------------------

  def predict(self, users_interactions, return_input=False):
    """Full-catalog predictions for a batch of users.

    Returns ``(output, input_dense)`` when ``return_input`` else just
    ``output`` (fixes the reference's always-a-tuple quirk,
    model.py:511). Outputs are numpy, trimmed to the logical
    ``num_items`` columns.
    """
    if not self._model_initialized:
      raise RuntimeError('Model not initialized.')
    batch = self._inference_collate(users_interactions)
    out, input_dense = self._predict_batch(batch)
    if return_input:
      return out, input_dense
    return out

  def _predict_batch(self, batch):
    model = self.model
    W = model.num_items_padded
    B = len(batch.users)
    dense = self._densify(jnp.asarray(batch.rows), jnp.asarray(batch.cols),
                          jnp.asarray(batch.vals), B, W)
    cd_kw = ({} if self.eval_compute_dtype is None
             else {'compute_dtype': self.eval_compute_dtype})
    out = model.apply(model.params, dense,
                      input_users=jnp.asarray(batch.users), training=False,
                      **cd_kw)
    out = np.asarray(out.astype(jnp.float32))[:, :self.num_items]
    input_dense = np.asarray(dense)[:, :self.num_items]
    return out, input_dense

  def _inference_collate(self, users_interactions):
    """Collate a full-catalog inference batch with nnz padding on a
    power-of-two ladder: repeated inference calls share one compiled
    program per bucket (at most log2(max nnz) programs), and — unlike
    the monotone sticky width this replaces — one huge batch cannot
    permanently inflate the scatter width of every later small one."""
    if len(users_interactions.users) == 0:
      raise ValueError('cannot score an empty user batch')
    collator = BatchCollator(batch_size=len(users_interactions.users),
                             negative_sampling=False,
                             num_items=self.num_items,
                             pad_users_to_batch_size=False)
    batch = collator.collate(users_interactions)[0]
    width = max(1024, 1 << int(np.ceil(np.log2(max(len(batch.rows), 1)))))
    if len(batch.rows) < width:
      pad = width - len(batch.rows)
      batch.rows = np.pad(batch.rows, (0, pad),
                          constant_values=len(batch.users))
      batch.cols = np.pad(batch.cols, (0, pad))
      batch.vals = np.pad(batch.vals, (0, pad))
    return batch

  def recommend_async(self, users_interactions, num_recommendations):
    """Dispatch top-k recommendation on device; returns the device
    array handle [B, k] (fetch with np.asarray)."""
    if not self._model_initialized:
      raise RuntimeError('Model not initialized.')
    batch = self._inference_collate(users_interactions)
    fn = self._get_recommend_fn(num_recommendations)
    top_idx, _ = fn(self.model.params, jnp.asarray(batch.rows),
                    jnp.asarray(batch.cols), jnp.asarray(batch.vals),
                    jnp.asarray(batch.users))
    return top_idx

  def recommend(self, users_interactions, num_recommendations):
    """Top-k recommendations excluding each user's seen items.

    Exactness note: 'exact' top-k is certified for NaN-free score
    rows. A diverged model (NaN scores) yields unspecified ranking
    for the NaN rows — the monolithic path's ``lax.top_k`` ranks NaN
    first while the chunked merge ranks NaN last — so chunked and
    monolithic results may differ there; both are garbage by
    construction and the training loop's loss logging is the place
    divergence actually surfaces."""
    return np.asarray(
        self.recommend_async(users_interactions,
                             num_recommendations)).tolist()

  def _evaluate(self, eval_dataset, num_recommendations, metrics,
                batch_size=1, num_users=None):
    if not self._model_initialized:
      raise RuntimeError('Model not initialized')
    from recoder_tpu.recommender import InferenceRecommender
    recommender = InferenceRecommender(self, num_recommendations)
    evaluator = RecommenderEvaluator(recommender, metrics)
    return evaluator.evaluate(eval_dataset, batch_size=batch_size,
                              num_users=num_users)

  def evaluate(self, eval_dataset, num_recommendations, metrics,
               batch_size=1, num_users=None):
    """Evaluate on a dataset; logs the mean of each metric."""
    results = self._evaluate(eval_dataset, num_recommendations, metrics,
                             batch_size=batch_size, num_users=num_users)
    for metric in results:
      log.info('%s: %s', metric, np.mean(results[metric]))
    return results

  # ------------------------------------------------------------------
  # checkpointing
  # ------------------------------------------------------------------

  def save_state(self, model_checkpoint_prefix, backend='npz',
                 async_save=True):
    """Save a checkpoint; returns its path.

    ``backend='npz'`` (default) writes the single-file
    ``{prefix}_epoch_{N}.model`` archive (reference model.py:193-224
    ergonomics). ``backend='orbax'`` writes an async, atomic,
    tensorstore-sharded ``{prefix}_epoch_{N}.orbax/`` directory -- the
    pod-scale option: the train loop blocks only for the array
    snapshot, not the IO (recoder_tpu.checkpoint_orbax).
    """
    suffix = '.model' if backend == 'npz' else '.orbax'
    checkpoint_file = (f'{model_checkpoint_prefix}_epoch_'
                       f'{self.current_epoch}{suffix}')
    log.info('Saving model to %s', checkpoint_file)
    meta = {
        'recoder_version': __version__,
        'model_class': type(self.model).__name__,
        'model_params': self.model.model_params(),
        'model_sparse': bool(self.model.sparse_param_paths()),
        'last_epoch': self.current_epoch,
        'optimizer_type': self.optimizer_type,
        'num_items': self.num_items,
        'num_users': self.num_users,
        'global_step': self._global_step,
    }
    if isinstance(self.loss, str):
      meta['loss'] = self.loss
      meta['loss_params'] = self.loss_params

    arrays = {'model': self.model.params}
    if self.opt_state is not None:
      arrays['optimizer'] = self.opt_state
    if self.sparse_states:
      arrays['sparse_optimizer'] = self.sparse_states
    if self.items is not None:
      arrays['items'] = np.asarray(self.items)
    if self.users is not None:
      arrays['users'] = np.asarray(self.users)

    if backend == 'orbax':
      from recoder_tpu.checkpoint_orbax import save_checkpoint_orbax
      save_checkpoint_orbax(checkpoint_file, arrays, meta,
                            async_save=async_save)
    elif backend == 'npz':
      save_checkpoint(checkpoint_file, arrays, meta)
    else:
      raise ValueError(f'unknown checkpoint backend {backend!r}')
    return checkpoint_file

  def init_from_model_file(self, model_file):
    """Restore model/optimizer/training state from a checkpoint
    (either backend; the format is auto-detected)."""
    import os
    log.info('Loading model from: %s', model_file)
    from recoder_tpu.checkpoint_orbax import (is_orbax_checkpoint,
                                              load_checkpoint_orbax)
    if is_orbax_checkpoint(model_file):
      arrays, meta = load_checkpoint_orbax(model_file)
    elif os.path.isfile(model_file):
      arrays, meta = load_checkpoint(model_file)
    else:
      raise FileNotFoundError(f'No state file found in {model_file}')

    self.current_epoch = meta['last_epoch']
    self._global_step = meta.get('global_step', 0)
    self.loss = meta.get('loss', self.loss)
    self.loss_params = meta.get('loss_params', self.loss_params)
    self.optimizer_type = meta['optimizer_type']
    self.num_items = meta.get('num_items')
    self.num_users = meta.get('num_users')
    self.items = arrays.get('items')
    self.users = arrays.get('users')
    self._pending_opt_arrays = (arrays.get('optimizer'),
                                arrays.get('sparse_optimizer') or {})

    self.model.load_model_params(meta['model_params'])
    self._init_model()
    # overwrite freshly-initialized params with the checkpoint weights
    # (_adapt_array bridges sparse<->dense feature-padding differences)
    self.model.params = jax.tree_util.tree_map(
        _adapt_array, self.model.params, arrays['model'])
