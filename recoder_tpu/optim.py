"""Optimizers with reference (torch) semantics, as pure pytree updates.

The reference trains with torch.optim {SGD(momentum=0.9), Adam, Adagrad,
RMSprop(momentum=0.9)} plus torch.optim.SparseAdam for sparse embedding
gradients (reference model.py:101-156). We re-implement the exact update
rules rather than use optax so that:
  * weight decay is L2-added-to-gradient (torch style), masked off for
    bias parameters (model.py:121-124);
  * SparseAdam semantics hold: only the rows touched by the batch get
    moment/parameter updates, with bias correction from a global step
    counter -- realized here as a scatter update over the batch's item
    union rows (TPU-friendly: the full table is never read or written).

All update functions are pure and jit-safe; ``lr`` is a traced scalar so
LR schedules do not recompile.
"""

import jax
import jax.numpy as jnp


def _tree_zeros(params, dtype=None):
  # dtype=None means FLOAT32 moments (the documented default: f32
  # state, bit-exact torch trajectories) -- NOT the params' dtype.
  # bf16-params models keep f32 moments unless state_dtype says
  # otherwise, so an explicit opt_state_dtype=None/'float32' is
  # honored regardless of parameter storage.
  dtype = jnp.float32 if dtype is None else dtype
  return jax.tree_util.tree_map(
      lambda p: jnp.zeros(p.shape, dtype
                          if jnp.issubdtype(p.dtype, jnp.floating)
                          else p.dtype), params)


def _store(x, like):
  """Round an f32-computed state value back to the stored buffer dtype.

  Round-to-nearest-even (jnp.astype). Measured receipt for why RN is
  enough here (vs stochastic rounding): the 30-epoch quality gate
  (tests/test_model.py opt_state_dtype='bfloat16' row) passes within
  the reference's own atol -- see docs/benchmarks.md (bf16 optimizer
  state). The concern with bf16 EMAs is lost tiny increments
  (b2=0.999 updates below the ~2^-8 relative quantum); in this
  workload g^2 fluctuates across batches far above that quantum, so
  v does not stagnate.
  """
  return x.astype(like.dtype)


class Optimizer:
  """Dense optimizer over a params pytree.

  Args:
    kind (str): 'sgd' | 'adam' | 'adagrad' | 'rmsprop'.
    weight_decay: float or pytree (same structure as params) of per-leaf
      decay factors; tree form is used to zero decay on biases.
    betas, eps, momentum, alpha: per-rule hyper-parameters (torch
      defaults).
    state_dtype: storage dtype for the float state buffers (moments /
      accumulators), or None for the params' own dtype (f32; exact
      torch trajectories, tests/test_optim.py). 'bfloat16' halves the
      optimizer's HBM traffic -- the dominant step stage on the dense
      TPU path (docs/benchmarks.md roofline) -- at a deliberate,
      quality-gated deviation from the reference's f32 torch state
      (reference model.py:101-138): update math still runs in f32 (the
      stored state is upcast, combined with the f32 grad, applied to
      the f32 params, then rounded back for storage). Only 'adam' is
      quality-gated (30-epoch tests/test_model.py row); the other
      kinds REFUSE non-f32 state rather than accept an ungated
      numerics mode. adagrad in particular is unsound in bf16
      regardless of gating: its 'sum' buffer is a monotone
      accumulator, so once it exceeds ~2^8x the per-step g^2
      increment, round-to-nearest drops every further increment and
      the effective LR freezes permanently (the _store EMA argument
      does not apply to monotone sums).
  """

  #: kinds whose bf16 state storage passed the 30-epoch quality gate
  STATE_DTYPE_GATED_KINDS = frozenset({'adam'})

  def __init__(self, kind, weight_decay=0.0, betas=(0.9, 0.999), eps=1e-8,
               momentum=0.9, alpha=0.99, adagrad_eps=1e-10,
               state_dtype=None):
    assert kind in ('sgd', 'adam', 'adagrad', 'rmsprop'), \
        f'Unknown optimizer kind {kind}'
    self.kind = kind
    self.weight_decay = weight_decay
    self.betas = betas
    self.eps = eps
    self.momentum = momentum
    self.alpha = alpha
    self.adagrad_eps = adagrad_eps
    self.state_dtype = jnp.dtype(state_dtype) if state_dtype else None
    if (self.state_dtype is not None
        and self.state_dtype != jnp.dtype(jnp.float32)
        and kind not in self.STATE_DTYPE_GATED_KINDS):
      raise ValueError(
          f"state_dtype={str(self.state_dtype)!r} is only quality-gated "
          f"for {sorted(self.STATE_DTYPE_GATED_KINDS)} (30-epoch "
          f"tests/test_model.py rows); '{kind}' refuses reduced-precision "
          "state rather than run an ungated numerics mode"
          + (" (adagrad's monotone 'sum' accumulator freezes the "
             "effective LR once increments fall below the bf16 quantum)"
             if kind == 'adagrad' else '') + '.')

  def init(self, params):
    step = jnp.zeros((), jnp.int32)
    sd = self.state_dtype
    if self.kind == 'sgd':
      return {'step': step, 'momentum': _tree_zeros(params, sd)}
    if self.kind == 'adam':
      return {'step': step, 'm': _tree_zeros(params, sd),
              'v': _tree_zeros(params, sd)}
    if self.kind == 'adagrad':
      return {'step': step, 'sum': _tree_zeros(params, sd)}
    if self.kind == 'rmsprop':
      return {'step': step, 'sq': _tree_zeros(params, sd),
              'buf': _tree_zeros(params, sd)}

  def _decayed(self, grads, params):
    wd = self.weight_decay
    if isinstance(wd, (int, float)):
      if wd == 0:
        return grads
      return jax.tree_util.tree_map(lambda g, p: g + wd * p, grads, params)
    return jax.tree_util.tree_map(lambda g, p, w: g + w * p,
                                  grads, params, wd)

  def update(self, grads, state, params, lr):
    """Returns (new_params, new_state).

    ALL update math is anchored at f32: bf16-stored buffers -- moments
    via ``state_dtype``, params (and therefore grads, which autodiff
    produces in the params' dtype) via the models' bf16
    ``params_dtype`` training mode -- are upcast for the math and
    rounded back to their storage dtype on return. The param update
    uses the UN-rounded f32 value of the new state (better than
    applying the rounded one -- the rounding error enters the
    trajectory once, at the next step's read, not twice). With f32
    storage every cast is a no-op and the trajectories are bit-exact
    torch (tests/test_optim.py).
    """
    tm = jax.tree_util.tree_map
    up = lambda tree: tm(lambda x: x.astype(jnp.float32), tree)
    params32 = up(params)
    grads = self._decayed(up(grads), params32)
    step = state['step'] + 1
    down = lambda tree32, ref: tm(_store, tree32, ref)

    if self.kind == 'sgd':
      mu = self.momentum
      new_buf = tm(lambda b, g: mu * b + g, up(state['momentum']), grads)
      new_params = tm(lambda p, b: p - lr * b, params32, new_buf)
      return down(new_params, params), {
          'step': step, 'momentum': down(new_buf, state['momentum'])}

    if self.kind == 'adam':
      b1, b2 = self.betas
      bc1 = 1.0 - b1 ** step.astype(jnp.float32)
      bc2 = 1.0 - b2 ** step.astype(jnp.float32)
      new_m = tm(lambda m, g: b1 * m + (1 - b1) * g,
                 up(state['m']), grads)
      new_v = tm(lambda v, g: b2 * v + (1 - b2) * g * g,
                 up(state['v']), grads)

      def upd(p, m, v):
        denom = jnp.sqrt(v) / jnp.sqrt(bc2) + self.eps
        return p - (lr / bc1) * m / denom

      new_params = tm(upd, params32, new_m, new_v)
      return down(new_params, params), {
          'step': step, 'm': down(new_m, state['m']),
          'v': down(new_v, state['v'])}

    if self.kind == 'adagrad':
      new_sum = tm(lambda s, g: s + g * g, up(state['sum']), grads)
      new_params = tm(
          lambda p, g, s: p - lr * g / (jnp.sqrt(s) + self.adagrad_eps),
          params32, grads, new_sum)
      return down(new_params, params), {
          'step': step, 'sum': down(new_sum, state['sum'])}

    if self.kind == 'rmsprop':
      a, mu = self.alpha, self.momentum
      new_sq = tm(lambda s, g: a * s + (1 - a) * g * g,
                  up(state['sq']), grads)
      new_buf = tm(lambda b, g, s: mu * b + g / (jnp.sqrt(s) + self.eps),
                   up(state['buf']), grads, new_sq)
      new_params = tm(lambda p, b: p - lr * b, params32, new_buf)
      return down(new_params, params), {
          'step': step, 'sq': down(new_sq, state['sq']),
          'buf': down(new_buf, state['buf'])}


def fold_dual_union(ids1, g1, ids2, g2, spare):
  """Coalesce two row-grad sets over one table into one update set.

  torch coalesces every use of a tied parameter into ONE sparse grad
  and takes ONE SparseAdam step; two sequential :meth:`update_rows`
  calls would advance the step counter twice and double-decay the
  moments of overlapping rows. Where ``ids2`` overlaps ``ids1``, the
  second use's grads fold into the first's slots; the folded slots are
  re-pointed at ``spare`` (a padding row, receives exactly-zero grads)
  so the concatenated index set stays duplicate-free on real rows.

  Requires both id vectors sorted with unique real ids (sentinel
  padding repeated at the tail is fine: repeated slots carry zero
  grads, so every duplicate write is value-identical and the
  scatter's unique-indices promise stays safe).

  Returns ``(ids_cat [R1+R2], grads_cat [R1+R2, d])`` (float32) for
  one :meth:`SparseRowAdam.update_rows` call. The fold accumulates in
  f32 even when autodiff produced the row grads in a bf16 table's
  dtype -- overlapping-row addition is update MATH, which anchors at
  f32 everywhere (see :class:`Optimizer`); rounding it in bf16 would
  add a second per-step rounding beyond the documented storage one.
  """
  g1 = g1.astype(jnp.float32)
  g2 = g2.astype(jnp.float32)
  pos = jnp.clip(jnp.searchsorted(ids1, ids2), 0, ids1.shape[0] - 1)
  hit = ids1[pos] == ids2
  g1 = g1.at[pos].add(jnp.where(hit[:, None], g2, 0.0))
  ids_cat = jnp.concatenate([ids1, jnp.where(hit, spare, ids2)])
  grads_cat = jnp.concatenate([g1, jnp.where(hit[:, None], 0.0, g2)])
  return ids_cat, grads_cat


class SparseRowAdam:
  """Row-sparse Adam over a 2-D embedding table (torch SparseAdam).

  Per step, only the rows indexed by ``ids`` (the batch item/user union,
  unique by construction) have their first/second moments and parameters
  updated; bias correction uses a global step counter. No weight decay
  (torch SparseAdam has none).

  The update never materializes full-table temporaries: it is gather ->
  small row-space math -> scatter, so cost is O(|union| * d) regardless
  of catalog size.

  ``state_dtype`` stores the m/v tables in that dtype (e.g. 'bfloat16'
  to halve the moment tables' HBM residency and gather/scatter bytes);
  math stays f32 -- see :class:`Optimizer`. None = f32, exact torch
  SparseAdam trajectories.
  """

  def __init__(self, betas=(0.9, 0.999), eps=1e-8, state_dtype=None):
    self.betas = betas
    self.eps = eps
    self.state_dtype = jnp.dtype(state_dtype) if state_dtype else None

  def init(self, table):
    # None = f32 moments (documented default), even for bf16 tables
    sd = self.state_dtype or jnp.float32
    return {'step': jnp.zeros((), jnp.int32),
            'm': jnp.zeros(table.shape, sd), 'v': jnp.zeros(table.shape, sd)}

  def update_rows(self, table, state, ids, row_grads, lr):
    """Apply one sparse step.

    Args:
      table: [N, d] parameter table.
      state: moments from :meth:`init`.
      ids: int32 [R] unique row indices (or None for all rows).
      row_grads: [R, d] gradient w.r.t. the gathered rows.
      lr: scalar learning rate.

    Returns (new_table, new_state).
    """
    b1, b2 = self.betas
    step = state['step'] + 1
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)
    step_size = lr * jnp.sqrt(bc2) / bc1

    if ids is None:
      m_rows, v_rows, p_rows = state['m'], state['v'], table
    else:
      m_rows = state['m'].at[ids].get(mode='promise_in_bounds')
      v_rows = state['v'].at[ids].get(mode='promise_in_bounds')
      p_rows = table.at[ids].get(mode='promise_in_bounds')

    # f32 math on the gathered rows (grads arrive in the table's dtype
    # when params are stored bf16); storage rounds back per buffer
    g32 = row_grads.astype(jnp.float32)
    new_m = b1 * m_rows.astype(jnp.float32) + (1 - b1) * g32
    new_v = (b2 * v_rows.astype(jnp.float32)
             + (1 - b2) * g32 * g32)
    new_p = _store(
        p_rows.astype(jnp.float32)
        - step_size * new_m / (jnp.sqrt(new_v) + self.eps), table)

    if ids is None:
      return new_p, {'step': step, 'm': _store(new_m, state['m']),
                     'v': _store(new_v, state['v'])}

    return (table.at[ids].set(new_p, mode='promise_in_bounds',
                              unique_indices=True),
            {'step': step,
             'm': state['m'].at[ids].set(_store(new_m, state['m']),
                                         mode='promise_in_bounds',
                                         unique_indices=True),
             'v': state['v'].at[ids].set(_store(new_v, state['v']),
                                         mode='promise_in_bounds',
                                         unique_indices=True)})


def make_weight_decay_tree(params, weight_decay, bias_free_paths=None,
                           is_bias=None):
  """Build a per-leaf weight-decay tree: 0 for biases, wd elsewhere.

  ``is_bias`` is a predicate over the flattened '/'-joined path name;
  default: any path segment containing 'bias' (matching the reference's
  ``'bias' in param_name`` rule, model.py:123). ``bias_free_paths``
  optionally names additional exact paths to exempt from decay.
  """
  bias_free = frozenset(bias_free_paths or ())
  if is_bias is None:
    is_bias = lambda path: 'bias' in path

  flat = jax.tree_util.tree_flatten_with_path(params)
  paths = ['/'.join(str(getattr(k, "key", k)) for k in path)
           for path, _ in flat[0]]
  leaves = [0.0 if (is_bias(p) or p in bias_free) else float(weight_decay)
            for p in paths]
  return jax.tree_util.tree_unflatten(flat[1], leaves)
