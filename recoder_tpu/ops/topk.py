"""Fast exact top-k for wide score rows (the eval/recommend hot op).

``lax.top_k`` on TPU costs O(width x k) per row: at the full-catalog
recommend shape [500 users x 1M items, k=100] it measures 188.8 ms on
v5e -- ~60% of the whole recommend step -- while the TPU's binned
``lax.approx_max_k`` (PartialReduce) does the same shape in 10.8 ms at
~0.95 recall (docs/benchmarks.md). The reference's eval is exact
(torch.topk, reference model.py:540), so approximate results would
break metric parity.

``exact_top_k`` recovers exactness at a fraction of the sort cost:

1. One ``approx_max_k(s, oversample*k)`` pass proposes candidates
   (every returned value is a REAL element of the row).
2. Count-certification, one cheap compare+reduce pass and no scatter:
   with t = the k-th best candidate (<= the true k-th max, since the
   candidates are real elements), a row is certified exact iff
   ``#{x >= t} == #{candidates >= t}`` -- then the candidate set
   provably contains everything >= t, hence the whole true top-k.
3. Rows that fail (approx missed a top element, mass ties, fewer than
   k finite entries) are gathered -- up to ``salvage_rows`` of them --
   and re-ranked with a full-width exact ``lax.top_k`` over just those
   rows; more failures than that flips a ``lax.cond`` to the full
   batch-wide sort. Results are ALWAYS exact.

Rejected designs, measured on v5e at [500 x 1M], k=100:
  * threshold compaction via ``jnp.nonzero(size=...)``: the full-width
    index scatter runs at the TPU's ~8 ns/element issue rate -- 4.7 s.
  * multi-pass approx with found-elements scatter-masked to -inf
    between passes: certifies well (0/500 rows fail at 2 passes,
    recall_target 0.99) but each [500, 200]-index scatter into the
    [500 x 1M] slab costs ~90 ms -- the pass structure loses to sort.
"""

import jax.numpy as jnp
from jax import lax

#: rows at least this wide route through the certified path; below it
#: plain top_k is already cheap and the extra passes don't pay
MIN_WIDTH = 8192


def exact_top_k(s, k, oversample=4, recall_target=0.99, salvage_rows=64):
  """Exact ``lax.top_k(s, k)`` over the last axis, restructured to run
  near approx_max_k speed on TPU (see module docstring).

  Args:
    s: [..., width] scores.
    k: number of results.
    oversample: approx candidate count as a multiple of k. More
      candidates = fewer salvage rows but a costlier approx pass.
    recall_target: approx_max_k recall knob (drives its bin count).
    salvage_rows: max uncertified rows re-ranked individually before
      falling back to the batch-wide sort.

  Returns:
    (values [..., k], indices [..., k]) -- identical to lax.top_k up to
    the order of exactly-tied values.
  """
  width = s.shape[-1]
  k2 = max(int(oversample * k), k, 64)
  if width <= max(k2, MIN_WIDTH):
    return lax.top_k(s, k)

  lead = s.shape[:-1]
  s2 = s.reshape((-1, width))
  B = s2.shape[0]
  F = min(int(salvage_rows), B)

  av, ai = lax.approx_max_k(s2, k2, recall_target=recall_target)
  top_v, sel = lax.top_k(av, k)
  top_i = jnp.take_along_axis(ai.astype(jnp.int32), sel, axis=1)

  # count-certification: t is a real element so t <= true kth max; the
  # candidate set covers the true top-k iff it contains EVERY x >= t.
  # NaN rows cannot be certified by counting (NaN >= t is False, so
  # NaNs are invisible to both counts while lax.top_k ranks them
  # first) -- force them onto the exact salvage/fallback path
  t = top_v[:, -1:]
  cnt_all = jnp.sum((s2 >= t).astype(jnp.int32), axis=1)
  cnt_cand = jnp.sum((av >= t).astype(jnp.int32), axis=1)
  failed = (cnt_all != cnt_cand) | jnp.isnan(s2).any(axis=1)  # [B]
  nfail = jnp.sum(failed.astype(jnp.int32))

  def no_salvage(_):
    return top_v, top_i

  def salvage(_):
    # fill slots use the out-of-range row id B so the merge-back
    # scatter DROPS them -- an in-range fill (e.g. row 0) would let a
    # duplicate fill-slot write clobber that row's corrected result
    fail_idx = jnp.nonzero(failed, size=F, fill_value=B)[0]
    sub = s2.at[fail_idx].get(mode='clip')  # [F, width]
    sv, si = lax.top_k(sub, k)
    return (top_v.at[fail_idx].set(sv, mode='drop'),
            top_i.at[fail_idx].set(si.astype(jnp.int32), mode='drop'))

  def full(_):
    v, i = lax.top_k(s2, k)
    return v, i.astype(jnp.int32)

  vals, idx = lax.cond(
      nfail == 0, no_salvage,
      lambda op: lax.cond(nfail <= F, salvage, full, op), operand=None)
  return vals.reshape(lead + (k,)), idx.reshape(lead + (k,))


def top_k(s, k, mode='exact', oversample=4):
  """Top-k dispatcher for the recommend/eval paths.

  mode: 'exact' (count-certified fast path, default) | 'sort' (plain
  lax.top_k) | 'approx' (raw lax.approx_max_k at ~0.95 recall --
  serving-only; breaks exact metric parity).
  """
  if mode == 'sort':
    return lax.top_k(s, k)
  if mode == 'approx':
    if s.shape[-1] <= max(k, MIN_WIDTH):
      return lax.top_k(s, k)
    return lax.approx_max_k(s, k)
  if mode == 'exact':
    return exact_top_k(s, k, oversample=oversample)
  raise ValueError(f"unknown top-k mode {mode!r}; "
                   "choose 'exact' | 'sort' | 'approx'")
