"""Experiment: COO-direct training forward vs the dense-slab forward.

The r2c step breakdown (docs/benchmarks.md) put the fused blocks-mode
step at ~1.69 ms: build 0.07, forward+backward 1.30, optimizer 0.32 --
slab-byte-bound, with docs calling the residual ~2x "XLA's fusion
territory". This experiment verifies that claim the way the Pallas
claims were verified: build the candidate (a forward that never
materializes the [B, W] INPUT slab -- encode straight from COO with
noise applied per-nnz, decode to the score slab, and fold the target
into the loss as a gathered correction term: for elementwise losses
``sum(l(x, t)) = sum(l(x, 0)) + sum_nnz[l(x_k, t_k) - l(x_k, 0)]``),
measure both under lax.scan(K) so the tunnel cannot pollute sub-ms
stages, and record the numbers either way.

Run on the TPU:  python -m recoder_tpu.experiments.coo_forward
"""

import time

import numpy as np


def run(B=500, W=15872, M=46080, d=200, K=64, confidence=3.0,
        noise_prob=0.5, seed=0):
  import jax
  import jax.numpy as jnp

  jax.config.update('jax_default_prng_impl', 'rbg')
  rng = np.random.default_rng(seed)

  # synthetic batch at bench shape: ~86 nnz per user over the union
  rows = np.pad(np.repeat(np.arange(B, dtype=np.int32), M // B),
                (0, M - B * (M // B)), constant_values=B)
  cols = rng.integers(0, W - 128, M).astype(np.int32)
  vals = np.ones(M, np.float32)
  nnz_valid = int(M * 0.72)  # budget slack like the real pipeline
  rows[nnz_valid:] = B
  en = (rng.standard_normal((W, d)) * 0.01).astype(np.float32)
  de = (rng.standard_normal((W, d)) * 0.01).astype(np.float32)
  en_b = np.zeros(d, np.float32)
  de_b = np.zeros(W, np.float32)
  params = {k: jnp.asarray(v) for k, v in
            dict(en=en, de=de, en_b=en_b, de_b=de_b).items()}
  rows, cols, vals = map(jnp.asarray, (rows, cols, vals))
  base_key = jax.random.PRNGKey(seed)

  row_mask = (jnp.arange(B) < B).astype(jnp.float32)
  col_mask = (jnp.arange(W) < W - 64).astype(jnp.float32)

  def densify():
    dense = jnp.zeros((B, W), jnp.float32)
    return dense.at[rows, cols].add(vals, mode='drop')

  def dense_forward(p, rng_key):
    x = densify()
    nrm = jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    z = x / nrm
    keep = jax.random.bernoulli(rng_key, 1 - noise_prob, (B, W))
    z = jnp.where(keep, z / (1 - noise_prob), 0.0)
    h = jnp.tanh(z @ p['en'] + p['en_b'])
    scores = h @ p['de'].T + p['de_b']
    w = 1.0 + confidence * (x > 0)
    loss = jnp.sum(w * jnp.square(scores - x)
                   * row_mask[:, None] * col_mask[None, :])
    return loss / B

  def coo_forward(p, rng_key):
    # per-user L2 norm from the COO values
    sq = jax.ops.segment_sum(vals * vals, rows, num_segments=B + 1)
    nrm = jnp.maximum(jnp.sqrt(sq), 1e-12)
    zv = vals / nrm[rows]
    # denoising dropout per nnz (zeros stay zero under dropout)
    keep = jax.random.bernoulli(rng_key, 1 - noise_prob, (M,))
    zv = jnp.where(keep, zv / (1 - noise_prob), 0.0)
    # encode: segment-sum of gathered table rows (never build [B, W])
    en_rows = p['en'].at[cols].get(mode='promise_in_bounds')
    h = jax.ops.segment_sum(zv[:, None] * en_rows, rows,
                            num_segments=B + 1)[:B]
    h = jnp.tanh(h + p['en_b'])
    scores = h @ p['de'].T + p['de_b']
    # loss = zeros part (dense over the score slab) + nnz correction
    base = jnp.sum(jnp.square(scores)
                   * row_mask[:, None] * col_mask[None, :])
    r_ok = jnp.minimum(rows, B - 1)
    x_k = scores[r_ok, cols]
    ok = ((rows < B) * (vals != 0)).astype(jnp.float32) \
        * row_mask[r_ok] * col_mask[cols]
    wk = 1.0 + confidence
    corr = jnp.sum(ok * (wk * jnp.square(x_k - vals)
                         - jnp.square(x_k)))
    return (base + corr) / B

  # -- union-gather vs masked full-catalog decode ----------------------
  # The synthetic dense baseline above owns [W, d] tables directly; the
  # REAL step's tables span the padded catalog [Wp, d] and every step
  # gathers the union's rows forward and scatter-adds their grads
  # backward. Candidate: skip the gathers -- encode/decode against the
  # FULL table (pure MXU matmuls both ways) and mask the loss to the
  # union's columns (one 16k scatter builds the mask).
  Wp = 20224
  enf = (rng.standard_normal((Wp, d)) * 0.01).astype(np.float32)
  def_ = (rng.standard_normal((Wp, d)) * 0.01).astype(np.float32)
  de_bf = np.zeros(Wp, np.float32)
  params_full = {k: jnp.asarray(v) for k, v in
                 dict(en=enf, de=def_, de_b=de_bf,
                      en_b=np.zeros(d, np.float32)).items()}
  items_u = jnp.asarray(
      np.sort(rng.choice(Wp - 128, W, replace=False)).astype(np.int32))
  raw_cols = items_u[cols]            # raw catalog ids per nnz

  def union_gather_forward(p, rng_key):
    """Mirrors the real dense step: gather union rows from the
    catalog-sized tables, math over [B, W], grads scatter back."""
    en_rows = p['en'].at[items_u].get(mode='promise_in_bounds',
                                      unique_indices=True,
                                      indices_are_sorted=True)
    de_rows = p['de'].at[items_u].get(mode='promise_in_bounds',
                                      unique_indices=True,
                                      indices_are_sorted=True)
    de_bias = p['de_b'].at[items_u].get(mode='promise_in_bounds',
                                        unique_indices=True,
                                        indices_are_sorted=True)
    x = densify()
    nrm = jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    z = x / nrm
    keep = jax.random.bernoulli(rng_key, 1 - noise_prob, (B, W))
    z = jnp.where(keep, z / (1 - noise_prob), 0.0)
    h = jnp.tanh(z @ en_rows + p['en_b'])
    scores = h @ de_rows.T + de_bias
    w = 1.0 + confidence * (x > 0)
    loss = jnp.sum(w * jnp.square(scores - x)
                   * row_mask[:, None] * col_mask[None, :])
    return loss / B

  def full_decode_forward(p, rng_key):
    """Candidate: full-catalog matmuls, loss masked to union columns
    (built by one scatter); no row gathers, backward = pure matmuls."""
    umask = jnp.zeros((Wp,), jnp.float32) \
        .at[items_u].set(1.0, mode='drop')
    dense = jnp.zeros((B, Wp), jnp.float32)
    x = dense.at[rows, raw_cols].add(vals, mode='drop')
    nrm = jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    z = x / nrm
    keep = jax.random.bernoulli(rng_key, 1 - noise_prob, (B, Wp))
    z = jnp.where(keep, z / (1 - noise_prob), 0.0)
    h = jnp.tanh(z @ p['en'] + p['en_b'])
    scores = h @ p['de'].T + p['de_b']
    w = 1.0 + confidence * (x > 0)
    loss = jnp.sum(w * jnp.square(scores - x)
                   * row_mask[:, None] * umask[None, :])
    return loss / B

  def timed(name, fn, p=None):
    p = params if p is None else p

    def scanned(p, key):
      def body(acc, i):
        return acc + fn(p, jax.random.fold_in(key, i)), None
      out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
      return out

    jf = jax.jit(scanned)
    float(jf(p, base_key))  # compile
    t0 = time.time()
    v = float(jf(p, base_key))
    dt = (time.time() - t0) / K * 1000
    print(f'{name:34s} {dt:7.3f} ms  (value {v:.4f})')
    return dt

  def grad_of(fn):
    g = jax.grad(lambda p, k: fn(p, k))
    def both(p, k):
      gr = g(p, k)
      return sum(jnp.sum(v) for v in gr.values())
    return both

  print(f'shapes: B={B} W={W} Wp={Wp} M={M} d={d}  scan K={K}')
  timed('densify scatter only', lambda p, k: jnp.sum(densify()))
  t_fwd_dense = timed('dense forward (loss)', dense_forward)
  t_fwd_coo = timed('coo forward (loss)', coo_forward)
  t_fb_dense = timed('dense forward+backward', grad_of(dense_forward))
  t_fb_coo = timed('coo forward+backward', grad_of(coo_forward))
  print(f'coo vs dense: fwd {t_fwd_dense / t_fwd_coo:5.2f}x   '
        f'fwd+bwd {t_fb_dense / t_fb_coo:.2f}x')
  t_u = timed('union-gather fwd (real step shape)', union_gather_forward,
              params_full)
  t_f = timed('full-decode masked fwd', full_decode_forward, params_full)
  t_ub = timed('union-gather fwd+bwd', grad_of(union_gather_forward),
               params_full)
  t_fb = timed('full-decode masked fwd+bwd', grad_of(full_decode_forward),
               params_full)
  print(f'full-decode vs union-gather: fwd {t_u / t_f:5.2f}x   '
        f'fwd+bwd {t_ub / t_fb:.2f}x')


if __name__ == '__main__':
  run()
