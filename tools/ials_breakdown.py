"""Experiment: stage-ablated timing of the iALS half-sweep on the TPU.

The iALS warm sweep is measured (tools/bench_ials.py: ~3.96 s at the
synthetic ML-20M shape, d=128) but — unlike the training-step headline
(docs/benchmarks.md roofline section) — its time was never attributed
to stages. This harness locates it, with the same cumulative-stage
methodology as recoder_tpu/experiments/step_breakdown.py: each stage
is a separate jitted program per (B, L) chunk bucket, run over the
REAL resident chunk plan of one half-sweep, one host fetch at the end
(the only reliable sync through the tunneled runtime); consecutive
differences are stage costs:

  gather    take the [B, L, d] factor slab off the padded table
  build     + the A/b einsum corrections ([B, d, d] systems)
  solve     + batched d x d Cholesky + two triangular solves
  scatter   + write the chunk's [B, d] solutions into the result

Stage outputs are forced with sum-of-squares (a plain sum of a
linear einsum output could legally be rewritten into a cheaper
contraction; the square makes the full tensor load-bearing). The
shared Gram and the per-side totals are timed separately. Optionally
A/Bs the einsum precision tier (--precision high vs the shipped
highest) — the r4 menu measured HIGH at 47.9 vs HIGHEST at 26.9
TFLOP/s on this v5e, so if `build` dominates, the tier is the lever.

Usage: python tools/ials_breakdown.py [--d 128] [--reps 5]
       [--precision highest|high] [--users N --items N --mean-items N]
Prints one JSON line on stdout; progress on stderr.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')
from bench import synthesize, synthesize_ml20m, log  # noqa: E402


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--d', type=int, default=128)
  ap.add_argument('--alpha', type=float, default=10.0)
  ap.add_argument('--lam', type=float, default=3e-3)
  ap.add_argument('--reps', type=int, default=5)
  ap.add_argument('--precision', choices=['highest', 'high'],
                  default='highest')
  ap.add_argument('--solver', default='stock',
                  choices=['stock', 'lax', 'cho', 'blocked16',
                           'blocked32', 'blocked64', 'pallas'],
                  help="SPD solve lowering: 'stock' = jnp cholesky + "
                       "two jax.scipy solve_triangular calls (shipped "
                       "r5 first cut); 'lax' = same but direct "
                       "lax.linalg.triangular_solve; 'cho' = "
                       "jax.scipy cho_solve; 'blockedN' = "
                       "ops/spd.spd_solve with base N")
  ap.add_argument('--users', type=int, default=0)
  ap.add_argument('--items', type=int, default=0)
  ap.add_argument('--mean-items', type=int, default=0)
  ap.add_argument('--side', choices=['user', 'item'], default='user',
                  help='which half-sweep to ablate (the user side is '
                       'the bigger one at ML-20M: 116,677 rows)')
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp

  from recoder_tpu.models import IALS

  if args.users or args.items:
    matrix = synthesize(args.users or 116677, args.items or 20108,
                        args.mean_items or 86,
                        mean_factor=0.68 if args.mean_items else 0.683)
  else:
    matrix = synthesize_ml20m()
  if args.side == 'item':
    import scipy.sparse as sp
    matrix = sp.csr_matrix(matrix.T)
  n_rows, n = matrix.shape
  d = args.d
  prec = (jax.lax.Precision.HIGHEST if args.precision == 'highest'
          else jax.lax.Precision.HIGH)
  log(f'iALS[{d}] {args.side}-side half-sweep breakdown over '
      f'{n_rows}x{n}, nnz={matrix.nnz}, precision={args.precision}')

  model = IALS(embedding_size=d, alpha=args.alpha, lam=args.lam)
  plan = model._chunk_plan(matrix)
  chunks = plan['chunks']
  slots = sum(int(c['cols'].size) for c in chunks)
  log(f'{len(chunks)} chunks, {slots} padded slots '
      f'({slots / matrix.nnz:.2f}x nnz)')

  rng = np.random.default_rng(0)
  factors = jnp.asarray(
      rng.standard_normal((n, d)).astype(np.float32) / np.sqrt(d))
  factors_pad = jnp.concatenate([factors, jnp.zeros((1, d))], axis=0)
  gram = jnp.matmul(factors.T, factors, precision=prec)
  alpha = jnp.float32(args.alpha)

  def build_ab(factors_pad, cols, vals, reg):
    f = jnp.take(factors_pad, cols, axis=0)
    valid = (cols < factors_pad.shape[0] - 1).astype(vals.dtype)
    w_a = alpha * vals
    a = gram[None] + jnp.einsum('bl,bld,ble->bde', w_a, f, f,
                                precision=prec)
    a = a + reg[:, None, None] * jnp.eye(d, dtype=a.dtype)
    b = jnp.einsum('bl,bld->bd', w_a + valid, f, precision=prec)
    return a, b

  def solve_x(factors_pad, cols, vals, reg):
    a, b = build_ab(factors_pad, cols, vals, reg)
    if args.solver == 'stock':
      chol = jnp.linalg.cholesky(a)
      y = jax.scipy.linalg.solve_triangular(chol, b[..., None],
                                            lower=True)
      return jax.scipy.linalg.solve_triangular(chol, y, lower=True,
                                               trans=1)[..., 0]
    if args.solver == 'lax':
      chol = jnp.linalg.cholesky(a)
      y = jax.lax.linalg.triangular_solve(chol, b[..., None],
                                          left_side=True, lower=True)
      return jax.lax.linalg.triangular_solve(
          chol, y, left_side=True, lower=True,
          transpose_a=True)[..., 0]
    if args.solver == 'cho':
      return jax.scipy.linalg.cho_solve(
          (jnp.linalg.cholesky(a), True), b[..., None])[..., 0]
    from recoder_tpu.ops.spd import spd_solve
    if args.solver == 'pallas':
      return spd_solve(a, b, impl='pallas')
    return spd_solve(a, b, base=int(args.solver[len('blocked'):]),
                     impl='blocked')

  @jax.jit
  def st_gather(factors_pad, cols):
    return jnp.sum(jnp.square(jnp.take(factors_pad, cols, axis=0)))

  @jax.jit
  def st_build(factors_pad, cols, vals, reg):
    a, b = build_ab(factors_pad, cols, vals, reg)
    return jnp.sum(jnp.square(a)) + jnp.sum(jnp.square(b))

  @jax.jit
  def st_solve(factors_pad, cols, vals, reg):
    return jnp.sum(jnp.square(solve_x(factors_pad, cols, vals, reg)))

  @jax.jit
  def st_scatter(out, factors_pad, rows, cols, vals, reg):
    x = solve_x(factors_pad, cols, vals, reg)
    return out.at[rows].set(x, mode='drop')

  @jax.jit
  def st_gram(factors):
    return jnp.sum(jnp.square(
        jnp.matmul(factors.T, factors, precision=prec)))

  def run_stage(name, call, out_carry=False):
    # warm pass compiles every (B, L) bucket; timed passes then fetch
    # ONE scalar at the end (host fetch = the real sync; per-fetch
    # round trips are ~5 ms on the tunnel, so they are kept out of
    # the timed loop)
    def sweep():
      if out_carry:
        out = jnp.zeros((n_rows, d), jnp.float32)
        for c in chunks:
          out = call(out, factors_pad, c['rows'], c['cols'], c['vals'],
                     c['reg'])
        return out[0, 0]
      acc = None
      for c in chunks:
        s = call(factors_pad, c['cols'], c['vals'], c['reg'])
        acc = s if acc is None else acc + s
      return acc
    np.asarray(sweep())  # compile + warm
    t0 = time.time()
    for _ in range(args.reps):
      last = sweep()
    np.asarray(last)
    dt = (time.time() - t0) / args.reps
    log(f'  {name:8s} {dt * 1e3:9.1f} ms/half-sweep')
    return dt

  t_gather = run_stage('gather', lambda fp, c, v, r: st_gather(fp, c))
  t_build = run_stage('build', st_build)
  t_solve = run_stage('solve', st_solve)
  t_scatter = run_stage('scatter', st_scatter, out_carry=True)
  np.asarray(st_gram(factors))
  t0 = time.time()
  for _ in range(args.reps):
    g = st_gram(factors)
  np.asarray(g)
  t_gram = (time.time() - t0) / args.reps
  log(f'  {"gram":8s} {t_gram * 1e3:9.1f} ms')

  # analytic floors for the dominant terms, from the measured v5e
  # numbers already in docs/benchmarks.md: 590 GB/s HBM (calibrated,
  # design.md #27) and the matmul tier menu (HIGH 47.9 / HIGHEST 26.9
  # TFLOP/s at [8192^2]; small batched shapes will sit below these)
  gather_bytes = slots * d * 4
  build_flops = 2.0 * slots * d * d  # the bde einsum dominates
  chol_flops = len(chunks) and sum(
      c['cols'].shape[0] for c in chunks) * (d ** 3 / 3 + 2 * d * d * d)
  out = {
      'metric': f'ials_{args.side}_half_sweep_breakdown',
      'd': d, 'precision': args.precision,
      'users': n_rows if args.side == 'user' else n,
      'items': n if args.side == 'user' else n_rows,
      'nnz': int(matrix.nnz), 'padded_slots': slots,
      'chunks': len(chunks),
      'gather_ms': round(t_gather * 1e3, 1),
      'build_ms': round(t_build * 1e3, 1),
      'solve_ms': round(t_solve * 1e3, 1),
      'scatter_ms': round(t_scatter * 1e3, 1),
      'gram_ms': round(t_gram * 1e3, 1),
      'delta_build_ms': round((t_build - t_gather) * 1e3, 1),
      'delta_solve_ms': round((t_solve - t_build) * 1e3, 1),
      'delta_scatter_ms': round((t_scatter - t_solve) * 1e3, 1),
      'floor_gather_ms_at_590GBs': round(gather_bytes / 590e9 * 1e3, 1),
      'floor_build_ms_at_26.9TFLOPs': round(build_flops / 26.9e12 * 1e3,
                                            1),
      'floor_build_ms_at_47.9TFLOPs': round(build_flops / 47.9e12 * 1e3,
                                            1),
      'cholesky_solve_flops_G': round(chol_flops / 1e9, 1),
  }
  print(json.dumps(out), flush=True)


if __name__ == '__main__':
  main()
