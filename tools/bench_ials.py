"""Time the iALS fit at ML-20M scale on the TPU.

One iALS half-sweep is a handful of batched device calls (shared Gram
matmul, per-chunk einsum corrections + batched d x d Cholesky —
models/ials.py); this records per-sweep wall-clock and end-to-end fit
time for the docs/benchmarks.md model-zoo section at the synthetic
ML-20M shape (116,677 users x 20,108 items, ~8.8M nnz) used by every
other throughput entry. Also reports quality on the real fixture when
asked (CPU path, tests/data) — the two measurements are separated
because the fixture is 75x smaller than the synthetic shape.

Usage: python tools/bench_ials.py [--d 128] [--sweeps 8] [--alpha 10]
Prints one JSON line on stdout; progress on stderr.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')
from bench import synthesize_ml20m, log  # noqa: E402


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--d', type=int, default=128)
  ap.add_argument('--alpha', type=float, default=10.0)
  ap.add_argument('--lam', type=float, default=3e-3)
  ap.add_argument('--sweeps', type=int, default=8)
  ap.add_argument('--users', type=int, default=0,
                  help='custom user count (default: ML-20M 116,677)')
  ap.add_argument('--items', type=int, default=0,
                  help='custom catalog width (default: ML-20M 20,108)')
  ap.add_argument('--mean-items', type=int, default=0,
                  help='mean interactions per user for custom shapes '
                       '(default: ML-20M 86; MSD is 59)')
  args = ap.parse_args()

  from recoder_tpu.models import IALS

  if args.users or args.items:
    from bench import MEAN_ITEMS_PER_USER, NUM_ITEMS, NUM_USERS, synthesize
    matrix = synthesize(args.users or NUM_USERS,
                        args.items or NUM_ITEMS,
                        args.mean_items or MEAN_ITEMS_PER_USER,
                        mean_factor=0.68 if args.mean_items else 0.683)
  else:
    matrix = synthesize_ml20m()
  log(f'iALS[{args.d}] fit over {matrix.shape[0]}x{matrix.shape[1]}, '
      f'nnz={matrix.nnz}, {args.sweeps} sweeps...')

  model = IALS(embedding_size=args.d, alpha=args.alpha, lam=args.lam,
               sweeps=args.sweeps, seed=0)
  times = [time.time()]

  def tick(sweep):
    # the sweep loop is fully async (resident chunk plans, no host
    # round trips): force completion with a host FETCH — the one
    # reliable sync through the tunneled runtime (block_until_ready
    # returns early there). This serializes the pipeline, so the
    # per-sweep numbers are upper bounds on the async steady state.
    np.asarray(model.item_factors[0, 0])
    times.append(time.time())
    log(f'  sweep {sweep}: {times[-1] - times[-2]:.2f}s')

  t0 = time.time()
  model.fit(matrix, callback=tick)
  np.asarray(model.user_factors[0, 0])  # final half-sweep completion
  t_fit = time.time() - t0
  per_sweep = np.diff(times)
  # sweep 0 pays every (B, L) bucket compile; later sweeps are warm
  warm = float(np.median(per_sweep[1:])) if len(per_sweep) > 1 else None
  log(f'fit total {t_fit:.2f}s (fetch-synced); cold sweep '
      f'{per_sweep[0]:.2f}s, median warm sweep {warm and round(warm, 2)}s')

  out = {
      'metric': ('ials_ml20m_fit_seconds' if not (args.users or args.items)
                 else f'ials_{matrix.shape[0]}x{matrix.shape[1]}_fit_seconds'),
      'value': round(t_fit, 2), 'unit': 's',
      'd': args.d, 'alpha': args.alpha, 'lam': args.lam,
      'sweeps': args.sweeps,
      'cold_sweep_s': round(float(per_sweep[0]), 2),
      'median_warm_sweep_s': warm and round(warm, 2),
      'users': int(matrix.shape[0]), 'items': int(matrix.shape[1]),
      'nnz': int(matrix.nnz),
  }
  print(json.dumps(out), flush=True)


if __name__ == '__main__':
  main()
