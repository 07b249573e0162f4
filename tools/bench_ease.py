"""Time the EASE closed-form fit at ML-20M catalog scale on the TPU.

EASE's training is one chunked on-device Gram accumulation (MXU) plus
one [items x items] Cholesky inverse (MXU). This records the
wall-clock split for the docs/benchmarks.md model-zoo section at the
synthetic ML-20M shape (20,108 items) used by every other throughput
entry. For comparison, the host-side scipy sparse Gram this replaced
measured 48.25 s on this 1-core host, and jnp.linalg.inv's blocked LU
failed to compile at this width on v5e (scoped-vmem exhaustion).

Usage: python tools/bench_ease.py [--lam 500] [--host-gram]
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
  ap.add_argument('--lam', type=float, default=500.0)
  ap.add_argument('--host-gram', action='store_true',
                  help='also time the host scipy Gram for comparison')
  ap.add_argument('--items', type=int, default=0,
                  help='custom catalog width (default: ML-20M 20,108; '
                       'use 41140 to probe the MSD width -- the '
                       'Newton solve holds ~4 [n, n] f32 buffers, so '
                       'the single-chip HBM ceiling lands near 30k)')
  args = ap.parse_args()

  from recoder_tpu.models import EASE

  if args.items:
    from bench import MSD_USERS, synthesize
    matrix = synthesize(MSD_USERS, args.items, 59, mean_factor=0.68)
  else:
    matrix = synthesize_ml20m()
  log(f'EASE fit over {matrix.shape[0]}x{matrix.shape[1]}, '
      f'nnz={matrix.nnz}...')

  t_host = None
  if args.host_gram:
    t0 = time.time()
    _ = (matrix.T @ matrix).toarray()
    t_host = time.time() - t0
    log(f'  host scipy gram (comparison): {t_host:.2f}s')

  model = EASE(lam=args.lam)
  m = matrix.tocsr().astype(np.float32)
  model.num_items = m.shape[1]
  # cold = first-ever pass in the process: pays jit compile AND the
  # tunnel session's first-transfer init (measured ~60 s on its own
  # before any bytes move -- a per-process constant, not a per-fit one)
  t1 = time.time()
  g = model._device_gram(m)
  np.asarray(g[0, 0])  # tunnel-safe sync: fetch a value
  t_gram_cold = time.time() - t1
  log(f'  device gram (cold: compile + session init): '
      f'{t_gram_cold:.2f}s')
  t1 = time.time()
  g = model._device_gram(m)
  np.asarray(g[0, 0])
  t_gram = time.time() - t1
  log(f'  device gram (warm): {t_gram:.2f}s')

  # time the solve DIRECTLY on the already-computed Gram (a full fit()
  # here would re-run the Gram pass and inflate the solve split)
  t2 = time.time()
  model.item_weights = model._solve_b(g)
  np.asarray(model.item_weights[0, 0])
  t_solve_cold = time.time() - t2
  log(f'  solve (cold, incl. compile): {t_solve_cold:.2f}s')
  t2 = time.time()
  model.item_weights = model._solve_b(g)
  np.asarray(model.item_weights[0, 0])
  t_solve = time.time() - t2
  t_fit = t_gram + t_solve
  log(f'  solve (warm): {t_solve:.2f}s '
      f'(warm fit = gram + solve = {t_fit:.2f}s)')

  out = {
      'metric': ('ease_ml20m_fit_seconds' if not args.items
                 else f'ease_{args.items}items_fit_seconds'),
      'value': round(t_fit, 2), 'unit': 's',
      'gram_device_s': round(t_gram, 2),
      'solve_device_s': round(t_solve, 2),
      'gram_cold_s': round(t_gram_cold, 2),
      'solve_cold_s': round(t_solve_cold, 2),
      'items': int(matrix.shape[1]), 'lam': args.lam,
  }
  if t_host is not None:
    out['gram_host_comparison_s'] = round(t_host, 2)
  print(json.dumps(out), flush=True)


if __name__ == '__main__':
  main()
