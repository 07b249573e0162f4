"""Executed receipt: iALS ``fit(mesh=...)`` at ML-20M scale on the
virtual 8-device mesh.

The mesh fit (models/ials.py) shards the row solves over every mesh
device along the chunk batch axis with the opposite-side factors
replicated; the small-shape equality gates live in tests/test_ials.py
and the driver dryrun. This script executes the sharded fit at the
REAL ML-20M shape (116,677 x 20,108; override with --users/--items)
on the 8-virtual-device CPU mesh and

  * asserts per-device residency of the resident chunk plans: every
    chunk's cols/vals come back batch-sharded with exactly B/8 rows
    per addressable shard, so the dominant resident cost (~8 bytes
    per padded nnz per side) divides by the device count,
  * cross-checks correctness against an independent per-row f64
    numpy HKV solve on sampled users (exact normal equations, no
    chunking, no batching),
  * reports wall-clock, labeled VIRTUAL -- 8 SPMD shards timeshare
    one physical core here, so the number proves execution, not
    speed (per-device bytes and the collective layout are what
    transfer to real hardware).

Run:  python tools/ials_mesh_receipt.py [--d 64] [--sweeps 1]
Prints one JSON line on stdout; progress on stderr.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

N_DEV = 8


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--d', type=int, default=64)
  ap.add_argument('--alpha', type=float, default=10.0)
  ap.add_argument('--lam', type=float, default=3e-3)
  ap.add_argument('--sweeps', type=int, default=1,
                  help='1 sweep (+ the final user half-sweep) is '
                       'enough for an execution receipt; the math is '
                       'sweep-invariant')
  ap.add_argument('--users', type=int, default=0)
  ap.add_argument('--items', type=int, default=0)
  ap.add_argument('--mean-items', type=int, default=0)
  ap.add_argument('--check-users', type=int, default=40,
                  help='sampled users for the independent numpy '
                       'cross-check')
  ap.add_argument('--factor-sharding', choices=['none', 'users'],
                  default='none',
                  help="'users' stores the user factors ROW-SHARDED "
                       "over the mesh (the >HBM-user-count lever) and "
                       "additionally asserts their per-device "
                       "residency")
  args = ap.parse_args()

  # same virtual-device + collective-timeout setup as
  # tools/ease_mesh_receipt.py: on a 1-core host the 8 shards
  # serialize, so XLA:CPU's 40 s rendezvous liveness heuristic must
  # not outrank the correctness receipt
  os.environ['XLA_FLAGS'] = (
      os.environ.get('XLA_FLAGS', '')
      + f' --xla_force_host_platform_device_count={N_DEV}'
      + ' --xla_cpu_collective_call_warn_stuck_timeout_seconds=600'
      + ' --xla_cpu_collective_call_terminate_timeout_seconds=14400'
      + ' --xla_cpu_collective_timeout_seconds=14400')
  import jax
  jax.config.update('jax_platforms', 'cpu')

  from bench import MEAN_ITEMS_PER_USER, NUM_ITEMS, NUM_USERS, synthesize
  from recoder_tpu.models import IALS
  from recoder_tpu.parallel import MeshConfig, make_mesh

  assert len(jax.devices()) == N_DEV, jax.devices()

  users = args.users or NUM_USERS
  items = args.items or NUM_ITEMS
  mean_items = args.mean_items or MEAN_ITEMS_PER_USER
  m = synthesize(users, items, mean_items,
                 mean_factor=0.68 if args.mean_items else 0.683)
  m = m.tocsr().astype(np.float32)

  mesh = make_mesh(MeshConfig(data=N_DEV // 2, model=2))
  model = IALS(embedding_size=args.d, alpha=args.alpha, lam=args.lam,
               sweeps=args.sweeps, seed=0)

  # residency: build one side's plan up front and assert every chunk
  # shards its batch axis into exactly B/8-row addressable shards
  plan = model._chunk_plan(m, mesh=mesh)
  total_b = per_dev_b = 0
  for c in plan['chunks']:
    B, L = c['cols'].shape
    assert B % N_DEV == 0, (B, L)
    shard_shapes = {s.data.shape for s in c['cols'].addressable_shards}
    assert shard_shapes == {(B // N_DEV, L)}, (shard_shapes, B, L)
    total_b += c['cols'].nbytes + c['vals'].nbytes
    per_dev_b += (c['cols'].nbytes + c['vals'].nbytes) // N_DEV
  log(f'user-side plan residency ok: {len(plan["chunks"])} chunks, '
      f'{total_b / 2**20:.1f} MiB total -> '
      f'{per_dev_b / 2**20:.1f} MiB/device (= total/{N_DEV})')

  fs = None if args.factor_sharding == 'none' else args.factor_sharding
  log(f'sharded iALS[{args.d}] fit over {users}x{items}, nnz={m.nnz}, '
      f'{args.sweeps} sweep(s), factor_sharding={fs} on {mesh} ...')
  t0 = time.time()
  model.fit(m, mesh=mesh, factor_sharding=fs)
  np.asarray(model.user_factors[0, 0])  # host fetch = the real sync
  fit_s = time.time() - t0
  log(f'fit done in {fit_s:.1f}s (VIRTUAL: 8 shards timeshare one core)')

  uf_mib_per_device = None
  if fs == 'users':
    # user factors row-sharded: equal per-device shards covering the
    # padded [n_pad, d]; no device materializes the full matrix
    uf = model.user_factors
    n_pad = -(-(users + 1) // N_DEV) * N_DEV
    assert uf.shape == (n_pad, args.d), uf.shape
    shapes = {s.data.shape for s in uf.addressable_shards}
    assert shapes == {(n_pad // N_DEV, args.d)}, shapes
    uf_mib_per_device = uf.nbytes / N_DEV / 2**20
    log(f'user-factor residency ok: {N_DEV} shards of '
        f'[{n_pad // N_DEV}, {args.d}] = {uf_mib_per_device:.1f} '
        f'MiB/device (full matrix {uf.nbytes / 2**20:.1f} MiB)')

  # independent per-row cross-check: exact f64 normal equations for
  # sampled users against the fitted item factors (the final stored
  # user factors are exact against the FINAL item factors by design)
  rng = np.random.default_rng(0)
  sample = rng.choice(users, size=min(args.check_users, users),
                      replace=False)
  v = np.asarray(model.item_factors, np.float64)
  g = v.T @ v
  got = np.asarray(model.user_factors, np.float32)[sample]
  worst = 0.0
  for j, u in enumerate(sample):
    lo, hi = m.indptr[u], m.indptr[u + 1]
    idx, val = m.indices[lo:hi], m.data[lo:hi].astype(np.float64)
    c = 1.0 + args.alpha * val
    reg = args.lam * (len(idx) + 1.0)
    a = g + (v[idx].T * (c - 1.0)) @ v[idx] + reg * np.eye(args.d)
    ref = np.linalg.solve(a, v[idx].T @ c)
    worst = max(worst, float(np.max(np.abs(ref - got[j]))))
  assert worst < 5e-4, worst
  log(f'numpy cross-check ok over {len(sample)} users: '
      f'max |err| = {worst:.2e}')

  out = {
      'metric': 'ials_sharded_fit_ml20m',
      'value': round(fit_s, 1),
      'unit': 's (virtual mesh; proves execution, not speed)',
      'users': users, 'items': items, 'nnz': int(m.nnz), 'd': args.d,
      'sweeps': args.sweeps, 'devices': N_DEV,
      'plan_mib_total': round(total_b / 2**20, 1),
      'plan_mib_per_device': round(per_dev_b / 2**20, 1),
      'crosscheck_users': len(sample),
      'crosscheck_max_abs_err': worst,
      'factor_sharding': fs,
  }
  if uf_mib_per_device is not None:
    out['user_factor_mib_per_device'] = round(uf_mib_per_device, 1)
  print(json.dumps(out), flush=True)


if __name__ == '__main__':
  main()
