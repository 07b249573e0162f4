"""Executed receipt: EASE ``fit(mesh=...)`` PAST the single-chip width
ceiling.

The single-chip EASE ceiling is ~27-30k items (the Newton-Schulz solve
holds ~4 [n, n] f32 buffers; 41k measured OOM on one 16 GB v5e —
docs/benchmarks.md). The sharded fit divides per-chip residency by the
mesh 'model' ways, but until r5 it had only been *executed* at small
widths (tests/test_ease.py) — the 27k+ billing rested on byte
arithmetic. This script turns the projection into a receipt: it runs
the REAL ``EASE.fit(mesh=...)`` at ``--items`` (default 27,648 ≥ the
stated 27k analytic ceiling) on the 8-virtual-device CPU mesh
(``--xla_force_host_platform_device_count``), then

  * asserts per-device residency: B comes back row-sharded
    PartitionSpec('model', None), every addressable shard holds exactly
    n/model_ways rows (no device ever materializes the full [n, n]),
  * cross-checks correctness against the independent LAPACK Cholesky
    solve of the same Gram (exact to f32 round-off),
  * reports the Newton residual/iterations and wall-clock, labeled
    VIRTUAL — 8 SPMD shards timeshare one physical core here, so the
    number proves execution, not speed (per-chip bytes and collective
    layout are what transfer to real hardware).

Run:  python tools/ease_mesh_receipt.py [--items 27648] [--lam 500]
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

MODEL_WAYS = 8


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--items', type=int, default=27648,
                  help='catalog width; must be >= the ~27k single-chip '
                       'analytic ceiling for the receipt to mean '
                       'anything, and divisible by 8 (the model ways)')
  ap.add_argument('--users', type=int, default=60000)
  ap.add_argument('--mean-items', type=int, default=45)
  ap.add_argument('--lam', type=float, default=500.0)
  ap.add_argument('--skip-cholesky', action='store_true',
                  help='skip the LAPACK cross-check (residual + '
                       'residency assertions only)')
  args = ap.parse_args()
  assert args.items % MODEL_WAYS == 0, args.items

  # on a 1-core host the 8 virtual devices' shard matmuls SERIALIZE, so
  # a device can sit at an all-gather for minutes while its peers
  # compute; XLA:CPU's default 40 s rendezvous termination timeout
  # aborts the process (measured: exit 134 at 27k wide). Raise it far
  # past the worst serialized skew (one [n/8, n] x [n, n] matmul per
  # peer) -- correctness receipts outrank liveness heuristics here.
  os.environ['XLA_FLAGS'] = (
      os.environ.get('XLA_FLAGS', '')
      + f' --xla_force_host_platform_device_count={MODEL_WAYS}'
      + ' --xla_cpu_collective_call_warn_stuck_timeout_seconds=600'
      + ' --xla_cpu_collective_call_terminate_timeout_seconds=14400'
      + ' --xla_cpu_collective_timeout_seconds=14400')
  import jax
  jax.config.update('jax_platforms', 'cpu')
  from jax.sharding import PartitionSpec as P

  from bench import synthesize
  from recoder_tpu.models import EASE
  from recoder_tpu.models.ease import _cholesky_solve
  from recoder_tpu.parallel import MeshConfig, make_mesh

  assert len(jax.devices()) == MODEL_WAYS, jax.devices()

  # calibrate the virtual-CPU matmul rate so the log can say up front
  # how long a [n, n] Newton iteration will take on this host
  import jax.numpy as jnp
  a = jnp.ones((4096, 4096), jnp.float32)
  jnp.matmul(a, a).block_until_ready()
  t0 = time.time()
  float(jnp.matmul(a, a)[0, 0])
  rate = 2 * 4096 ** 3 / (time.time() - t0) / 1e9
  per_mm = 2 * args.items ** 3 / (rate * 1e9)
  log(f'cpu matmul rate ~{rate:.0f} GFLOP/s; one [{args.items}]^2 '
      f'matmul ~{per_mm:.0f}s; a Newton iteration is 2 matmuls')

  log(f'synthesizing {args.users} x {args.items} binary interactions...')
  m = synthesize(args.users, args.items, args.mean_items,
                 mean_factor=0.68).tocsr().astype(np.float32)
  g_host = np.asarray((m.T @ m).todense(), np.float32)
  a1 = float(np.max(np.sum(np.abs(g_host), axis=0))) + args.lam
  log(f'nnz={m.nnz}; ||G+lam I||_1 ~ {a1:.0f} '
      f'(linear rate 1 - lam/||A||_1 = {1 - args.lam / a1:.4f})')

  mesh = make_mesh(MeshConfig(data=1, model=MODEL_WAYS))
  model = EASE(lam=args.lam)
  log(f'sharded fit over {mesh} ...')
  t0 = time.time()
  model.fit(m, gram='host', mesh=mesh, max_items=65536)
  b = model.item_weights
  b.block_until_ready()
  fit_s = time.time() - t0

  # residency: row-sharded over 'model', n/8 rows per device, no
  # device holds the full matrix
  assert b.shape == (args.items, args.items), b.shape
  assert b.sharding.spec == P('model', None), b.sharding
  shard_rows = {s.data.shape for s in b.addressable_shards}
  assert shard_rows == {(args.items // MODEL_WAYS, args.items)}, shard_rows
  per_chip_gib = args.items ** 2 // MODEL_WAYS * 4 / 2 ** 30
  full_gib = args.items ** 2 * 4 / 2 ** 30
  log(f'residency ok: 8 shards of [{args.items // MODEL_WAYS}, '
      f'{args.items}] = {per_chip_gib:.2f} GiB/chip/buffer '
      f'(full matrix would be {full_gib:.2f} GiB)')

  out = {
      'metric': 'ease_sharded_fit_width',
      'value': args.items,
      'unit': 'items',
      'model_ways': MODEL_WAYS,
      'per_chip_gib_per_buffer': round(per_chip_gib, 3),
      'fit_wall_s_virtual_cpu': round(fit_s, 1),
      'lam': args.lam,
  }

  if not args.skip_cholesky:
    log('independent LAPACK Cholesky solve of the same Gram...')
    t0 = time.time()
    b_ref = _cholesky_solve(jnp.asarray(g_host), jnp.float32(args.lam))
    b_ref.block_until_ready()
    log(f'cholesky took {time.time() - t0:.0f}s; comparing...')
    # compare in row blocks: two full f32 copies are ~6 GiB, fine, but
    # the elementwise diff of two [27k, 27k] is better streamed
    max_abs = 0.0
    max_rel_denom = float(np.abs(np.asarray(
        b_ref[:1024])).max())  # B entries are O(1e-2..1)
    step = 4096
    bh = np.asarray(b)
    brh = np.asarray(b_ref)
    for s in range(0, args.items, step):
      d = np.abs(bh[s:s + step] - brh[s:s + step]).max()
      max_abs = max(max_abs, float(d))
    out['max_abs_diff_vs_cholesky'] = float(f'{max_abs:.3e}')
    log(f'max |B_newton - B_cholesky| = {max_abs:.3e} '
        f'(B scale ~{max_rel_denom:.3f})')
    assert max_abs < 5e-3, max_abs

  print(json.dumps(out), flush=True)


if __name__ == '__main__':
  main()
