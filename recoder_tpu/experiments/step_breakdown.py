"""Experiment: stage-ablated timing of the slab-cached training step.

After the dense-slab cache (docs/benchmarks.md r3) the fused
blocks-mode step runs ~0.73 ms f32 / ~0.66 ms bf16 at ML-20M bench
shape. This harness locates the residual: each stage is timed as a
separate jitted ``lax.scan(K)`` program (tunnel latency amortized over
K iterations; one scalar fetched at the end), cumulative so
consecutive differences are stage costs:

  fetch      dynamic_slice B rows off the resident slab + upcast
  forward    + normalize, denoising dropout, encode/decode matmuls
  loss       + confidence-weighted masked MSE over the score slab
  backward   + jax.grad through all of it
  adam       + full-table Adam update (p, m, v donated)

Shapes default to the bench config: B=500 users, W=20224 padded
catalog, d=200, cache 117k rows (the slab cache's real row count so
the slice reads the same layout). Run on the TPU:

  python -m recoder_tpu.experiments.step_breakdown [--dtype bfloat16]
"""

import time

import numpy as np


def run(B=500, W=20224, d=200, K=64, n_cache=117000, confidence=3.0,
        noise_prob=0.5, compute_dtype=None, state_dtype=None,
        params_dtype=None, seed=0, reps=3, loss='mse', packed=False,
        fd_mask=False):
  """``loss``: 'mse' (confidence-weighted, the ml20m config) or
  'logloss' (multinomial NLL, the msd config). ``packed``: store the
  slab cache bit-packed (uint32 words) and unpack in the fetch stage
  -- the MSD-scale tier where the bf16 slab exceeds HBM. ``fd_mask``:
  recover the full-decode loss column mask from the fetched slab
  (``any(x != 0, axis=0)``) like the real fd step, instead of a fixed
  mask."""
  import jax
  import jax.numpy as jnp

  jax.config.update('jax_default_prng_impl', 'rbg')
  rng = np.random.default_rng(seed)
  cd = jnp.dtype(compute_dtype if compute_dtype else jnp.float32)
  sd = jnp.dtype(state_dtype if state_dtype else jnp.float32)
  pd = jnp.dtype(params_dtype if params_dtype else jnp.float32)

  # resident slab cache (bf16, binary data) + params + Adam state
  host_bits = rng.random((n_cache, W)) < 0.004
  if packed:
    assert W % 32 == 0, W
    words = np.zeros((n_cache, W // 32), np.uint32)
    r, c = np.nonzero(host_bits)
    np.bitwise_or.at(words, (r, c >> 5),
                     np.uint32(1) << (c & 31).astype(np.uint32))
    slab_cache = jnp.asarray(words)
  else:
    slab_cache = jnp.asarray(host_bits.astype(np.float32),
                             dtype=jnp.bfloat16)
  params = {
      'en': jnp.asarray(rng.standard_normal((W, d)) * 0.01, pd),
      'de': jnp.asarray(rng.standard_normal((W, d)) * 0.01, pd),
      'en_b': jnp.zeros((d,), pd),
      'de_b': jnp.zeros((W,), pd),
  }
  adam = {
      'm': jax.tree_util.tree_map(
          lambda p: jnp.zeros(p.shape, sd), params),
      'v': jax.tree_util.tree_map(
          lambda p: jnp.zeros(p.shape, sd), params),
      't': jnp.int32(0),
  }
  col_mask = (jnp.arange(W) < W - 116).astype(jnp.float32)
  base_key = jax.random.PRNGKey(seed)

  def fetch(cache, i):
    if packed:
      rows = jax.lax.dynamic_slice(cache, (i * B, 0), (B, W // 32))
      shifts = jnp.arange(32, dtype=jnp.uint32)
      bits = (rows[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
      return bits.astype(cd).reshape(B, W)
    sl = jax.lax.dynamic_slice(cache, (i * B, 0), (B, W))
    return sl.astype(cd)

  def forward(cache, p, i, key):
    x = fetch(cache, i)
    nrm = jnp.maximum(jnp.linalg.norm(
        x.astype(jnp.float32), axis=1, keepdims=True), 1e-12)
    z = (x / nrm.astype(cd))
    keep = jax.random.bernoulli(key, 1 - noise_prob, (B, W))
    z = jnp.where(keep, z / (1 - noise_prob), 0.0)
    h = jnp.tanh(z @ p['en'].astype(cd) + p['en_b'].astype(cd))
    scores = h @ p['de'].astype(cd).T + p['de_b'].astype(cd)
    return x, scores

  def loss_fn(cache, p, i, key):
    x, scores = forward(cache, p, i, key)
    xf = x.astype(jnp.float32)
    sf = scores.astype(jnp.float32)
    if fd_mask:
      # real fd step: mask = columns present in the mega (off the
      # slab) clamped to the logical catalog (ops mirror model.py
      # _forward_loss)
      cm = jnp.logical_and(jnp.any(x != 0, axis=0),
                           col_mask.astype(bool)).astype(jnp.float32)
    else:
      cm = col_mask
    if loss == 'logloss':
      logits = jnp.where(cm[None, :].astype(bool), sf,
                         jnp.float32(-1e30))
      mx = jnp.max(logits, axis=1, keepdims=True)
      log_z = jnp.log(jnp.sum(jnp.exp(logits - mx), axis=1,
                              keepdims=True))
      return jnp.sum(-xf * ((logits - mx) - log_z) * cm[None, :]) / B
    w = 1.0 + confidence * (xf > 0)
    return jnp.sum(w * jnp.square(sf - xf) * cm[None, :]) / B

  def adam_update(p, st, g, lr=1e-3, b1=0.9, b2=0.999, eps=1e-8):
    # same storage/math split as optim.Optimizer: f32 math, state
    # STORED in sd (bf16 halves the m/v table traffic), params
    # STORED in pd (grads arrive from autodiff in pd)
    t = st['t'] + 1
    m = jax.tree_util.tree_map(
        lambda m_, g_: (b1 * m_.astype(jnp.float32)
                        + (1 - b1) * g_.astype(jnp.float32)),
        st['m'], g)
    v = jax.tree_util.tree_map(
        lambda v_, g_: (b2 * v_.astype(jnp.float32)
                        + (1 - b2) * g_.astype(jnp.float32)
                        * g_.astype(jnp.float32)),
        st['v'], g)
    tf = t.astype(jnp.float32)
    c1 = 1 - jnp.power(jnp.float32(b1), tf)
    c2 = 1 - jnp.power(jnp.float32(b2), tf)
    newp = jax.tree_util.tree_map(
        lambda p_, m_, v_: (p_.astype(jnp.float32) - lr * (m_ / c1) /
                            (jnp.sqrt(v_ / c2) + eps)).astype(pd),
        p, m, v)
    store = lambda tr: jax.tree_util.tree_map(
        lambda x: x.astype(sd), tr)
    return newp, {'m': store(m), 'v': store(v), 't': t}

  n_steps = n_cache // B

  def make_scan(stage):
    # the slab cache enters as a jit ARGUMENT (closure capture would
    # bake 4.7 GB into the serialized program -- decision record #24)
    def body(cache, carry, k):
      p, st = carry
      i = jax.lax.rem(k, n_steps)
      key = jax.random.fold_in(base_key, k)
      if stage == 'fetch':
        out = jnp.sum(fetch(cache, i).astype(jnp.float32))
        return (p, st), out
      if stage == 'forward':
        x, scores = forward(cache, p, i, key)
        return (p, st), jnp.sum(scores.astype(jnp.float32))
      if stage == 'loss':
        return (p, st), loss_fn(cache, p, i, key)
      l, g = jax.value_and_grad(loss_fn, argnums=1)(cache, p, i, key)
      if stage == 'backward':
        return (p, st), l + sum(
            jnp.sum(x[:1, :1].astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(g) if x.ndim == 2)
      newp, newst = adam_update(p, st, g)
      return (newp, newst), l

    def prog(cache, p, st):
      (p, st), outs = jax.lax.scan(
          lambda c, k: body(cache, c, k), (p, st),
          jnp.arange(K, dtype=jnp.int32))
      return p, st, outs[-1]

    return jax.jit(prog, donate_argnums=(1, 2))

  results = {}
  for stage in ('fetch', 'forward', 'loss', 'backward', 'adam'):
    fn = make_scan(stage)
    p = jax.tree_util.tree_map(jnp.copy, params)
    st = jax.tree_util.tree_map(jnp.copy, adam)
    p, st, out = fn(slab_cache, p, st)   # compile + warm
    float(out)                       # host fetch = the only real sync
    times = []
    for _ in range(reps):
      t0 = time.time()
      p, st, out = fn(slab_cache, p, st)
      float(out)
      times.append((time.time() - t0) / K * 1e3)
    results[stage] = sorted(times)[len(times) // 2]
    del p, st

  prev = 0.0
  print(f'dtype={cd.name} state={sd.name} params={pd.name} '
        f'B={B} W={W} d={d} K={K}')
  for stage, ms in results.items():
    print(f'  {stage:9s} cum {ms:6.3f} ms   stage {ms - prev:+6.3f} ms')
    prev = ms
  return results


if __name__ == '__main__':
  import argparse
  ap = argparse.ArgumentParser()
  ap.add_argument('--dtype', default=None,
                  choices=[None, 'float32', 'bfloat16'], nargs='?')
  ap.add_argument('--state-dtype', default=None,
                  choices=[None, 'float32', 'bfloat16'], nargs='?')
  ap.add_argument('--params-dtype', default=None,
                  choices=[None, 'float32', 'bfloat16'], nargs='?')
  ap.add_argument('--preset', default='ml20m', choices=['ml20m', 'msd'],
                  help="msd: B=500, W=41216 padded catalog, logloss, "
                       "bit-packed slab cache (the bench config the "
                       "packed tier makes eligible), fd mask recovered "
                       "from the slab. Cache rows are capped at 180k "
                       "(~0.93 GiB packed) -- stage timings are "
                       "row-count-independent, only the slice origin "
                       "wraps sooner")
  ap.add_argument('--packed', action='store_true',
                  help='bit-packed slab cache (implied by --preset msd)')
  args = ap.parse_args()
  cd = args.dtype if args.dtype not in (None, 'float32') else None
  sd = (args.state_dtype if args.state_dtype not in (None, 'float32')
        else None)
  pd = (args.params_dtype
        if args.params_dtype not in (None, 'float32') else None)
  kw = {}
  if args.preset == 'msd':
    kw = dict(W=41216, n_cache=180000, loss='logloss', packed=True,
              fd_mask=True)
  if args.packed:
    kw['packed'] = True
  run(compute_dtype=cd, state_dtype=sd, params_dtype=pd, **kw)
