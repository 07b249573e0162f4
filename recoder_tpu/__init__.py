"""recoder-tpu: a TPU-native collaborative-filtering framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``recoder`` library (mini-batch negative-sampling factorization models,
see arXiv:1809.00999): autoencoder / matrix-factorization training with
item-union compressed decoding, on-device ranking evaluation, ANN item
similarity search, and checkpoint/resume -- designed for TPU from the
start (static shapes, bucketed padding, MXU-shaped matmuls, mesh-sharded
embedding tables).

Public API parity map (reference file -> here):
  recoder/model.py:Recoder            -> recoder_tpu.model.Recoder
  recoder/nn.py                       -> recoder_tpu.models
  recoder/data.py                     -> recoder_tpu.data
  recoder/losses.py                   -> recoder_tpu.ops.losses
  recoder/metrics.py                  -> recoder_tpu.metrics
  recoder/recommender.py              -> recoder_tpu.recommender
  recoder/embedding.py                -> recoder_tpu.embedding
  recoder/utils.py                    -> recoder_tpu.utils
"""

__version__ = '0.2.0'


def _enable_compilation_cache():
  """Persist compiled executables across processes.

  Measured on the axon TPU client: a trivial jit compile costs up to
  ~100 s through the remote compiler cold, ~2 s with the cache warm.
  Opt out with RECODER_TPU_NO_COMPILE_CACHE=1 or by setting
  JAX_COMPILATION_CACHE_DIR yourself.
  """
  import os
  if os.environ.get('RECODER_TPU_NO_COMPILE_CACHE'):
    return
  if os.environ.get('JAX_COMPILATION_CACHE_DIR'):
    return
  try:
    import jax
    if jax.config.jax_compilation_cache_dir:
      return
    cache_dir = os.path.join(
        os.environ.get('RECODER_TPU_CACHE',
                       os.path.expanduser('~/.cache/recoder_tpu')),
        'jax_compilation_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
  except Exception:  # never block import on cache setup
    pass


_enable_compilation_cache()
