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

__version__ = '0.1.0'
