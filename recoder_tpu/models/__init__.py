"""Factorization model zoo (pure-functional JAX, TPU-shaped).

Parity with reference recoder/nn.py: :class:`FactorizationModel` ABC,
:class:`DynamicAutoencoder`, :class:`MatrixFactorization`. Models hold
hyper-parameters and a params pytree; the compute path is a pure
``apply(params, ...)`` suitable for ``jax.jit`` / ``pjit``.

Beyond parity: :class:`EASE` (closed-form item-item model, one MXU
solve instead of an epoch loop; models/ease.py), :class:`MultVAE`
(the canonical vae_cf model, KL-annealed variational autoencoder with
multinomial likelihood; models/multvae.py) and :class:`IALS`
(implicit-feedback alternating least squares, batched MXU solves;
models/ials.py).
"""

from recoder_tpu.models.base import FactorizationModel, activation
from recoder_tpu.models.autoencoder import DynamicAutoencoder
from recoder_tpu.models.ease import EASE
from recoder_tpu.models.ials import IALS
from recoder_tpu.models.matrix_factorization import MatrixFactorization
from recoder_tpu.models.multvae import MultVAE

__all__ = ['FactorizationModel', 'activation', 'DynamicAutoencoder',
           'MatrixFactorization', 'EASE', 'IALS', 'MultVAE']
