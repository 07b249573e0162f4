"""Padding-aware losses.

Parity with reference recoder/losses.py (MSELoss :16, MultinomialNLLLoss
:50) plus the 'logistic' BCE-with-logits option wired in reference
model.py:90-91. Every loss takes optional validity masks because the
TPU pipeline pads both the user rows and the item-union columns: padded
elements must contribute exactly zero so sum-reduced losses match the
reference's unpadded sums bit-for-bit in expectation.

Functions return elementwise [B, W] losses; classes apply reduction
('none' | 'elementwise_mean' | 'sum', reference losses.py:5-13 -- note
the reference compares reduction strings with ``is``, a latent bug we
do not replicate).
"""

import jax.numpy as jnp


_NEG_INF = -1e30


def _apply_masks(loss, row_mask=None, col_mask=None):
  if row_mask is not None:
    loss = loss * row_mask[:, None]
  if col_mask is not None:
    loss = loss * col_mask[None, :]
  return loss


def _reduce(loss, reduction, row_mask=None, col_mask=None):
  if reduction == 'none':
    return loss
  if reduction == 'sum':
    return jnp.sum(loss)
  if reduction == 'elementwise_mean':
    # mean over *valid* elements (equals torch's full-tensor mean when
    # no padding is present)
    if row_mask is None and col_mask is None:
      return jnp.mean(loss)
    rows = jnp.sum(row_mask) if row_mask is not None else loss.shape[0]
    cols = jnp.sum(col_mask) if col_mask is not None else loss.shape[1]
    return jnp.sum(loss) / (rows * cols)
  raise ValueError(f'No such reduction {reduction} defined')


def mse_loss(input, target, confidence=0.0, row_mask=None, col_mask=None):
  """Confidence-weighted squared error: ``(1 + c*[t>0]) * (t - x)^2``.

  Elementwise math runs in float32 regardless of the (possibly bf16)
  input dtype; the casts fuse into the surrounding computation.
  """
  input = input.astype(jnp.float32)
  target = target.astype(jnp.float32)
  weights = 1.0 + confidence * (target > 0).astype(jnp.float32)
  loss = weights * jnp.square(input - target)
  return _apply_masks(loss, row_mask, col_mask)


def logistic_loss(input, target, row_mask=None, col_mask=None):
  """BCE with logits, the stable form used by torch BCEWithLogitsLoss:
  ``max(x, 0) - x*y + log(1 + exp(-|x|))``."""
  input = input.astype(jnp.float32)
  target = target.astype(jnp.float32)
  loss = (jnp.maximum(input, 0.0) - input * target
          + jnp.log1p(jnp.exp(-jnp.abs(input))))
  return _apply_masks(loss, row_mask, col_mask)


def multinomial_nll_loss(input, target, row_mask=None, col_mask=None):
  """Multinomial NLL ``-y * log_softmax(x)`` over the valid columns.

  Padded columns are excluded from the softmax normalizer (set to a
  large negative logit), otherwise the partition function would differ
  from the unpadded computation.
  """
  input = input.astype(jnp.float32)
  target = target.astype(jnp.float32)
  if col_mask is not None:
    logits = jnp.where(col_mask[None, :].astype(bool), input, _NEG_INF)
  else:
    logits = input
  log_z = jnp.log(jnp.sum(jnp.exp(logits - jnp.max(logits, axis=1,
                                                   keepdims=True)),
                          axis=1, keepdims=True))
  log_softmax = (logits - jnp.max(logits, axis=1, keepdims=True)) - log_z
  loss = -target * log_softmax
  return _apply_masks(loss, row_mask, col_mask)


class Loss:
  """Base loss module (callable)."""

  reduction = 'sum'

  def elementwise(self, input, target, row_mask=None, col_mask=None):
    raise NotImplementedError

  def __call__(self, input, target, row_mask=None, col_mask=None):
    loss = self.elementwise(input, target, row_mask=row_mask,
                            col_mask=col_mask)
    return _reduce(loss, self.reduction, row_mask=row_mask,
                   col_mask=col_mask)


class MSELoss(Loss):
  """Weighted MSE: ``w = 1 + confidence * 1[target > 0]``.

  Args:
    confidence (float): weighting of positive observations.
    reduction (str): 'none' | 'elementwise_mean' | 'sum'.
  """

  def __init__(self, confidence=0, reduction='elementwise_mean'):
    self.confidence = confidence
    self.reduction = reduction

  def elementwise(self, input, target, row_mask=None, col_mask=None):
    return mse_loss(input, target, confidence=self.confidence,
                    row_mask=row_mask, col_mask=col_mask)


class LogisticLoss(Loss):
  """BCE-with-logits (the reference's ``loss='logistic'``)."""

  def __init__(self, reduction='elementwise_mean'):
    self.reduction = reduction

  def elementwise(self, input, target, row_mask=None, col_mask=None):
    return logistic_loss(input, target, row_mask=row_mask, col_mask=col_mask)


class MultinomialNLLLoss(Loss):
  """Negative log-likelihood of a multinomial over the item axis."""

  def __init__(self, reduction='elementwise_mean'):
    self.reduction = reduction

  def elementwise(self, input, target, row_mask=None, col_mask=None):
    return multinomial_nll_loss(input, target, row_mask=row_mask,
                                col_mask=col_mask)
