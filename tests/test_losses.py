"""Loss parity tests against torch's reference implementations
(the reference uses torch F.mse_loss / BCEWithLogitsLoss /
log_softmax; losses.py:44-47,69 and model.py:90-91), plus padding-mask
invariance: a padded computation must equal the unpadded one."""

import numpy as np
import pytest
import torch

from recoder_tpu.ops.losses import (LogisticLoss, MSELoss,
                                    MultinomialNLLLoss)


@pytest.fixture
def data():
  rng = np.random.default_rng(3)
  B, W = 8, 37
  x = rng.normal(size=(B, W)).astype(np.float32)
  t = (rng.random((B, W)) < 0.2).astype(np.float32) * \
      rng.random((B, W)).astype(np.float32)
  return x, t


def torch_mse(x, t, confidence, reduction):
  xt, tt = torch.tensor(x), torch.tensor(t)
  w = 1 + confidence * (tt > 0).float()
  loss = w * torch.nn.functional.mse_loss(xt, tt, reduction='none')
  return {'sum': loss.sum(), 'elementwise_mean': loss.mean(),
          'none': loss}[reduction].numpy()


@pytest.mark.parametrize('confidence', [0.0, 2.5])
@pytest.mark.parametrize('reduction', ['sum', 'elementwise_mean'])
def test_mse_matches_torch(data, confidence, reduction):
  x, t = data
  ours = MSELoss(confidence=confidence, reduction=reduction)(x, t)
  np.testing.assert_allclose(np.asarray(ours),
                             torch_mse(x, t, confidence, reduction),
                             rtol=1e-5)


def test_logistic_matches_torch(data):
  x, t = data
  t_bin = (t > 0).astype(np.float32)
  ours = LogisticLoss(reduction='sum')(x, t_bin)
  ref = torch.nn.BCEWithLogitsLoss(reduction='sum')(
      torch.tensor(x), torch.tensor(t_bin)).numpy()
  np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5)


def test_multinomial_nll_matches_torch(data):
  x, t = data
  ours = MultinomialNLLLoss(reduction='sum')(x, t)
  ref = (-torch.tensor(t)
         * torch.nn.functional.log_softmax(torch.tensor(x), dim=1))
  np.testing.assert_allclose(np.asarray(ours), ref.sum().numpy(), rtol=1e-5)


@pytest.mark.parametrize('loss_cls,kw', [
    (MSELoss, {'confidence': 1.5}), (LogisticLoss, {}),
    (MultinomialNLLLoss, {})])
def test_padding_invariance(data, loss_cls, kw):
  """sum-loss over a padded [B_pad, W_pad] slab with masks must equal
  the unpadded loss (padding contributes exactly zero)."""
  x, t = data
  B, W = x.shape
  B_pad, W_pad = B + 3, W + 11
  x_pad = np.zeros((B_pad, W_pad), np.float32)
  t_pad = np.zeros((B_pad, W_pad), np.float32)
  rng = np.random.default_rng(0)
  # garbage in the padding region must not leak into the loss
  x_pad[:] = rng.normal(size=(B_pad, W_pad))
  x_pad[:B, :W] = x
  t_pad[:B, :W] = t
  row_mask = (np.arange(B_pad) < B).astype(np.float32)
  col_mask = (np.arange(W_pad) < W).astype(np.float32)

  loss = loss_cls(reduction='sum', **kw)
  unpadded = np.asarray(loss(x, t))
  padded = np.asarray(loss(x_pad, t_pad, row_mask=row_mask,
                           col_mask=col_mask))
  np.testing.assert_allclose(padded, unpadded, rtol=1e-5)
