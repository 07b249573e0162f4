"""Pallas TPU kernel: fused decode-score + masked loss.

The training hot path computes ``scores = h @ rows.T + bias_rows`` over
the batch item-union and immediately reduces them through an
elementwise loss (reference nn.py:269-280 feeding losses.py:44-69).
Composed as separate XLA ops, the [batch, union] score matrix (and its
cotangent) round-trips HBM several times per step. This kernel fuses
the decode matmul, the bias add, the masked elementwise loss, and the
reduction into one pass over union tiles -- the score matrix never
exists in HBM. The custom VJP recomputes each score tile on the fly
(flash-attention-style rematerialization) and emits dh / drows /
dbias_rows directly.

Supported losses: 'mse' (confidence-weighted, reference losses.py:16)
and 'logistic' (BCE-with-logits, reference model.py:90-91).
'logloss' (multinomial NLL) needs a whole-row softmax normalizer and
stays on the XLA path.

All blocks are tile-aligned (union width is padded to multiples of 256
by the data pipeline), so the kernel lowers cleanly on Mosaic.

Status: EXPERIMENTAL / UNWIRED. Correctness-verified against the XLA
composition (tests/test_pallas_loss.py), but measured slower than
XLA's own fusion on v5e at every swept shape (round 2 sweep,
value_and_grad wall-clock per step):

  B=512  d=200  W=16640 f32 : XLA 2.07 ms  Pallas 4.93 ms (2.4x)
  B=512  d=200  W=16640 bf16: XLA 2.11 ms  Pallas 5.12 ms (2.4x)
  B=1024 d=512  W=8192  f32 : XLA 1.91 ms  Pallas 3.28 ms (1.7x)
  B=1024 d=512  W=8192  bf16: XLA 1.86 ms  Pallas 5.23 ms (2.8x)
  B=1024 d=1024 W=8192       : Mosaic compile failure

XLA's emitters handle these contractions better than Mosaic today, so
no library code path reaches this module; it is kept (with its test)
as a baseline to re-measure when the Mosaic toolchain changes.
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# union widths are padded to multiples of 256 by the data pipeline
TILE_U = 256


def _elementwise_loss(s, t, kind, confidence):
  s = s.astype(jnp.float32)
  t = t.astype(jnp.float32)
  if kind == 'mse':
    w = 1.0 + confidence * (t > 0).astype(jnp.float32)
    return w * jnp.square(s - t)
  if kind == 'logistic':
    return (jnp.maximum(s, 0.0) - s * t
            + jnp.log1p(jnp.exp(-jnp.abs(s))))
  raise ValueError(kind)


def _dloss_ds(s, t, kind, confidence):
  s = s.astype(jnp.float32)
  t = t.astype(jnp.float32)
  if kind == 'mse':
    w = 1.0 + confidence * (t > 0).astype(jnp.float32)
    return 2.0 * w * (s - t)
  if kind == 'logistic':
    return jax.nn.sigmoid(s) - t
  raise ValueError(kind)


def _scores(h_ref, rows_ref, brows_ref):
  s = jax.lax.dot_general(
      h_ref[:], rows_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  return s + brows_ref[0, :][None, :].astype(jnp.float32)


def _fwd_kernel(h_ref, rows_ref, brows_ref, t_ref, rowm_ref, colm_ref,
                out_ref, *, kind, confidence):
  t_idx = pl.program_id(0)
  s = _scores(h_ref, rows_ref, brows_ref)
  e = _elementwise_loss(s, t_ref[:], kind, confidence)
  e = e * rowm_ref[0, :][:, None] * colm_ref[0, :][None, :]
  partial = jnp.sum(e)

  @pl.when(t_idx == 0)
  def _():
    out_ref[0, 0] = partial

  @pl.when(t_idx != 0)
  def _():
    out_ref[0, 0] = out_ref[0, 0] + partial


def _bwd_kernel(g_ref, h_ref, rows_ref, brows_ref, t_ref, rowm_ref,
                colm_ref, dh_ref, drows_ref, dbrows_ref, *, kind,
                confidence):
  t_idx = pl.program_id(0)
  s = _scores(h_ref, rows_ref, brows_ref)
  ds = _dloss_ds(s, t_ref[:], kind, confidence)
  ds = ds * (g_ref[0, 0] * rowm_ref[0, :][:, None] * colm_ref[0, :][None, :])

  # dh accumulates over union tiles; drows/dbias are per tile
  dh_partial = jnp.dot(ds, rows_ref[:].astype(jnp.float32),
                       preferred_element_type=jnp.float32)

  @pl.when(t_idx == 0)
  def _():
    dh_ref[:] = dh_partial

  @pl.when(t_idx != 0)
  def _():
    dh_ref[:] = dh_ref[:] + dh_partial

  drows_ref[:] = jax.lax.dot_general(
      ds, h_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  dbrows_ref[:] = jnp.sum(ds, axis=0, keepdims=True)


def _specs(B, d, interpret):
  # vectors travel as (1, N) to match XLA's 2-D tiled layouts
  kw = {} if interpret else {'memory_space': pltpu.VMEM}
  return [
      pl.BlockSpec((B, d), lambda t: (0, 0), **kw),          # h
      pl.BlockSpec((TILE_U, d), lambda t: (t, 0), **kw),     # rows
      pl.BlockSpec((1, TILE_U), lambda t: (0, t), **kw),     # bias rows
      pl.BlockSpec((B, TILE_U), lambda t: (0, t), **kw),     # target
      pl.BlockSpec((1, B), lambda t: (0, 0), **kw),          # row mask
      pl.BlockSpec((1, TILE_U), lambda t: (0, t), **kw),     # col mask
  ], kw


@functools.partial(jax.jit,
                   static_argnames=('kind', 'confidence', 'interpret'))
def _fwd_call(h, rows, brows, target, row_mask, col_mask, kind,
              confidence, interpret=False):
  B, d = h.shape
  U = rows.shape[0]
  in_specs, kw = _specs(B, d, interpret)
  smem_kw = {} if interpret else {'memory_space': pltpu.SMEM}
  return pl.pallas_call(
      functools.partial(_fwd_kernel, kind=kind, confidence=confidence),
      grid=(U // TILE_U,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((1, 1), lambda t: (0, 0), **smem_kw),
      out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
      interpret=interpret,
  )(h, rows, brows.reshape(1, U), target, row_mask.reshape(1, B),
    col_mask.reshape(1, U))[0, 0]


@functools.partial(jax.jit,
                   static_argnames=('kind', 'confidence', 'interpret'))
def _bwd_call(g, h, rows, brows, target, row_mask, col_mask, kind,
              confidence, interpret=False):
  B, d = h.shape
  U = rows.shape[0]
  in_specs, kw = _specs(B, d, interpret)
  smem_kw = {} if interpret else {'memory_space': pltpu.SMEM}
  in_specs = [pl.BlockSpec((1, 1), lambda t: (0, 0), **smem_kw)] + in_specs
  dh, drows, dbrows = pl.pallas_call(
      functools.partial(_bwd_kernel, kind=kind, confidence=confidence),
      grid=(U // TILE_U,),
      in_specs=in_specs,
      out_specs=[
          pl.BlockSpec((B, d), lambda t: (0, 0), **kw),
          pl.BlockSpec((TILE_U, d), lambda t: (t, 0), **kw),
          pl.BlockSpec((1, TILE_U), lambda t: (0, t), **kw),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((B, d), jnp.float32),
          jax.ShapeDtypeStruct((U, d), jnp.float32),
          jax.ShapeDtypeStruct((1, U), jnp.float32),
      ],
      interpret=interpret,
  )(g.reshape(1, 1), h, rows, brows.reshape(1, U), target,
    row_mask.reshape(1, B), col_mask.reshape(1, U))
  return dh, drows, dbrows.reshape(U)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_decode_loss(h, rows, bias_rows, target, row_mask, col_mask,
                      kind='mse', confidence=0.0, interpret=False):
  """Masked sum-loss of ``h @ rows.T + bias_rows`` against ``target``.

  Args:
    h: [B, d] bottleneck activations.
    rows: [U, d] decoder embedding rows (already gathered).
    bias_rows: [U] decoder bias rows.
    target: [B, U] dense targets.
    row_mask: [B] 1.0 for valid users.
    col_mask: [U] 1.0 for valid union columns.
    kind: 'mse' | 'logistic' (static).
    confidence: positive-observation weighting for 'mse' (static).
    interpret: run in interpreter mode (CPU tests) (static).

  Returns the scalar sum loss; differentiable w.r.t. h/rows/bias_rows.
  """
  return _fwd_call(h, rows, bias_rows, target, row_mask, col_mask,
                   kind, confidence, interpret)


def _fdl_fwd(h, rows, bias_rows, target, row_mask, col_mask, kind,
             confidence, interpret):
  out = fused_decode_loss(h, rows, bias_rows, target, row_mask, col_mask,
                          kind, confidence, interpret)
  return out, (h, rows, bias_rows, target, row_mask, col_mask)


def _fdl_bwd(kind, confidence, interpret, res, g):
  h, rows, bias_rows, target, row_mask, col_mask = res
  dh, drows, dbrows = _bwd_call(g, h, rows, bias_rows, target, row_mask,
                                col_mask, kind, confidence, interpret)
  zt = jnp.zeros_like(target)
  zr = jnp.zeros_like(row_mask)
  zc = jnp.zeros_like(col_mask)
  return dh, drows, dbrows, zt, zr, zc


fused_decode_loss.defvjp(_fdl_fwd, _fdl_bwd)


def supported(kind, union_width):
  """Whether the fused kernel covers this loss/shape."""
  return kind in ('mse', 'logistic') and union_width % TILE_U == 0
