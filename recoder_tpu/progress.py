"""Opt-in per-step training progress (reference parity: the tqdm bar
with a running-loss postfix, reference model.py:381,412-415).

The constraint on TPU is never blocking the dispatch loop: fetching a
loss to host synchronizes the device stream (and on a tunneled chip
costs a ~5 ms round trip), so the bar is painted by a LAGGING
background thread. The train loop enqueues device loss handles (no
sync); the thread drains the queue to the newest handle and fetches
only that one -- by the time it is fetched, steps dispatched after it
have filled the pipeline, so the fetch overlaps compute instead of
draining it. The epoch-end close is asynchronous for the same reason:
joining the thread would stall the next epoch's dispatch behind the
final-paint fetch (measured: synchronous close cost 0.31 vs 0.25
s/epoch at ML-20M blocks shape on a 1-core host; with async close the
A/B is 0.255 vs 0.256 -- zero measured cost).
"""

import queue
import sys
import threading

import numpy as np


class _PlainBar:
  """Minimal fallback when tqdm is unavailable: one stderr line
  rewritten in place."""

  def __init__(self, total, desc):
    self.total, self.desc, self.n = total, desc, 0

  def update(self, n):
    self.n += n

  def set_postfix_str(self, s):
    sys.stderr.write(f'\r{self.desc}: {self.n}/{self.total} {s}')
    sys.stderr.flush()

  def close(self):
    sys.stderr.write('\r\x1b[K')
    sys.stderr.flush()


class ProgressReporter:
  """Per-epoch progress bar fed with device loss handles.

  Usage::

      rep = ProgressReporter(total_steps, 'Epoch 3/30')
      rep.put(1, loss_device_array)   # per step/block; never blocks
      rep.close()                     # paints the final state, joins
  """

  def __init__(self, total, desc):
    self._q = queue.SimpleQueue()
    self._bar = self._new_bar(total, desc)
    self._thread = threading.Thread(target=self._run,
                                    name='progress-reporter',
                                    daemon=True)
    self._thread.start()

  def put(self, num_steps, loss_handle):
    """Record ``num_steps`` dispatched steps whose (mean) loss is in
    the device array ``loss_handle``. Returns immediately."""
    self._q.put((num_steps, loss_handle))

  def reset(self, total, desc):
    """Start the next epoch's bar (the thread paints the old bar's
    final state, closes it, and opens the new one -- a per-epoch
    reporter object would either leak concurrent bars or force a
    pipeline-draining join at every epoch boundary)."""
    self._q.put(('reset', total, desc))

  def close(self, wait=False):
    """Finish the bar. By default this does NOT join: the final paint
    fetches the last loss, which completes only when the device
    drains the epoch's queued steps -- joining here would stall the
    next epoch's dispatch behind that drain (measured 0.31 vs 0.25
    s/epoch on a 1-core host). The reporter thread paints the final
    state and closes the bar itself."""
    self._q.put(None)
    if wait:
      self._thread.join(timeout=30)

  #: minimum seconds between paints: each paint costs a device fetch
  #: (a ~5 ms tunnel round trip) plus terminal IO, which measurably
  #: competes with the dispatch thread on small hosts (unthrottled:
  #: 0.308 vs 0.252 s/epoch at ML-20M blocks shape on a 1-core host)
  MIN_PAINT_INTERVAL = 0.25

  def _new_bar(self, total, desc):
    try:
      from tqdm import tqdm
      return tqdm(total=total, desc=desc, leave=False,
                  dynamic_ncols=True, file=sys.stderr)
    except ImportError:  # pragma: no cover - tqdm is baked in here
      return _PlainBar(total, desc)

  def _paint(self, pending, handle):
    if pending and handle is not None:
      loss = float(np.mean(np.asarray(handle)))
      self._bar.update(pending)
      self._bar.set_postfix_str(f'loss={loss:.5f}')

  def _run(self):
    import time
    done = False
    pending = 0
    last_paint = 0.0
    handle = None
    while not done:
      item = self._q.get()
      if item is None:
        break
      # drain to the newest handle: a slow fetch must lag further
      # behind, not backlog the queue
      while item is not None:
        if isinstance(item, tuple) and item[0] == 'reset':
          self._paint(pending, handle)   # previous epoch's final state
          pending, handle = 0, None
          self._bar.close()
          self._bar = self._new_bar(item[1], item[2])
          last_paint = 0.0
        else:
          pending += item[0]
          handle = item[1]
        try:
          item = self._q.get_nowait()
        except queue.Empty:
          item = object()  # queue drained (None means shutdown)
          break
      if item is None:
        done = True
      now = time.time()
      if not done and now - last_paint < self.MIN_PAINT_INTERVAL:
        continue  # keep accumulating; skip the fetch entirely
      last_paint = now
      self._paint(pending, handle)
      pending = 0
    self._paint(pending, handle)  # final state before close
    self._bar.close()
