"""Static-shape bucket ladders for padding dynamic dimensions.

XLA compiles one program per distinct shape. The mini-batch item-union
size (reference data.py:220) and the batch nnz vary per mega-batch, so
we round them up to a geometric ladder of bucket sizes: few enough
buckets that the jit cache stays small, tight enough that padding waste
stays bounded (<= ``growth - 1`` relative overhead, default 25%).

All bucket sizes are multiples of ``align`` (default 256 lanes) so the
padded axes tile cleanly onto the MXU/VPU (128-lane registers).
"""

import bisect


class BucketLadder:
  """A geometric ladder of aligned sizes.

  Args:
    min_size (int): smallest bucket.
    max_size (int): ceiling; sizes are capped here.
    growth (float): geometric growth factor between buckets.
    align (int): every bucket is a multiple of this.
  """

  def __init__(self, min_size=256, max_size=1 << 22, growth=1.25, align=256):
    assert growth > 1.0
    sizes = []
    s = max(min_size, align)
    s = ((s + align - 1) // align) * align
    while s < max_size:
      sizes.append(s)
      nxt = int(s * growth)
      nxt = ((nxt + align - 1) // align) * align
      if nxt <= s:
        nxt = s + align
      s = nxt
    sizes.append(((max_size + align - 1) // align) * align)
    self.sizes = sizes
    self.align = align

  def fit(self, n):
    """Smallest bucket >= n (n may exceed the ladder: returns aligned n)."""
    i = bisect.bisect_left(self.sizes, n)
    if i < len(self.sizes):
      return self.sizes[i]
    return ((n + self.align - 1) // self.align) * self.align

  def __repr__(self):
    return f'BucketLadder({self.sizes[0]}..{self.sizes[-1]}, n={len(self.sizes)})'
