"""Host-side sparse data pipeline (TPU-feeding, static-shape slabs).

Reference parity: recoder/data.py. The reference collator emits
variable-width sparse COO batches (data.py:190-251); XLA wants static
shapes, so this pipeline instead emits :class:`Batch` slabs whose
item-union width and nnz are padded up to a small ladder of bucket
sizes (see :mod:`recoder_tpu.data.buckets`) with explicit valid-counts,
and densification happens on-device inside the jitted step.
"""

from recoder_tpu.data.buckets import BucketLadder
from recoder_tpu.data.dataset import UsersInteractions, RecommendationDataset
from recoder_tpu.data.loader import (Batch, BatchCollator,
                                     RecommendationDataLoader)

__all__ = [
    'BucketLadder', 'UsersInteractions', 'RecommendationDataset',
    'Batch', 'BatchCollator', 'RecommendationDataLoader',
]
