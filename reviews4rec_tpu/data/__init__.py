"""Data subsystem: corpus store, preprocessing, batching, native
materializer.

Replaces the reference's L0/L1 layers (`data_scripts/`, `data.py`,
`data_fast.py`) with one pipeline that emits fixed-shape, leakage-removed
array records — the TPU-ready equivalent of the reference's HDF5
"quick data" (`data_scripts/make_quick_data.py:21-44`).
"""

from .batcher import Batcher
from .corpus import ReviewDataset, Split
from .synthetic import make_synthetic

__all__ = ["Batcher", "ReviewDataset", "Split", "make_synthetic"]
