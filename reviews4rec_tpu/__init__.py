"""tpu-reviews4rec: a TPU-native review-aware recommendation framework.

Covers the full capability surface of the reviews4rec benchmark suite
(SIGIR'20) — see SURVEY.md for the structural analysis of the reference
and README.md for the design overview.
"""

from .config import HyperParams

__version__ = "0.1.0"
__all__ = ["HyperParams"]
