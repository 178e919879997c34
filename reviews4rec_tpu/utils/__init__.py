from .io import load_json, load_npz, save_json, save_npz
from .logging import Timer, file_write, log_end_epoch

__all__ = [
    "load_json", "load_npz", "save_json", "save_npz",
    "Timer", "file_write", "log_end_epoch",
]
