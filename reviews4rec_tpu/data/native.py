"""ctypes bridge to the native (C++/OpenMP) record materializer.

Builds `native/materialize.cc` on first use (g++, no pybind11 — plain
`extern "C"` + ctypes) and exposes `materialize_records`. Returns None
from `materialize_records` when the toolchain is unavailable so the
caller can fall back to the numpy path. The native tier replaces the
host-side Python nested loops of the reference's loaders
(`data.py:146-336`, `make_quick_data.py`).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Dict, Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False

_I32 = ctypes.POINTER(ctypes.c_int32)
_I64 = ctypes.POINTER(ctypes.c_int64)


def _native_dir() -> Path:
    return Path(__file__).resolve().parents[2] / "native"


def _build(src: Path, out: Path) -> None:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-fopenmp", "-std=c++17",
           "-o", str(out), str(src)]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _FAILED:
            raise RuntimeError("native materializer build failed earlier")
        try:
            d = _native_dir()
            src = d / "materialize.cc"
            so = d / "libmaterialize.so"
            if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
                _build(src, so)
            lib = ctypes.CDLL(str(so))
            lib.materialize_num_threads.restype = ctypes.c_int
            lib.materialize_records.restype = ctypes.c_int
            lib.materialize_records.argtypes = [
                _I32, _I64,                      # tokens, rev_off
                _I32, _I64, _I32,                # u_revs, u_off, u_other
                _I32, _I64, _I32,                # i_revs, i_off, i_other
                ctypes.c_int64,                  # n_examples
                _I32, _I32, _I32, _I32, _I32,    # user item ui iu this_rev
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # layout
                ctypes.c_int32, ctypes.c_int32,  # pad ids
                _I32, _I32, _I32, _I32, _I32,    # outputs
            ]
            _LIB = lib
        except Exception:
            _FAILED = True
            raise
        return _LIB


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _p32(a: np.ndarray):
    return np.ascontiguousarray(a, np.int32).ctypes.data_as(_I32)


def _p64(a: np.ndarray):
    return np.ascontiguousarray(a, np.int64).ctypes.data_as(_I64)


def materialize_records(flat: Dict, user, item, ui_idx, iu_idx, this_rev,
                        rows: int, words: int, slots: int,
                        user_pad: int, item_pad: int
                        ) -> Optional[Dict[str, np.ndarray]]:
    try:
        lib = _load()
    except Exception:
        return None

    n = int(user.shape[0])
    user_doc = np.zeros((n, rows, words), np.int32)
    item_doc = np.zeros((n, rows, words), np.int32)
    this_doc = np.zeros((n, rows, words), np.int32)
    who_gave = np.zeros((n, slots), np.int32)
    reviewed = np.zeros((n, slots), np.int32)

    # keep contiguous copies alive for the duration of the call
    keep = [np.ascontiguousarray(flat[k], np.int32) for k in
            ("tokens", "u_revs", "u_other", "i_revs", "i_other")]
    keep64 = [np.ascontiguousarray(flat[k], np.int64) for k in
              ("rev_off", "u_off", "i_off")]
    ex = [np.ascontiguousarray(a, np.int32)
          for a in (user, item, ui_idx, iu_idx, this_rev)]

    rc = lib.materialize_records(
        keep[0].ctypes.data_as(_I32), keep64[0].ctypes.data_as(_I64),
        keep[1].ctypes.data_as(_I32), keep64[1].ctypes.data_as(_I64),
        keep[2].ctypes.data_as(_I32),
        keep[3].ctypes.data_as(_I32), keep64[2].ctypes.data_as(_I64),
        keep[4].ctypes.data_as(_I32),
        ctypes.c_int64(n),
        ex[0].ctypes.data_as(_I32), ex[1].ctypes.data_as(_I32),
        ex[2].ctypes.data_as(_I32), ex[3].ctypes.data_as(_I32),
        ex[4].ctypes.data_as(_I32),
        rows, words, slots, user_pad, item_pad,
        user_doc.ctypes.data_as(_I32), item_doc.ctypes.data_as(_I32),
        this_doc.ctypes.data_as(_I32), who_gave.ctypes.data_as(_I32),
        reviewed.ctypes.data_as(_I32))
    if rc != 0:
        return None
    return {"user_doc": user_doc, "item_doc": item_doc,
            "this_doc": this_doc, "users_who_gave": who_gave,
            "items_reviewed": reviewed}
