"""Native (C++/OpenMP) materializer: must produce byte-identical records
to the pure-Python path for every layout and split."""

import numpy as np
import pytest

from reviews4rec_tpu.data import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def _python_records(dataset, hp, split):
    """Force the Python fallback by monkeypatching availability."""
    import reviews4rec_tpu.data.corpus as corpus_mod
    ds = dataset
    ds._cache.clear()
    orig = corpus_mod.ReviewDataset._native_text
    corpus_mod.ReviewDataset._native_text = \
        lambda self, *a, **k: None
    try:
        rec = {k: v.copy() for k, v in ds.materialize(hp, split).items()}
    finally:
        corpus_mod.ReviewDataset._native_text = orig
        ds._cache.clear()
    return rec


@pytest.mark.parametrize("mt,split", [
    ("deepconn", "train"), ("deepconn", "test"), ("deepconn", "val"),
    ("NARRE", "train"), ("NARRE", "test"),
    ("MPCN", "train"),
])
def test_native_matches_python(dataset, hp_base, mt, split):
    hp = hp_base.replace(model_type=mt)
    py = _python_records(dataset, hp, split)
    nat = dataset.materialize(hp, split)
    assert set(py) == set(nat)
    for k in py:
        assert np.array_equal(py[k], nat[k]), \
            f"{k}: first diff at {np.argwhere(py[k] != nat[k])[:3]}"


def test_native_negs_match(dataset, hp_base):
    import reviews4rec_tpu.data.corpus as corpus_mod
    hp = hp_base.replace(model_type="deepconn")
    dataset._cache.clear()
    orig = corpus_mod.ReviewDataset._native_text
    corpus_mod.ReviewDataset._native_text = lambda self, *a, **k: None
    try:
        py = {k: v.copy()
              for k, v in dataset.materialize_negs(hp).items()}
    finally:
        corpus_mod.ReviewDataset._native_text = orig
        dataset._cache.clear()
    nat = dataset.materialize_negs(hp)
    for k in py:
        assert np.array_equal(py[k], nat[k]), k


def test_native_threads():
    from reviews4rec_tpu.data.native import _load
    lib = _load()
    assert lib.materialize_num_threads() >= 1
