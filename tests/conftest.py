"""Test harness: force CPU with 8 virtual devices so sharding tests run
without TPU hardware.

Note: this environment's axon harness force-registers the TPU platform
from sitecustomize *after* env parsing, so `JAX_PLATFORMS=cpu` in the
environment is not enough — the config must be updated before backend
initialization."""

import os

import jax

if os.environ.get("R4R_TEST_TPU") == "1":
    # Hardware mode: run the TPU-gated subset on the real chip —
    #   R4R_TEST_TPU=1 pytest tests/test_pallas.py -k tpu
    # Only the Pallas parity tests are meaningful here; the mesh tests
    # need the 8-virtual-device CPU default.
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

from reviews4rec_tpu.config import HyperParams
from reviews4rec_tpu.data.synthetic import make_synthetic


@pytest.fixture(scope="session")
def dataset():
    return make_synthetic(num_users=40, num_items=30, vocab=120, seed=0)


@pytest.fixture(scope="session")
def hp_base(dataset):
    hp = HyperParams(batch_size=32, epochs=2, input_length=64,
                     narre_num_reviews=4, narre_num_words=16,
                     mpcn_dmax=4, mpcn_smax=8, latent_size=8)
    return dataset.apply_to(hp)
