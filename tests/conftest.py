"""Test harness: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, before jax initializes."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
