"""Two-process `jax.distributed` CPU integration test (BASELINE.md's
multi-host scaling target; the single-process assumption being replaced
is reference main.py:407).

Launches two subprocesses that initialize a real jax.distributed
runtime over localhost, train MF_dot through `api.run` on a (2, 1)
mesh — each process feeding only its host slice of every batch — and
asserts both report metrics equal to a single-process run."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_metrics():
    port = _free_port()
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(pid)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    metrics = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("METRICS "):
                m = json.loads(line[len("METRICS "):])
                metrics[m.pop("pid")] = m
            elif line.startswith("METRICS2 "):
                m = json.loads(line[len("METRICS2 "):])
                metrics[("cached", m.pop("pid"))] = m
    assert {0, 1} <= set(metrics), f"missing worker output: {outs}"
    return metrics


def test_both_processes_report_identical_metrics(multihost_metrics):
    assert multihost_metrics[0] == multihost_metrics[1]


def test_cached_flagship_spans_hosts(multihost_metrics, dataset):
    """The entity doc cache works ACROSS processes (VERDICT r4 #3):
    both workers agree, and the 2-process cached run reproduces the
    single-process cached metrics."""
    from reviews4rec_tpu.api import run
    from reviews4rec_tpu.config import HyperParams

    got = multihost_metrics[("cached", 0)]
    assert got == multihost_metrics[("cached", 1)]
    hp = dataset.apply_to(HyperParams(
        model_type="deepconn++", epochs=1, batch_size=32, latent_size=8,
        input_length=64, save_model=False, cache_doc_embeds=True,
        cache_entity=True))
    ref, _, _ = run(hp, dataset)
    assert np.isclose(got["MSE"], ref["MSE"], atol=3e-4)
    assert got["HR@1"] == ref["HR@1"]
    assert got["HR@10"] == ref["HR@10"]


def test_multihost_matches_single_process(multihost_metrics, dataset):
    """api.run metrics via host-sliced global batches on the 2-process
    mesh must equal the single-process run (same data, same seed)."""
    from reviews4rec_tpu.api import run
    from reviews4rec_tpu.config import HyperParams

    hp = dataset.apply_to(HyperParams(
        model_type="MF_dot", epochs=2, batch_size=32, latent_size=8,
        input_length=64, save_model=False))
    ref, ucm, _ = run(hp, dataset)
    got = multihost_metrics[0]
    assert np.isclose(got["MSE"], ref["MSE"], atol=3e-4)
    assert got["HR@1"] == ref["HR@1"]
    assert got["HR@10"] == ref["HR@10"]
    assert got["n_ucm"] == len(ucm)
