"""Worker process for the two-process `jax.distributed` CPU test
(tests/test_multihost.py). Each process owns ONE cpu device; the global
mesh is (data=2, model=1), so every train batch is split across the two
processes via `host_slice` + `make_array_from_process_local_data`
(parallel/mesh.py) and gradients psum over DCN-equivalent channels.

Usage: python tests/_multihost_worker.py <port> <process_id>
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])

    from reviews4rec_tpu.parallel.distributed import initialize, is_primary

    multi = initialize(f"localhost:{port}", 2, pid)
    assert multi, "expected a multi-process runtime"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 2, jax.devices()
    assert is_primary() == (pid == 0)

    from reviews4rec_tpu.api import run
    from reviews4rec_tpu.config import HyperParams
    from reviews4rec_tpu.data.synthetic import make_synthetic

    # identical corpus on both processes (deterministic seed); hp matches
    # the conftest fixtures so the parent can compare to a single-process
    # in-process run
    ds = make_synthetic(num_users=40, num_items=30, vocab=120, seed=0)
    hp = ds.apply_to(HyperParams(
        model_type="MF_dot", epochs=2, batch_size=32, latent_size=8,
        input_length=64, mesh_shape=(2, 1), save_model=False))
    metrics, ucm, icm = run(hp, ds)

    print("METRICS " + json.dumps(
        {"pid": pid, "MSE": metrics["MSE"], "HR@1": metrics["HR@1"],
         "HR@10": metrics["HR@10"], "n_ucm": len(ucm)}), flush=True)

    # the flagship perf path ACROSS HOSTS (VERDICT r4 #3): entity doc
    # cache — every process device_puts its example-row shard over the
    # data axis and replicates the (entity-scaled) doc tables
    hp2 = ds.apply_to(HyperParams(
        model_type="deepconn++", epochs=1, batch_size=32, latent_size=8,
        input_length=64, mesh_shape=(2, 1), save_model=False,
        cache_doc_embeds=True, cache_entity=True))
    metrics2, _, _ = run(hp2, ds)
    print("METRICS2 " + json.dumps(
        {"pid": pid, "MSE": metrics2["MSE"], "HR@1": metrics2["HR@1"],
         "HR@10": metrics2["HR@10"]}), flush=True)


if __name__ == "__main__":
    main()
