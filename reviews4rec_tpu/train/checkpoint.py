"""Parameter checkpointing.

The reference saves a best-validation `state_dict` per run and reloads
it for test eval (`main.py:123-134`); it cannot resume mid-training.
Here checkpoints carry params + optimizer state + step + epoch so
training is resumable, serialized with flax's msgpack codec (works for
arbitrarily nested pytrees, including sharded arrays which are gathered
on save)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, params: Any, *, opt_state: Any = None,
                    step: int = 0, epoch: int = 0,
                    extra: Optional[Dict] = None,
                    best_params: Any = None) -> None:
    if jax.process_count() > 1 and jax.process_index() != 0:
        # primary-only writes under jax.distributed: every process holds
        # identical (replicated or restorable) state; N writers to one
        # path would race. device_get below requires the fetched arrays
        # to be process-addressable — replicate tables across hosts
        # (model axis within one host) when checkpointing multi-host.
        return
    payload = {
        # to_state_dict flattens NamedTuple optimizer states into plain
        # dicts that the msgpack codec accepts
        "params": serialization.to_state_dict(jax.device_get(params)),
        "opt_state": (serialization.to_state_dict(
            jax.device_get(opt_state)) if opt_state is not None else {}),
        "step": step,
        "epoch": epoch,
        "extra": extra or {},
        # latest + best-validation params travel together so one file
        # supports both resume-mid-training and test-at-best-dev reload
        "best_params": (serialization.to_state_dict(
            jax.device_get(best_params)) if best_params is not None
            else {}),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)  # atomic: no torn checkpoints on interruption


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_params(path: str, template: Any) -> Any:
    """Restore params with the template's pytree structure (and dtypes)."""
    payload = load_checkpoint(path)
    return serialization.from_state_dict(template, payload["params"])


def restore_like(template: Any, state_dict: Any) -> Any:
    """Restore a state dict into the template's pytree, re-placing every
    leaf on the template leaf's sharding (msgpack round-trips lose device
    placement; under a mesh the restored tree must keep its row-sharded
    tables sharded)."""
    import jax.numpy as jnp

    restored = serialization.from_state_dict(template, state_dict)

    def place(t, v):
        if hasattr(t, "sharding"):
            return jax.device_put(jnp.asarray(v, t.dtype), t.sharding)
        return v

    return jax.tree_util.tree_map(place, template, restored)
