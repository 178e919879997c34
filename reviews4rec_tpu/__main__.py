"""Training CLI: `python -m reviews4rec_tpu --model_type deepconn
--dataset <name> ...`.

The reference is driven by editing `hyper_params.py` and running
`python main.py` (`/root/reference/README.md:47-65`); here every
HyperParams field is a flag (auto-generated from the dataclass, so new
config fields appear in the CLI without extra wiring). The run prints
the final metric row and the log path — the same research outputs the
reference dispatcher returns (`main.py:417-429`).

Preprocessing has its own CLI: `python -m reviews4rec_tpu.data.preprocess`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import typing

from .config import ALL_MODELS, HyperParams


def _tuple_parser(elem_type):
    def parse(s: str):
        s = s.strip()
        if not s:
            return ()
        return tuple(elem_type(x) for x in s.split(","))
    return parse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m reviews4rec_tpu",
        description="Train + evaluate one model on a preprocessed dataset "
                    "(test MSE, HR@k/NDCG@k, count-vs-MSE maps).",
        epilog="Preprocess raw Amazon/RateBeer data first with "
               "`python -m reviews4rec_tpu.data.preprocess`.")
    hints = typing.get_type_hints(HyperParams)
    for f in dataclasses.fields(HyperParams):
        t = hints[f.name]
        kw = {"default": None, "help": f"default: {f.default!r}"}
        if t is bool:
            kw["type"] = lambda s: s.lower() in ("1", "true", "yes", "on")
            kw["metavar"] = "BOOL"
        elif typing.get_origin(t) is tuple:
            elem = typing.get_args(t)[0]
            kw["type"] = _tuple_parser(elem)
            kw["metavar"] = "X,Y,..."
        else:
            kw["type"] = t
        if f.name == "model_type":
            kw["choices"] = ALL_MODELS
        p.add_argument(f"--{f.name}", **kw)
    p.add_argument("--json", action="store_true",
                   help="print the final metrics as one JSON line")
    p.add_argument("--save_predictions", action="store_true",
                   help="after training, write <tag>_{split}_results "
                        "prediction artifacts for train/test/val "
                        "(reference HFT/MPCN prediction-file format) "
                        "to --log_dir")
    # multi-host runtime (parallel/distributed.py): every host runs the
    # same command with its own --process_id; jax.devices() becomes the
    # global device set and hp.mesh_shape spans hosts
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="jax.distributed coordinator address (process 0); "
                        "defaults to $JAX_COORDINATOR_ADDRESS")
    p.add_argument("--num_processes", type=int, default=None,
                   help="total number of processes in the multi-host run")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's index in [0, num_processes)")
    return p


def hp_from_args(args: argparse.Namespace) -> HyperParams:
    overrides = {f.name: getattr(args, f.name)
                 for f in dataclasses.fields(HyperParams)
                 if getattr(args, f.name) is not None}
    return HyperParams(**overrides)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    hp = hp_from_args(args)

    # Honor JAX_PLATFORMS even where a sitecustomize force-registers a
    # platform after env parsing (this image's axon TPU shim does):
    # re-assert the choice through the config before backend init, so
    # `JAX_PLATFORMS=cpu python -m reviews4rec_tpu ...` really runs on
    # CPU.
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        try:
            jax.config.update("jax_platforms",
                              os.environ["JAX_PLATFORMS"])
        except Exception:
            pass  # backend already initialized; keep its choice

    # Bring up the cross-host runtime BEFORE any JAX call (the .api
    # import initializes the backend). No-op without --coordinator /
    # env vars (parallel/distributed.py).
    from .parallel.distributed import initialize, is_primary
    initialize(args.coordinator, args.num_processes, args.process_id)

    data_dir = hp.data_dir()
    if not os.path.exists(os.path.join(data_dir, "corpus.npz")):
        print(f"error: no preprocessed corpus at {data_dir}/corpus.npz — "
              f"run `python -m reviews4rec_tpu.data.preprocess` first",
              file=sys.stderr)
        return 2

    from .api import run
    metrics, user_map, item_map = run(hp, quiet=not is_primary())

    if not is_primary():
        return 0
    if args.save_predictions:
        if hp.family in ("id", "review"):
            from .data.corpus import ReviewDataset
            from .serve import save_predictions
            paths = save_predictions(hp, ReviewDataset.load(hp.data_dir()))
            for split, path in paths.items():
                print(f"predictions[{split}]: {path}", file=sys.stderr)
        elif hp.family == "topic":
            print("--save_predictions: HFT already writes its per-split "
                  "prediction artifacts during training (models/hft.py "
                  "run_hft) — see "
                  f"{hp.log_dir}/{hp.run_tag()}_HFT_*_results",
                  file=sys.stderr)
        else:
            print(f"--save_predictions is not supported for the "
                  f"{hp.family!r} family ({hp.model_type}): neighborhood "
                  f"models have no persisted checkpoint to score from — "
                  f"use reviews4rec_tpu.models.neighbors.run_neighbor "
                  f"in-process instead", file=sys.stderr)
    if args.json:
        print(json.dumps(metrics))
    else:
        body = " | ".join(f"{k} = {v}" for k, v in metrics.items())
        print(f"\nFINAL ({hp.model_type} on {hp.dataset}): {body}")
        print(f"log: {hp.log_file()}")
        if hp.save_model and hp.family in ("id", "review"):
            print(f"model: {hp.model_path()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
