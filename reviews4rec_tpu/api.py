"""Top-level runner: one call trains any model and reports the full
metric set (test MSE, HR@k/NDCG@k, count-vs-MSE maps).

Equivalent of the reference dispatcher `main(hyper_params)`
(`main.py:401-431`), but every family runs inside one process on one
runtime — no shelling out to C++ binaries or python2 conda envs
(`main.py:150-169, 224-265`).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

from .config import HyperParams
from .data.corpus import ReviewDataset
from .models import build_model, neumf_warm_start
from .train.evaluate import (eval_ranking, evaluate, make_apply_fn,
                             make_eval_step, make_rank_step)
from .train.loop import train_complete
from .utils.logging import Timer, file_write, log_end_epoch


def _finalize(hp, model, params, dataset, quiet: bool, mesh=None):
    """Test MSE + count maps + ranking for a trained gradient model.

    With the ENTITY cache on (hp.cache_doc_embeds + hp.cache_entity,
    supported towers), the whole finalize pass runs DEVICE-RESIDENT:
    test-split MSE through the entity example cache and ranking over
    ID-ONLY candidate grids whose doc tensors are gathered in-jit from
    the canonical entity tables (train/evaluate.py::
    make_entity_rank_step) — no multi-GB host doc grids, no wire
    transfer of document text. Metrics are identical to the
    host-materialized path (eval removes nothing, so canonical docs
    ARE the eval docs — tested)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .data.batcher import Batcher
    from .train.loop import (EntityCache, build_entity_tables,
                             entity_supported)

    apply_fn = make_apply_fn(model)
    use_ent = (hp.cache_doc_embeds and hp.cache_entity
               and hp.family == "review" and entity_supported(hp)
               and jax.process_count() == 1)
    tables = None
    if use_ent:
        from .train.evaluate import (evaluate_cached,
                                     make_cached_eval_step,
                                     make_entity_rank_step)
        tables = build_entity_tables(hp, dataset)
        if mesh is not None:
            from .parallel.mesh import replicate
            tables = replicate(tables, mesh)
        test_recs = dataset.materialize_entity(hp, "test")
        test_cache = EntityCache(
            example={k: jnp.asarray(np.asarray(v))
                     for k, v in test_recs.items()},
            tables=tables)
        cached_eval = make_cached_eval_step(apply_fn, hp.model_type,
                                            mesh=mesh)
        metrics, ucm, icm = evaluate_cached(
            cached_eval, params, test_cache, test_recs, hp,
            dataset.user_count, dataset.item_count, mesh=mesh)
        tdw = (hp.input_length
               if hp.model_type in ("transnet", "transnet++") else 0)
        rank_step = make_entity_rank_step(apply_fn, hp.model_type,
                                          this_doc_words=tdw, mesh=mesh)
    else:
        eval_step = make_eval_step(apply_fn, hp.model_type, mesh=mesh)
        test_b = Batcher(dataset.materialize(hp, "test"), hp.batch_size)
        metrics, ucm, icm = evaluate(eval_step, params, test_b, hp,
                                     dataset.user_count,
                                     dataset.item_count, mesh=mesh)
        rank_step = make_rank_step(apply_fn, hp.model_type, mesh=mesh)

    neg_recs = dataset.materialize_negs(
        hp, include_text=False if use_ent else None)
    # Review-model candidate tensors are large; use a smaller outer batch
    # (kept divisible over the mesh data axis). The entity path carries
    # only ids per grid row, so it keeps the full batch.
    heavy = hp.uses_reviews and not use_ent
    rank_bs = max(1, hp.batch_size // (4 if heavy else 1))
    if mesh is not None:
        n_data = mesh.shape[hp.mesh_axes[0]]
        rank_bs = -(-rank_bs // n_data) * n_data
    if hp.eval_num_negs > 0:
        # split the protocol: HR@1 on the reference 1+5 sets, the k>1
        # cutoffs on wide 1+eval_num_negs sets (on the 6-candidate
        # layout HR@10 saturates at 100 by construction)
        from .train.evaluate import split_eval_ks
        narrow_ks, wide_ks = split_eval_ks(hp)
        metrics.update(eval_ranking(
            rank_step, params, neg_recs, hp.replace(eval_ks=narrow_ks),
            batch_size=rank_bs, mesh=mesh, entity_tables=tables))
        if wide_ks:  # don't build multi-GB doc grids for zero metrics
            wide_recs = dataset.materialize_wide_negs(
                hp, hp.eval_num_negs, seed=hp.seed,
                include_text=False if use_ent else None)
            # entity path: the in-jit doc gather materializes
            # [B, C, ...] float docs transiently — cap the outer batch
            # so a 1+99 grid stays under ~1 GB of transient HBM
            wide_bs = max(1, rank_bs // (8 if use_ent else
                                         4 if hp.uses_reviews else 1))
            if mesh is not None:
                wide_bs = -(-wide_bs // n_data) * n_data
            metrics.update(eval_ranking(
                rank_step, params, wide_recs, hp.replace(eval_ks=wide_ks),
                batch_size=wide_bs, mesh=mesh, entity_tables=tables))
    else:
        metrics.update(eval_ranking(rank_step, params, neg_recs, hp,
                                    batch_size=rank_bs, mesh=mesh,
                                    entity_tables=tables))
    return metrics, ucm, icm


def run(hp: HyperParams, dataset: Optional[ReviewDataset] = None,
        quiet: bool = True) -> Tuple[Dict, Dict, Dict]:
    """Train + evaluate `hp.model_type`. Returns (metrics,
    user_count_mse_map, item_count_mse_map), the reference's research
    outputs (`main.py:417-429`)."""
    if dataset is None:
        dataset = ReviewDataset.load(hp.data_dir())
    hp = dataset.apply_to(hp)
    if hp.dataset == "ratebeer" and hp.rating_max == 5.0:
        # RateBeer overall ratings are N/20 (reference data.py:101-102).
        hp = hp.replace(rating_max=20.0)
    start = time.time()

    if hp.family == "neighbor":
        from .models.neighbors import run_neighbor
        out = run_neighbor(hp, dataset)
    elif hp.family == "topic":
        from .models.hft import run_hft
        out = run_hft(hp, dataset, quiet=quiet)
    elif hp.model_type == "NeuMF":
        out = _run_neumf(hp, dataset, quiet=quiet)
    else:
        from .parallel.mesh import mesh_from_hp
        mesh = mesh_from_hp(hp)
        model = build_model(hp, dataset.word_vectors, mesh=mesh)
        # best-val checkpoint persisted in the normal flow (reference
        # main.py:123-126 always saves model_path)
        ckpt = hp.model_path() if hp.save_model else None
        stats: Dict = {}
        params, _ = train_complete(hp, model, dataset, quiet=quiet,
                                   mesh=mesh, checkpoint_path=ckpt,
                                   stats=stats)
        out = _finalize(hp, model, params, dataset, quiet, mesh=mesh)
        if "train_examples_per_s" in stats:
            out[0]["train_examples_per_s"] = stats["train_examples_per_s"]

    metrics, ucm, icm = out
    metrics["dataset"] = hp.dataset
    log_end_epoch(hp.log_file(), metrics, "final", time.time() - start,
                  metrics_on="(TEST)", quiet=quiet)
    return metrics, ucm, icm


def _run_neumf(hp: HyperParams, dataset: ReviewDataset, quiet: bool):
    """NeuMF 3-phase pretrain: GMF, then MLP, then weight-surgery warm
    start of the fused model (reference `main_NeuMF`, main.py:289-338).
    One mesh is shared across all three phases."""
    from .parallel.mesh import mesh_from_hp
    mesh = mesh_from_hp(hp)

    # phase checkpoints: run_tag embeds model_type, so the GMF/MLP
    # phases land in distinct files (reference appends "_gmf"/"_mlp" to
    # one path, main.py:305,314)
    gmf_hp = hp.replace(model_type="GMF")
    gmf_model = build_model(gmf_hp, mesh=mesh)
    gmf_params, _ = train_complete(
        gmf_hp, gmf_model, dataset, quiet=quiet, mesh=mesh,
        checkpoint_path=gmf_hp.model_path() if hp.save_model else None)

    mlp_hp = hp.replace(model_type="MLP")
    mlp_model = build_model(mlp_hp, mesh=mesh)
    mlp_params, _ = train_complete(
        mlp_hp, mlp_model, dataset, quiet=quiet, mesh=mesh,
        checkpoint_path=mlp_hp.model_path() if hp.save_model else None)

    model = build_model(hp, mesh=mesh)
    import jax
    from .data.batcher import Batcher
    sample = next(iter(Batcher(dataset.materialize(hp, "train"),
                               hp.batch_size)))
    rng = jax.random.PRNGKey(hp.seed)
    params = model.init({"params": rng, "dropout": rng}, sample,
                        train=False)["params"]
    params = neumf_warm_start(params, gmf_params, mlp_params)
    params, _ = train_complete(
        hp, model, dataset, params=params, quiet=quiet, mesh=mesh,
        checkpoint_path=hp.model_path() if hp.save_model else None)
    return _finalize(hp, model, params, dataset, quiet, mesh=mesh)
