from .evaluate import (eval_ranking, evaluate, make_apply_fn, make_eval_step,
                       make_rank_step)
from .loop import (TrainState, build_doc_cache, make_cached_train_step,
                   make_optimizer, make_scan_train_step, make_train_step,
                   train_complete, train_epoch, train_epoch_cached)

__all__ = [
    "eval_ranking", "evaluate", "make_apply_fn", "make_eval_step",
    "make_rank_step", "TrainState", "make_optimizer", "make_train_step",
    "make_scan_train_step", "make_cached_train_step", "build_doc_cache",
    "train_complete", "train_epoch", "train_epoch_cached",
]
