"""Loss library: the reference MPCN stack's loss variants
(`MPCN/tf_models/model.py:701-733`) as pure, mask-aware functions.

The reviews4rec runner fixes the rating-prediction objective to
'RAW_MSE' (`run_MPCN_in_p2.sh:3` via `train.py:180-182`), which is what
`loop._batch_loss` computes; the ranking losses below (softmax CE over
candidates, pointwise sigmoid CE, BPR, hinge) are the rest of the
reference's loss surface, usable with the 6-candidate negative layout
from `data/corpus.py::materialize_negs`.

All functions take an optional `weight` mask (1 = real example,
0 = padding) and reduce exactly like the reference (mean for CE/MSE/BPR,
sum for hinge, model.py:716-733).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _mean(x, weight):
    if weight is None:
        return jnp.mean(x)
    return jnp.sum(x * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def raw_mse(preds: jnp.ndarray, targets: jnp.ndarray,
            weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean squared error ('RAW_MSE', model.py:717-721)."""
    return _mean((preds - targets) ** 2, weight)


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray,
               weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Softmax cross-entropy over a candidate axis ('SOFT',
    model.py:703-716): `logits`/`labels` are [..., num_candidates],
    labels a distribution (one-hot for the 1-pos + negs layout)."""
    ce = -jnp.sum(jax.lax.stop_gradient(labels)
                  * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    return _mean(ce, weight)


def sigmoid_ce_point(logits: jnp.ndarray, labels: jnp.ndarray,
                     weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Pointwise sigmoid cross-entropy ('SOFT'+'POINT',
    model.py:705-712) on binary labels."""
    ce = optax_sigmoid_ce(logits, labels)
    return _mean(ce, weight)


def optax_sigmoid_ce(logits, labels):
    # numerically-stable BCE-with-logits (tf.nn.sigmoid_cross_entropy
    # _with_logits semantics)
    return jnp.maximum(logits, 0) - logits * labels \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def bpr(pos: jnp.ndarray, neg: jnp.ndarray,
        weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """BPR pairwise ranking loss ('LOG', model.py:722-726):
    mean(-log sigmoid(pos - neg))."""
    return _mean(-jax.nn.log_sigmoid(pos - neg), weight)


def hinge(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 0.2,
          weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Pairwise hinge ranking loss (model.py:727-733):
    sum(max(0, margin - pos + neg)). Reference default margin 0.2
    (MPCN/parser.py margin flag)."""
    h = jnp.maximum(0.0, margin - pos + neg)
    if weight is not None:
        h = h * weight
    return jnp.sum(h)
