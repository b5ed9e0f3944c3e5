"""Metric-learning losses: triplet and circle.

Math parity with the reference's TF implementations
(backend/siamese/siamese_tf/model.py:73-137):

  * triplet: squared-L2 margin loss
        max(||a-p||^2 - ||a-n||^2 + margin, 0),  margin=0.5
  * circle (Sun et al. 2020), cosine-similarity form with m=0.25,
    scale(gamma)=256, in the numerically stable shape the reference uses:
        softplus(logsumexp(logit_n) + logsumexp(logit_p))
    with alpha_p = relu(Op - sg(sp)), alpha_n = relu(sg(sn) - On),
    Op = 1+m, On = -m, margin_p = 1-m, margin_n = m.

Also the pair-based self-supervised circle loss of the PT variant
(pytorch-metric-learning's SelfSupervisedLoss(CircleLoss), siamese_pt/
train.py:189): each (anchor_i, positive_i) batch forms positives on the
diagonal and treats every cross pair as a negative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from image_search_engine_tpu.ops.distances import l2_normalize


def triplet_loss(anchor, positive, negative, margin: float = 0.5) -> jnp.ndarray:
    """Per-example squared-L2 triplet loss (reference model.py:73-90)."""
    ap = jnp.sum((anchor - positive) ** 2, axis=-1)
    an = jnp.sum((anchor - negative) ** 2, axis=-1)
    return jnp.maximum(ap - an + margin, 0.0)


def _cosine(a, b):
    return jnp.sum(l2_normalize(a) * l2_normalize(b), axis=-1)


def circle_loss(anchor, positive, negative, margin: float = 0.25, scale: float = 256.0) -> jnp.ndarray:
    """Triplet-form circle loss, scalar over the batch (reference
    model.py:92-137, including the softplus(logsumexp+logsumexp) trick)."""
    sp = _cosine(anchor, positive)
    sn = _cosine(anchor, negative)

    op = 1.0 + margin
    on = -margin
    alpha_p = jax.nn.relu(op - jax.lax.stop_gradient(sp))
    alpha_n = jax.nn.relu(jax.lax.stop_gradient(sn) - on)

    logit_p = -scale * alpha_p * (sp - (1.0 - margin))
    logit_n = scale * alpha_n * (sn - margin)

    return jax.nn.softplus(
        jax.scipy.special.logsumexp(logit_n) + jax.scipy.special.logsumexp(logit_p)
    )


def self_supervised_circle_loss(
    anchor: jnp.ndarray, positive: jnp.ndarray, margin: float = 0.25, scale: float = 256.0
) -> jnp.ndarray:
    """Pair-based circle loss: (B, D) anchors vs (B, D) positives; the
    matched row is the positive, all other rows are negatives (the PT
    variant's SelfSupervisedLoss(CircleLoss(m=0.25, gamma=256)),
    siamese_pt/train.py:189 — no explicit negatives needed).
    """
    a = l2_normalize(anchor)
    p = l2_normalize(positive)
    sim = jnp.dot(a, p.T)  # (B, B): diag = positives, off-diag = negatives
    b = sim.shape[0]
    eye = jnp.eye(b, dtype=bool)

    op = 1.0 + margin
    on = -margin
    sp = jnp.diag(sim)
    alpha_p = jax.nn.relu(op - jax.lax.stop_gradient(sp))
    logit_p = -scale * alpha_p * (sp - (1.0 - margin))  # (B,)

    alpha_n = jax.nn.relu(jax.lax.stop_gradient(sim) - on)
    logit_n = scale * alpha_n * (sim - margin)  # (B, B)
    logit_n = jnp.where(eye, -jnp.inf, logit_n)  # drop the diagonal

    lse_n = jax.scipy.special.logsumexp(logit_n, axis=1)  # (B,)
    loss = jax.nn.softplus(logit_p + lse_n)
    return jnp.mean(loss)


LOSSES = {
    "triplet": lambda a, p, n: jnp.mean(triplet_loss(a, p, n)),
    "circle": circle_loss,
    "self_supervised_circle": lambda a, p, n=None: self_supervised_circle_loss(a, p),
}
