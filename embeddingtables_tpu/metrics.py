"""Training-quality metrics.

The reference has no metrics module (SURVEY.md §5); the BASELINE.md north
star requires AUC parity on Criteo for the DLRM flagship, so ROC-AUC is
provided here. Two implementations:

  - `auc`: exact Mann-Whitney rank statistic with tie handling (host numpy;
    evaluation is a host-side concern).
  - `auc_jax`: jit-friendly version (average ranks via double argsort) for
    on-device eval loops.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def auc(labels, scores) -> float:
    """Exact ROC-AUC: P(score_pos > score_neg) + 0.5 * P(tie).

    Rank-based (Mann-Whitney U) with average ranks for ties.
    """
    labels = np.asarray(labels).reshape(-1)
    scores = np.asarray(scores, dtype=np.float64).reshape(-1)
    pos = labels > 0.5
    n_pos = int(pos.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(scores)
    ranks[order] = np.arange(1, scores.size + 1, dtype=np.float64)
    # Average ranks over tie groups.
    sorted_scores = scores[order]
    is_new = np.concatenate([[True], sorted_scores[1:] != sorted_scores[:-1]])
    group = np.cumsum(is_new) - 1
    gsum = np.zeros(group[-1] + 1)
    gcnt = np.zeros(group[-1] + 1)
    np.add.at(gsum, group, ranks[order])
    np.add.at(gcnt, group, 1)
    avg = gsum / gcnt
    ranks[order] = avg[group]
    u = ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def auc_jax(labels: jnp.ndarray, scores: jnp.ndarray) -> jnp.ndarray:
    """jit-compatible ROC-AUC with average-rank tie handling."""
    labels = labels.reshape(-1).astype(jnp.float32)
    scores = scores.reshape(-1).astype(jnp.float32)
    n = scores.shape[0]
    order = jnp.argsort(scores)
    sorted_scores = scores[order]
    base_ranks = jnp.arange(1, n + 1, dtype=jnp.float32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_scores[1:] != sorted_scores[:-1]])
    group = jnp.cumsum(is_new) - 1
    gsum = jnp.zeros((n,), jnp.float32).at[group].add(base_ranks)
    gcnt = jnp.zeros((n,), jnp.float32).at[group].add(1.0)
    avg = jnp.where(gcnt > 0, gsum / jnp.maximum(gcnt, 1.0), 0.0)
    ranks = jnp.zeros((n,), jnp.float32).at[order].set(avg[group])
    n_pos = jnp.sum(labels)
    n_neg = n - n_pos
    u = jnp.sum(ranks * labels) - n_pos * (n_pos + 1) / 2.0
    return u / jnp.maximum(n_pos * n_neg, 1.0)


def log_loss(labels, logits, eps: float = 1e-7) -> float:
    """Mean binary cross-entropy from LOGITS (the CTR industry's primary
    loss metric). Computed in float64 with the numerically-stable
    softplus form: `bce = softplus(logit) - label * logit`."""
    labels = np.asarray(labels, np.float64).reshape(-1)
    logits = np.asarray(logits, np.float64).reshape(-1)
    bce = np.logaddexp(0.0, logits) - labels * logits
    del eps  # kept for signature stability with probability-space callers
    return float(bce.mean())


def normalized_entropy(labels, logits) -> float:
    """Log loss normalized by the entropy of the base CTR (He et al.,
    "Practical Lessons from Predicting Clicks on Ads at Facebook", ADKDD
    2014). NE < 1 means the model beats the best constant predictor;
    insensitive to the base rate, unlike raw log loss."""
    labels = np.asarray(labels, np.float64).reshape(-1)
    p = labels.mean()
    if p <= 0.0 or p >= 1.0:
        return float("nan")
    base = -(p * np.log(p) + (1.0 - p) * np.log(1.0 - p))
    return float(log_loss(labels, logits) / base)


def calibration(labels, logits) -> float:
    """Mean predicted CTR / empirical CTR. 1.0 = perfectly calibrated in
    aggregate; the standard companion metric to NE for ads models."""
    labels = np.asarray(labels, np.float64).reshape(-1)
    logits = np.asarray(logits, np.float64).reshape(-1)
    p = 1.0 / (1.0 + np.exp(-logits))
    actual = labels.mean()
    if actual <= 0.0:
        return float("nan")
    return float(p.mean() / actual)


def accuracy(labels, scores, threshold: float = 0.0) -> float:
    labels = np.asarray(labels).reshape(-1)
    scores = np.asarray(scores).reshape(-1)
    return float(((scores > threshold) == (labels > 0.5)).mean())


def recall_at_k(true_ids, retrieved_ids) -> float:
    """Fraction of queries whose positive item appears in the retrieved
    top-k. true_ids: (B,); retrieved_ids: (B, k)."""
    true_ids = np.asarray(true_ids).reshape(-1, 1)
    retrieved_ids = np.asarray(retrieved_ids)
    return float((retrieved_ids == true_ids).any(axis=1).mean())
