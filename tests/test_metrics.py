"""Metrics module: rank/loss/calibration metrics vs hand-worked oracles."""
import numpy as np
import pytest

from embeddingtables_tpu.metrics import (accuracy, auc, auc_jax, calibration,
                                         log_loss, normalized_entropy,
                                         recall_at_k)


def test_auc_exact_known_values():
    # Perfect separation -> 1.0; inverted -> 0.0; random symmetric -> 0.5.
    assert auc([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
    assert auc([1, 1, 0, 0], [0.1, 0.2, 0.8, 0.9]) == 0.0
    assert auc([0, 1], [0.5, 0.5]) == 0.5          # tie -> 0.5 credit


def test_auc_jax_matches_exact():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 500).astype(np.float32)
    scores = (rng.normal(size=500) + labels).astype(np.float32)
    scores = np.round(scores, 1)                   # force ties
    np.testing.assert_allclose(float(auc_jax(labels, scores)),
                               auc(labels, scores), atol=1e-5)


def test_log_loss_oracle():
    labels = np.array([0.0, 1.0, 1.0, 0.0])
    logits = np.array([-2.0, 1.5, 0.0, 0.3])
    p = 1 / (1 + np.exp(-logits))
    want = -np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    assert log_loss(labels, logits) == pytest.approx(want, rel=1e-12)
    # Stable at extreme logits (naive form would overflow/log(0)).
    assert np.isfinite(log_loss([1.0, 0.0], [60.0, -60.0]))
    assert log_loss([1.0, 0.0], [60.0, -60.0]) == pytest.approx(0.0, abs=1e-12)


def test_normalized_entropy_constant_predictor_is_one():
    rng = np.random.default_rng(1)
    labels = (rng.random(4000) < 0.25).astype(np.float64)
    p = labels.mean()
    base_logit = np.log(p / (1 - p))
    # Predicting the base rate everywhere -> NE == 1 by construction.
    ne = normalized_entropy(labels, np.full_like(labels, base_logit))
    assert ne == pytest.approx(1.0, rel=1e-9)
    # A better-than-constant predictor -> NE < 1.
    good = base_logit + 2.0 * (labels - p)
    assert normalized_entropy(labels, good) < 1.0
    # Degenerate all-one-class -> nan.
    assert np.isnan(normalized_entropy(np.ones(8), np.zeros(8)))


def test_calibration_oracle():
    labels = np.array([1.0, 0.0, 0.0, 1.0])
    logits = np.zeros(4)                           # predicts 0.5 everywhere
    assert calibration(labels, logits) == pytest.approx(0.5 / 0.5)
    # Over-prediction inflates the ratio.
    assert calibration(np.array([1.0, 0.0, 0.0, 0.0]),
                       logits) == pytest.approx(0.5 / 0.25)
    assert np.isnan(calibration(np.zeros(4), logits))


def test_accuracy_and_recall():
    assert accuracy([0, 1, 1], [-1.0, 2.0, -0.5]) == pytest.approx(2 / 3)
    assert recall_at_k([3, 7], [[1, 3], [2, 4]]) == pytest.approx(0.5)


def test_evaluate_metrics_sweep():
    import jax
    import jax.numpy as jnp
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import make_eval_step
    from embeddingtables_tpu.models.train import evaluate_metrics
    cfg = DLRMConfig(vocab_sizes=(40, 60), num_dense=3, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    model = init_dlrm(jax.random.key(0), cfg)
    rng = np.random.default_rng(4)
    batches = []
    for _ in range(2):
        batches.append(dict(
            dense=rng.normal(size=(16, 3)).astype(np.float32),
            cat=np.stack([rng.integers(0, v, 16).astype(np.int32)
                          for v in cfg.vocab_sizes]),
            label=rng.integers(0, 2, 16).astype(np.float32)))
    m = evaluate_metrics(make_eval_step(cfg), model, batches)
    assert set(m) == {"auc", "log_loss", "normalized_entropy", "calibration"}
    assert all(np.isfinite(v) for v in m.values())
    assert 0.0 <= m["auc"] <= 1.0 and m["log_loss"] > 0.0


def test_train_loop_eval_metrics_flag(capsys):
    import jax.numpy as jnp
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models import DLRMConfig
    from embeddingtables_tpu.models.train import train_dlrm
    vocab = (50, 50)
    cfg = DLRMConfig(vocab_sizes=vocab, num_dense=3, dim=8,
                     bottom_mlp=(8, 8), top_mlp=(8, 1),
                     compute_dtype=jnp.float32)
    gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=3, batch_size=64,
                          seed=3)
    res = train_dlrm(cfg, gen.batches(), 4, eval_batches=list(gen.batches(1)),
                     eval_every=4, eval_metrics=True, log_every=4)
    out = capsys.readouterr().out
    assert "NE " in out and "calib" in out and "logloss" in out
    assert res.aucs and 0.0 <= res.aucs[-1][1] <= 1.0
