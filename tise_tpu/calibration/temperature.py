"""Classifier calibration: temperature scaling + ECE.

Reference (classifier_calibration/temperature_scaling.py): a single scalar
temperature is fit by LBFGS to minimise NLL on cached validation logits
(:34-77, lr=0.01, max_iter=50); ``_ECELoss`` (:80-119) bins the max softmax
confidence into 15 equal bins and sums |accuracy - confidence| weighted by
bin occupancy.  The fitted temperatures are then baked into the IS*/O-IS
scripts (the constants in tise_tpu.core.config).

Here the NLL/grad is a jitted JAX computation and the 1-D LBFGS runs on host
via scipy (the problem is a scalar — the optimizer choice is irrelevant to
the fixed point, and the reference's result is reproduced to float tolerance;
tests recover planted temperatures on synthetic logits).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def nll(log_t: jax.Array, logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean cross-entropy of logits / exp(log_t) (log-parametrised for
    positivity)."""
    scaled = logits / jnp.exp(log_t)
    logp = jax.nn.log_softmax(scaled, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def fit_temperature(logits: np.ndarray, labels: np.ndarray, max_iter: int = 50) -> float:
    """Fit T minimising NLL (reference ModelWithTemperature.set_temperature)."""
    from scipy.optimize import minimize

    logits_j = jnp.asarray(logits, jnp.float32)
    labels_j = jnp.asarray(labels, jnp.int32)
    grad_fn = jax.jit(jax.value_and_grad(nll))

    def objective(x):
        v, g = grad_fn(jnp.asarray(x[0], jnp.float32), logits_j, labels_j)
        return float(v), np.array([float(g)], dtype=np.float64)

    res = minimize(objective, x0=np.zeros(1), jac=True, method="L-BFGS-B", options={"maxiter": max_iter})
    return float(np.exp(res.x[0]))


def ece(logits: np.ndarray, labels: np.ndarray, n_bins: int = 15, temperature: float = 1.0) -> float:
    """Expected Calibration Error (temperature_scaling.py:80-119 semantics:
    equal-width confidence bins over (0, 1], |acc - conf| weighted by bin
    occupancy)."""
    logits = np.asarray(logits, np.float64) / temperature
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    conf = probs.max(axis=1)
    pred = probs.argmax(axis=1)
    correct = pred == np.asarray(labels)
    edges = np.linspace(0, 1, n_bins + 1)
    total = len(labels)
    out = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        in_bin = (conf > lo) & (conf <= hi)
        prop = in_bin.mean()
        if prop > 0:
            out += abs(correct[in_bin].mean() - conf[in_bin].mean()) * prop
    return float(out)


def calibration_report(
    logits: np.ndarray, labels: np.ndarray, n_bins: int = 15
) -> Tuple[float, float, float, float, float]:
    """(T, nll_before, ece_before, nll_after, ece_after) — the before/after
    printout of the reference (:56-75)."""
    t = fit_temperature(logits, labels)
    lj, yj = jnp.asarray(logits, jnp.float32), jnp.asarray(labels, jnp.int32)
    nll_before = float(nll(jnp.asarray(0.0), lj, yj))
    nll_after = float(nll(jnp.asarray(np.log(t), dtype=jnp.float32), lj, yj))
    return t, nll_before, ece(logits, labels, n_bins), nll_after, ece(logits, labels, n_bins, temperature=t)


def reliability_diagram(
    logits: np.ndarray, labels: np.ndarray, n_bins: int = 15, temperature: float = 1.0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-bin (mean confidence, accuracy, fraction of samples) — the data
    behind the notebook's reliability plots (calibration_classifier.ipynb
    cells 5-7); render with any plotting tool."""
    logits = np.asarray(logits, np.float64) / temperature
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    conf = probs.max(axis=1)
    correct = probs.argmax(axis=1) == np.asarray(labels)
    edges = np.linspace(0, 1, n_bins + 1)
    mean_conf = np.zeros(n_bins)
    accuracy = np.zeros(n_bins)
    fraction = np.zeros(n_bins)
    for i, (lo, hi) in enumerate(zip(edges[:-1], edges[1:])):
        in_bin = (conf > lo) & (conf <= hi)
        fraction[i] = in_bin.mean()
        if in_bin.any():
            mean_conf[i] = conf[in_bin].mean()
            accuracy[i] = correct[in_bin].mean()
    return mean_conf, accuracy, fraction


def load_validation_npz(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a ``*_validation_feature_data.npz`` cache (notebook cell 3 format:
    arrays of logits and integer labels; accepts common key spellings)."""
    with np.load(path, allow_pickle=True) as f:
        keys = set(f.files)
        logit_key = next(k for k in ("logits", "features", "preds") if k in keys)
        label_key = next(k for k in ("labels", "targets", "y") if k in keys)
        return np.array(f[logit_key]), np.array(f[label_key])
