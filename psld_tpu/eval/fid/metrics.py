"""KID and Inception Score — the other two torch-fidelity metrics.

The reference's quality gate is the external ``fidelity`` CLI
(reference: scripts_psld/fid.sh:1), which computes FID, KID, and ISC from
the same FID-InceptionV3 activations.  The reference scripts only invoke
``--fid``; KID/ISC come for free with the tool, so users expect them.  This
module provides both on top of the JAX Inception graph (inception.py):

- ``kid_from_features``: Kernel Inception Distance (Binkowski et al. 2018)
  over pool3 features — the unbiased polynomial-kernel MMD^2 estimator
  averaged over random subsets, matching torch-fidelity's protocol
  (degree 3, gamma=1/dim, coef0=1, 100 subsets of 1000 without
  replacement).  Unlike FID it is unbiased in the sample count, so it is
  the better metric at small n.

- ``isc_from_logits``: Inception Score (Salimans et al. 2016) from the
  1008-way fc-head softmax — exp(E_x KL(p(y|x) || p(y))) over consecutive
  splits (default 10), reported as mean +/- std, the classic protocol
  torch-fidelity follows.

Both are pure numpy on host: offline metrics over at most ~50k x 2048
features (400 MB f32); the device work is the feature extraction.
"""

from __future__ import annotations

import numpy as np


def _polynomial_kernel(x: np.ndarray, y: np.ndarray, degree: int,
                       gamma: float, coef0: float) -> np.ndarray:
    return (gamma * (x @ y.T) + coef0) ** degree


def polynomial_mmd2_unbiased(f1: np.ndarray, f2: np.ndarray,
                             degree: int = 3, gamma: float | None = None,
                             coef0: float = 1.0) -> float:
    """Unbiased MMD^2 between two equal-size feature sets.

    MMD^2_u = sum_{i!=j} k(x_i,x_j)/(m(m-1)) + sum_{i!=j} k(y_i,y_j)/(m(m-1))
              - 2 mean k(x_i, y_j)
    (the estimator torch-fidelity / the original KID code uses; slightly
    negative values are possible and correct for identical distributions).
    """
    m = f1.shape[0]
    assert f2.shape[0] == m, "unbiased MMD^2 wants equal-size sets"
    if gamma is None:
        gamma = 1.0 / f1.shape[1]
    k_xx = _polynomial_kernel(f1, f1, degree, gamma, coef0)
    k_yy = _polynomial_kernel(f2, f2, degree, gamma, coef0)
    k_xy = _polynomial_kernel(f1, f2, degree, gamma, coef0)
    sum_off_xx = k_xx.sum() - np.trace(k_xx)
    sum_off_yy = k_yy.sum() - np.trace(k_yy)
    return float(sum_off_xx / (m * (m - 1)) + sum_off_yy / (m * (m - 1))
                 - 2.0 * k_xy.mean())


def kid_from_features(f1: np.ndarray, f2: np.ndarray, subsets: int = 100,
                      subset_size: int = 1000, degree: int = 3,
                      gamma: float | None = None, coef0: float = 1.0,
                      seed: int = 0) -> tuple[float, float]:
    """(mean, std) of unbiased MMD^2 over random subsets — the KID value.

    torch-fidelity defaults: 100 subsets of 1000 drawn without replacement.
    When either set is smaller than ``subset_size`` the subset shrinks to
    the smaller set's size, so small smoke runs still produce a number —
    with a warning, because torch-fidelity errors in that case and the
    clamped value is NOT protocol-comparable to the tool's output.
    """
    import warnings

    f1 = np.asarray(f1, np.float64)
    f2 = np.asarray(f2, np.float64)
    m = min(subset_size, f1.shape[0], f2.shape[0])
    if m < 2:
        raise ValueError("KID needs at least 2 samples per set")
    if m < subset_size:
        warnings.warn(
            f"KID subset_size clamped {subset_size} -> {m} (set sizes "
            f"{f1.shape[0]}/{f2.shape[0]}): torch-fidelity errors here, so "
            "this value is not comparable to the fidelity CLI's KID",
            stacklevel=2)
    rng = np.random.default_rng(seed)
    vals = []
    for _ in range(subsets):
        i1 = rng.choice(f1.shape[0], m, replace=False)
        i2 = rng.choice(f2.shape[0], m, replace=False)
        vals.append(polynomial_mmd2_unbiased(f1[i1], f2[i2], degree=degree,
                                             gamma=gamma, coef0=coef0))
    vals = np.asarray(vals)
    return float(vals.mean()), float(vals.std())


def isc_from_logits(logits: np.ndarray, splits: int = 10,
                    eps: float = 1e-16) -> tuple[float, float]:
    """(mean, std) Inception Score from [N, n_classes] logits.

    Per consecutive split: exp(mean_i sum_c p_ic (log p_ic - log pbar_c))
    with pbar the split's marginal — Salimans' protocol, as in
    torch-fidelity (which also splits in input order).
    """
    logits = np.asarray(logits, np.float64)
    if logits.shape[0] < splits:
        raise ValueError(f"ISC wants >= {splits} samples, got"
                         f" {logits.shape[0]}")
    z = logits - logits.max(axis=1, keepdims=True)
    p = np.exp(z)
    p /= p.sum(axis=1, keepdims=True)
    scores = []
    for chunk in np.array_split(p, splits, axis=0):
        marginal = chunk.mean(axis=0, keepdims=True)
        kl = chunk * (np.log(chunk + eps) - np.log(marginal + eps))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    scores = np.asarray(scores)
    return float(scores.mean()), float(scores.std())
