"""FID statistics: streaming feature moments + Frechet distance.

Replaces the reference's external `torch-fidelity` CLI (scripts_psld/fid.sh:1)
with an on-TPU pipeline: features accumulate as (count, sum, outer-product
sum) so 50k-sample runs stream in constant memory and reduce across devices
with a single psum-shaped addition. The matrix square root runs on host via
scipy (offline metric; robustness over speed), matching pytorch-fid's
``np.cov(..., ddof=1)`` convention.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class FeatureMoments:
    count: int
    feat_sum: np.ndarray      # [D]
    outer_sum: np.ndarray     # [D, D]

    @classmethod
    def zeros(cls, dim: int) -> "FeatureMoments":
        return cls(0, np.zeros(dim, np.float64),
                   np.zeros((dim, dim), np.float64))

    def update(self, feats) -> "FeatureMoments":
        f = np.asarray(feats, np.float64)
        return FeatureMoments(
            self.count + f.shape[0],
            self.feat_sum + f.sum(axis=0),
            self.outer_sum + f.T @ f,
        )

    def merge(self, other: "FeatureMoments") -> "FeatureMoments":
        return FeatureMoments(self.count + other.count,
                              self.feat_sum + other.feat_sum,
                              self.outer_sum + other.outer_sum)

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        """(mu, cov) with the unbiased (ddof=1) covariance pytorch-fid uses."""
        n = self.count
        mu = self.feat_sum / n
        cov = (self.outer_sum - n * np.outer(mu, mu)) / (n - 1)
        return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + tr(C1 + C2 - 2 (C1 C2)^{1/2})."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    cov1, cov2 = np.atleast_2d(cov1), np.atleast_2d(cov2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(cov1 @ cov2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(covmean))


def save_stats(path: str, moments: FeatureMoments) -> None:
    mu, cov = moments.finalize()
    np.savez(path, mu=mu, sigma=cov, count=moments.count)


def load_stats(path: str) -> tuple[np.ndarray, np.ndarray]:
    d = np.load(path)
    return d["mu"], d["sigma"]
