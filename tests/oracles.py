"""Numpy test oracles.

Independent (numpy, float64) transcriptions of the reference math used purely
as test fixtures to pin down numerical parity of the TPU-native
implementations. Each oracle cites the reference file:line it mirrors.
"""

from __future__ import annotations

import numpy as np


class PSLDOracle:
    """Expanded-coefficient PSLD perturbation kernel
    (reference main/models/sde/psld.py:38-152)."""

    def __init__(self, beta_min, beta_max, nu, gamma, kappa, numerical_eps=1e-9):
        self.beta_0, self.beta_1 = beta_min, beta_max
        self.nu, self.gamma, self.kappa = nu, gamma, kappa
        self.m_inv = (gamma - nu) ** 2 / 4
        self.m = 1 / self.m_inv
        self.mm_0 = kappa * self.m
        self.eps = numerical_eps

    def b_t(self, t):
        return self.beta_0 * t + 0.5 * t**2 * (self.beta_1 - self.beta_0)

    def mean_coeffs(self, t):
        """Scalar coefficients (e11,e12,e21,e22) of the mean map
        (psld.py:62-84)."""
        nu, gamma = self.nu, self.gamma
        b = self.b_t(t)
        scale = np.exp(-(nu + gamma) / 4 * b)
        A_1, A_2 = (nu - gamma) / 4, (gamma - nu) ** 2 / 8
        C_1, C_2 = -0.5, (gamma - nu) / 4
        e11 = scale * (A_1 * b + 1)
        e12 = scale * (A_2 * b)
        e21 = scale * (C_1 * b)
        e22 = scale * (C_2 * b + 1)
        return e11, e12, e21, e22

    def cov(self, xx_0, mm_0, t):
        """(xx_t, xm_t, mm_t) (psld.py:86-152)."""
        nu, gamma, m_inv, m = self.nu, self.gamma, self.m_inv, self.m
        b = self.b_t(t)
        b2 = b**2
        cov_lam = (nu + gamma) / 2
        scale = np.exp(-cov_lam * b)
        inv_scale = np.exp(cov_lam * b)

        A_1, A_2, A_3, A_5, A_6 = (
            m_inv / 4,
            m_inv**2 / 4,
            (nu - gamma) / 2,
            -m_inv / 2,
            (gamma - nu) / 2,
        )
        A_7 = inv_scale - 1
        C_1, C_2, C_3, C_4, C_5 = (
            (gamma - nu) / 8,
            m_inv * (gamma - nu) / 8,
            -0.5,
            m_inv / 2,
            (nu - gamma) / 4,
        )
        D_1, D_2, D_4, D_5, D_6 = (0.25, m_inv / 4, (gamma - nu) / 2, -0.5,
                                   m * (nu - gamma) / 2)
        D_7 = m * (inv_scale - 1)

        xx_t = (A_1 * b2 * xx_0 + A_2 * b2 * mm_0 + A_3 * b * xx_0
                + A_5 * b2 + A_6 * b + A_7 + xx_0) * scale
        xm_t = (C_1 * b2 * xx_0 + C_2 * b2 * mm_0 + C_3 * b * xx_0
                + C_4 * b * mm_0 + C_5 * b2) * scale
        mm_t = (D_1 * b2 * xx_0 + D_2 * b2 * mm_0 + D_4 * b * mm_0
                + D_5 * b2 + D_6 * b + D_7 + mm_0) * scale
        return xx_t + self.eps, xm_t, mm_t + self.eps

    def sscs_mean_coeffs(self, t, dt):
        """Scalar mean-map coefficients of the SSCS reverse half-step
        (reference main/samplers/sde.py:236-263); returns the 2x2 map applied
        to (x, m)."""
        nu, gamma = self.nu, self.gamma
        db = self.b_t(1.0 - (t + dt)) - self.b_t(1.0 - t)
        scale = np.exp((nu + gamma) / 4 * db)
        A_1, A_2 = (nu - gamma) / 4, -((gamma - nu) ** 2) / 8
        C_1, C_2 = 0.5, (gamma - nu) / 4
        e11 = scale * (-A_1 * db + 1)
        e12 = scale * (-A_2 * db)
        e21 = scale * (-C_1 * db)
        e22 = scale * (-C_2 * db + 1)
        return e11, e12, e21, e22

    def sscs_var(self, t, dt):
        """SSCS half-step covariance (reference main/samplers/sde.py:265-292)."""
        nu, gamma, m_inv, m = self.nu, self.gamma, self.m_inv, self.m
        db = self.b_t(1.0 - (t + dt)) - self.b_t(1.0 - t)
        db2 = db**2
        cov_lam = (nu + gamma) / 2
        scale = np.exp(cov_lam * db)
        inv_scale = np.exp(-cov_lam * db)
        A_5, A_6 = -m_inv / 2, (gamma - nu) / 2
        A_7 = inv_scale - 1
        C_5 = (gamma - nu) / 4
        D_5, D_6 = -0.5, m * (nu - gamma) / 2
        D_7 = m * (inv_scale - 1)
        xx = (A_5 * db2 - A_6 * db + A_7) * scale
        xm = (C_5 * db2) * scale
        mm = (D_5 * db2 - D_6 * db + D_7) * scale
        return xx + self.eps, xm, mm + self.eps


def upfirdn2d_oracle(x, kernel, up=1, down=1, pad=(0, 0)):
    """Reference upfirdn2d semantics (op/upfirdn2d.py:159-200) in numpy.

    x: (B, H, W, C) NHWC; kernel: (kh, kw). Zero-stuff by `up`, pad, convolve
    (true convolution), stride by `down`.
    """
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    up_y = up_x = up
    down_y = down_x = down
    pad_y0 = pad_x0 = pad[0]
    pad_y1 = pad_x1 = pad[1]

    out = np.zeros((b, h * up_y, w * up_x, c), dtype=x.dtype)
    out[:, ::up_y, ::up_x, :] = x

    py0, py1 = max(pad_y0, 0), max(pad_y1, 0)
    px0, px1 = max(pad_x0, 0), max(pad_x1, 0)
    out = np.pad(out, ((0, 0), (py0, py1), (px0, px1), (0, 0)))
    out = out[
        :,
        max(-pad_y0, 0): out.shape[1] - max(-pad_y1, 0),
        max(-pad_x0, 0): out.shape[2] - max(-pad_x1, 0),
        :,
    ]

    # true convolution with the kernel
    kf = kernel[::-1, ::-1]
    oh = out.shape[1] - kh + 1
    ow = out.shape[2] - kw + 1
    res = np.zeros((b, oh, ow, c), dtype=np.float64)
    for iy in range(kh):
        for ix in range(kw):
            res += kf[iy, ix] * out[:, iy: iy + oh, ix: ix + ow, :]
    return res[:, ::down_y, ::down_x, :].astype(x.dtype)


def setup_fir_kernel(k):
    """Normalized outer-product FIR kernel
    (reference up_or_down_sampling.py:181-188)."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / k.sum()
