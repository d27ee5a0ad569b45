"""Effective sample size — the quality-per-second numerator.

BASELINE.json names "chain-steps/sec/chip and ESS/sec" as the benchmark
metrics; the reference computes neither. Standard autocorrelation-based ESS
with Geyer's initial positive sequence truncation (Geyer 1992), computed on
the cold chain's post-burn-in scalar trace (likelihood or a parameter).
NumPy host-side — runs on trace arrays after sampling.
"""

from __future__ import annotations

import numpy as np


def autocorr(x: np.ndarray) -> np.ndarray:
    """Normalized autocorrelation of a 1-D series via FFT."""
    x = np.asarray(x, np.float64)
    n = len(x)
    x = x - x.mean()
    m = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, m)
    acov = np.fft.irfft(f * np.conj(f), m)[:n].real
    if acov[0] == 0:
        return np.ones(n)
    return acov / acov[0]


def ess(x: np.ndarray) -> float:
    """ESS of a 1-D chain trace (initial positive sequence truncation)."""
    x = np.asarray(x, np.float64)
    n = len(x)
    if n < 4 or np.allclose(x, x[0]):
        return 1.0
    rho = autocorr(x)
    # sum consecutive pairs rho[2k]+rho[2k+1] while positive
    pair_sums = rho[1 : n - (n - 1) % 2 - 1 : 2] + rho[2 : n - (n - 1) % 2 : 2]
    pos = np.where(pair_sums <= 0)[0]
    cutoff = pos[0] if len(pos) else len(pair_sums)
    tau = 1.0 + 2.0 * np.sum(pair_sums[:cutoff]) if cutoff else 1.0
    return float(np.clip(n / max(tau, 1e-12), 1.0, n))


def multi_ess(samples: np.ndarray, max_params: int = 64) -> float:
    """Mean ESS across (a subset of) parameter traces.

    ``samples``: (S, P) post-burn-in draws of one chain.
    """
    s = np.asarray(samples)
    p = min(max_params, s.shape[1])
    idx = np.linspace(0, s.shape[1] - 1, p).astype(int)
    return float(np.mean([ess(s[:, j]) for j in idx]))
