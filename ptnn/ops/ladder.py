"""Temperature ladder construction (host-side, NumPy).

Reproduces the reference's geometric beta ladder adapted from ptemcee
(reference: multicore-pt-classification/pt_classification.py:537-645). When
both ``ntemps`` and a finite ``Tmax`` are given — as in every reference config
— the ladder reduces to ``betas = logspace(0, -log10(Tmax), ntemps)`` and the
``tstep``/``ndim`` machinery is dead; it is kept (including its input
validation and the ``Tmax = inf`` path) so sweeps over those arguments behave
identically.

Temperatures are ``1 / beta`` with chain 0 at T = 1 (``assign_temperatures``,
pt_classification.py:624-645). A linear-spacing alternative mirrors the
reference's (dead) linear branch.
"""

from __future__ import annotations

import numpy as np


def default_beta_ladder(ndim: int, ntemps: int | None, Tmax: float | None) -> np.ndarray:
    """Geometric ladder of beta = 1/T (pt_classification.py:537-622)."""
    if type(ndim) != int or ndim < 1:
        raise ValueError("Invalid number of dimensions specified.")
    if ntemps is None and Tmax is None:
        raise ValueError("Must specify one of ``ntemps`` and ``Tmax``.")
    if Tmax is not None and Tmax <= 1:
        raise ValueError("``Tmax`` must be greater than 1.")
    if ntemps is not None and (type(ntemps) != int or ntemps < 1):
        raise ValueError("Invalid number of temperatures specified.")

    # Per-dimension temperature step, consulted only when ntemps or Tmax is
    # missing. The reference derives it from a geometric descent off Tmax
    # (pt_classification.py:580-596) — but its own aux paths crash as written
    # (``range(Tmax)`` with Tmax None/inf), so for those inputs we use
    # ptemcee's large-dimension approximation instead of replicating the
    # crash; the standard both-given path never reads tstep.
    if Tmax is not None and np.isfinite(Tmax) and ntemps is not None:
        steps = [float(Tmax)]
        last = float(Tmax)
        for _ in range(int(Tmax)):
            last = last * (ntemps ** (-1.0 / (ntemps - 1)))
            steps.append(last)
        tsteps = np.array(steps)
        if ndim > tsteps.shape[0]:
            tstep = 1.0 + 2.0 * np.sqrt(np.log(4.0)) / np.sqrt(ndim)
        else:
            tstep = tsteps[ndim - 1]
    else:
        tstep = 1.0 + 2.0 * np.sqrt(np.log(4.0)) / np.sqrt(ndim)

    append_inf = False
    if Tmax == np.inf:
        append_inf = True
        Tmax = None
        ntemps = ntemps - 1

    if ntemps is not None:
        if Tmax is None:
            Tmax = tstep ** (ntemps - 1)
    else:
        ntemps = int(np.log(Tmax) / np.log(tstep) + 2)

    betas = np.logspace(0, -np.log10(Tmax), ntemps)
    if append_inf:
        betas = np.concatenate((betas, [0.0]))
    return betas


def assign_temperatures(
    num_chains: int, maxtemp: float, geometric: bool = True
) -> np.ndarray:
    """Temperatures for the ladder, chain 0 coldest at T = 1
    (pt_classification.py:624-645)."""
    if num_chains == 1:
        return np.asarray([1.0])  # single-chain MCMC: T = 1
    if geometric:
        betas = default_beta_ladder(2, ntemps=num_chains, Tmax=maxtemp)
        temps = np.where(betas == 0.0, np.inf, 1.0 / np.where(betas == 0.0, 1.0, betas))
        return temps
    # Linear spacing (reference's dead alternative, pt_classification.py:639-645):
    # starts at 1 and increments by maxtemp / num_chains.
    rate = maxtemp / num_chains
    return 1.0 + rate * np.arange(num_chains)
