"""Single-chain Langevin/random-walk MCMC with uncertainty quantification.

Equivalent of the reference's standalone samplers — the Langevin MCMC in
Misc/Misc_code/ldmcmc.py (class ``MCMC``: sampler :237-394, uncertainty
plots :463-510, per-parameter posteriors :183-236) and the older RW-only
multicore-pt-regression/misc_code/mcmc.py. These are the algorithmic unit
tests the PT code grew out of (SURVEY.md §3.3); here they are the PT kernel
with one chain, swapping disabled, and T = 1 throughout.

A note on ldmcmc's every-step Langevin proposals (:317-323): its q-ratio has
a misplaced parenthesis — ``log(pdf1 - log(pdf2))`` (:322) — which evaluates
to roughly ``log(-log q2)``, a small positive constant, instead of the
correction term. With the *correct* q-ratio (which this kernel computes),
every-step Langevin from a cold start rejects almost everything because the
drift map is far from reversible away from a mode; the reference's own PT
entry points avoid this with the 50/50 RW/Langevin mixture. Hence the
default here is ``langevin_prob = 0.5``; pass 1.0 to reproduce ldmcmc's
every-step *proposal schedule* (with the corrected ratio).

Adds the reference's posterior-predictive outputs: per-step prediction traces
and 5/95-percentile uncertainty bands (ldmcmc.py:463-510).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np

from ptnn.config import PTConfig
from ptnn.sampler import SampleResult, sample


def single_chain_config(
    task: str,
    topology: Tuple[int, int, int],
    samples: int = 50_000,
    use_langevin_gradients: bool = True,
    langevin_prob: float = 0.5,  # see module docstring on ldmcmc's 1.0
    learn_rate: float = 0.01,
    drift_mode: str = "sequential",
    record_fx: bool = True,
) -> PTConfig:
    return PTConfig(
        task=task,
        topology=topology,
        num_samples=samples,
        num_chains=1,
        maxtemp=2.0,  # unused: no swaps, T ladder collapses to [1.0]
        swap_interval=0,  # single chain: swapping disabled
        use_langevin_gradients=use_langevin_gradients,
        langevin_prob=langevin_prob,
        learn_rate=learn_rate,
        drift_mode=drift_mode,
        pt_phase_frac=2.0,  # no tempered phase: T=1 throughout
        record_fx=record_fx,
    ).validate()


def run_single_chain(
    cfg: PTConfig, train: np.ndarray, test: np.ndarray, seed: int = 0
) -> SampleResult:
    """Run the single-chain sampler. The temperature ladder degenerates to
    [1.0] (assign_temperatures with one chain yields beta = [1])."""
    assert cfg.num_chains == 1 and not cfg.swaps_enabled
    return sample(cfg, train, test, seed=seed)


def predictive_bands(
    res: SampleResult, split: str = "test", lo: float = 5.0, hi: float = 95.0
) -> Dict[str, np.ndarray]:
    """Posterior-predictive percentile bands over the post-burn-in samples
    (ldmcmc.py:463-476: fx_mu = mean, fx_high/low = 5/95 percentiles)."""
    cfg = res.config
    burnin = int(cfg.samples_per_chain * cfg.burn_in)
    fx = res.traces[f"fx_{split}"][burnin:, 0]  # (S-b, N)
    return {
        "mean": fx.mean(axis=0),
        "low": np.percentile(fx, lo, axis=0),
        "high": np.percentile(fx, hi, axis=0),
    }


def plot_uncertainty(
    res: SampleResult,
    y_train: np.ndarray,
    y_test: np.ndarray,
    outdir: str,
) -> None:
    """The ldmcmc.py artifact set: posterior-predictive band plots for train
    and test (:463-510) and per-parameter posterior histogram + trace plots
    (``plot_figure`` :183-236, first 10 parameters)."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    os.makedirs(outdir, exist_ok=True)
    for split, y in (("train", y_train), ("test", y_test)):
        if f"fx_{split}" not in res.traces:
            continue
        b = predictive_bands(res, split)
        x = np.linspace(0, 1, num=len(y))
        plt.plot(x, y, label="actual")
        plt.plot(x, b["mean"], label="pred. (mean)")
        plt.fill_between(x, b["low"], b["high"], alpha=0.35, label="5%-95%")
        plt.legend(loc="upper right")
        plt.title(f"Posterior predictive — {split}")
        plt.savefig(os.path.join(outdir, f"mcmcres_{split}.png"))
        plt.clf()

    if "w" in res.traces:
        cfg = res.config
        burnin = int(cfg.samples_per_chain * cfg.burn_in)
        pos = res.traces["w"][burnin:, 0, :]  # (S-b, W)
        for p in range(min(10, pos.shape[1])):
            fig, (a0, a1) = plt.subplots(2, 1)
            a0.hist(pos[:, p], bins=40, density=True)
            a0.set_title(f"posterior θ[{p}]")
            a1.plot(pos[:, p])
            a1.set_title("trace")
            fig.tight_layout()
            fig.savefig(os.path.join(outdir, f"param_{p}.png"))
            plt.close(fig)
    plt.close("all")
