"""ptnn — TPU-native parallel-tempering MCMC for Bayesian neural networks.

A from-scratch JAX/XLA re-design of the capabilities of
``sydney-machine-learning/parallel-tempering-neural-net``: replica-exchange
(parallel tempering) sampling of feed-forward neural network weights with
random-walk and Langevin-gradient proposals, for classification and
time-series regression. The entire temperature ladder runs as one compiled
XLA program with a ``(chains, ...)`` leading axis, sharded over a TPU mesh.
"""

from ptnn.config import PTConfig, classification_preset, regression_preset
from ptnn.kernel import ChainState, Dataset, init_state, make_step_fn
from ptnn.sampler import (
    SampleResult,
    make_dataset,
    sample,
    throughput_run,
    throughput_runner,
)
# ptnn.auto and ptnn.predict are deliberately NOT imported here: both are
# `python -m` entry points, and importing them at package level makes runpy
# warn about the module pre-existing in sys.modules. `from ptnn import auto`
# still works (plain submodule import).
from ptnn import checkpoint, data, mcmc, profiling, results, sweeps, tuning

__version__ = "0.1.0"

__all__ = [
    "PTConfig",
    "classification_preset",
    "regression_preset",
    "ChainState",
    "Dataset",
    "init_state",
    "make_step_fn",
    "SampleResult",
    "make_dataset",
    "sample",
    "throughput_run",
    "throughput_runner",
    "checkpoint",
    "data",
    "mcmc",
    "profiling",
    "results",
    "sweeps",
    "tuning",
]
