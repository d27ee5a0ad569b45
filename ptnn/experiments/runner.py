"""Shared experiment runner: dataset -> config -> sample -> artifacts."""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

from ptnn import sample
from ptnn.config import PTConfig
from ptnn.data import Problem, load
from ptnn.parallel import mesh as mesh_mod
from ptnn import results as results_mod


def run_problem(
    prob: Problem,
    cfg: PTConfig,
    outdir: str,
    seed: int = 0,
    plots: bool = True,
    use_mesh: bool = False,
    master_fmt: str = "%1.4f",
    truepos: bool = False,
) -> results_mod.Summary:
    """One full experiment: sample, write the artifact tree into an
    auto-versioned ``<outdir>/<name>_<n>`` directory, append the master row."""
    os.makedirs(outdir, exist_ok=True)
    mesh = None
    if use_mesh:
        import jax

        if jax.device_count() > 1:
            mesh = mesh_mod.make_mesh()
    t0 = time.time()
    res = sample(cfg, prob.train, prob.test, seed=seed, mesh=mesh)
    path = results_mod.versioned_dir(outdir, prob.name)
    summary = results_mod.write_artifacts(res, path, prob.name, plots=plots)
    if truepos:
        # "true posterior" reporting: cold chain only
        # (Misc_code/pt_classifier_truepos.py semantics)
        summary = results_mod.summarize(res, prob.name, cold_only=True)
    # wall time includes artifact IO, like the reference's timer bracket
    summary.time_min = (time.time() - t0) / 60.0
    run_name = os.path.basename(path)
    results_mod.append_master_row(
        os.path.join(outdir, "master_result_file.txt"), summary, run_name, master_fmt
    )
    print(
        f"[{prob.name}] test_mean={summary.test_mean:.4f} "
        f"test_best={summary.test_best:.4f} swap%={summary.swap_perc:.2f} "
        f"accept%={summary.accept_per:.2f} "
        f"({res.chain_steps_per_sec:,.0f} chain-steps/s) -> {path}"
    )
    return summary
