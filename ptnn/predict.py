"""Posterior-predictive serving: load a finished run, predict on new inputs.

The reference stops at its committed artifact tree — per-chain ``pos_w``
text traces (pt_classification.py:465-492) that nothing ever turns back into
predictions (``show_results`` re-reads them only to pool accuracy numbers,
:780-893). This module closes that loop, TPU-first:

* ``load_posterior(run_dir)`` reads the ``posterior/pos_w`` artifacts (and
  the run's self-describing ``config.json``) back into a ``(draws, w_size)``
  matrix — cold chain by default, burn-in dropped, optional thinning;
* ``posterior_predict(cfg, draws, x)`` evaluates the model forward pass for
  EVERY posterior draw as one vmapped XLA computation — the draw axis is a
  batch axis on the MXU, so serving M draws costs one batched matmul chain,
  not M Python loops (the same chain-batching the sampler uses) — and
  reduces to the posterior-predictive mean + percentile band (regression;
  ldmcmc.py:463-476 semantics) or mean class probabilities + labels +
  predictive entropy (classification);
* ``python -m ptnn.predict --run <dir> --problem <name>`` is the CLI:
  point it at any artifact directory and it serves predictions for the
  problem's train/test split (or a file of raw feature rows via ``--x``).

Draw batches are chunked (``batch``) so M x N x out never materializes
beyond one chunk on device — serving stays within the tunneled worker's
execution-length comfort zone at any draw count.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from ptnn.config import PTConfig, from_json_dict


def load_posterior(
    run_dir: str,
    chains: str = "cold",
    burn_in: Optional[float] = None,
    thin: int = 1,
) -> Tuple[np.ndarray, Optional[PTConfig]]:
    """Read ``<run_dir>/posterior/pos_w`` back into ``(draws, w_size)``.

    ``chains``: "cold" (lowest temperature — the true-posterior chain, the
    truepos variant's aggregation choice) or "all" (pool every rung, the
    reference's default ``show_results`` pooling). Burn-in defaults to the
    run config's fraction (0.5 when no ``config.json`` is present — older
    runs); row 0 (the np.ones init row) is always dropped.
    """
    cfg = None
    cfg_path = os.path.join(run_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = from_json_dict(json.load(f))
    pos_dir = os.path.join(run_dir, "posterior", "pos_w")
    if not os.path.isdir(pos_dir):
        raise FileNotFoundError(
            f"{pos_dir} not found: the run must be written with record_w=True"
        )
    def _temp_of(f: str) -> float:
        # chain_<T>.txt, or chain_<T>_l<r>.txt under replicated ladders
        # (PTConfig.n_ladders — results.write_artifacts qualifies duplicate
        # temperatures with the ladder index)
        stem = f[len("chain_"):-len(".txt")]
        return float(stem.split("_l")[0])

    files = sorted(
        (_temp_of(f), f)
        for f in os.listdir(pos_dir)
        if f.startswith("chain_") and f.endswith(".txt")
    )
    if not files:
        raise FileNotFoundError(f"no chain_<T>.txt traces under {pos_dir}")
    if chains == "cold":
        # every file at the minimum temperature — one per ladder; their
        # draws pool (independent samplers of the same cold posterior)
        t_cold = files[0][0]
        files = [fc for fc in files if fc[0] == t_cold]
    elif chains != "all":
        raise ValueError("chains must be 'cold' or 'all'")
    b = burn_in if burn_in is not None else (cfg.burn_in if cfg else 0.5)
    draws = []
    for _, fname in files:
        w = np.loadtxt(os.path.join(pos_dir, fname))
        w = np.atleast_2d(w)
        start = max(int(w.shape[0] * b), 1)  # always drop the init row
        draws.append(w[start::max(thin, 1)])
    return np.concatenate(draws, axis=0), cfg


def prior_draws(
    cfg: PTConfig, n: int, seed: int = 0, spec=None
) -> np.ndarray:
    """``(n, w_size)`` weight draws from the model PRIOR — N(0, sigma_sq I)
    (ops/likelihood.py prior semantics) — for prior-predictive checks: run
    them through ``posterior_predict`` / ``ops/calibrate.ppc`` BEFORE
    sampling to see what the architecture+prior alone say about the data
    (the first step of the Bayesian workflow; the reference has no prior-
    predictive surface at all). Note the regression tau^2 prior is improper
    at the reference defaults (nu_1 = nu_2 = 0), so prior-predictive bands
    are epistemic-only (``noise=None``) unless the config sets a proper
    InvGamma (nu_1 > 1, nu_2 > 0).
    """
    from ptnn import kernel

    spec = spec if spec is not None else kernel.default_spec(cfg)
    rng = np.random.default_rng(seed)
    return rng.normal(
        0.0, np.sqrt(cfg.sigma_sq), size=(n, spec.w_size)
    ).astype(np.float32)


def posterior_predict(
    cfg: PTConfig,
    draws: np.ndarray,
    x: np.ndarray,
    lo: float = 5.0,
    hi: float = 95.0,
    batch: int = 512,
    spec=None,
    noise: Optional[str] = None,
    cond: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    seed: int = 0,
    return_samples: bool = False,
) -> Dict[str, np.ndarray]:
    """Posterior-predictive summary on inputs ``x`` from weight ``draws``.

    Regression returns ``mean``/``low``/``high``/``std`` (N,) —
    ldmcmc.py:463-476's 5/95 band semantics. Classification returns
    ``probs`` (N, K) posterior-mean class probabilities, ``label`` (N,)
    argmax, and ``entropy`` (N,) of the predictive distribution (nats) —
    the uncertainty number the reference never surfaces.

    ``noise="conditional"`` (regression): the default band is EPISTEMIC
    only (percentiles of fx across draws — the reference's plot semantics);
    with noise enabled the band/std describe the FULL posterior predictive
    p(y*|D): per weight draw, tau^2 is drawn from its conditional InvGamma
    posterior given the training residuals (``cond=(x_train, y_train)``,
    ops/ic.py derivation) and observation noise is added, so a 5-95 band
    should cover ~90% of held-out targets (ops/calibrate.py scores this).
    ``return_samples`` additionally returns the ``(M, N)`` predictive draws
    (for CRPS).

    ``spec``: ModelSpec override for non-FNN families — runs sampled with
    an explicit ``model_spec`` (e.g. the CNN driver's ``cnn.digits_spec()``)
    must pass the same spec here; config.json records topology, not the
    model family.
    """
    import jax
    import jax.numpy as jnp

    from ptnn import kernel

    spec = spec if spec is not None else kernel.default_spec(cfg)
    draws = np.asarray(draws, np.float32)
    x = np.asarray(x, np.float32)
    if draws.ndim != 2 or draws.shape[1] != spec.w_size:
        raise ValueError(
            f"draws must be (M, {spec.w_size}) for topology {cfg.topology}; "
            f"got {draws.shape}"
        )

    if cfg.task == "regression":
        fwd = jax.jit(jax.vmap(lambda w: spec.forward(w, x)[:, 0]))
    else:
        fwd = jax.jit(
            jax.vmap(lambda w: jnp.exp(spec.log_probs(spec.forward(w, x))))
        )
    outs = [
        np.asarray(fwd(jnp.asarray(draws[i : i + batch])))
        for i in range(0, draws.shape[0], max(batch, 1))
    ]
    out = np.concatenate(outs, axis=0)  # (M, N) or (M, N, K)

    if cfg.task == "regression":
        y_rep = out
        if noise == "conditional":
            if cond is None:
                raise ValueError(
                    "noise='conditional' needs cond=(x_train, y_train) — "
                    "the data the sampler conditioned tau^2 on"
                )
            xc = np.asarray(cond[0], np.float32)
            yc = np.asarray(cond[1], np.float64)
            fwd_c = jax.jit(jax.vmap(lambda w: spec.forward(w, xc)[:, 0]))
            fc = np.concatenate(
                [
                    np.asarray(fwd_c(jnp.asarray(draws[i : i + batch])))
                    for i in range(0, draws.shape[0], max(batch, 1))
                ],
                axis=0,
            ).astype(np.float64)
            a = cfg.nu_1 + 0.5 * yc.shape[0]
            b = cfg.nu_2 + 0.5 * np.sum(np.square(yc[None, :] - fc), axis=1)
            rng = np.random.default_rng(seed)
            tau_sq = b / rng.gamma(a, 1.0, size=b.shape)  # InvGamma(a, b)
            y_rep = out + np.sqrt(tau_sq)[:, None] * rng.standard_normal(
                out.shape
            )
        elif noise is not None:
            raise ValueError("noise must be None or 'conditional'")
        res = {
            "mean": out.mean(axis=0),
            "low": np.percentile(y_rep, lo, axis=0),
            "high": np.percentile(y_rep, hi, axis=0),
            "std": y_rep.std(axis=0),
        }
        if return_samples:
            res["samples"] = y_rep
        return res
    probs = out.mean(axis=0)  # (N, K) posterior-mean predictive
    ent = -np.sum(probs * np.log(np.maximum(probs, 1e-12)), axis=-1)
    return {
        "probs": probs,
        "label": probs.argmax(axis=-1),
        "entropy": ent,
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Serve posterior predictions from a finished run's artifacts"
    )
    p.add_argument("--run", required=True, help="artifact dir (e.g. results/regression/Sunspot_0)")
    p.add_argument("--problem", help="bundled dataset name (for --split inputs)")
    p.add_argument("--split", choices=("train", "test"), default="test")
    p.add_argument("--x", help="file of raw feature rows (np.loadtxt) instead of --problem")
    p.add_argument("--chains", choices=("cold", "all"), default="cold")
    p.add_argument("--thin", type=int, default=1)
    p.add_argument("--out", help="write predictions (np.savetxt) here")
    p.add_argument(
        "--prior", type=int, default=0, metavar="N",
        help="serve N draws from the PRIOR instead of the run's posterior "
        "(prior-predictive checks; the run dir still supplies the "
        "architecture via config.json)",
    )
    p.add_argument(
        "--calibrate",
        action="store_true",
        help="score the posterior as a distributional forecast on the "
        "chosen split: full-predictive band coverage + CRPS (regression) "
        "or ECE + Brier (classification) — ops/calibrate.py",
    )
    p.add_argument(
        "--ic",
        action="store_true",
        help="report WAIC + PSIS-LOO on the training split (and the test-"
        "set log predictive density) from the loaded draws — ops/ic.py",
    )
    args = p.parse_args(argv)

    if args.prior:
        # prior-predictive mode: the run dir supplies only the architecture
        cfg_path = os.path.join(args.run, "config.json")
        if not os.path.exists(cfg_path):
            raise SystemExit("--prior needs a run dir with config.json")
        with open(cfg_path) as f:
            cfg = from_json_dict(json.load(f))
        draws = prior_draws(cfg, args.prior)
    else:
        draws, cfg = load_posterior(
            args.run, chains=args.chains, thin=args.thin
        )
    if cfg is None:
        raise SystemExit(
            "run has no config.json (written before this feature): call "
            "ptnn.predict.posterior_predict with an explicit PTConfig instead"
        )
    if args.x:
        x = np.atleast_2d(np.loadtxt(args.x))
        y = None
    else:
        if not args.problem:
            raise SystemExit("pass --problem (bundled dataset) or --x FILE")
        from ptnn.data import load

        prob = load(args.problem)
        data = prob.train if args.split == "train" else prob.test
        # reference row format: [features..., label] with ONE label column
        # (class index / regression target) — sampler.make_dataset semantics
        x, y = data[:, : x_cols(cfg)], data[:, x_cols(cfg)]
    pred = posterior_predict(cfg, draws, x)
    if cfg.task == "regression":
        line = (
            f"{draws.shape[0]} draws -> {x.shape[0]} inputs: "
            f"predictive mean in [{pred['mean'].min():.4f}, "
            f"{pred['mean'].max():.4f}], mean band width "
            f"{np.mean(pred['high'] - pred['low']):.4f}"
        )
        if y is not None:
            rmse = float(np.sqrt(np.mean((pred["mean"] - y) ** 2)))
            line += f", RMSE(mean) {rmse:.4f}"
        cols = np.stack(
            [pred["mean"], pred["low"], pred["high"], pred["std"]], axis=1
        )
    else:
        line = (
            f"{draws.shape[0]} draws -> {x.shape[0]} inputs: "
            f"mean predictive entropy {pred['entropy'].mean():.4f} nats"
        )
        if y is not None:
            acc = float(np.mean(pred["label"] == y.astype(np.int64)))
            line += f", accuracy(mean probs) {acc * 100:.2f}%"
        cols = np.concatenate(
            [pred["label"][:, None], pred["entropy"][:, None], pred["probs"]],
            axis=1,
        )
    print(line)
    if args.calibrate:
        if y is None:
            raise SystemExit("--calibrate needs targets (use --problem)")
        from ptnn.ops import calibrate

        if cfg.task == "regression":
            prob = load(args.problem)
            nx = x_cols(cfg)
            full = posterior_predict(
                cfg,
                draws,
                x,
                noise="conditional",
                cond=(prob.train[:, :nx], prob.train[:, nx]),
                return_samples=True,
            )
            cov_e = calibrate.coverage(y, pred["low"], pred["high"])
            cov_f = calibrate.coverage(y, full["low"], full["high"])
            cr = calibrate.crps(full["samples"], y)
            print(
                f"calibration ({args.split}): 5-95 band coverage "
                f"{cov_f * 100:.1f}% (target 90; epistemic-only band: "
                f"{cov_e * 100:.1f}%), CRPS {cr['mean']:.4f}, "
                f"mean full-band width "
                f"{np.mean(full['high'] - full['low']):.4f}"
            )
            pv = calibrate.ppc(full["samples"], y)
            print(
                "posterior-predictive checks (p~0.5 healthy): "
                + ", ".join(f"{k} {v:.2f}" for k, v in pv.items())
            )
        else:
            yl = y.astype(np.int64)
            e = calibrate.ece(pred["probs"], yl)
            br = calibrate.brier(pred["probs"], yl)
            print(
                f"calibration ({args.split}): ECE {e['ece']:.4f}, "
                f"Brier {br:.4f} over {yl.shape[0]} rows"
            )
    if args.ic:
        if not args.problem:
            raise SystemExit("--ic needs --problem (train/test splits)")
        from ptnn.ops import ic

        prob = load(args.problem)
        nx = x_cols(cfg)
        x_tr, y_tr = prob.train[:, :nx], prob.train[:, nx]
        x_te, y_te = prob.test[:, :nx], prob.test[:, nx]
        ll_tr = ic.pointwise_log_lik(cfg, draws, x_tr, y_tr)
        w, lo = ic.waic(ll_tr), ic.psis_loo(ll_tr)
        bad = int(np.sum(lo["pareto_k"] > 0.7))
        print(
            f"WAIC: elpd {w['elpd_waic']:.2f} (se {w['se']:.2f}), "
            f"p_waic {w['p_waic']:.2f}"
        )
        print(
            f"PSIS-LOO: elpd {lo['elpd_loo']:.2f} (se {lo['se']:.2f}), "
            f"p_loo {lo['p_loo']:.2f}, "
            f"{bad}/{len(lo['pareto_k'])} points with Pareto k > 0.7"
        )
        ll_te = ic.pointwise_log_lik(
            cfg, draws, x_te, y_te, cond=(x_tr, y_tr)
        )
        lppd_te = ic.waic(ll_te)["lppd"]
        print(
            f"test lppd: {lppd_te:.2f} over {x_te.shape[0]} rows "
            f"({lppd_te / x_te.shape[0]:.4f}/row)"
        )
    if args.out:
        np.savetxt(args.out, cols, fmt="%1.6f")
        print(f"wrote {args.out}")


def x_cols(cfg: PTConfig) -> int:
    """Feature-column count of a raw data row for this config's topology."""
    return cfg.topology[0]


if __name__ == "__main__":
    main()
