"""Vmapped hyperparameter sweeps: many PT runs as ONE compiled program.

The reference sweeps hyperparameters by editing loop bounds and re-running
the whole process pipeline per cell (SURVEY.md §5 "Config"). On TPU, sweep
points that share shapes (same chains/steps/dataset) differ only in *values*
— e.g. the temperature ladder for a maxtemp sweep — so the entire grid runs
as ``jax.vmap`` over a leading sweep axis: one compile, one launch, every
cell in flight simultaneously (SURVEY.md §7 stage 7).

Sweep axes available as traced per-cell values: seeds, temperature ladders
(maxtemp), swap interval, Langevin probability, drift learning rate, and —
via row-mask padding to a shared shape (``dataset_grid``) — the DATASET
itself, so the whole Compare_Benchmark table (BASELINE.json config 4:
"RW vs LG-0.01 vs LG-0.1 across all bundled DATA sets in one vmapped run")
is one compile and one resident program.

No per-cell traces are kept: post-burn-in metric statistics accumulate
inside the scan carry (sum/sumsq/best), so a grid's device footprint is a
few scalars per cell and the scan chunks freely (the tunneled single-chip
worker dies on >60-90 s executions; grids at reference scale need chunking).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ptnn import kernel
from ptnn.compat import fast_jit
from ptnn.config import PTConfig
from ptnn.ops import ladder
from ptnn.sampler import _pick_chunk, _step_keys, make_dataset


def seed_sweep(
    cfg: PTConfig,
    seeds: Sequence[int],
    train: np.ndarray,
    test: np.ndarray,
) -> Dict[str, np.ndarray]:
    """N independent replications of one config as a single vmapped program —
    run-to-run spread (mean/std over seeds) for the parity gates, which the
    reference could only estimate by re-running the whole process pipeline."""
    cfg = dataclasses.replace(cfg, record_w=False, record_fx=False).validate()
    temps = jnp.asarray(ladder.build_temperatures(cfg), jnp.float32)
    temps_batch = jnp.broadcast_to(temps, (len(seeds),) + temps.shape)
    keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
    return _run_grid(cfg, temps_batch, keys, train, test)


def maxtemp_sweep(
    cfg: PTConfig,
    maxtemps: Sequence[float],
    train: np.ndarray,
    test: np.ndarray,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Run one PT sampler per maxtemp value, all cells in one vmapped scan.

    Returns per-cell arrays: pooled post-burn-in test metric mean/best,
    accept %, swap %.
    """
    cfg = dataclasses.replace(cfg, record_w=False, record_fx=False).validate()
    temps_batch = jnp.stack(
        [
            jnp.asarray(
                ladder.build_temperatures(
                    dataclasses.replace(cfg, maxtemp=float(mt))
                ),
                jnp.float32,
            )
            for mt in maxtemps
        ]
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), len(maxtemps))
    return _run_grid(cfg, temps_batch, keys, train, test)


def swap_interval_sweep(
    cfg: PTConfig,
    intervals: Sequence[int],
    train: np.ndarray,
    test: np.ndarray,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """The reference's Res_SwapInterval sweep (multicore-pt-regression/
    Res_SwapInterval/master_result_file.txt) as ONE vmapped program: swap
    cadence enters the compiled step only as a step-index mask, so the
    interval can be a per-cell traced scalar (kernel.make_step_fn
    ``swap_interval_t``) instead of a recompile axis."""
    cfg = dataclasses.replace(cfg, record_w=False, record_fx=False).validate()
    temps = jnp.asarray(ladder.build_temperatures(cfg), jnp.float32)
    n = len(intervals)
    temps_batch = jnp.broadcast_to(temps, (n,) + temps.shape)
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    si = jnp.asarray(list(intervals), jnp.int32)
    return _run_grid(cfg, temps_batch, keys, train, test, si_batch=si)


def lprob_sweep(
    cfg: PTConfig,
    lprobs: Sequence[float],
    train: np.ndarray,
    test: np.ndarray,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """The reference's Langevin-probability sweep (the regression driver's
    ``l_prob = i/10`` loop, pt_timeseries_regression.py:991; committed as
    Res_LG-Lprob/master_result_file.txt) as one vmapped program. Every cell
    pays the Langevin drift (the Bernoulli threshold is traced), so the
    l_prob=0 cell costs the same as l_prob=1 — one compile for the grid."""
    cfg = dataclasses.replace(
        cfg, record_w=False, record_fx=False, use_langevin_gradients=True
    ).validate()
    temps = jnp.asarray(ladder.build_temperatures(cfg), jnp.float32)
    n = len(lprobs)
    temps_batch = jnp.broadcast_to(temps, (n,) + temps.shape)
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    lp = jnp.asarray(list(lprobs), jnp.float32)
    return _run_grid(cfg, temps_batch, keys, train, test, lp_batch=lp)


REGRESSION_MODES: Dict[str, Tuple[float, float]] = {
    # mode -> (langevin_prob, learn_rate): the three Compare_Benchmark
    # proposal families (Res_RW / Res_LG001 / Res_LG01 master files). The
    # committed Res_LG* runs used l_prob=0.5 (PARITY.md forensics).
    "rw": (0.0, 0.1),
    "lg001": (0.5, 0.01),
    "lg01": (0.5, 0.1),
}


def dataset_grid(
    cfg: PTConfig,
    names: Sequence[str],
    modes: Sequence[str] = ("rw", "lg001", "lg01"),
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """BASELINE.json config 4, literally: every bundled regression series x
    {RW, LG-0.01, LG-0.1} as ONE vmapped program.

    Datasets of different lengths are padded to a shared row envelope with
    {0,1} validity masks (kernel.Dataset.mask_*); the masked likelihood,
    RMSE, and drift make padded rows exact no-ops, so each cell equals its
    unpadded serial run draw-for-draw (tests/test_dataset_grid.py pins
    this). The proposal-mode axis rides the traced ``langevin_prob`` /
    ``learn_rate`` overrides — every cell pays the Langevin drift (RW cells
    simply never draw it), which is the price of one compile for the grid.

    Returns per-cell arrays keyed like ``_run_grid`` plus ``cells`` — the
    (dataset, mode) pair per row, ordered dataset-major.
    """
    from ptnn.data import load_regression

    cfg = dataclasses.replace(
        cfg, record_w=False, record_fx=False, use_langevin_gradients=True
    ).validate()
    probs = [load_regression(n) for n in names]
    n_tr = max(p.train.shape[0] for p in probs)
    n_te = max(p.test.shape[0] for p in probs)

    def pad_cell(p):
        d = make_dataset(cfg, p.train, p.test)

        def pad(a, n):
            return jnp.pad(a, ((0, n - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))

        def mask(a, n):
            return jnp.pad(jnp.ones((a.shape[0],), jnp.float32), (0, n - a.shape[0]))

        return kernel.Dataset(
            x_train=pad(d.x_train, n_tr),
            y_train=pad(d.y_train, n_tr),
            t_train=pad(d.t_train, n_tr),
            x_test=pad(d.x_test, n_te),
            y_test=pad(d.y_test, n_te),
            mask_train=mask(d.x_train, n_tr),
            mask_test=mask(d.x_test, n_te),
        )

    padded = [pad_cell(p) for p in probs]
    cells = [(n, m) for n in names for m in modes]
    data_batch = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves),
        *[padded[names.index(n)] for n, _m in cells],
    )
    lp = jnp.asarray([REGRESSION_MODES[m][0] for _n, m in cells], jnp.float32)
    lr = jnp.asarray([REGRESSION_MODES[m][1] for _n, m in cells], jnp.float32)
    temps = jnp.asarray(ladder.build_temperatures(cfg), jnp.float32)
    temps_batch = jnp.broadcast_to(temps, (len(cells),) + temps.shape)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(cells))
    out = _run_grid(
        cfg, temps_batch, keys, None, None,
        lp_batch=lp, lr_batch=lr, data_batch=data_batch,
    )
    out["cells"] = cells
    return out


def envelope_w_mask(small: Tuple[int, int, int], env: Tuple[int, int, int]):
    """{0,1} parameter mask embedding a ``small=(i,h,o)`` FNN in the
    ``env=(I,H,O)`` envelope, in the reference flat layout
    ``[W1.ravel, W2.ravel, B1, B2]`` (pt_classification.py:99-106).

    Masked parameters are pinned at zero by the kernel (init, proposal
    noise, per-update drift), which makes the padded network EXACTLY the
    small one on real coordinates: padded hidden units keep zero outgoing
    weights so their sigmoid(0)=0.5 activation never reaches a real output,
    and padded class columns are removed from the softmax by
    ``Dataset.class_mask``.
    """
    i, h, o = small
    ei, eh, eo = env
    w1 = np.zeros((ei, eh), np.float32)
    w1[:i, :h] = 1.0
    w2 = np.zeros((eh, eo), np.float32)
    w2[:h, :o] = 1.0
    b1 = np.zeros(eh, np.float32)
    b1[:h] = 1.0
    b2 = np.zeros(eo, np.float32)
    b2[:o] = 1.0
    return np.concatenate([w1.ravel(), w2.ravel(), b1, b2])


def classification_grid(
    cfg: PTConfig,
    names: Sequence[str],
    seeds: Sequence[int] = (0,),
) -> Dict[str, np.ndarray]:
    """Every classification dataset (and seed) of one parity table as ONE
    vmapped program — the classification half of BASELINE.json config 4.

    The regression grid (``dataset_grid``) only needed ROW padding because
    the 4-lag series share a topology; classification datasets differ in
    (features, hidden, classes), so cells are padded to a topology ENVELOPE
    — zero feature columns, ``Dataset.class_mask`` over padded class
    columns, and an ``envelope_w_mask`` pinning padded parameters at zero
    (SURVEY.md §7 hard-part 6). ``cfg.topology`` is replaced by the
    envelope; each cell's own topology comes from its data bundle.

    The RW and LG parity tables differ in STATIC config (qratio,
    swap_payload — config.classification_preset legacy_lg), so each table
    is its own launch; within a launch, {dataset x seed} is the vmapped
    cell axis. Returns ``_run_grid`` arrays plus ``cells`` (dataset, seed)
    ordered dataset-major.
    """
    from ptnn.data import load_classification

    cfg = dataclasses.replace(
        cfg, record_w=False, record_fx=False
    )
    probs = [load_classification(n, seed=0) for n in names]
    env = (
        max(p.topology[0] for p in probs),
        max(p.topology[1] for p in probs),
        max(p.topology[2] for p in probs),
    )
    n_tr = max(p.train.shape[0] for p in probs)
    n_te = max(p.test.shape[0] for p in probs)
    cfg = dataclasses.replace(cfg, topology=env).validate()

    def pad_cell(p):
        # slice features / build one-hot targets with the dataset's OWN
        # topology, then pad rows and columns out to the envelope
        d = make_dataset(
            dataclasses.replace(cfg, topology=p.topology), p.train, p.test
        )

        def pad(a, n, cols=None):
            spec = [(0, n - a.shape[0])]
            if a.ndim > 1:
                spec.append((0, 0) if cols is None else (0, cols - a.shape[1]))
            return jnp.pad(a, spec)

        def rmask(a, n):
            return jnp.pad(jnp.ones((a.shape[0],), jnp.float32), (0, n - a.shape[0]))

        cmask = np.zeros(env[2], np.float32)
        cmask[: p.topology[2]] = 1.0
        return kernel.Dataset(
            x_train=pad(d.x_train, n_tr, env[0]),
            y_train=pad(d.y_train, n_tr),
            t_train=pad(d.t_train, n_tr, env[2]),
            x_test=pad(d.x_test, n_te, env[0]),
            y_test=pad(d.y_test, n_te),
            mask_train=rmask(d.x_train, n_tr),
            mask_test=rmask(d.x_test, n_te),
            class_mask=jnp.asarray(cmask),
            w_mask=jnp.asarray(envelope_w_mask(p.topology, env)),
        )

    padded = [pad_cell(p) for p in probs]
    cells = [(n, s) for n in names for s in seeds]
    data_batch = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves),
        *[padded[names.index(n)] for n, _s in cells],
    )
    temps = jnp.asarray(ladder.build_temperatures(cfg), jnp.float32)
    temps_batch = jnp.broadcast_to(temps, (len(cells),) + temps.shape)
    keys = jnp.stack([jax.random.PRNGKey(int(s)) for _n, s in cells])
    out = _run_grid(cfg, temps_batch, keys, None, None, data_batch=data_batch)
    out["cells"] = cells
    return out


def _run_grid(
    cfg,
    temps_batch,
    keys,
    train,
    test,
    si_batch=None,
    lp_batch=None,
    lr_batch=None,
    data_batch=None,
) -> Dict[str, np.ndarray]:
    """Chunked vmapped grid core.

    Post-burn-in metric statistics (mean/std/best for train and test)
    accumulate inside the scan carry, so nothing trace-sized ever
    materializes and the scan splits into ``cfg.chunk_steps``-sized jitted
    chunks — mandatory on the tunneled single-chip worker, which crashes on
    executions over ~60-90 s.
    """
    if data_batch is None:
        data = make_dataset(cfg, train, test)
        data_axes = None  # broadcast to every cell
    else:
        data = data_batch
        data_axes = kernel.Dataset(
            x_train=0, y_train=0, t_train=0, x_test=0, y_test=0,
            mask_train=None if data.mask_train is None else 0,
            mask_test=None if data.mask_test is None else 0,
            class_mask=None if data.class_mask is None else 0,
            w_mask=None if data.w_mask is None else 0,
        )
    n_cells = temps_batch.shape[0]
    si_none = si_batch is None
    lp_none = lp_batch is None
    lr_none = lr_batch is None
    if si_none:
        si_batch = jnp.zeros((n_cells,), jnp.int32)
    if lp_none:
        lp_batch = jnp.zeros((n_cells,), jnp.float32)
    if lr_none:
        lr_batch = jnp.zeros((n_cells,), jnp.float32)
    n_steps = cfg.n_steps
    switch = cfg.temper_switch_step
    burnin = int(cfg.samples_per_chain * cfg.burn_in)
    is_reg = cfg.task == "regression"
    metric_te = "rmse_test" if is_reg else "acc_test"
    metric_tr = "rmse_train" if is_reg else "acc_train"
    best_init = jnp.inf if is_reg else -jnp.inf
    best_op = jnp.minimum if is_reg else jnp.maximum

    def make_step(data_c, temps, si, lp, lr):
        return kernel.make_step_fn(
            cfg, data_c, temps,
            swap_interval_t=None if si_none else si,
            langevin_prob_t=None if lp_none else lp,
            learn_rate_t=None if lr_none else lr,
        )

    def init_one(data_c, temps, key, si, lp, lr):
        k_init, _ = jax.random.split(key)
        state = kernel.init_state(k_init, cfg, data_c)
        acc = {
            "tr_sum": jnp.zeros(()), "tr_sq": jnp.zeros(()),
            "te_sum": jnp.zeros(()), "te_sq": jnp.zeros(()),
            "tr_best": jnp.full((), best_init), "te_best": jnp.full((), best_init),
            "count": jnp.zeros(()),
        }
        return state, acc

    def chunk_one(state, acc, data_c, temps, key, si, lp, lr, start, length):
        step = make_step(data_c, temps, si, lp, lr)
        k_run = jax.random.split(key)[1]

        def body(carry, xs):
            st, ac = carry
            i, k = xs
            st, tr = step(st, (i, k))
            keep = (i >= burnin - 1).astype(jnp.float32)
            te, trn = tr[metric_te], tr[metric_tr]
            ac = {
                "tr_sum": ac["tr_sum"] + keep * jnp.sum(trn),
                "tr_sq": ac["tr_sq"] + keep * jnp.sum(trn * trn),
                "te_sum": ac["te_sum"] + keep * jnp.sum(te),
                "te_sq": ac["te_sq"] + keep * jnp.sum(te * te),
                # ±inf sentinel keeps pre-burn-in rows out of the best
                "tr_best": best_op(
                    ac["tr_best"],
                    jnp.where(keep > 0, _reduce_best(trn, is_reg), best_init),
                ),
                "te_best": best_op(
                    ac["te_best"],
                    jnp.where(keep > 0, _reduce_best(te, is_reg), best_init),
                ),
                "count": ac["count"] + keep * trn.shape[0],
            }
            return (st, ac), None

        idx = start + jnp.arange(length)
        ks = _step_keys(k_run, start, length)
        (state, acc), _ = jax.lax.scan(body, (state, acc), (idx, ks))
        return state, acc

    def recompute_one(state, data_c, temps, si, lp, lr):
        return make_step(data_c, temps, si, lp, lr).recompute_ll(state)

    v_init = fast_jit(
        jax.vmap(init_one, in_axes=(data_axes, 0, 0, 0, 0, 0))
    )
    _v_chunks: Dict[int, object] = {}

    def v_chunk(state, acc, data_, temps_, keys_, si_, lp_, lr_, start, length):
        # one compiled executable per chunk length (scan length is static)
        fn = _v_chunks.get(length)
        if fn is None:
            fn = fast_jit(
                jax.vmap(
                    lambda st, ac, d, t, k, si, lp, lr, s: chunk_one(
                        st, ac, d, t, k, si, lp, lr, s, length
                    ),
                    in_axes=(0, 0, data_axes, 0, 0, 0, 0, 0, None),
                )
            )
            _v_chunks[length] = fn
        return fn(state, acc, data_, temps_, keys_, si_, lp_, lr_, start)
    v_recompute = fast_jit(
        jax.vmap(recompute_one, in_axes=(0, data_axes, 0, 0, 0, 0))
    )

    state, acc = v_init(data, temps_batch, keys, si_batch, lp_batch, lr_batch)
    bounds = (
        [(0, switch), (switch, n_steps)] if 0 < switch < n_steps else [(0, n_steps)]
    )
    for bi, (a, b) in enumerate(bounds):
        if bi > 0:
            state = v_recompute(
                state, data, temps_batch, si_batch, lp_batch, lr_batch
            )
        chunk = _pick_chunk(b - a, max(1, min(cfg.chunk_steps, b - a)))
        done = a
        while done < b:
            length = min(chunk, b - done)
            state, acc = v_chunk(
                state, acc, data, temps_batch, keys, si_batch, lp_batch,
                lr_batch, jnp.asarray(done, jnp.int32), length,
            )
            done += length
    acc = jax.device_get(acc)
    state = jax.device_get(state)
    cnt = np.maximum(acc["count"], 1.0)
    te_mean = acc["te_sum"] / cnt
    tr_mean = acc["tr_sum"] / cnt
    out = {
        "test_mean": te_mean,
        "test_std": np.sqrt(np.maximum(acc["te_sq"] / cnt - te_mean**2, 0.0)),
        "test_best": acc["te_best"],
        "train_mean": tr_mean,
        "train_std": np.sqrt(np.maximum(acc["tr_sq"] / cnt - tr_mean**2, 0.0)),
        "train_best": acc["tr_best"],
        "accept_pct": np.mean(np.asarray(state.n_accept), axis=1)
        * 100.0
        / cfg.samples_per_chain,
        "swap_pct": np.where(
            np.asarray(state.n_swap_proposed) > 0,
            100.0
            * np.asarray(state.n_swap_accepted)
            / np.maximum(np.asarray(state.n_swap_proposed), 1),
            0.0,
        ),
    }
    return {k: np.asarray(v) for k, v in out.items()}


def _reduce_best(v: jax.Array, is_reg: bool) -> jax.Array:
    return jnp.min(v) if is_reg else jnp.max(v)
