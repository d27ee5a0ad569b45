"""Roofline/ablation profile of the flagship FNN sampler step (VERDICT r2
item 6).

Where does the time go in one fused ladder step of the Sunspot 64-chain
config? The step is certainly not MXU-bound at w_size=61 — this quantifies
it: analytic FLOPs/bytes per step vs measured step time at several chain
counts, plus ablations (swap sweep off, proposal family) that attribute the
per-step cost to scan body vs swap machinery vs fixed dispatch overhead.

Method: every variant is compiled once via ptnn.throughput_runner (fused
two-segment scan, traces live so nothing is DCE'd), then >=3 interleaved
reps; the table reports median microseconds per ladder step. The pure-eval
floor is a bare lax.scan of the batched train+test likelihood evaluation
with the same step count. Results -> fnn_roofline.md.

Usage (serial on the tunneled chip): python scripts/profile_fnn_step.py
  [--chains 64] [--steps 2000] [--reps 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# FLOPs per forward pass of the (4,10,1) net, per example: 2 FLOP per MAC
# on the two matmuls (4*10 + 10*1 = 50 MACs) + ~4 FLOP/neuron for the
# sigmoids (11 neurons) -> ~144 FLOP; likelihood reduction is O(1)/example.
FWD_FLOP_PER_EXAMPLE = 2 * 50 + 4 * 11


def _median(xs):
    return float(np.median(np.asarray(xs, float)))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--unroll", type=int, default=1,
                   help="PTConfig.scan_unroll for every variant")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import ptnn
    from ptnn.data import load_regression

    prob = load_regression("Sunspot")
    n_tr, n_te = prob.train.shape[0], prob.test.shape[0]
    C = args.chains

    base = ptnn.PTConfig(
        task="regression",
        topology=(4, 10, 1),
        num_samples=C * args.steps,
        num_chains=C,
        maxtemp=5.0,
        swap_interval=100,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,
        record_w=False,
        scan_unroll=args.unroll,
    ).validate()
    variants = {
        "rw": base,
        "rw_noswap": dataclasses.replace(base, swap_interval=0).validate(),
        "mala": dataclasses.replace(
            base,
            proposal="precond_mala",
            adapt_rate=0.1,
            swap_style="even_odd",
            swap_interval=10,
            warmstart_frac=0.1,
            precond_start_frac=0.3,
        ).validate(),
        "mala_noswap": dataclasses.replace(
            base,
            proposal="precond_mala",
            adapt_rate=0.1,
            swap_interval=0,
            warmstart_frac=0.1,
            precond_start_frac=0.3,
        ).validate(),
    }

    runners = {
        tag: ptnn.throughput_runner(cfg, prob.train, prob.test, seed=0)
        for tag, cfg in variants.items()
    }

    # pure-eval floor: same scan length, body = batched train+test forward
    # + likelihood only (no proposal, no MH, no traces, no swap)
    xtr = jnp.asarray(prob.train[:, :4], jnp.float32)
    ytr = jnp.asarray(prob.train[:, 4], jnp.float32)
    xte = jnp.asarray(prob.test[:, :4], jnp.float32)
    yte = jnp.asarray(prob.test[:, 4], jnp.float32)

    def fwd(w, x):
        w1 = w[:40].reshape(4, 10)
        b1 = w[50:60]
        w2 = w[40:50].reshape(10, 1)
        b2 = w[60:]
        h = jax.nn.sigmoid(x @ w1 - b1)
        return jax.nn.sigmoid(h @ w2 - b2)[:, 0]

    def eval_body(ws, _):
        def one(w):
            return (
                jnp.sum(jnp.square(fwd(w, xtr) - ytr))
                + jnp.sum(jnp.square(fwd(w, xte) - yte))
            )

        ll = jax.vmap(one)(ws)
        # feed the result back so the scan carries a data dependence
        return ws + 1e-20 * ll[:, None], ll[0]

    @jax.jit
    def eval_scan(ws):
        return jax.lax.scan(eval_body, ws, None, length=args.steps)

    ws0 = jax.random.normal(jax.random.PRNGKey(0), (C, 61), jnp.float32)
    out = eval_scan(ws0)
    jax.block_until_ready(out)

    def eval_rep():
        t0 = time.perf_counter()
        o = eval_scan(ws0)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    reps = {tag: [] for tag in runners}
    eval_reps = []
    for _ in range(args.reps):
        for tag, r in runners.items():
            reps[tag].append(r()["chain_steps_per_sec"])
        eval_reps.append(eval_rep())

    print(f"\n# chains={C} steps={args.steps} reps={args.reps} "
          f"train={n_tr} test={n_te}\n")
    print("| variant | chain-steps/s (median) | us/ladder-step | achieved GFLOP/s |")
    print("|---|---|---|---|")
    rows = {}
    for tag in runners:
        sps = _median(reps[tag])
        us = 1e6 * C / sps
        # evals per step per chain: rw = 1 fwd(train)+1 fwd(test);
        # mala adds value_and_grad(train) on proposal AND current point
        # (~3x fwd each) every step
        fwd_eq = (n_tr + n_te) + (6 * n_tr if tag.startswith("mala") else 0)
        gflops = C * fwd_eq * FWD_FLOP_PER_EXAMPLE / us / 1e3
        rows[tag] = (sps, us, gflops)
        print(f"| {tag} | {sps:,.0f} | {us:.1f} | {gflops:.1f} |")
    ev_us = 1e6 * _median(eval_reps) / args.steps
    ev_gflops = C * (n_tr + n_te) * FWD_FLOP_PER_EXAMPLE / ev_us / 1e3
    print(f"| pure-eval floor | - | {ev_us:.1f} | {ev_gflops:.1f} |")

    for tag in ("rw", "mala"):
        full, noswap = rows[tag][1], rows[tag + "_noswap"][1]
        print(f"# {tag}: swap machinery = {full - noswap:+.1f} us/step "
              f"({100 * (full - noswap) / full:.1f}% of step)")
    print(f"# sampler overhead over pure eval (rw_noswap - floor): "
          f"{rows['rw_noswap'][1] - ev_us:.1f} us/step")


if __name__ == "__main__":
    main()
