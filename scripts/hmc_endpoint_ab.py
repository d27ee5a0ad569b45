"""A/B receipt for the fused-HMC endpoint-gradient reuse (VERDICT r4 item 5).

Times the r4 kernel (unconditional endpoint re-eval, extracted from git at
the commit BEFORE the change) against the current kernel (trajectory-carry
reuse + warm-start-only lax.cond re-eval) on identical inputs, INTERLEAVED
reps on the real chip, at the shapes the bench flagships use:

  * fixed-L HMC  L=16, 128 chains (16x4 ladders), k_max=10 DEO interval
  * fused ChEES  bound 16, steady-state realized L ~ 8, same shapes
  * both at 1024 chains (8 lane blocks, the chees16_fused_256x4 shape)

Expected: ~1/(L+1) on fixed-L (the gradient eval dominates the block), a
smaller ~1/(max_over_lanes_L+1) on ChEES. Writes results/hmc_endpoint_ab.md.

Usage: python scripts/hmc_endpoint_ab.py [--old-ref <git-ref>]
"""

from __future__ import annotations

import importlib.util
import math
import subprocess
import sys
import time

sys.path.insert(0, ".")

import numpy as np

OLD_REF = "8f57646"  # last commit before the endpoint-reuse change


def load_old(ref: str):
    src = subprocess.run(
        ["git", "show", f"{ref}:ptnn/ops/pallas_step.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = "/tmp/ps_old.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("ps_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def mk_inputs(jnp, ps, c_pad, k_max, chees, leapfrog=16, seed=0):
    """Steady-state (post-burn) fused-HMC block inputs at d=61 shapes."""
    rng = np.random.default_rng(seed)
    topo = (4, 10, 1)
    w_size = 4 * 10 + 10 * 1 + 10 + 1  # 61
    p_pad = 64
    rungs = 4
    f32 = np.float32

    ntr, nte = 208, 80  # ~Sunspot split sizes
    x_tr = rng.uniform(size=(ntr, 4)).astype(f32)
    y_tr = rng.uniform(size=(ntr,)).astype(f32)
    x_te = rng.uniform(size=(nte, 4)).astype(f32)
    y_te = rng.uniform(size=(nte,)).astype(f32)
    data = ps.prep_data(
        jnp.asarray(x_tr), jnp.asarray(y_tr), jnp.asarray(x_te),
        jnp.asarray(y_te),
    )

    def pc(scale=0.1):
        a = np.zeros((p_pad, c_pad), f32)
        a[:w_size] = rng.normal(size=(w_size, c_pad)) * scale
        return jnp.asarray(a)

    def c1(val, jitter=0.0):
        return jnp.asarray(
            (val + jitter * rng.normal(size=(1, c_pad))).astype(f32)
        )

    w = pc()
    state = dict(
        w=w, w_last=w, eta=c1(-3.0, 0.1), ll=c1(300.0, 5.0),
        prior=c1(-10.0, 1.0), rmse_train=c1(0.05), rmse_test=c1(0.05),
        n_accept=jnp.zeros((1, c_pad), jnp.int32),
        log_step_w=c1(math.log(0.01)), log_step_eta=c1(math.log(0.1)),
        g_like=pc(1.0), pc_mean=pc(), pc_m2=pc(0.5) ** 2 * 100.0,
        log_traj=c1(math.log(0.08)), chees_m1=c1(0.0), chees_v2=c1(1e-4),
    )
    noise_w = np.zeros((k_max, p_pad, c_pad), f32)
    noise_w[:, :w_size] = rng.normal(size=(k_max, w_size, c_pad))
    u_traj = np.broadcast_to(
        rng.uniform(size=(k_max, 1)).astype(f32), (k_max, c_pad)
    ).copy()
    noise = dict(
        noise_w=jnp.asarray(noise_w),
        noise_eta=jnp.asarray(rng.normal(size=(k_max, c_pad)).astype(f32)),
        u_mh=jnp.asarray(rng.uniform(size=(k_max, c_pad)).astype(f32)),
        u_eta=jnp.asarray(rng.uniform(size=(k_max, c_pad)).astype(f32)),
        u_jit=jnp.asarray(rng.uniform(size=(k_max, c_pad)).astype(f32)),
        u_traj=jnp.asarray(u_traj),
    )
    at = np.tile(
        np.geomspace(1.0, 5.0, rungs).astype(f32), c_pad // rungs
    )[None, :]
    scal = dict(
        sigma_sq=25.0, nu_1=0.0, nu_2=0.0, adapt_rate=0.1, hmc_target=0.75,
        warmstart_step=0.05, precond_power=1.0, pc_start=300, warm_end=800,
        burn_end=4000, leapfrog=leapfrog, eps_jitter=0.1, chees=chees,
        chees_rate=0.02, n_ladders=128 // rungs,
    )
    rs = ps.rung_sum_matrix(128, rungs, 128)
    return topo, data, state, noise, jnp.asarray(at), scal, rs


def make_runner(ps, jnp, c_pad, k_max, chees, blocks):
    """Compile ONE jitted block call; return a fn timing `blocks` calls."""
    topo, data, state, noise, at, scal, rs = mk_inputs(
        jnp, ps, c_pad, k_max, chees
    )
    import jax

    def call(st):
        ns, _tr = ps.fused_hmc_block_impl(
            st, noise["noise_w"], noise["noise_eta"], noise["u_mh"],
            noise["u_eta"], noise["u_jit"], noise["u_traj"], rs,
            5000, k_max, data, at, topo, scal, record_w=False,
        )
        return ns

    call_j = jax.jit(call)
    jax.block_until_ready(call_j(state))  # compile + warm

    def rep():
        st = call_j(state)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        for _ in range(blocks):
            st = call_j(st)
        jax.block_until_ready(st)
        return blocks * k_max * c_pad / (time.perf_counter() - t0)

    return rep


def main():
    old_ref = OLD_REF
    if "--old-ref" in sys.argv:
        old_ref = sys.argv[sys.argv.index("--old-ref") + 1]
    import jax
    import jax.numpy as jnp

    import ptnn.ops.pallas_step as ps_new

    ps_old = load_old(old_ref)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    configs = [c for c in sys.argv[1:] if not c.startswith("--")]
    rows = []
    for label, c_pad, chees in (
        ("hmc_fixed16_128ch", 128, False),
        ("chees16_128ch", 128, True),
        ("hmc_fixed16_1024ch", 1024, False),
        ("chees16_1024ch", 1024, True),
    ):
        if configs and label not in configs:
            continue
        k_max, reps, blocks = 10, 5, 40
        rep_old = make_runner(ps_old, jnp, c_pad, k_max, chees, blocks)
        rep_new = make_runner(ps_new, jnp, c_pad, k_max, chees, blocks)
        # interleave old/new reps (tunnel variance): rep1 old, rep1 new, ...
        o_list, n_list = [], []
        for _ in range(reps):
            o_list.append(rep_old())
            n_list.append(rep_new())
        mo, mn = float(np.median(o_list)), float(np.median(n_list))
        rows.append(
            f"| {label} | {mo:,.0f} | {mn:,.0f} | {mn / mo:.3f}x |"
        )
        print(rows[-1], flush=True)
        path = "results/hmc_endpoint_ab.md"
        import os

        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(
                    "# Fused-HMC endpoint-gradient reuse: A/B on the "
                    "real chip\n\n"
                    f"Old = `{old_ref}` kernel (unconditional endpoint "
                    "re-eval); new = trajectory-carry reuse\n"
                    "(re-eval only on warm-start steps). Interleaved "
                    "5-rep medians, 40 x 10-step blocks per rep,\n"
                    "steady-state (post-burn) inputs, d=61 topology, "
                    "4-rung ladders. Expected gain ~1/(L+1)\n"
                    "on fixed-L (L=16 -> ~5.9%); smaller on ChEES (the "
                    "block pays max-over-lanes realized L,\nso the saved "
                    "eval is a smaller fraction). Generated by "
                    "scripts/hmc_endpoint_ab.py.\n\n"
                    "| config | old chain-steps/s | new chain-steps/s "
                    "| ratio |\n|---|---|---|---|\n"
                )
        with open(path, "a") as f:
            f.write(rows[-1] + "\n")
    print("wrote results/hmc_endpoint_ab.md")


if __name__ == "__main__":
    main()
