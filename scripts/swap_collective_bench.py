"""Microbenchmark: swap-permutation collective on a sharded chain axis.

VERDICT r1 #10: measure the `jnp.take` gather permutation that
`ptnn.parallel.swap.apply_permutation` relies on against a
`lax.ppermute`-based adjacent exchange, on the virtual 8-device mesh,
and adopt ppermute only if the gather's collective dominates step time.

Three implementations of "apply a chain-axis permutation to (C, W) sharded
payloads":

* ``take``      — the shipped path: replicated `perm`, `jnp.take(w, perm, 0)`
                  under jit with `PartitionSpec('chains', None)` sharding;
                  XLA chooses the lowering.
* ``allgather`` — explicit shard_map: `all_gather` the full (C, W) block per
                  device, local take of this device's rows. The worst-case
                  cost the take path could degenerate to.
* ``ppermute``  — halo exchange: each device ppermutes its boundary rows to
                  both neighbors, then stitches locally. Only correct for
                  permutations that move every row by at most one position —
                  i.e. NOT the reference's bubbling sweep (whose permutation
                  is a product of left-cyclic segments old[a]->position b,
                  SURVEY.md §3.4; a configuration can cross many devices in
                  one sweep). Benchmarked as the even/odd (DEO-style)
                  alternative it would enable, not as a drop-in.

Also reports which collective ops each implementation's compiled HLO
contains, and the measured per-sweep cost relative to one sampler step (the
adopt/don't-adopt criterion).

CPU-mesh caveat: the virtual mesh measures XLA's lowering + memory traffic,
not ICI latency; treat relative numbers as structure, not speed-of-light.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/swap_collective_bench.py
(the script self-provisions those env vars if unset)
"""

from __future__ import annotations

import json
import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")  # env var alone loses to the axon plugin
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, ".")

C = 64  # chains
REPS = 50


def bubbling_perm(c: int, seed: int) -> np.ndarray:
    """A realistic sweep permutation: left-cyclic segments (SURVEY §3.4)."""
    rng = np.random.default_rng(seed)
    perm = np.arange(c)
    ll = rng.normal(size=c)
    for k in range(c - 1):
        if rng.random() < 0.5 * np.exp(min(709.0, ll[k + 1] - ll[k])):
            perm[[k, k + 1]] = perm[[k + 1, k]]
            ll[[k, k + 1]] = ll[[k + 1, k]]
    return perm


def adjacent_perm(c: int, seed: int) -> np.ndarray:
    """Even/odd (DEO-style) disjoint-pair permutation: distance <= 1."""
    rng = np.random.default_rng(seed)
    perm = np.arange(c)
    for k in range(0, c - 1, 2):
        if rng.random() < 0.5:
            perm[[k, k + 1]] = perm[[k + 1, k]]
    return perm


def collectives_in(lowered_compiled) -> list[str]:
    txt = lowered_compiled.as_text()
    found = []
    for op in ("all-gather", "all-to-all", "collective-permute", "all-reduce",
               "gather(", "dynamic-slice"):
        if op in txt:
            found.append(op.rstrip("("))
    return found


def timeit(fn, *args) -> float:
    # Block EVERY call: on the 1-core virtual CPU mesh, letting many
    # executions of a cross-module collective program pile up asynchronously
    # interleaves their device threads and the all-gather rendezvous aborts
    # (40 s termination timeout in xla rendezvous.cc). Per-call latency is
    # what we want here anyway.
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e6  # us


def main() -> None:
    devs = jax.devices()
    assert len(devs) >= 8, devs
    mesh = Mesh(np.array(devs[:8]), ("chains",))
    shard = NamedSharding(mesh, P("chains", None))
    repl = NamedSharding(mesh, P())

    rows = []
    for w_size in (61, 5_000, 50_000):
        w = jax.device_put(
            np.random.default_rng(0).normal(size=(C, w_size)).astype(np.float32),
            shard,
        )
        perm_b = jax.device_put(bubbling_perm(C, 1).astype(np.int32), repl)
        perm_a = jax.device_put(adjacent_perm(C, 1).astype(np.int32), repl)

        # --- take (shipped path) ---
        take = jax.jit(
            lambda w, p: jnp.take(w, p, axis=0),
            in_shardings=(shard, repl),
            out_shardings=shard,
        )
        take_c = take.lower(w, perm_b).compile()

        # --- explicit all_gather + local take ---
        per_dev = C // 8

        def _ag(wl, p):
            full = jax.lax.all_gather(wl, "chains", axis=0, tiled=True)
            i = jax.lax.axis_index("chains")
            mine = jax.lax.dynamic_slice_in_dim(p, i * per_dev, per_dev)
            return jnp.take(full, mine, axis=0)

        ag = jax.jit(
            shard_map(_ag, mesh=mesh, in_specs=(P("chains", None), P()),
                      out_specs=P("chains", None))
        )
        ag_c = ag.lower(w, perm_b).compile()

        # --- ppermute halo exchange (adjacent-only permutations) ---
        def _halo(wl, p):
            # send my first row up, my last row down; stitch locally
            up = jax.lax.ppermute(
                wl[:1], "chains", [(i, (i - 1) % 8) for i in range(8)]
            )  # row from next device
            down = jax.lax.ppermute(
                wl[-1:], "chains", [(i, (i + 1) % 8) for i in range(8)]
            )  # row from previous device
            ext = jnp.concatenate([down, wl, up], axis=0)  # rows g-1 .. g+per_dev
            i = jax.lax.axis_index("chains")
            mine = jax.lax.dynamic_slice_in_dim(p, i * per_dev, per_dev)
            local_idx = mine - (i * per_dev - 1)  # into ext
            return jnp.take(ext, local_idx, axis=0)

        halo = jax.jit(
            shard_map(_halo, mesh=mesh, in_specs=(P("chains", None), P()),
                      out_specs=P("chains", None))
        )
        halo_c = halo.lower(w, perm_a).compile()

        # correctness
        ref_b = np.asarray(w)[np.asarray(perm_b)]
        ref_a = np.asarray(w)[np.asarray(perm_a)]
        assert np.array_equal(np.asarray(take(w, perm_b)), ref_b)
        assert np.array_equal(np.asarray(ag(w, perm_b)), ref_b)
        assert np.array_equal(np.asarray(halo(w, perm_a)), ref_a)

        row = {
            "w_size": w_size,
            "take_us": round(timeit(take, w, perm_b), 1),
            "allgather_us": round(timeit(ag, w, perm_b), 1),
            "ppermute_us": round(timeit(halo, w, perm_a), 1),
            "take_hlo": collectives_in(take_c),
            "allgather_hlo": collectives_in(ag_c),
            "ppermute_hlo": collectives_in(halo_c),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # context: one full sampler step on the same mesh (take path inside)
    import ptnn
    from ptnn.data import load_regression
    from ptnn import sampler as sampler_mod

    prob = load_regression("Sunspot")
    cfg = ptnn.PTConfig(
        task="regression", topology=(4, 10, 1), num_samples=C * 200,
        num_chains=C, maxtemp=5.0, swap_interval=100, swap_offset=0,
        swap_payload="tempered_times_T", use_langevin_gradients=False,
        record_w=False,
    ).validate()
    from ptnn.parallel import mesh as mesh_mod

    pmesh = mesh_mod.make_mesh(jax.devices()[:8])
    t0 = time.perf_counter()
    stats = sampler_mod.throughput_run(cfg, prob.train, prob.test, seed=0, mesh=pmesh)
    step_us = 1e6 / (stats["chain_steps_per_sec"] / C)
    print(json.dumps({"sampler_step_us_on_mesh": round(step_us, 1),
                      "swap_every_n_steps": cfg.swap_interval}), flush=True)


if __name__ == "__main__":
    main()
