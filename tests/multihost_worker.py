"""Worker for the multi-host (multi-process) DCN-path validation.

Launched by tests/test_multihost.py as N separate OS processes, each owning
4 virtual CPU devices, joined into one global mesh via ``jax.distributed``
(gloo collectives stand in for DCN). Every process runs the SAME sampler
program over the global 8-device 'chains' mesh — exactly how a multi-host
TPU pod slice runs it (SURVEY.md §5 "Distributed communication backend":
across hosts the same code runs over DCN via standard jax.distributed
initialization; no bespoke transport).

Usage: python multihost_worker.py <proc_id> <num_procs> <port>
Prints one ``RESULT {json}`` line from process 0.
"""

import json
import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%d" % (
        8 // nproc
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    assert jax.device_count() == 8, jax.device_count()

    import jax.numpy as jnp

    from ptnn import PTConfig, init_state, make_dataset, make_step_fn
    from ptnn.data import load_regression
    from ptnn.ops import ladder
    from ptnn.parallel import mesh as mesh_mod

    p = load_regression("Sunspot")
    cfg = PTConfig(
        task="regression",
        topology=(4, 10, 1),
        num_samples=8 * 601,  # 600 steps; 0.6*601 non-integral -> no switch
        num_chains=8,
        maxtemp=3.0,
        swap_interval=30,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,
        record_w=False,
    ).validate()
    data = make_dataset(cfg, p.train, p.test)
    mesh = mesh_mod.make_mesh()  # all 8 GLOBAL devices (crosses processes)
    data = mesh_mod.replicate_tree(data, mesh)
    temps = mesh_mod.replicate_tree(
        jnp.asarray(
            ladder.assign_temperatures(cfg.num_chains, cfg.maxtemp), jnp.float32
        ),
        mesh,
    )
    step = make_step_fn(cfg, data, temps)
    state = mesh_mod.shard_chain_tree(
        init_state(jax.random.PRNGKey(0), cfg, data), mesh
    )

    base_key = jax.random.PRNGKey(7)

    @jax.jit
    def block(st, start):
        keys = jax.vmap(lambda s: jax.random.fold_in(base_key, s))(
            start + jnp.arange(100)
        )
        idx = start + jnp.arange(100, dtype=jnp.int32)
        st, tr = jax.lax.scan(step, st, (idx, keys))
        return st, jnp.mean(tr["ll"]), jnp.mean(tr["rmse_test"])

    st = state
    mean_lls = []
    for b in range(6):
        st, mll, _ = block(st, jnp.asarray(b * 100, jnp.int32))
        mean_lls.append(float(mll))
    out = {
        "mean_ll_first": mean_lls[0],
        "mean_ll_last": mean_lls[-1],
        "rmse_test_mean": float(jnp.mean(st.rmse_test)),
        "swaps_accepted": int(st.n_swap_accepted),
        "swaps_proposed": int(st.n_swap_proposed),
        "accept_mean": float(jnp.mean(st.n_accept.astype(jnp.float32))),
    }
    if pid == 0:
        print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
