"""Sampling drivers: chunked streaming sampler and fused throughput runner.

Replaces the reference's ``ParallelTempering.run_chains`` master loop
(multicore-pt-classification/pt_classification.py:701-776): instead of forking
processes and rendezvousing over queues, the whole run is a ``lax.scan`` over
MCMC steps (kernel.py) executed in jitted chunks. Per-chunk traces are copied
to the host while the next chunk runs on device (JAX async dispatch overlaps
the D2H copy with compute), replacing the reference's end-of-run
``np.savetxt`` persistence (pt_classification.py:465-492) with double-buffered
streaming — and making every chunk boundary a natural checkpoint/resume point
(SURVEY.md §5 checkpoint note).
"""

from __future__ import annotations

import time
import warnings
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ptnn import kernel
from ptnn.compat import fast_jit
from ptnn.config import PTConfig
from ptnn.models import fnn
from ptnn.ops import drift as drift_mod
from ptnn.ops import ladder
from ptnn.parallel import mesh as mesh_mod


@dataclass
class SampleResult:
    """Host-side result of a PT run.

    Trace arrays have shape (samples_per_chain, num_chains, ...) with row 0
    holding the reference's untouched init row (pos_w row of ones,
    likelihood row of -100 — pt_classification.py:249,294).
    """

    traces: Dict[str, np.ndarray]
    final_state: kernel.ChainState
    temperatures: np.ndarray
    accept_ratio_per_chain: np.ndarray  # percent, per chain
    swap_percent: float
    langevin_ratio_per_chain: np.ndarray
    elapsed_s: float
    chain_steps_per_sec: float
    config: PTConfig = field(repr=False, default=None)
    # Delayed-acceptance diagnostics (surrogate_mode="delayed_acceptance"):
    da_segments: int = 0  # surrogate segments opened (composite proposals)
    da_accept_per_chain: Optional[np.ndarray] = None  # segment accept %, per chain
    # Mean expected swap-acceptance probability per adjacent rung pair
    # (k, k+1), shape (C-1,) — the Rao-Blackwellized rejection statistic the
    # communication-barrier ladder tuner consumes
    # (ops/ladder.py:barrier_tuned_temperatures).
    pair_swap_accept: Optional[np.ndarray] = None
    # Variational-reference diagnostics (cfg.variational_reference with
    # vr_regen): hot-rung independence-refresh acceptance. 100% when the hot
    # rung sits at beta=0 (vr_hot_infinite) — the IID reference leg.
    vr_regen_accept_pct: Optional[float] = None
    vr_regen_proposed: int = 0


def make_dataset(
    cfg: PTConfig,
    train: np.ndarray,
    test: np.ndarray,
) -> kernel.Dataset:
    """Split raw ``[features..., label]`` matrices (reference row format,
    SURVEY.md §L7) into a device-ready Dataset."""
    i, _h, o = cfg.topology
    x_tr = jnp.asarray(train[:, :i], jnp.float32)
    y_tr = jnp.asarray(train[:, i], jnp.float32)
    x_te = jnp.asarray(test[:, :i], jnp.float32)
    y_te = jnp.asarray(test[:, i], jnp.float32)
    t_tr = drift_mod.make_targets(y_tr, o, cfg.task)
    return kernel.Dataset(
        x_train=x_tr, y_train=y_tr, t_train=t_tr, x_test=x_te, y_test=y_te
    )


def _pick_chunk(n_steps: int, target: int) -> int:
    """Largest divisor of ``n_steps`` not exceeding ~2x the target, so every
    chunk shares one compiled executable (a trailing odd-sized chunk would
    cost a second XLA compile, which dwarfs the compute at these sizes)."""
    best = 1
    for d in range(1, int(n_steps**0.5) + 1):
        if n_steps % d == 0:
            for cand in (d, n_steps // d):
                if cand <= 2 * target and cand > best:
                    best = cand
    # n_steps prime (or no divisor near target): two compiles beat running
    # thousands of tiny chunks.
    if best < max(1, target // 8):
        return target
    return best


def _step_keys(base_key: jax.Array, start: jax.Array, length: int) -> jax.Array:
    """Per-step keys derived from the absolute step index, so results are
    invariant to chunking."""
    return jax.vmap(lambda s: jax.random.fold_in(base_key, s))(
        start + jnp.arange(length)
    )


# canonical config -> ladder construction (ops/ladder.py); re-exported here
# because sampler is where driver code historically found it
build_temperatures = ladder.build_temperatures


def sample(
    cfg: PTConfig,
    train: np.ndarray,
    test: np.ndarray,
    seed: int = 0,
    mesh=None,
    init_state: Optional[kernel.ChainState] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 4,
    model_spec=None,
) -> SampleResult:
    """Run the full PT sampler, streaming traces to host chunk by chunk.

    With ``checkpoint_path``, the run checkpoints every ``checkpoint_every``
    chunks and resumes transparently from a matching checkpoint (same config
    + seed); results are identical to an uninterrupted run because per-step
    RNG keys derive from absolute step indices.
    """
    cfg.validate()
    if cfg.fused_step:
        from ptnn import fused

        reason = (
            "fused_step does not checkpoint (chunk boundaries are "
            "swap-aligned, not step-aligned)"
            if checkpoint_path is not None
            else fused.runtime_reason(cfg, train, test, mesh=mesh,
                                      model_spec=model_spec)
        )
        if reason is None:
            return fused.sample_fused(
                cfg, train, test, seed=seed, mesh=mesh,
                init_state=init_state, model_spec=model_spec,
            )
        warnings.warn(
            f"fused_step: falling back to the per-step sampler ({reason})"
        )
    data = make_dataset(cfg, train, test)
    temps_host = build_temperatures(cfg)
    temps = jnp.asarray(temps_host, jnp.float32)
    key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)

    if mesh is not None:
        if mesh_mod.DATA_AXIS in mesh.axis_names:
            data = mesh_mod.shard_data_tree(data, mesh)
        else:
            data = mesh_mod.replicate_tree(data, mesh)
        temps = mesh_mod.replicate_tree(temps, mesh)

    # On the mesh path, plain jit preserves sharding; otherwise fast_jit
    # works around slow lowering on tunneled TPU backends (compat.py).
    jit_here = jax.jit if mesh is not None else fast_jit

    spec = model_spec if model_spec is not None else kernel.default_spec(cfg)

    state = init_state
    if state is None:
        state = jit_here(lambda k: kernel.init_state(k, cfg, data, spec))(k_init)
    if mesh is not None:
        state = mesh_mod.shard_chain_tree(state, mesh)

    step = kernel.make_step_fn(cfg, data, temps, spec)
    recompute = jit_here(step.recompute_ll)
    refit_anchor = None
    close_seg = None
    da_mode = cfg.use_surrogate and cfg.surrogate_mode == "delayed_acceptance"
    # boundary-closure keys: a stream disjoint from the per-step keys
    k_close = jax.random.fold_in(k_run, 0x7FFFFFFF)
    if cfg.use_surrogate:
        # chunk boundary = surrogate interval: refit on the collected buffer
        # and re-anchor every chain's carried likelihood with a true eval.
        # In delayed-acceptance mode any open segment is exactly corrected
        # FIRST (the refit changes the surrogate the segment was built under).
        if da_mode:
            close_seg = jit_here(step.close_segment)

            def _refit(st, idx, kc):
                return step.recompute_ll(
                    step.refit_surrogate(step.close_segment(st, idx, kc))
                )

            refit_anchor_inner = jit_here(_refit)
        else:
            refit_anchor_inner = jit_here(
                lambda st, idx, kc: step.recompute_ll(step.refit_surrogate(st))
            )

        def refit_anchor(st, done):
            return refit_anchor_inner(
                st,
                jnp.asarray(max(done - 1, 0), jnp.int32),
                jax.random.fold_in(k_close, done),
            )

    thin = cfg.record_thin

    def _run_chunk(st, start, length):
        keys = _step_keys(k_run, start, length)
        idx = start + jnp.arange(length)
        st, traces = jax.lax.scan(
            step, st, (idx, keys), unroll=cfg.scan_unroll
        )
        if thin > 1:
            # device-side trace striding (cfg.record_thin): keep rows at
            # local positions thin-1, 2*thin-1, ... BEFORE the host fetch,
            # so long runs ship thin-x fewer trace bytes over the wire
            traces = {k: v[thin - 1 :: thin] for k, v in traces.items()}
        return st, traces

    if mesh is not None:
        run_chunk = jax.jit(
            _run_chunk, static_argnames=("length",), donate_argnums=(0,)
        )
    else:
        run_chunk = fast_jit(_run_chunk, static_argnames=("length",))

    n_steps = cfg.n_steps
    target = max(1, min(cfg.chunk_steps, n_steps))
    # Scan segments split at the (static) temper-switch step, where the
    # reference recomputes the carried likelihood (pt_classification.py:320-324).
    switch = cfg.temper_switch_step
    segments = (
        [(0, switch), (switch, n_steps)] if 0 < switch < n_steps else [(0, n_steps)]
    )
    host_chunks = []
    pending = None  # (device_traces) from previous chunk, fetched lazily
    resume_at = 0
    if checkpoint_path is not None:
        from ptnn import checkpoint as ckpt_mod

        loaded = ckpt_mod.load(checkpoint_path, cfg, seed, spec.name)
        if loaded is not None:
            ck_state, resume_at, ck_traces = loaded
            if cfg.use_surrogate and ck_state.surr is None:
                # legacy checkpoint format (pre surrogate-state flattening):
                # rebuild empty; it refills within one chunk of true evals.
                # New checkpoints round-trip the ring buffer, so resume is
                # bit-identical to an uninterrupted run.
                from ptnn import surrogate as surrogate_mod

                ck_state = ck_state._replace(
                    surr=surrogate_mod.init_for(cfg, spec.w_size)
                )
            if da_mode and ck_state.da is None:
                # pre-DA checkpoint format: start with no open segment (only
                # correct if the save was not mid-segment; new checkpoints
                # always persist the DA state)
                ck_state = ck_state._replace(
                    da=kernel.init_da_state(cfg.num_chains, spec.w_size)
                )
            if mesh is not None:
                state = mesh_mod.shard_chain_tree(ck_state, mesh)
            else:
                state = jax.device_put(ck_state)
            if ck_traces:
                host_chunks.append(ck_traces)

    def maybe_checkpoint(done: int) -> None:
        if checkpoint_path is None:
            return
        from ptnn import checkpoint as ckpt_mod

        merged_sofar = {
            k: np.concatenate([c[k] for c in host_chunks], axis=0)
            for k in host_chunks[0]
        }
        ckpt_mod.save(
            checkpoint_path,
            jax.device_get(state),
            done,
            merged_sofar,
            cfg,
            seed,
            spec.name,
        )

    t0 = time.perf_counter()
    chunks_since_ckpt = 0
    for si, (seg_start, seg_end) in enumerate(segments):
        if resume_at >= seg_end:
            continue
        done = max(seg_start, resume_at)
        # refit_anchor subsumes the temper-switch recompute (it ends with a
        # true-likelihood re-anchor), so don't pay the dataset pass twice
        if si > 0 and done == seg_start and refit_anchor is None:
            state = recompute(state)
        chunk = _pick_chunk(seg_end - seg_start, target)
        while done < seg_end:
            if refit_anchor is not None and done > 0:
                state = refit_anchor(state, done)
            length = min(chunk, seg_end - done)
            state, traces = run_chunk(
                state, jnp.asarray(done, jnp.int32), length=length
            )
            if pending is not None:
                host_chunks.append(jax.device_get(pending))  # overlaps with chunk
            pending = traces
            done += length
            chunks_since_ckpt += 1
            if checkpoint_path is not None and chunks_since_ckpt >= checkpoint_every:
                host_chunks.append(jax.device_get(pending))
                pending = None
                maybe_checkpoint(done)
                chunks_since_ckpt = 0
    if pending is not None:
        host_chunks.append(jax.device_get(pending))
    if close_seg is not None:
        # a run must not end mid-segment: apply the exact correction so the
        # final state (and its carried likelihood) is a true posterior sample
        state = close_seg(
            state,
            jnp.asarray(n_steps - 1, jnp.int32),
            jax.random.fold_in(k_close, n_steps + 1),
        )
    state = jax.block_until_ready(state)
    if checkpoint_path is not None:
        maybe_checkpoint(cfg.n_steps)
    elapsed = time.perf_counter() - t0

    # Assemble (samples, C, ...) traces with the reference's init row 0.
    merged: Dict[str, np.ndarray] = {}
    for name in host_chunks[0]:
        arr = np.concatenate([c[name] for c in host_chunks], axis=0)
        if name == "w":
            row0 = np.ones((1,) + arr.shape[1:], arr.dtype)
        elif name == "ll":
            row0 = np.full((1,) + arr.shape[1:], -100.0, arr.dtype)
        elif name == "replica":
            # step 0: replica r sits at rung r by construction (init_state)
            row0 = np.arange(arr.shape[1], dtype=arr.dtype)[None, :]
        else:
            row0 = np.zeros((1,) + arr.shape[1:], arr.dtype)
        merged[name] = np.concatenate([row0, arr], axis=0)

    samples = cfg.samples_per_chain
    n_acc = np.asarray(state.n_accept)
    accept_ratio = n_acc * 100.0 / samples  # pt_classification.py:458
    n_sw_prop = int(state.n_swap_proposed)
    swap_pct = (
        100.0 * int(state.n_swap_accepted) / n_sw_prop if n_sw_prop else 0.0
    )  # pt_classification.py:774
    pair_sum = np.asarray(state.pair_accept_sum)[:-1]
    pair_cnt = np.asarray(state.pair_prop_count)[:-1]
    pair_swap_accept = pair_sum / np.maximum(pair_cnt, 1)
    langevin_ratio = np.asarray(state.n_langevin) * 100.0 / samples
    da_segments = 0
    da_accept = None
    if da_mode:
        da_segments = int(state.da.n_seg)
        da_accept = (
            np.asarray(state.da.n_seg_accepted) * 100.0 / max(da_segments, 1)
        )
    vr_regen_pct = None
    vr_regen_prop = 0
    if state.n_regen_proposed is not None:
        vr_regen_prop = int(state.n_regen_proposed)
        vr_regen_pct = (
            100.0 * int(state.n_regen_accepted) / max(vr_regen_prop, 1)
        )

    return SampleResult(
        traces=merged,
        final_state=jax.device_get(state),
        temperatures=np.asarray(temps_host),
        accept_ratio_per_chain=accept_ratio,
        swap_percent=swap_pct,
        langevin_ratio_per_chain=langevin_ratio,
        elapsed_s=elapsed,
        chain_steps_per_sec=n_steps * cfg.num_chains / elapsed,
        config=cfg,
        da_segments=da_segments,
        da_accept_per_chain=da_accept,
        pair_swap_accept=pair_swap_accept,
        vr_regen_accept_pct=vr_regen_pct,
        vr_regen_proposed=vr_regen_prop,
    )


def throughput_runner(
    cfg: PTConfig,
    train: np.ndarray,
    test: np.ndarray,
    seed: int = 0,
    mesh=None,
    model_spec=None,
):
    """Compile a fused benchmark run once and return a zero-arg callable that
    executes ONE timed rep. Holding several runners and cycling them gives
    interleaved repeated measurements — the only defensible protocol on the
    tunneled single-chip backend, whose round-trip variance is ±30-40%
    (COVERAGE.md measurement note)."""
    stats_fn = _throughput_build(cfg, train, test, seed, mesh, model_spec)
    return stats_fn


def throughput_run(
    cfg: PTConfig,
    train: np.ndarray,
    test: np.ndarray,
    seed: int = 0,
    mesh=None,
    model_spec=None,
) -> Dict[str, float]:
    """Fused device-resident run for benchmarking: one jitted scan over all
    steps, scalar traces kept on device, timed after a full warmup pass (the
    warmup run doubles as the compile; its wall time is not reported)."""
    return _throughput_build(cfg, train, test, seed, mesh, model_spec)()


def _throughput_build(
    cfg: PTConfig,
    train: np.ndarray,
    test: np.ndarray,
    seed: int = 0,
    mesh=None,
    model_spec=None,
):
    cfg = cfg.validate()
    if cfg.fused_step:
        from ptnn import fused

        reason = fused.runtime_reason(
            cfg, train, test, mesh=mesh, model_spec=model_spec,
            record_w=False,
        )
        if reason is None:
            return fused.throughput_build_fused(
                cfg, train, test, seed=seed, mesh=mesh, model_spec=model_spec
            )
        warnings.warn(
            f"fused_step: falling back to the per-step sampler ({reason})"
        )
    if cfg.use_surrogate:
        raise ValueError(
            "throughput_run never refits the surrogate (no chunk boundaries);"
            " benchmark surrogate configs through sample()"
        )
    import dataclasses as _dc

    cfg2 = _dc.replace(cfg, record_w=False)
    data = make_dataset(cfg2, train, test)
    temps = jnp.asarray(build_temperatures(cfg2), jnp.float32)
    key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    if mesh is not None:
        data = mesh_mod.replicate_tree(data, mesh)
        temps = mesh_mod.replicate_tree(temps, mesh)
    jit_here = jax.jit if mesh is not None else fast_jit
    state0 = jit_here(lambda k: kernel.init_state(k, cfg2, data, model_spec))(k_init)
    if mesh is not None:
        state0 = mesh_mod.shard_chain_tree(state0, mesh)
    step = kernel.make_step_fn(cfg2, data, temps, model_spec)

    @jit_here
    def run(st):
        # Two fused scans split at the static temper-switch step with the
        # reference's one-time likelihood recompute between them.
        switch = cfg2.temper_switch_step
        n = cfg2.n_steps
        bounds = [(0, switch), (switch, n)] if 0 < switch < n else [(0, n)]
        # cheap per-segment trace means keep the trace recording live (so the
        # benchmark measures the real sampler, not a DCE'd one)
        summaries = []
        for bi, (a, b) in enumerate(bounds):
            if bi > 0:
                st = step.recompute_ll(st)
            keys = _step_keys(k_run, jnp.asarray(a), b - a)
            idx = a + jnp.arange(b - a)
            st, traces = jax.lax.scan(
                step, st, (idx, keys), unroll=cfg2.scan_unroll
            )
            summaries.append({k: jnp.mean(v) for k, v in traces.items()})
        return st, summaries

    # Compile + warmup pass once; each rep is then a pure timed run.
    st, _ = run(state0)
    jax.block_until_ready(st)

    def one_rep() -> Dict[str, float]:
        t0 = time.perf_counter()
        st, summaries = run(state0)
        jax.block_until_ready(st)
        dt = time.perf_counter() - t0
        n = cfg2.n_steps
        return {
            "trace_means": jax.device_get(summaries),
            "elapsed_s": dt,
            "steps": float(n),
            "chains": float(cfg2.num_chains),
            "chain_steps_per_sec": n * cfg2.num_chains / dt,
            "accept_pct": float(
                jnp.mean(st.n_accept) * 100.0 / cfg2.samples_per_chain
            ),
            "swap_pct": float(
                jnp.where(
                    st.n_swap_proposed > 0,
                    100.0
                    * st.n_swap_accepted
                    / jnp.maximum(st.n_swap_proposed, 1),
                    0.0,
                )
            ),
            "final_rmse_test_cold": float(jax.device_get(st.rmse_test)[0]),
        }

    return one_rep
