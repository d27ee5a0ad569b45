"""Fused-block sampling drivers (PTConfig.fused_step).

The standard sampler advances one MCMC step per `lax.scan` iteration, paying
a fixed ~20-40 us of per-iteration kernel sequencing on TPU regardless of how
small the model is (fnn_roofline.md). Here the run is re-cut at its replica-
exchange boundaries: every inter-swap interval becomes ONE invocation of the
fused Pallas block kernel (ops/pallas_step.py) that executes the whole
interval's steps with chain state resident in VMEM, and only the swap sweep
itself (plus the 60% temper-switch recompute) stays at the XLA level, where
it reuses the exact same `do_swap` / `recompute_ll` closures as the per-step
path (kernel.make_step_fn) — so swap semantics, counters, pair statistics,
replica tracking and ensemble pair masks are shared, not re-implemented.

Scope (validated by PTConfig.validate + `fused_reason` / `runtime_reason`):
the reference random-walk path and the preconditioned-MALA flagship for
BOTH tasks (regression and classification) plus preconditioned HMC incl.
ChEES trajectory adaptation (regression). The kernels carry the Welford
preconditioner, cached likelihood gradient and every adapted scale across
steps and hand-write the FNN backprop on planes — ops/pallas_step.py
`_mala_block_kernel` / `_mala_cls_block_kernel` / `_hmc_block_kernel`; the
ChEES rung sums are an in-kernel matmul, which restricts fused ChEES to
chain counts within one 128-lane block on one device. Float32, no
surrogate/VR/fx machinery. Multi-device: a 1-D 'chains' mesh shards the
chain axis via ``jax.shard_map`` (`_call_impl`) — each device dispatches
the block kernel on its own 128-lane chain blocks (needs num_chains
divisible by n_devices*128) while the swap sweep stays at the GSPMD level;
sharded == unsharded bit-for-bit (tests/test_fused_driver.py). Working
sets are additionally gated: models/datasets whose block working set
fits the ~12 MiB VMEM budget (`_k_cap`): pregenerated proposal noise is
(K, P, 128) per chain block, so large w_size shrinks the block length K
until amortization stops paying, at which point dispatch falls back to the
per-step sampler with a warning (compute-bound configs don't need the
dispatch-floor amortization anyway). Everything else keeps the per-step
sampler; `ptnn.sample` / throughput dispatch transparently on
cfg.fused_step.

Statistical equivalence with the per-step path is tested
(tests/test_fused_driver.py); bit-level step semantics are pinned against an
independent oracle in tests/test_pallas_step.py. RNG streams differ from the
per-step path by construction (noise is drawn per block, not per step), so
cross-path parity is distributional — exactly like the reference itself
(SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ptnn import kernel
from ptnn.compat import fast_jit
from ptnn.config import PTConfig
from ptnn.ops import ladder
from ptnn.ops import pallas_step as ps
from ptnn.parallel import mesh as mesh_mod

LANES = ps.LANES


def fused_reason(cfg: PTConfig, mesh=None, model_spec=None) -> Optional[str]:
    """Why the fused path CANNOT run this config (None = supported)."""
    if cfg.use_langevin_gradients:
        return (
            "fused_step supports the reference RW / precond-MALA / HMC "
            "proposals"
        )
    if cfg.proposal in ("precond_mala", "hmc"):
        if cfg.proposal == "hmc" and cfg.hmc_adapt_traj:
            # The in-kernel rung-sum matmul couples lanes within one
            # 128-lane block. One block always works; multi-block works
            # when every block holds COMPLETE ladders (chain = ladder*K +
            # rung layout), i.e. K | 128 and num_chains a multiple of 128
            # — each block then adapts its trajectory length from its own
            # 128/K replicas (statistically equivalent pooling, smaller
            # panel). A mesh shards whole 128-lane blocks, so the same
            # condition covers it (per-device divisibility is checked
            # below).
            one_block = (
                ((cfg.num_chains + LANES - 1) // LANES) * LANES == LANES
            )
            multi_ok = (
                cfg.num_chains % LANES == 0
                and LANES % cfg.rungs_per_ladder == 0
            )
            if not (one_block and mesh is None) and not multi_ok:
                return (
                    "fused ChEES needs complete ladders per 128-lane "
                    "block: either num_chains <= 128 on one device, or "
                    "num_chains % 128 == 0 with rungs_per_ladder "
                    "dividing 128"
                )
    elif cfg.proposal != "reference":
        return (
            "fused_step supports the reference RW / precond-MALA / HMC "
            "proposals"
        )
    if cfg.use_surrogate or cfg.variational_reference:
        return "fused_step excludes surrogate/variational-reference modes"
    if cfg.record_fx or cfg.record_ll_state:
        return "fused_step does not record fx/ll_cur traces"
    if cfg.eval_dtype != "float32":
        return "fused_step is float32-only"
    if mesh is not None:
        # chain axis shards over the mesh via shard_map: each device runs
        # the block kernel on its local 128-lane chain blocks, the swap
        # sweep stays at the (GSPMD) XLA level between blocks
        if (
            mesh_mod.DATA_AXIS in mesh.axis_names
            and mesh.shape[mesh_mod.DATA_AXIS] > 1
        ):
            return "fused_step shards the chain axis only (1-D mesh)"
        n_dev = mesh.shape.get(mesh_mod.CHAIN_AXIS, 1)
        if cfg.num_chains % (n_dev * LANES) != 0:
            return (
                "fused_step on a mesh needs num_chains divisible by "
                f"n_devices*{LANES} (got {cfg.num_chains} over {n_dev})"
            )
    if model_spec is not None and model_spec.name != "fnn":
        return "fused_step supports the reference FNN spec"
    return None


_VMEM_BUDGET = 12 * 2**20  # conservative per-core VMEM working-set cap
_K_MIN = 8  # below this the dispatch-floor amortization stops paying


def _k_cap(
    record_w: bool, p_pad: int, ntr_p: int, nte_p: int, n_classes: int,
    mala: bool = False, hmc: bool = False, hidden: int = 0,
) -> int:
    """Largest block length K whose working set fits the VMEM budget
    (pallas_step.vmem_bytes model); 0 = doesn't fit even at K=_K_MIN."""
    per_k = 4 * LANES * (p_pad + 8 + (p_pad if record_w else 0))
    live = max(4, n_classes + 4)
    if (mala or hmc) and n_classes > 0:
        # the classification backprop keeps the hidden sigmoid planes and
        # per-class delta planes live through the gradient
        live = live + hidden + n_classes
    # MALA carries 3 extra (P, C) state planes (g_like, Welford mean/M2) in
    # and out, plus ~4 live (P, C) proposal/gradient planes; HMC adds the
    # momentum carry and leapfrog temporaries on top
    state_planes = 26 if hmc else (18 if mala else 4)
    fixed = 4 * LANES * (live * (ntr_p + nte_p) + state_planes * p_pad)
    if fixed + _K_MIN * per_k > _VMEM_BUDGET:
        return 0
    return min(128, int((_VMEM_BUDGET - fixed) // per_k))


def runtime_reason(
    cfg: PTConfig,
    train,
    test,
    mesh=None,
    model_spec=None,
    record_w: Optional[bool] = None,
) -> Optional[str]:
    """Static + shape-dependent applicability check, for dispatch-time
    fallback (the per-step sampler runs the same chain)."""
    from ptnn.models import fnn

    reason = fused_reason(cfg, mesh=mesh, model_spec=model_spec)
    if reason is not None:
        return reason
    pad8 = lambda n: ((n + 7) // 8) * 8
    p_pad = pad8(fnn.w_size(cfg.topology))
    rec = cfg.record_w if record_w is None else record_w
    n_cls = cfg.topology[2] if cfg.task == "classification" else 0
    cap = _k_cap(
        rec, p_pad, pad8(train.shape[0]), pad8(test.shape[0]), n_cls,
        mala=cfg.proposal == "precond_mala", hmc=cfg.proposal == "hmc",
        hidden=cfg.topology[1],
    )
    if cap < _K_MIN:
        return (
            f"block working set exceeds the VMEM budget (w_size "
            f"{fnn.w_size(cfg.topology)}, {train.shape[0]}+{test.shape[0]} "
            f"rows) — compute-bound; the per-step sampler is the right tool"
        )
    return None


# ---------------------------------------------------------------------------
# Block planning: cut [0, n_steps) at swap events and the temper switch.


def _swap_due_host(cfg: PTConfig, i: int) -> bool:
    si = cfg.swap_interval
    if si <= 0 or si > cfg.n_steps:
        return False
    k = i + cfg.swap_offset
    return k % si == 0 and k > 0


def block_plan(
    cfg: PTConfig, k_cap: int = 128
) -> List[List[Tuple[int, int, bool]]]:
    """Per segment (split at the temper switch), a list of
    ``(start, length, swap_after)`` blocks covering the segment, each block
    at most ``k_cap`` steps and ending at a swap event iff ``swap_after``."""
    n = cfg.n_steps
    switch = cfg.temper_switch_step
    seg_bounds = (
        [(0, switch), (switch, n)] if 0 < switch < n else [(0, n)]
    )
    segments = []
    for a, b in seg_bounds:
        points = [a]
        for i in range(a, b):
            if _swap_due_host(cfg, i) and i + 1 < b:
                points.append(i + 1)
        points.append(b)
        blocks = []
        for lo, hi in zip(points, points[1:]):
            # subdivide long pieces; only the LAST sub-piece may end at a
            # swap event
            cur = lo
            while hi - cur > k_cap:
                blocks.append((cur, k_cap, False))
                cur += k_cap
            blocks.append((cur, hi - cur, _swap_due_host(cfg, hi - 1)))
        segments.append(blocks)
    return segments


# ---------------------------------------------------------------------------
# ChainState <-> kernel-layout conversion.


def _to_kernel_state(st: kernel.ChainState, p_pad, c_pad, adapt,
                     mala: bool = False, hmc: bool = False,
                     task_cls: bool = False):
    c, w = st.w.shape

    def pad_pc(a):  # (C, W) -> (P, C)
        return jnp.pad(a.T, ((0, p_pad - w), (0, c_pad - c)))

    def pad_1c(a, dtype=jnp.float32):  # (C,) -> (1, C)
        return jnp.pad(a.astype(dtype), (0, c_pad - c)).reshape(1, c_pad)

    grad = mala or hmc
    lsw = (
        st.log_step_w
        if (adapt or grad)
        else jnp.zeros((c,), jnp.float32)
    )
    out = dict(
        w=pad_pc(st.w),
        w_last=pad_pc(st.w_last),
        eta=pad_1c(st.eta),
        ll=pad_1c(st.ll),
        prior=pad_1c(st.prior),
        rmse_train=pad_1c(st.rmse_train),
        rmse_test=pad_1c(st.rmse_test),
        acc_train=pad_1c(st.acc_train),
        acc_test=pad_1c(st.acc_test),
        n_accept=pad_1c(st.n_accept, jnp.int32),
        log_step_w=pad_1c(lsw),
    )
    if grad:
        out.update(
            g_like=pad_pc(st.g_like),
            pc_mean=pad_pc(st.pc_mean),
            pc_m2=pad_pc(st.pc_m2),
        )
        if not task_cls:
            # the regression MALA/HMC kernels carry the eta block's scale
            # and have no accuracy carries
            out["log_step_eta"] = pad_1c(st.log_step_eta)
            del out["acc_train"], out["acc_test"]
    if hmc:
        zc = jnp.zeros((c,), jnp.float32)
        out.update(
            log_traj=pad_1c(st.log_traj if st.log_traj is not None else zc),
            chees_m1=pad_1c(st.chees_m1 if st.chees_m1 is not None else zc),
            chees_v2=pad_1c(st.chees_v2 if st.chees_v2 is not None else zc),
        )
    return out


def _from_kernel_state(st: kernel.ChainState, ks: dict, adapt,
                       mala: bool = False, hmc: bool = False,
                       task_cls: bool = False):
    c, w = st.w.shape
    grad = mala or hmc
    take_pc = lambda a: a[:w, :c].T
    take_1c = lambda a: a[0, :c]
    out = st._replace(
        w=take_pc(ks["w"]),
        w_last=take_pc(ks["w_last"]),
        eta=take_1c(ks["eta"]),
        ll=take_1c(ks["ll"]),
        prior=take_1c(ks["prior"]),
        rmse_train=take_1c(ks["rmse_train"]),
        rmse_test=take_1c(ks["rmse_test"]),
        n_accept=take_1c(ks["n_accept"]),
    )
    if not grad or task_cls:
        out = out._replace(
            acc_train=take_1c(ks["acc_train"]),
            acc_test=take_1c(ks["acc_test"]),
        )
    if adapt or grad:
        out = out._replace(log_step_w=take_1c(ks["log_step_w"]))
    if grad:
        out = out._replace(
            g_like=take_pc(ks["g_like"]),
            pc_mean=take_pc(ks["pc_mean"]),
            pc_m2=take_pc(ks["pc_m2"]),
        )
        if not task_cls:
            out = out._replace(log_step_eta=take_1c(ks["log_step_eta"]))
    if hmc and st.log_traj is not None:
        out = out._replace(
            log_traj=take_1c(ks["log_traj"]),
            chees_m1=take_1c(ks["chees_m1"]),
            chees_v2=take_1c(ks["chees_v2"]),
        )
    return out


# ---------------------------------------------------------------------------
# Shared machinery for both drivers.


class _Fused:
    def __init__(self, cfg: PTConfig, train, test, seed, model_spec=None,
                 record_w: bool = False, interpret: Optional[bool] = None,
                 mesh=None):
        if interpret is None:
            # off-TPU (CPU test tier) the Mosaic kernel only runs interpreted
            interpret = jax.default_backend() != "tpu"
        from ptnn import sampler as sampler_mod

        reason = runtime_reason(
            cfg, train, test, mesh=mesh, model_spec=model_spec,
            record_w=record_w,
        )
        if reason is not None:
            raise ValueError(f"fused_step unsupported here: {reason}")
        self.mesh = mesh
        self.cfg = cfg
        self.task_cls = cfg.task == "classification"
        self.mala = cfg.proposal == "precond_mala"
        self.hmc = cfg.proposal == "hmc"
        self.chees = False  # set by the hmc scal block below
        self.data = sampler_mod.make_dataset(cfg, train, test)
        if self.data.mask_train is not None or self.data.w_mask is not None:
            raise ValueError("fused_step does not support padded datasets")
        self.temps_host = ladder.build_temperatures(cfg)
        self.temps = jnp.asarray(self.temps_host, jnp.float32)
        key = jax.random.PRNGKey(seed)
        self.k_init, self.k_run = jax.random.split(key)
        self.spec = (
            model_spec if model_spec is not None else kernel.default_spec(cfg)
        )
        # the per-step machinery supplies do_swap / recompute_ll closures
        self.step = kernel.make_step_fn(cfg, self.data, self.temps, self.spec)
        self.record_w = record_w and cfg.record_w
        self.interpret = interpret

        c = cfg.num_chains
        self.c_pad = ((c + LANES - 1) // LANES) * LANES
        self.p_pad = ((self.spec.w_size + 7) // 8) * 8
        pad8 = lambda n: ((n + 7) // 8) * 8
        n_cls = cfg.topology[2] if self.task_cls else 0
        k_cap = _k_cap(
            self.record_w, self.p_pad,
            pad8(self.data.x_train.shape[0]), pad8(self.data.x_test.shape[0]),
            n_cls, mala=self.mala, hmc=self.hmc,
        )
        self.plan = block_plan(cfg, k_cap=k_cap)
        self.k_max = max(
            ln for seg in self.plan for (_s, ln, _f) in seg
        )
        self.kdata = ps.prep_data(
            self.data.x_train, self.data.y_train,
            self.data.x_test, self.data.y_test,
            n_classes=n_cls,
        )
        samples = cfg.samples_per_chain
        if self.mala:
            self.scal = dict(
                sigma_sq=cfg.sigma_sq, nu_1=cfg.nu_1, nu_2=cfg.nu_2,
                adapt_rate=cfg.adapt_rate,
                mala_target=cfg.mala_target_accept,
                warmstart_step=cfg.warmstart_step,
                precond_power=cfg.precond_power,
                pc_start=int(samples * cfg.precond_start_frac),
                warm_end=int(samples * cfg.warmstart_frac),
                burn_end=int(samples * cfg.burn_in) - 1,
            )
        elif self.hmc:
            self.chees = cfg.hmc_adapt_traj
            self.scal = dict(
                sigma_sq=cfg.sigma_sq, nu_1=cfg.nu_1, nu_2=cfg.nu_2,
                adapt_rate=cfg.adapt_rate,
                hmc_target=cfg.hmc_target_accept,
                warmstart_step=cfg.warmstart_step,
                precond_power=cfg.precond_power,
                pc_start=int(samples * cfg.precond_start_frac),
                warm_end=int(samples * cfg.warmstart_frac),
                burn_end=int(samples * cfg.burn_in) - 1,
                leapfrog=cfg.hmc_leapfrog,
                eps_jitter=cfg.hmc_eps_jitter,
                chees=self.chees,
                chees_rate=cfg.chees_rate,
                n_ladders=cfg.n_ladders,
            )
            if self.chees and self.c_pad > LANES:
                # multi-block ensembles: every 128-lane block holds
                # complete ladders (fused_reason guarantees K | 128 and
                # 128 | num_chains), so the kernel's rung sums pool the
                # block's own 128/K replicas; n_ladders becomes that
                # per-block panel size and one (128, 128) matrix serves
                # every block (rung of lane l within a block = l % K).
                self.scal["n_ladders"] = LANES // cfg.rungs_per_ladder
                self.rung_sum = ps.rung_sum_matrix(
                    LANES, cfg.rungs_per_ladder, LANES
                )
            elif self.chees:
                self.rung_sum = ps.rung_sum_matrix(
                    c, cfg.rungs_per_ladder, self.c_pad
                )
            else:
                self.rung_sum = jnp.zeros((LANES, LANES), jnp.float32)
        else:
            self.scal = dict(
                step_w=cfg.step_w, step_eta=cfg.step_eta,
                sigma_sq=cfg.sigma_sq,
                nu_1=cfg.nu_1, nu_2=cfg.nu_2, adapt=cfg.adapt_step_size,
                adapt_rate=cfg.adapt_rate,
                adapt_target=cfg.adapt_target_accept,
                burn_end=int(samples * cfg.burn_in) - 1,
                task_cls=self.task_cls,
            )
        # (P, 1) mask zeroing proposal noise on padded weight rows
        self.row_mask = (
            jnp.arange(self.p_pad) < self.spec.w_size
        ).astype(jnp.float32)[:, None]
        temps_pad = np.ones((1, self.c_pad), np.float32)
        temps_pad[0, :c] = self.temps_host
        self.temps_pad = jnp.asarray(temps_pad)
        self.switch = cfg.temper_switch_step

    def init_state(self) -> kernel.ChainState:
        return kernel.init_state(self.k_init, self.cfg, self.data, self.spec)

    def _w_trace(self, w_rows: jax.Array) -> jax.Array:
        """(K, C, W) -> the recorded slice (kernel._w_trace semantics)."""
        cfg = self.cfg
        k = cfg.record_w_chains
        if k <= 0:
            return w_rows
        if cfg.n_ladders > 1:
            return w_rows[:, :: cfg.rungs_per_ladder][:, :k]
        return w_rows[:, :k]

    def _call_impl(self, fn, kstate, arrs, start, length, adapttemp):
        """Invoke a block-kernel impl, sharding the chain axis over the
        mesh when one is active.

        ``fn(kstate, *arrs, start, length, data, adapttemp)`` →
        ``(new_state, traces)``. Without a mesh this is a plain call. With
        a 1-D 'chains' mesh, the call runs under ``jax.shard_map``: every
        chain-axis operand/output (last dim = C) is sharded over the mesh
        so each device dispatches the Pallas kernel on its own 128-lane
        chain blocks; the dataset replicates and (start, length) ride an
        SMEM-bound (2,) scalar vector. Per-chain math is device-local by
        construction, so sharded == unsharded bit-for-bit (tested)."""
        if self.mesh is None:
            return fn(kstate, *arrs, start, length, self.kdata, adapttemp)

        # every chain-axis operand (last dim == c_pad) shards; the ChEES
        # per-block (LANES, LANES) rung-sum matrix replicates — its lane
        # coupling is internal to each 128-lane block
        def cs(x):
            if x.ndim >= 1 and x.shape[-1] == self.c_pad:
                return P(*([None] * (x.ndim - 1)), mesh_mod.CHAIN_AXIS)
            return P()
        sl = jnp.stack(
            [jnp.asarray(start, jnp.int32), jnp.asarray(length, jnp.int32)]
        )
        arrs = list(arrs)
        # dataset row counts are STATIC kernel parameters — keep them out
        # of the shard_map operands (they would trace to int32[] scalars)
        d_arr = {k: v for k, v in self.kdata.items() if hasattr(v, "ndim")}
        d_static = {
            k: v for k, v in self.kdata.items() if not hasattr(v, "ndim")
        }

        def local_fn(kst, ar, sl_, darr, at):
            return fn(kst, *ar, sl_[0], sl_[1], {**darr, **d_static}, at)

        in_specs = (
            jax.tree.map(cs, kstate),
            jax.tree.map(cs, arrs),
            P(),
            jax.tree.map(lambda _x: P(), d_arr),
            cs(adapttemp),
        )
        out_struct = jax.eval_shape(
            local_fn, kstate, arrs, sl, d_arr, adapttemp
        )
        out_specs = jax.tree.map(cs, out_struct)
        return jax.shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )(kstate, arrs, sl, d_arr, adapttemp)

    def block_body(self, st: kernel.ChainState, xs):
        """One fused block + boundary swap; scan-compatible."""
        start, length, swap_flag = xs
        cfg = self.cfg
        kb = jax.random.fold_in(self.k_run, start)
        kp, ke, ku, kue, ks = jax.random.split(kb, 5)
        noise_w = (
            jax.random.normal(
                kp, (self.k_max, self.p_pad, self.c_pad), jnp.float32
            )
            * self.row_mask
        )
        noise_eta = jax.random.normal(
            ke, (self.k_max, self.c_pad), jnp.float32
        )
        u = jax.random.uniform(ku, (self.k_max, self.c_pad), jnp.float32)
        adapttemp = jnp.where(start < self.switch, self.temps_pad, 1.0)
        kstate = _to_kernel_state(
            st, self.p_pad, self.c_pad, cfg.adapt_step_size, mala=self.mala,
            hmc=self.hmc, task_cls=self.task_cls,
        )
        kw = dict(record_w=self.record_w, interpret=self.interpret)
        if self.mala and self.task_cls:
            fn = lambda kst, nw, um, s, ln, d, at: (
                ps.fused_mala_cls_block_impl(
                    kst, nw, um, s, ln, d, at, cfg.topology, self.scal, **kw
                )
            )
            ksd, traces = self._call_impl(
                fn, kstate, (noise_w, u), start, length, adapttemp
            )
        elif self.mala:
            u_eta = jax.random.uniform(
                kue, (self.k_max, self.c_pad), jnp.float32
            )
            fn = lambda kst, nw, ne, um, ue, s, ln, d, at: (
                ps.fused_mala_block_impl(
                    kst, nw, ne, um, ue, s, ln, d, at, cfg.topology,
                    self.scal, **kw
                )
            )
            ksd, traces = self._call_impl(
                fn, kstate, (noise_w, noise_eta, u, u_eta), start, length,
                adapttemp,
            )
            traces["acc_train"] = jnp.zeros_like(traces["ll"])
            traces["acc_test"] = jnp.zeros_like(traces["ll"])
        elif self.hmc:
            kj = jax.random.fold_in(kb, 101)
            u_jit = jax.random.uniform(
                kj, (self.k_max, self.c_pad), jnp.float32
            )
            # state-independent van-der-Corput trajectory jitter, one
            # scalar per absolute step index, replicated over lanes
            u_traj = jnp.broadcast_to(
                kernel.vdc_u(start + jnp.arange(self.k_max, dtype=jnp.int32))[
                    :, None
                ],
                (self.k_max, self.c_pad),
            )
            if self.task_cls:
                # classification HMC: no eta machinery (the multinomial
                # likelihood has no noise parameter)
                fn = lambda kst, nw, um, uj, ut, rs, s, ln, d, at: (
                    ps.fused_hmc_cls_block_impl(
                        kst, nw, um, uj, ut, rs, s, ln, d, at,
                        cfg.topology, self.scal, **kw
                    )
                )
                ksd, traces = self._call_impl(
                    fn, kstate,
                    (noise_w, u, u_jit, u_traj, self.rung_sum),
                    start, length, adapttemp,
                )
            else:
                u_eta = jax.random.uniform(
                    kue, (self.k_max, self.c_pad), jnp.float32
                )
                fn = lambda kst, nw, ne, um, ue, uj, ut, rs, s, ln, d, at: (
                    ps.fused_hmc_block_impl(
                        kst, nw, ne, um, ue, uj, ut, rs, s, ln, d, at,
                        cfg.topology, self.scal, **kw
                    )
                )
                ksd, traces = self._call_impl(
                    fn, kstate,
                    (noise_w, noise_eta, u, u_eta, u_jit, u_traj,
                     self.rung_sum),
                    start, length, adapttemp,
                )
                traces["acc_train"] = jnp.zeros_like(traces["ll"])
                traces["acc_test"] = jnp.zeros_like(traces["ll"])
        else:
            fn = lambda kst, nw, ne, um, s, ln, d, at: (
                ps.fused_rw_block_impl(
                    kst, nw, ne, um, s, ln, d, at, cfg.topology, self.scal,
                    **kw
                )
            )
            ksd, traces = self._call_impl(
                fn, kstate, (noise_w, noise_eta, u), start, length, adapttemp
            )
        st2 = _from_kernel_state(
            st, ksd, cfg.adapt_step_size, mala=self.mala, hmc=self.hmc,
            task_cls=self.task_cls,
        )
        i_swap = start + length - 1
        st3 = jax.lax.cond(
            swap_flag,
            lambda s: self.step.do_swap(s, i_swap, ks),
            lambda s: s,
            st2,
        )
        c = cfg.num_chains
        out = {
            "ll": traces["ll"][:, :c],
            "rmse_train": traces["rmse_train"][:, :c],
            "rmse_test": traces["rmse_test"][:, :c],
            "acc_train": traces["acc_train"][:, :c],
            "acc_test": traces["acc_test"][:, :c],
            "accept_count": traces["accept_count"][:, :c],
        }
        if self.hmc and self.chees:
            out["traj_len"] = traces["traj_len"][:, :c]
        if self.record_w:
            w_rows = jnp.transpose(traces["w"], (0, 2, 1))[
                :, :c, : self.spec.w_size
            ]
            out["w"] = self._w_trace(w_rows)
        if cfg.track_replicas:
            reps = jnp.broadcast_to(
                st.replica_id, (self.k_max, c)
            )
            # the swap-boundary step records the POST-swap identities
            reps = jax.lax.dynamic_update_slice(
                reps, st3.replica_id[None, :], (length - 1, 0)
            )
            out["replica"] = reps
        return st3, out


def _pack_xs(blocks: List[Tuple[int, int, bool]]):
    starts = jnp.asarray([b[0] for b in blocks], jnp.int32)
    lengths = jnp.asarray([b[1] for b in blocks], jnp.int32)
    flags = jnp.asarray([b[2] for b in blocks], bool)
    return (starts, lengths, flags)


def sample_fused(
    cfg: PTConfig,
    train: np.ndarray,
    test: np.ndarray,
    seed: int = 0,
    mesh=None,
    init_state=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 4,
    model_spec=None,
):
    """Fused-block analogue of sampler.sample (trace-compatible)."""
    from ptnn import sampler as sampler_mod

    cfg.validate()
    if checkpoint_path is not None:
        raise ValueError(
            "fused_step does not checkpoint (chunk boundaries are "
            "swap-aligned, not step-aligned); run with fused_step=False "
            "for checkpointed runs"
        )
    eng = _Fused(cfg, train, test, seed, model_spec, record_w=True,
                 mesh=mesh)
    jit_here = jax.jit if mesh is not None else fast_jit
    state = init_state if init_state is not None else jit_here(
        eng.init_state
    )()
    if mesh is not None:
        state = mesh_mod.shard_chain_tree(state, mesh)

    # group each segment's blocks into fixed-size scan chunks (dummy blocks
    # of length 0 pad the tail so every chunk shares one compiled scan)
    group = max(1, int(np.ceil(cfg.chunk_steps / eng.k_max)))
    thin = cfg.record_thin

    def run_group(st, xs):
        return jax.lax.scan(eng.block_body, st, xs)

    def run_group_gather(st, xs, keep):
        """record_thin < block length: stride the chunk's executed-step
        rows at positions thin-1, 2*thin-1, ... via one device gather of
        the scanned traces before the host fetch. ``keep`` holds the
        (block*k_max + local) flat indices of the kept rows (dead
        padding rows are never selected)."""
        st, traces = jax.lax.scan(eng.block_body, st, xs)
        traces = {
            k: v.reshape((-1,) + v.shape[2:])[keep]
            for k, v in traces.items()
        }
        return st, traces

    def run_group_sparse(st, xs, posdest, bufs):
        """record_thin >= block length: each block keeps AT MOST ONE row,
        written into a small carried buffer with a conditional
        dynamic_update_slice (TPU scatter is slow; a cond that is false
        on ~(1 - k_max/thin) of blocks costs ~nothing) — a long chunk
        (the whole point of record_thin) never materializes its full
        traces in HBM. ``posdest`` is (n_blocks, 2) int32
        [local_row, buffer_row], buffer_row = -1 when the block keeps
        nothing."""

        def body(carry, x):
            st, bufs = carry
            blk_xs, pd = x
            st, out = eng.block_body(st, blk_xs)

            def write(b):
                return {
                    k: jax.lax.dynamic_update_slice(
                        b[k],
                        jax.lax.dynamic_slice_in_dim(out[k], pd[0], 1, 0),
                        (pd[1],) + (0,) * (b[k].ndim - 1),
                    )
                    for k in b
                }

            bufs = jax.lax.cond(pd[1] >= 0, write, lambda b: b, bufs)
            return (st, bufs), None

        (st, bufs), _ = jax.lax.scan(body, (st, bufs), (xs, posdest))
        return st, bufs

    run_group_j = jit_here(run_group)
    run_group_gather_j = jit_here(run_group_gather)
    run_group_sparse_j = jit_here(run_group_sparse)
    recompute = jit_here(eng.step.recompute_ll)

    def _keep_flat(blocks) -> np.ndarray:
        """Flat (block*k_max + local) indices of kept rows."""
        flat = [
            bi * eng.k_max + p
            for bi, (_s, ln, _f) in enumerate(blocks)
            for p in range(ln)
        ]
        return np.asarray(flat[thin - 1 :: thin], np.int32)

    def _posdest(blocks) -> Tuple[np.ndarray, int]:
        """(n_blocks, 2) [local_row, buffer_row] (-1 = keep nothing) +
        kept count; valid when thin >= k_max (<= 1 kept row/block)."""
        pd = np.full((len(blocks), 2), -1, np.int32)
        q = 0
        for bi, (_s, ln, _f) in enumerate(blocks):
            for p in range(ln):
                if q % thin == thin - 1:
                    pd[bi] = (p, q // thin)
                q += 1
        return pd, q // thin

    out_struct = None
    if thin > 1:  # trace block_body once for the buffer shapes
        out_struct = jax.eval_shape(
            lambda s: eng.block_body(s, (
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                jnp.asarray(False),
            ))[1],
            state,
        )

    def _trace_bufs(n_rows: int):
        """Zero buffers shaped like one chunk's kept trace rows."""
        return {
            k: jnp.zeros((max(n_rows, 1),) + v.shape[1:], v.dtype)
            for k, v in out_struct.items()
        }

    host_chunks: List[Dict[str, np.ndarray]] = []
    pending = None  # (device traces, lengths) fetched lazily
    t0 = time.perf_counter()
    for si, seg in enumerate(eng.plan):
        if si > 0:
            state = recompute(state)
        for gi in range(0, len(seg), group):
            blocks = seg[gi : gi + group]
            lengths = [b[1] for b in blocks]
            while len(blocks) < group:
                blocks = blocks + [(0, 0, False)]
            if thin > 1 and thin >= eng.k_max:
                pd, n_keep = _posdest(blocks)
                state, traces = run_group_sparse_j(
                    state, _pack_xs(blocks), jnp.asarray(pd),
                    _trace_bufs(n_keep),
                )
                # rows already selected: fetch cuts to the kept count
                lengths = [n_keep]
                traces = {k: v[None] for k, v in traces.items()}
            elif thin > 1:
                keep = _keep_flat(blocks)
                state, traces = run_group_gather_j(
                    state, _pack_xs(blocks), jnp.asarray(keep)
                )
                lengths = [len(keep)]
                traces = {k: v[None] for k, v in traces.items()}
            else:
                state, traces = run_group_j(state, _pack_xs(blocks))
            if pending is not None:
                host_chunks.append(_fetch(*pending))
            pending = (traces, lengths)
    if pending is not None:
        host_chunks.append(_fetch(*pending))
    state = jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    merged: Dict[str, np.ndarray] = {}
    for name in host_chunks[0]:
        arr = np.concatenate([c[name] for c in host_chunks], axis=0)
        if name == "w":
            row0 = np.ones((1,) + arr.shape[1:], arr.dtype)
        elif name == "ll":
            row0 = np.full((1,) + arr.shape[1:], -100.0, arr.dtype)
        elif name == "replica":
            row0 = np.arange(arr.shape[1], dtype=arr.dtype)[None, :]
        else:
            row0 = np.zeros((1,) + arr.shape[1:], arr.dtype)
        merged[name] = np.concatenate([row0, arr], axis=0)

    samples = cfg.samples_per_chain
    n_acc = np.asarray(state.n_accept)
    n_sw_prop = int(state.n_swap_proposed)
    pair_sum = np.asarray(state.pair_accept_sum)[:-1]
    pair_cnt = np.asarray(state.pair_prop_count)[:-1]
    return sampler_mod.SampleResult(
        traces=merged,
        final_state=jax.device_get(state),
        temperatures=np.asarray(eng.temps_host),
        accept_ratio_per_chain=n_acc * 100.0 / samples,
        swap_percent=(
            100.0 * int(state.n_swap_accepted) / n_sw_prop if n_sw_prop else 0.0
        ),
        langevin_ratio_per_chain=np.zeros((cfg.num_chains,)),
        elapsed_s=elapsed,
        chain_steps_per_sec=cfg.n_steps * cfg.num_chains / elapsed,
        config=cfg,
        pair_swap_accept=pair_sum / np.maximum(pair_cnt, 1),
    )


def _fetch(traces, lengths) -> Dict[str, np.ndarray]:
    """Device (B, K_max, ...) traces -> host rows, dummy/masked rows cut.

    A chunk can legitimately keep ZERO rows (record_thin larger than the
    chunk's executed-step count, e.g. a short segment tail) — it still
    contributes an empty block so the cross-chunk concatenate stays
    shape-consistent."""
    host = jax.device_get(traces)
    out = {}
    for name, arr in host.items():
        rows = [arr[b, :ln] for b, ln in enumerate(lengths) if ln > 0]
        out[name] = (
            np.concatenate(rows, axis=0)
            if rows
            else np.zeros((0,) + arr.shape[2:], arr.dtype)
        )
    return out


def throughput_build_fused(
    cfg: PTConfig, train, test, seed: int = 0, mesh=None, model_spec=None
):
    """Fused-block analogue of sampler._throughput_build (bench protocol:
    compile+warmup once, every call is one timed rep)."""
    import dataclasses as _dc

    cfg2 = _dc.replace(cfg, record_w=False).validate()
    eng = _Fused(cfg2, train, test, seed, model_spec, record_w=False,
                 mesh=mesh)

    seg_xs = [_pack_xs(seg) for seg in eng.plan]

    def run(st):
        summaries = []
        for si, xs in enumerate(seg_xs):
            if si > 0:
                st = eng.step.recompute_ll(st)
            st, traces = jax.lax.scan(eng.block_body, st, xs)
            # keep recording live (bench measures the real sampler)
            summaries.append({k: jnp.mean(v) for k, v in traces.items()})
        return st, summaries

    jit_here = jax.jit if mesh is not None else fast_jit
    run_j = jit_here(run)
    state0 = jit_here(eng.init_state)()
    if mesh is not None:
        state0 = mesh_mod.shard_chain_tree(state0, mesh)
    st, _ = run_j(state0)
    jax.block_until_ready(st)

    def one_rep() -> Dict[str, float]:
        t0 = time.perf_counter()
        st, summaries = run_j(state0)
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
