"""Headline benchmark: chain-steps/sec AND ESS/sec on the Sunspot PT config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference's 10-process CPU run aggregates ~370 chain-steps/sec
on the regression suite (BASELINE.md "Throughput": ~35-45 steps/s/chain x 10
chains, Res_RW master_result_file.txt). Here the whole 64-chain temperature
ladder is one fused XLA scan on a single TPU chip.

Measurement protocol (the tunneled single-chip backend has ±30-40% run-to-run
variance, so single-shot numbers are meaningless):

* throughput: every variant is compiled once, then the reps are INTERLEAVED
  across variants (rep 1 of each, rep 2 of each, ...); the JSON reports the
  per-variant median and IQR over >=3 reps.
* ESS/sec: ESS-per-draw over the post-burn-in cold-chain parameter draws
  (ops/ess.multi_ess) from 3 seeded trace runs, each converted to ESS/sec
  with the variant's median steady-state step rate; reported as the
  median + IQR over seeds. RMSE follows the committed table's semantics —
  the reference pools post-burn-in rows across ALL chains
  (pt_timeseries_regression.py show_results), so the quality figure is the
  pooled mean of the rmse_test trace, median over seeds; the cold chain's
  own posterior mean is reported alongside.

Variants (canonical names — COVERAGE/README cite this file's output):
  * rw          — the reference's headline random-walk mode, reference swap
                  machinery (bubbling sweep every 100 steps)
  * rw_fused    — the SAME sampler, executed as fused Pallas blocks
                  (PTConfig.fused_step: each inter-swap interval is ONE
                  kernel invocation with chain state resident in VMEM, so
                  the per-step dispatch floor amortizes over the interval;
                  ptnn/fused.py). Statistically the same chain (tested);
                  RNG stream differs, so its quality figures are an
                  independent draw, not a paired comparison.
  * rw_adaptive — RETIRED in r4: per-chain Robbins-Monro acceptance
                  targeting shrinks the cold step at every target and
                  halves cold ESS on the d=61 ladder
                  (results/rw_adaptive.md)
  * lg_pallas   — reference Langevin proposals via the Pallas drift kernel
                  (opt-in via --full: its compile+run time pushes the default
                  bench past the tunneled backend's comfort zone)
  * mala        — preconditioned MALA (fused value_and_grad proposals,
                  Welford diagonal M, warm start) with even/odd (DEO) swaps
                  every 10 steps
                  (PTConfig.proposal="precond_mala", swap_style="even_odd")
  * hmc         — preconditioned HMC-within-PT: 8-leapfrog trajectories on
                  the tempered-posterior Hamiltonian, same Welford M as mass
                  matrix, exact energy-difference MH, DEO swaps
                  (PTConfig.proposal="hmc")
  * mala_16x4   — the ESS/s flagship: mala on a REPLICATED tempering
                  ensemble (PTConfig.n_ladders=16 — sixteen independent
                  4-rung ladders in the same 64-chain budget; swap pairs
                  never cross ladder boundaries). Sixteen independent cold
                  chains whose ESS adds (ops/ess.pooled_multi_ess); chains
                  are latency-free on a chip, so this is pure quality-per-
                  second gain (results/ladder_ensembles.md: 19x the 1x64
                  ladder at equal RMSE and equal steps/s)
  * mala_fused_16x4 — mala_16x4 executed as fused Pallas blocks (the MALA
                  block kernel of ops/pallas_step.py: hand-written plane
                  backprop, exact q-ratio, Welford + RM adaptation all
                  in-kernel; one invocation per 10-step DEO interval).
                  Same sampler as mala_16x4 (oracle-pinned), ~1.5x its
                  steps/s -> the ESS/s flagship when it wins. Heavy
                  one-time Mosaic compile (~minutes on the tunnel).
  * chees16_16x4 — the QUALITY flagship: ChEES-adapted HMC
                  (hmc_adapt_traj, trajectory bound 16, realized mean
                  L~7 chosen by the cross-replica criterion — no hand
                  tuning) on 16 replicated 4-rung ladders. Beats every
                  fixed-L variant measured on BOTH axes at once
                  (results/chees_study.md: RMSE 0.0103 at 6,230 pooled
                  cold ESS/s)
  * chees16_fused_16x4 — chees16_16x4 executed as fused Pallas blocks
                  (the HMC block kernel of ops/pallas_step.py: leapfrog
                  trajectories — dynamic trip count, so the block only pays
                  the max-over-lanes realized ChEES length per step —
                  kinetic-energy MH, in-kernel ChEES rung-sum adaptation;
                  one invocation per 10-step DEO interval). Same sampler
                  (oracle-pinned). Heavy one-time Mosaic compile.
  * chees16_fused_64x4 — the same fused ChEES-HMC sampler on 64
                  replicated 4-rung ladders (256 chains = two full
                  128-lane kernel blocks, each holding 32 complete ladders
                  with per-block rung-sum adaptation). Full lanes ~double
                  total steps/s over the half-empty 64-chain block and 64
                  independent cold chains pool ESS.
  * chees16_fused_256x4 — THE FLAGSHIP: the chip-saturating 1024-chain
                  ensemble (8 lane blocks x 32 ladders; total steps/s
                  saturates ~3.4M as grid blocks serialize on the single
                  TensorCore) — ~46k pooled cold ESS/s at cold RMSE
                  ~0.0102; wins the quality-gated selection on both axes
                  at once (results/ensemble_scaling_fused.md).

Flagship selection: highest pooled cold ESS/s SUBJECT TO cold-posterior
RMSE <= the reference quality bar — committed Sunspot RW test RMSE 0.0239
(multicore-pt-regression/Res_RW/master_result_file.txt:2). Variants that
mix fast around a worse posterior (see results/mala_basins.md) are listed
but cannot win.

The JSON additionally carries a ``classification`` section (r5): the
reference's second workload family (iris + Ionosphere) under the same
quality-gated treatment — see ``classification_arm`` for the variant
set, the served-accuracy gate, and the Ionosphere compute-bound
fallback. r5 snapshot: results/cls_bench_r5.json (iris flagship
chees16_fused_16x4, 1725 pooled cold ESS/s at served 97.78 vs committed
96.76; Ionosphere honestly null at the bench budget). ``--no-cls``
skips it for regression-only iteration.

``--scaling`` runs the chain-count scaling curve instead (64..4096 FNN
chains + digits-CNN points) and writes results/scaling.md.
"""

from __future__ import annotations

import dataclasses
import json
import sys

sys.path.insert(0, ".")


def _median_iqr(xs):
    import numpy as np

    xs = np.asarray(xs, float)
    return (
        float(np.median(xs)),
        [float(np.percentile(xs, 25)), float(np.percentile(xs, 75))],
    )


def pick_flagship(ess_per_sec, quality, gate, higher_is_better=False):
    """THE flagship: highest pooled cold ESS/s among variants whose
    cold-posterior quality passes the gate (None if none pass).

    BASELINE.json's "at matched posterior quality" clause as a hard
    constraint: raw within-mode ESS/s rewards mixing fast around the
    wrong posterior (results/mala_basins.md), so throughput alone cannot
    win. ``higher_is_better=False`` gates quality <= gate (RMSE);
    ``True`` gates quality >= gate (accuracy — the classification arm).
    Unit-tested in tests/test_components.py."""
    if higher_is_better:
        eligible = [t for t in ess_per_sec if quality[t] >= gate]
    else:
        eligible = [t for t in ess_per_sec if quality[t] <= gate]
    if not eligible:
        return None
    return max(eligible, key=lambda t: ess_per_sec[t]["value"])


def _variants(chains: int, steps_per_chain: int, full: bool = False):
    import ptnn

    cfg = ptnn.PTConfig(
        task="regression",
        topology=(4, 10, 1),
        num_samples=chains * steps_per_chain,
        num_chains=chains,
        maxtemp=5.0,
        swap_interval=100,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,  # RW: the reference's headline mode
        record_w=False,
    ).validate()
    out = {
        "rw": cfg,
        "rw_fused": dataclasses.replace(cfg, fused_step=True).validate(),
        # rw_adaptive retired (r4): Robbins-Monro acceptance targeting
        # shrinks the cold step at every target and halves cold ESS on the
        # d=61 ladder — results/rw_adaptive.md has the sweep and mechanism
        "mala": dataclasses.replace(
            cfg,
            proposal="precond_mala",
            adapt_rate=0.1,
            swap_style="even_odd",
            swap_interval=10,
            warmstart_frac=0.1,
            precond_start_frac=0.3,
        ).validate(),
        "hmc": dataclasses.replace(
            cfg,
            proposal="hmc",
            hmc_leapfrog=8,
            adapt_rate=0.1,
            swap_style="even_odd",
            swap_interval=10,
            warmstart_frac=0.1,
            precond_start_frac=0.3,
            step_w=0.01,
        ).validate(),
        "mala_16x4": dataclasses.replace(
            cfg,
            proposal="precond_mala",
            n_ladders=16,
            adapt_rate=0.1,
            swap_style="even_odd",
            swap_interval=10,
            warmstart_frac=0.1,
            precond_start_frac=0.3,
        ).validate(),
        "mala_fused_16x4": dataclasses.replace(
            cfg,
            proposal="precond_mala",
            n_ladders=16,
            adapt_rate=0.1,
            swap_style="even_odd",
            swap_interval=10,
            warmstart_frac=0.1,
            precond_start_frac=0.3,
            fused_step=True,
        ).validate(),
        "chees16_16x4": dataclasses.replace(
            cfg,
            proposal="hmc",
            hmc_leapfrog=16,
            hmc_adapt_traj=True,
            n_ladders=16,
            adapt_rate=0.1,
            swap_style="even_odd",
            swap_interval=10,
            warmstart_frac=0.1,
            precond_start_frac=0.3,
            step_w=0.01,
        ).validate(),
        "chees16_fused_16x4": dataclasses.replace(
            cfg,
            proposal="hmc",
            hmc_leapfrog=16,
            hmc_adapt_traj=True,
            n_ladders=16,
            adapt_rate=0.1,
            swap_style="even_odd",
            swap_interval=10,
            warmstart_frac=0.1,
            precond_start_frac=0.3,
            step_w=0.01,
            fused_step=True,
        ).validate(),
        # the r4 flagship: the same fused ChEES-HMC sampler on 64 replicated
        # 4-rung ladders (256 chains = 2 full 128-lane kernel blocks, each
        # holding 32 complete ladders; per-block rung-sum adaptation).
        # Filling the lanes doubles total steps/s over the half-block
        # 64-chain config, and 64 independent cold chains pool ESS
        "chees16_fused_64x4": dataclasses.replace(
            cfg,
            proposal="hmc",
            hmc_leapfrog=16,
            hmc_adapt_traj=True,
            n_ladders=64,
            num_chains=256,
            num_samples=256 * steps_per_chain,
            adapt_rate=0.1,
            swap_style="even_odd",
            swap_interval=10,
            warmstart_frac=0.1,
            precond_start_frac=0.3,
            step_w=0.01,
            fused_step=True,
        ).validate(),
        # chip-saturating flagship: 1024 chains = 8 full lane blocks of 32
        # ladders each. Blocks serialize on the single TensorCore, so total
        # steps/s saturates (~3.4M) and pooled ESS/s gains taper: 41.7k
        # (256 chains) -> ~46k here (results/ensemble_scaling_fused.md)
        "chees16_fused_256x4": dataclasses.replace(
            cfg,
            proposal="hmc",
            hmc_leapfrog=16,
            hmc_adapt_traj=True,
            n_ladders=256,
            num_chains=1024,
            num_samples=1024 * steps_per_chain,
            adapt_rate=0.1,
            swap_style="even_odd",
            swap_interval=10,
            warmstart_frac=0.1,
            precond_start_frac=0.3,
            step_w=0.01,
            fused_step=True,
        ).validate(),
    }
    if full:
        out["lg_pallas"] = dataclasses.replace(
            cfg, use_langevin_gradients=True, drift_mode="pallas"
        ).validate()
    return out


CLS_GATE = {
    # committed LG classification test means — the reference's second
    # workload family (BASELINE.json config 2; iris + Ionosphere,
    # multicore-pt-classification/PT_EvalSwapLG/master_result_file.txt:1-2)
    "iris": 96.76,
    "Ionosphere": 92.19,
}


def _cls_variants(topology, steps_per_chain):
    import ptnn

    def mk(chains, n_ladders, proposal, chees):
        cfg = ptnn.classification_preset(
            topology,
            num_samples=chains * steps_per_chain,
            num_chains=chains,
            maxtemp=5.0,
        )
        extra = (
            dict(hmc_leapfrog=16, hmc_adapt_traj=True, step_w=0.01)
            if chees
            else {}
        )
        return dataclasses.replace(
            cfg,
            proposal=proposal,
            n_ladders=n_ladders,
            adapt_rate=0.1,
            swap_style="even_odd",
            swap_interval=10,
            swap_rule="metropolis",
            swap_payload="untempered",
            warmstart_frac=0.1,
            precond_start_frac=0.3,
            record_w=True,
            record_w_chains=n_ladders,
            track_replicas=True,
            chunk_steps=1000,
            fused_step=True,
            **extra,
        ).validate()

    return {
        "chees16_fused_16x4": mk(64, 16, "hmc", True),
        "chees16_fused_64x4": mk(256, 64, "hmc", True),
        "mala_fused_16x4": mk(64, 16, "precond_mala", False),
    }


def classification_arm(notes) -> dict:
    """Quality-gated classification bench — the treatment the regression
    arm gets, on the reference's second workload family (BASELINE config
    2: iris + Ionosphere Langevin classification,
    multicore-pt-classification/pt_classification.py:899-1224).

    Per dataset: fused ChEES / MALA replicated-ladder ensembles, 3 seeded
    8000-step runs each; pooled cold ESS/s (ESS over the recorded cold-w
    draws x the run's own median chain-steps/s — the recording run's rate,
    slightly conservative vs a record-free runner), the function-space
    cross-seed R-hat over ALL class outputs, and round trips.

    Quality gate: the COLD-POOLED POSTERIOR-PREDICTIVE test accuracy
    (accuracy of the posterior-mean class probabilities over the pooled
    cold draws — what ptnn.predict serves) >= the committed LG mean.
    The per-draw accuracy trace mean is reported alongside but is NOT the
    gate: the committed LG rows come from the legacy always-accept noisy
    SGD (PARITY.md "classification Langevin"), so per-draw accuracy
    compares an optimizer's iterates against a posterior's draws — a
    correct sampler's served predictor is its quality surface
    (results/auto_study.md: iris per-draw 88.3 vs served 97.78)."""
    import numpy as np

    import ptnn
    from ptnn import predict as predict_mod
    from ptnn.data import load_classification
    from ptnn.ops import ess as ess_mod
    from ptnn.ops import roundtrip as rt_mod

    from ptnn import fused as fused_mod

    out = {}
    for name, gate in CLS_GATE.items():
        prob = load_classification(name, seed=0)
        variants = _cls_variants(prob.topology, steps_per_chain=8000)
        # Compute-bound nets (Ionosphere's w_size 1852 exceeds the fused
        # VMEM gate) fall back to the per-step sampler, where the L=16
        # ChEES leapfrog scan is a multi-minute XLA compile per chunk
        # length (and has crashed the tunneled remote compiler) — exactly
        # the regime where fused amortization doesn't pay anyway. Bench
        # those datasets on the per-step precond-MALA ensemble family
        # (1-step proposals, small programs) and say so.
        blocked = [
            t for t, v in variants.items()
            if v.proposal == "hmc"
            and fused_mod.runtime_reason(v, prob.train, prob.test)
            is not None
        ]
        if blocked:
            for t in blocked:
                variants.pop(t)
            v16 = variants.pop("mala_fused_16x4", None)
            if v16 is not None:  # honest name: this runs per-step
                variants["mala_16x4"] = v16
            variants["mala_64x4"] = dataclasses.replace(
                variants["mala_16x4"],
                n_ladders=64,
                num_chains=256,
                num_samples=256 * 8000,
                record_w_chains=64,
            ).validate()
            notes.append(
                f"cls/{name}: fused VMEM gate rejects this net "
                f"(w_size {prob.topology[0] * prob.topology[1] + prob.topology[1] * prob.topology[2] + prob.topology[1] + prob.topology[2]}) "
                "-> per-step precond-MALA ensemble family"
            )
        ess_per_sec, acc_post, acc_draw, rhat, trips_med = {}, {}, {}, {}, {}
        for tag, vcfg in variants.items():
            cold_idx = np.arange(
                0, vcfg.num_chains, vcfg.rungs_per_ladder
            )
            colds, ess_s, a_post, a_draw, sps, trips = [], [], [], [], [], []
            try:
                for seed in (1, 2, 3):
                    res = ptnn.sample(
                        vcfg, prob.train, prob.test, seed=seed
                    )
                    sps.append(res.chain_steps_per_sec)
                    trips.append(
                        rt_mod.roundtrip_stats(
                            res.traces["replica"], n_ladders=vcfg.n_ladders
                        ).rate_per_kstep
                    )
                    b = vcfg.samples_per_chain // 2
                    cold = np.asarray(res.traces["w"][b:, :, :])
                    colds.append(cold)
                    a_draw.append(
                        float(
                            np.mean(res.traces["acc_test"][b:, cold_idx])
                        )
                    )
                    # served quality: accuracy of the posterior-mean
                    # class probabilities over the pooled cold draws
                    # (ptnn.predict semantics), ~2000-draw subsample
                    pool = cold.reshape(-1, cold.shape[-1])
                    pool = pool[:: max(1, pool.shape[0] // 2000)]
                    nx = vcfg.topology[0]
                    pred = predict_mod.posterior_predict(
                        vcfg, pool, prob.test[:, :nx]
                    )
                    y = prob.test[:, nx].astype(np.int64)
                    a_post.append(
                        float(np.mean(pred["label"] == y)) * 100.0
                    )
            except Exception as e:  # the official record must survive a
                # wedged tunnel / remote-compile failure on one variant
                notes.append(
                    f"cls/{name}/{tag}: FAILED "
                    f"({type(e).__name__}: {e})"
                )
                print("# " + notes[-1], file=sys.stderr, flush=True)
                continue
            sps_med = float(np.median(sps))
            for cold in colds:
                e = ess_mod.pooled_multi_ess(cold, max_params=16)
                ess_s.append(
                    (e / cold.shape[0]) * (sps_med / vcfg.num_chains)
                )
            e_med, e_iqr = _median_iqr(ess_s)
            ess_per_sec[tag] = {
                "value": round(e_med, 1),
                "iqr": [round(x, 1) for x in e_iqr],
            }
            acc_post[tag] = round(float(np.median(a_post)), 2)
            acc_draw[tag] = round(float(np.median(a_draw)), 2)
            rhat[tag] = round(
                float(
                    ess_mod.function_space_rhat(colds, prob.test, vcfg)
                ),
                3,
            )
            trips_med[tag] = round(float(np.median(trips)), 2)
            notes.append(
                f"cls/{name}/{tag}: {sps_med:,.0f} steps/s, "
                f"{e_med:.0f} ESS/s (IQR {e_iqr[0]:.0f}-{e_iqr[1]:.0f}), "
                f"acc(mean probs) {acc_post[tag]}, draw-mean "
                f"{acc_draw[tag]}, rhat {rhat[tag]}, "
                f"roundtrips/1k {trips_med[tag]}"
            )
            print("# " + notes[-1], file=sys.stderr, flush=True)
        out[name] = {
            "ess_per_sec": ess_per_sec,
            "acc_test_cold_posterior": acc_post,
            "acc_test_cold_draw_mean": acc_draw,
            "rhat_cold_max": rhat,
            "roundtrips_per_kstep": trips_med,
            "ref_acc_test": gate,
            "flagship": pick_flagship(
                ess_per_sec, acc_post, gate, higher_is_better=True
            ),
            "flagship_gate": {
                "acc_cold_posterior_min": gate,
                "basis": "ref committed LG test mean "
                "(PT_EvalSwapLG/master_result_file.txt)",
            },
        }
    return out


def main() -> None:
    import numpy as np

    import ptnn
    from ptnn.data import load_regression
    from ptnn.ops import ess as ess_mod
    from ptnn.ops import roundtrip as rt_mod

    prob = load_regression("Sunspot")
    chains = 64
    variants = _variants(
        chains, steps_per_chain=5000, full="--full" in sys.argv[1:]
    )

    # compile all runners, then interleave the timed reps
    runners = {
        tag: ptnn.throughput_runner(vcfg, prob.train, prob.test, seed=0)
        for tag, vcfg in variants.items()
    }
    reps = {tag: [] for tag in variants}
    last = {}
    for _ in range(3):
        for tag, runner in runners.items():
            st = runner()
            reps[tag].append(st["chain_steps_per_sec"])
            last[tag] = st

    ess_per_sec = {}
    quality = {}
    quality_cold = {}
    rhat_cold = {}
    roundtrips = {}
    notes = []
    for tag, vcfg in variants.items():
        sps_med, sps_iqr = _median_iqr(reps[tag])
        # cold set: chain 0, or every ladder's T=1 rung under replicated
        # ladders (pooled — R independent cold chains, ESS adds). Only the
        # cold chains' w rows are recorded (record_w_chains: the fused and
        # per-step paths share the cold-chains-first trace convention) —
        # the full-chain w trace at 256 chains is a multi-100MB tunnel
        # fetch for rows the ESS never reads
        n_cold = (
            vcfg.num_chains // vcfg.rungs_per_ladder
            if vcfg.n_ladders > 1
            else 1
        )
        ess_cfg = dataclasses.replace(
            vcfg,
            # 8000 steps/chain: at ~2M chain-steps/s the device time is
            # trivial; the longer run un-starves the cold chain's posterior
            # mean (4000-step runs read ~0.025 RMSE from pure draw noise)
            # and doubles the draws behind each ESS estimate
            num_samples=vcfg.num_chains * 8000,
            record_w=True,
            record_w_chains=n_cold,
            track_replicas=True,  # transport metric rides the same runs
            chunk_steps=1000,
        ).validate()
        cold_idx = np.arange(0, ess_cfg.num_chains, ess_cfg.rungs_per_ladder)
        ess_s_seeds, rmse_seeds, rmse_cold_seeds, ess_draws = [], [], [], []
        cold_seeds, trip_rates = [], []
        draws = 0
        for seed in (1, 2, 3):
            res = ptnn.sample(ess_cfg, prob.train, prob.test, seed=seed)
            trip_rates.append(
                rt_mod.roundtrip_stats(
                    res.traces["replica"], n_ladders=ess_cfg.n_ladders
                ).rate_per_kstep
            )
            b = ess_cfg.samples_per_chain // 2
            cold = np.asarray(res.traces["w"][b:, :, :])  # recorded = cold
            cold_seeds.append(cold)
            draws = cold.shape[0]
            e = ess_mod.pooled_multi_ess(cold, max_params=16)
            ess_draws.append(e)
            ess_s_seeds.append((e / draws) * (sps_med / vcfg.num_chains))
            # reference table semantics: post-burn-in rows pooled over all
            # chains (show_results drops 50% then averages everything)
            rmse_seeds.append(
                float(np.mean(res.traces["rmse_test"][b:, :]))
            )
            rmse_cold_seeds.append(
                float(np.mean(res.traces["rmse_test"][b:, cold_idx]))
            )
        e_med, e_iqr = _median_iqr(ess_s_seeds)
        ess_per_sec[tag] = {
            "value": round(e_med, 1),
            "iqr": [round(x, 1) for x in e_iqr],
        }
        # cross-seed convergence gate, FUNCTION-SPACE and pooled (r4): the
        # 3 seed runs are 3 chains of the same served cold posterior —
        # worst rank-normalized split R-hat of the posterior predictions
        # at 16 test inputs, all cold replicas pooled per seed (w-space
        # R-hat conflates weight symmetry with predictive disagreement,
        # results/convergence_definitive.md; ops/ess.function_space_rhat)
        rhat_cold[tag] = round(
            float(
                ess_mod.function_space_rhat(cold_seeds, prob.test, ess_cfg)
            ),
            3,
        )
        # replica round trips per 1k steps (ops/roundtrip.py): actual
        # cold<->hot transport, which swap% alone cannot certify
        roundtrips[tag] = round(float(np.median(trip_rates)), 2)
        quality[tag] = round(float(np.median(rmse_seeds)), 4)
        quality_cold[tag] = round(float(np.median(rmse_cold_seeds)), 4)
        notes.append(
            f"{tag}: {sps_med:,.0f} steps/s (IQR {sps_iqr[0]:,.0f}-"
            f"{sps_iqr[1]:,.0f}), ESS {np.median(ess_draws):.0f}/{draws} "
            f"draws x {len(cold_idx)} cold chain(s) "
            f"-> {e_med:.0f} ESS/s (IQR {e_iqr[0]:.0f}-{e_iqr[1]:.0f})"
            f", pooled RMSE {quality[tag]} (cold {quality_cold[tag]}), accept "
            f"{last[tag]['accept_pct']:.1f}%, swap {last[tag]['swap_pct']:.1f}%"
            f", roundtrips/1k {roundtrips[tag]}"
        )

    # the reference's SECOND workload family, same quality-gated treatment
    # (skippable for regression-only iteration via --no-cls)
    cls = (
        None if "--no-cls" in sys.argv[1:] else classification_arm(notes)
    )

    # headline: the fastest execution of the reference RW sampler (the
    # fused-block path when it wins, the per-step scan otherwise — same
    # sampler, two execution strategies)
    head_tag = max(("rw", "rw_fused"), key=lambda t: _median_iqr(reps[t])[0])
    value, iqr = _median_iqr(reps[head_tag])
    baseline = 370.0  # aggregate chain-steps/sec, 10-proc CPU reference
    # per-variant notes FIRST (stderr), canonical JSON line LAST: the
    # driver tails the combined output, so the machine-readable record
    # must be the final thing printed (BENCH_r03/r04 carried parsed:null
    # because the notes used to follow the JSON — VERDICT r4 item 6)
    for n in notes:
        print("# " + n, file=sys.stderr)
    sys.stderr.flush()
    print(
        json.dumps(
            {
                "metric": "sunspot_rw_pt_chain_steps_per_sec_64chains_1chip",
                "headline_variant": head_tag,
                "value": round(value, 1),
                "unit": "chain-steps/s",
                "vs_baseline": round(value / baseline, 2),
                "iqr": [round(x, 1) for x in iqr],
                "reps": 3,
                "ess_per_sec": ess_per_sec,
                "rmse_test_pooled_mean": quality,
                "rmse_test_cold_posterior_mean": quality_cold,
                "rhat_cold_max": rhat_cold,
                # the bench ESS arm reads R-hat at its own 8k-step budget,
                # where large-R ensembles are draw-starved: the crowned
                # 256x4 flagship read 1.033 here in r4 but 1.002 under the
                # definitive 256k-step protocol on the SAME config
                # (results/convergence_definitive.md r5 extension) — the
                # bench field is a smoke alarm, not the convergence receipt
                "rhat_note": (
                    "8k-step budget; see convergence_definitive.md for "
                    "the long-budget gate on the flagship config"
                ),
                "roundtrips_per_kstep": roundtrips,
                "ref_rmse_test": 0.0239,
                # THE flagship: highest pooled cold ESS/s SUBJECT TO the
                # cold-posterior RMSE beating the reference's committed
                # Sunspot row (Res_RW/master_result_file.txt:2, 0.0239) —
                # BASELINE.json's "at matched posterior quality" clause as
                # a hard gate, not a footnote (VERDICT r3 item 1). Raw
                # within-mode ESS/s without the gate rewards fast mixing
                # around the wrong posterior (results/mala_basins.md)
                "flagship": pick_flagship(
                    ess_per_sec, quality_cold, 0.0239
                ),
                "flagship_gate": {
                    "cold_rmse_max": 0.0239,
                    "basis": "ref Sunspot RW committed test RMSE",
                },
                # the classification family (BASELINE config 2), quality
                # gate = served posterior-predictive cold accuracy >= the
                # committed LG mean (see classification_arm docstring)
                "classification": cls,
            }
        ),
        flush=True,
    )


def scaling() -> None:
    """Chain-count scaling on one chip: steps/s and cold-chain ESS/s,
    FNN (Sunspot) 64..4096 chains + digits-CNN 256/1024. Writes
    results/scaling.md (VERDICT r2 item 7)."""
    import numpy as np

    import ptnn
    from ptnn.data import load_digits, load_regression
    from ptnn.models import cnn
    from ptnn.ops import ess as ess_mod

    only = [int(a) for a in sys.argv[1:] if a.isdigit()]
    prob = load_regression("Sunspot")
    rows = []
    for chains in (64, 256, 1024, 4096):
        if "cnn" in sys.argv[1:] or (only and chains not in only):
            continue
        cfg = _variants(chains, steps_per_chain=2000)["mala"]
        runner = ptnn.throughput_runner(cfg, prob.train, prob.test, seed=0)
        sps = float(np.median([runner()["chain_steps_per_sec"] for _ in range(3)]))
        # cold-chain-only w trace (record_w_chains=1): the full-w trace at
        # >=1024 chains is a multi-100MB tunnel transfer (wedges); this keeps
        # the bench-consistent multi-parameter w ESS at a few-MB fetch
        ess_cfg = dataclasses.replace(
            cfg,
            num_samples=chains * 2000,
            record_w=True,
            record_w_chains=1,
            chunk_steps=500,
        ).validate()
        res = ptnn.sample(ess_cfg, prob.train, prob.test, seed=1)
        b = ess_cfg.samples_per_chain // 2
        cold = np.asarray(res.traces["w"][b:, 0, :])
        e = ess_mod.multi_ess(cold, max_params=16)
        ess_s = (e / cold.shape[0]) * (sps / chains)
        rows.append(
            f"| fnn-sunspot mala | {chains} | {sps:,.0f} | {e:.0f}/{cold.shape[0]} | {ess_s:.0f} |"
        )
        print(rows[-1], flush=True)
    digits = load_digits(0)
    for chains in (256, 1024):
        if only and ("cnn" not in sys.argv[1:] or chains not in only):
            continue
        # short fused run: a 1000-step 1024-chain CNN scan is a single >60 s
        # XLA execution, which crashes the tunneled worker (memory: serial-
        # TPU rule); 250 steps keeps it ~15-20 s with the same steady rate
        cfg = dataclasses.replace(
            ptnn.classification_preset(
                digits.topology,
                num_samples=chains * 250,
                num_chains=chains,
                maxtemp=5.0,
            ),
            swap_interval=10,
            swap_style="even_odd",
            proposal="precond_mala",
            warmstart_frac=0.1,
            precond_start_frac=0.3,
            step_w=0.01,
            record_w=False,
            drift_chain_microbatch=4 if chains >= 1024 else 1,
        ).validate()
        spec = cnn.digits_spec()
        runner = ptnn.throughput_runner(
            cfg, digits.train, digits.test, seed=0, model_spec=spec
        )
        sps = float(np.median([runner()["chain_steps_per_sec"] for _ in range(3)]))
        rows.append(f"| cnn-digits mala | {chains} | {sps:,.0f} | - | - |")
        print(rows[-1], flush=True)
    header = (
        "# Chain-count scaling (single chip)\n\n"
        "Median of 3 reps per point; cold-chain multi-parameter w ESS over\n"
        "the last 1000 draws (seed 1), as in bench.py. Generated by\n"
        "`python bench.py --scaling`\n"
        "(point-by-point on the tunneled chip: pass chain counts, and\n"
        "`cnn` for the CNN points, to append selected rows).\n\n"
        "| config | chains | chain-steps/s | ESS/draws | ESS/s |\n"
        "|---|---|---|---|---|\n"
    )
    import os

    path = "results/scaling.md"
    if os.path.exists(path) and only:
        with open(path, "a") as f:
            f.write("\n".join(rows) + "\n")
    else:
        with open(path, "w") as f:
            f.write(header + "\n".join(rows) + "\n")
    print(f"wrote {path} (+{len(rows)} rows)")


def _enable_compile_cache() -> None:
    """Persistent XLA-executable cache: the bench re-invokes identical
    HLO across variants/seeds/processes; without it every ptnn.sample
    builds fresh jitted closures and recompiles (minutes each on a
    1-core host)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcomp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


if __name__ == "__main__":
    _enable_compile_cache()
    if "--scaling" in sys.argv[1:]:
        scaling()
    else:
        main()
