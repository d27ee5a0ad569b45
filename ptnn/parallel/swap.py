"""Replica-exchange swap as a compiled in-program permutation.

The reference runs one master process that, every ``swap_interval`` steps,
barriers all chain processes over ``multiprocessing.Event``s, then performs a
*sequential adjacent-pair sweep* over the temperature ladder
(multicore-pt-classification/pt_classification.py:668-698 and :747-755):
pair (k, k+1) is considered in order, and because swapped parameter payloads
are re-enqueued before pair (k+1, k+2) is examined, an accepted configuration
can bubble several rungs up the ladder within a single sweep (SURVEY.md §3.4).

Acceptance rule (pt_classification.py:683), kept verbatim including its
nonstandard 0.5 prefactor and the exp-overflow clamp at 709:

    accept  iff  u < min(1, 0.5 * exp(min(709, lhood2 - lhood1)))

Here the whole sweep is a ``lax.scan`` over the C-1 adjacent pairs carrying
(permutation, payload-likelihood vector); the resulting permutation is then
applied to the (chains, ...) state arrays with ``jnp.take``. On a sharded
chain axis XLA lowers that gather to the appropriate ICI collective — the
entire master/queue/event choreography of the reference disappears into one
deterministic collective step (SURVEY.md §2.3, §5).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_EXP_CLAMP = 709.0  # reference's overflow guard (pt_classification.py:683)


class SwapResult(NamedTuple):
    perm: jax.Array  # (C,) int32 — new_state[i] = old_state[perm[i]]
    n_accepted: jax.Array  # scalar int32 — accepted pair proposals this sweep
    n_proposed: jax.Array  # scalar int32 — always C-1
    # Per adjacent rung pair (k, k+1), the EXPECTED acceptance probability of
    # this sweep's proposal (the exact Rao-Blackwellized quantity the
    # communication-barrier estimator of Syed et al. 2021 wants — lower
    # variance than the realized 0/1 outcome), and whether the pair was
    # proposed at all (even/odd sweeps alternate halves).
    pair_accept: jax.Array  # (C-1,) float
    pair_active: jax.Array  # (C-1,) bool


def sweep_permutation(
    payload_ll: jax.Array,
    key: jax.Array,
    rule: str = "half_exp",
    betas: jax.Array | None = None,
    pair_penalty: jax.Array | None = None,
    pair_mask: jax.Array | None = None,
) -> SwapResult:
    """One sequential bubbling sweep over adjacent pairs.

    ``payload_ll``: (C,) likelihood payloads as each chain would enqueue them
    (tempered or otherwise — the caller decides, mirroring the reference's
    per-entry-point payload convention, see kernel.py).

    ``rule`` selects the pair-acceptance probability:

    * ``"half_exp"`` — the reference entry points' nonstandard
      ``min(1, 0.5 * exp(min(709, lh2 - lh1)))`` (pt_classification.py:683);
    * ``"unclamped"`` — the same without the 709 clamp, as in the older
      variants (e.g. Misc_code/ldpt_classifier_multi.py:483,
      misc_code/pt_fnn_multi.py:475);
    * ``"metropolis"`` — the detailed-balance replica-exchange rule
      ``min(1, exp((beta1 - beta2) * (lh2 - lh1)))`` with *untempered*
      payloads and ``betas`` = 1/T per chain (not reference behavior; the
      classic form the reference approximates — cf. the dead variant
      Misc/ldpt_fnn_multi_fixed.py:520).

    ``pair_penalty``: optional (C-1,) nonnegative exponent correction,
    subtracted inside the metropolis exponent for adjacent pair (k, k+1) —
    the unbiased noisy-energy swap test of reSGLD
    (``PTConfig.sg_swap="corrected"``): penalty = Delta-beta^2 * sigma^2 / 2
    from the minibatch variance of the pair's energy-difference estimate.

    ``pair_mask``: optional (C-1,) bool — pairs with a False entry are never
    proposed (used by replicated tempering ensembles, ``PTConfig.n_ladders``,
    to keep swaps from crossing ladder boundaries). Masked pairs count
    neither as proposed nor as accepted and report pair_active=False.
    """
    c = payload_ll.shape[0]
    if rule == "metropolis" and betas is None:
        raise ValueError("metropolis swap rule requires betas")
    if pair_penalty is not None and rule != "metropolis":
        raise ValueError("pair_penalty applies to the metropolis rule only")
    perm0 = jnp.arange(c, dtype=jnp.int32)
    us = jax.random.uniform(key, (c - 1,), dtype=payload_ll.dtype)
    if betas is None:
        betas = jnp.ones((c,), payload_ll.dtype)
    if pair_penalty is None:
        pair_penalty = jnp.zeros((c - 1,), payload_ll.dtype)
    mask = (
        jnp.ones((c - 1,), bool) if pair_mask is None
        else jnp.asarray(pair_mask, bool)
    )

    def pair(carry, inputs):
        perm, ll = carry
        k, u, active = inputs
        lh1 = ll[k]
        lh2 = ll[k + 1]
        if rule == "half_exp":
            a = jnp.minimum(
                1.0, 0.5 * jnp.exp(jnp.minimum(_EXP_CLAMP, lh2 - lh1))
            )
        elif rule == "unclamped":
            a = jnp.minimum(1.0, 0.5 * jnp.exp(lh2 - lh1))
        elif rule == "metropolis":
            # betas indexed by RUNG position (temperature is a property of
            # the rung, not of the traveling configuration)
            a = jnp.minimum(
                1.0,
                jnp.exp(
                    jnp.minimum(
                        _EXP_CLAMP,
                        (betas[k] - betas[k + 1]) * (lh2 - lh1)
                        - pair_penalty[k],
                    )
                ),
            )
        else:
            raise ValueError(f"unknown swap rule {rule!r}")
        swap = jnp.logical_and(u < a, active)
        # Swap entries k and k+1 of both the permutation and the traveling
        # payloads (the bubbling semantics: pair k+1 sees pair k's output).
        pk, pk1 = perm[k], perm[k + 1]
        perm = perm.at[k].set(jnp.where(swap, pk1, pk))
        perm = perm.at[k + 1].set(jnp.where(swap, pk, pk1))
        ll = ll.at[k].set(jnp.where(swap, lh2, lh1))
        ll = ll.at[k + 1].set(jnp.where(swap, lh1, lh2))
        return (perm, ll), (swap, jnp.where(active, a, 0.0))

    # Unroll the pair sweep for reference-scale ladders: the body is scalar
    # work and unrolling makes the k-indexing static. Measured effect at 64
    # chains is small (42.0 -> 39.3 us/step full-sampler median, within
    # tunnel noise — the sweep's amortized cost is dominated by the
    # cadence-gated payload computation and state permutation, not the pair
    # scan itself; fnn_roofline.md). Large ladders unroll in blocks to
    # bound program size.
    (perm, _), (swaps, accs) = jax.lax.scan(
        pair,
        (perm0, payload_ll),
        (jnp.arange(c - 1, dtype=jnp.int32), us, mask),
        unroll=(c - 1) if c <= 128 else 16,
    )
    return SwapResult(
        perm=perm,
        n_accepted=jnp.sum(swaps.astype(jnp.int32)),
        n_proposed=jnp.sum(mask.astype(jnp.int32)),
        pair_accept=accs,
        pair_active=mask,
    )


def _pair_accept_prob(lh1, lh2, rule, beta1, beta2, penalty=0.0):
    if rule == "half_exp":
        return jnp.minimum(1.0, 0.5 * jnp.exp(jnp.minimum(_EXP_CLAMP, lh2 - lh1)))
    if rule == "unclamped":
        return jnp.minimum(1.0, 0.5 * jnp.exp(lh2 - lh1))
    if rule == "metropolis":
        return jnp.minimum(
            1.0,
            jnp.exp(
                jnp.minimum(
                    _EXP_CLAMP, (beta1 - beta2) * (lh2 - lh1) - penalty
                )
            ),
        )
    raise ValueError(f"unknown swap rule {rule!r}")


def disjoint_pair_permutation(
    payload_ll: jax.Array,
    key: jax.Array,
    rule: str = "metropolis",
    betas: jax.Array | None = None,
    parity: jax.Array | int = 0,
    pair_penalty: jax.Array | None = None,
    pair_mask: jax.Array | None = None,
) -> SwapResult:
    """One even/odd (DEO-style) sweep: disjoint adjacent pairs only.

    Pairs (k, k+1) with ``k % 2 == parity`` are proposed simultaneously —
    alternate ``parity`` 0/1 on successive swap events for the deterministic
    even-odd scheme (Okabe et al. 2001; the non-reversible-PT round-trip
    argument is Syed et al. 2021). NOT reference behavior (the reference's
    master sweeps sequentially with re-enqueueing — ``sweep_permutation``);
    opt in via ``PTConfig(swap_style="even_odd")``. Because every row moves
    at most one rung, the resulting permutation is neighbor-exchange only —
    the cheap collective case measured in swap_collective_bench.md.

    Fully vectorized: no ``lax.scan``, one uniform draw per adjacent pair.
    """
    c = payload_ll.shape[0]
    if rule == "metropolis" and betas is None:
        raise ValueError("metropolis swap rule requires betas")
    if pair_penalty is not None and rule != "metropolis":
        raise ValueError("pair_penalty applies to the metropolis rule only")
    if betas is None:
        betas = jnp.ones((c,), payload_ll.dtype)
    if pair_penalty is None:
        pair_penalty = jnp.zeros((c - 1,), payload_ll.dtype)
    us = jax.random.uniform(key, (c - 1,), dtype=payload_ll.dtype)
    a = _pair_accept_prob(
        payload_ll[:-1], payload_ll[1:], rule, betas[:-1], betas[1:],
        pair_penalty,
    )
    active = (jnp.arange(c - 1) % 2) == (jnp.asarray(parity) % 2)
    if pair_mask is not None:
        # replicated tempering ensembles (PTConfig.n_ladders): pairs
        # crossing a ladder boundary are never proposed
        active = jnp.logical_and(active, jnp.asarray(pair_mask, bool))
    swap = (us < a) & active
    # perm[k] = k+1 where pair k swapped, k-1 where pair k-1 swapped, else k.
    # Disjoint pairs guarantee the two shifts never collide.
    up = jnp.concatenate([swap, jnp.zeros((1,), bool)])
    down = jnp.concatenate([jnp.zeros((1,), bool), swap])
    perm = (
        jnp.arange(c, dtype=jnp.int32)
        + up.astype(jnp.int32)
        - down.astype(jnp.int32)
    )
    return SwapResult(
        perm=perm,
        n_accepted=jnp.sum(swap.astype(jnp.int32)),
        n_proposed=jnp.sum(active.astype(jnp.int32)),
        pair_accept=jnp.where(active, a, 0.0),
        pair_active=active,
    )


def apply_permutation(perm: jax.Array, *arrays: jax.Array) -> Tuple[jax.Array, ...]:
    """Gather chain-axis arrays through the sweep permutation.

    Only the parameter payload travels between chains in the reference — the
    chain's own likelihood/prior are deliberately NOT restored after a swap
    (pt_classification.py:445-448, the commented-out line), so callers pass
    only (w, eta) here under stale-likelihood parity semantics.
    """
    return tuple(jnp.take(a, perm, axis=0) for a in arrays)
