"""Device-mesh helpers: chain-axis sharding for the temperature ladder.

The reference's only parallelism is one OS process per chain on a single
host (SURVEY.md §2.3). Here the chain axis is a named mesh axis: every
per-chain array is sharded ``PartitionSpec('chains')`` and the MCMC step is
chain-elementwise, so the compiled program needs **zero** communication except
the replica-exchange permutation, whose tiny ``jnp.take`` gather XLA lowers to
ICI collectives. Across hosts the same program runs over DCN via standard
``jax.distributed`` initialization — no bespoke transport (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = "chains"
DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices with a 'chains' axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def make_mesh_2d(
    data_parallel: int = 2, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """2-D ('chains', 'data') mesh: chains shard one way, dataset rows the
    other — per-example log-likelihood terms reduce with an XLA-inserted
    psum over the 'data' axis (the MNIST-scale layout, SURVEY.md §2.3)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % data_parallel == 0, (n, data_parallel)
    arr = np.asarray(devices).reshape(n // data_parallel, data_parallel)
    return Mesh(arr, (CHAIN_AXIS, DATA_AXIS))


def shard_data_tree(tree, mesh: Mesh):
    """Shard dataset rows over the 'data' axis (leading axis = examples)."""
    n_dp = mesh.shape[DATA_AXIS]

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n_dp == 0:
            spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, tree)


def chain_spec(ndim: int) -> P:
    """PartitionSpec sharding the leading (chain) axis only."""
    return P(CHAIN_AXIS, *([None] * (ndim - 1)))


def shard_chain_tree(tree, mesh: Mesh):
    """Place a pytree on the mesh: leading-axis=chains arrays sharded over
    'chains', scalars replicated. The chain count must be a multiple of the
    CHAIN-axis size (padding is the caller's job — configs use powers of
    two); arrays that do not divide are replicated."""
    n_dev = mesh.shape[CHAIN_AXIS]

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n_dev == 0:
            return jax.device_put(x, NamedSharding(mesh, chain_spec(x.ndim)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, tree)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree across the mesh (datasets are KB-scale)."""
    return jax.tree.map(
        lambda x: jax.device_put(jax.numpy.asarray(x), NamedSharding(mesh, P())), tree
    )
