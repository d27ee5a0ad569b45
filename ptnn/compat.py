"""Backend workarounds: fast jit for tunneled-TPU backends.

On the 'axon' remote-TPU backend, jaxpr -> StableHLO lowering makes per-op
round trips over the tunnel and takes *minutes* for the sampler's scan body
(measured: 396 s to lower a 2000-step chunk that the CPU backend lowers in
0.28 s; XLA compilation itself is ~1.5 s either way). ``fast_jit`` sidesteps
this by lowering once on the in-process CPU backend via ``jax.export`` with
``platforms=("cpu", "tpu")`` and then compiling/executing the exported module
on the TPU. On every other backend it is exactly ``jax.jit``.

Only used for unsharded computations (the export path does not carry sharding
annotations); the mesh path keeps plain jit.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional

import jax


@functools.cache
def is_tunneled_tpu() -> bool:
    """True when running on the axon remote-TPU client (slow lowering)."""
    if os.environ.get("PTNN_FORCE_EXPORT_LOWERING"):
        return True
    if os.environ.get("PTNN_DISABLE_EXPORT_LOWERING"):
        return False
    try:
        d = jax.devices()[0]
        return "axon" in getattr(d.client, "platform_version", "").lower()
    except Exception:
        return False


@functools.cache
def _cpu_device():
    return jax.devices("cpu")[0]


class _ExportJit:
    """jit-like wrapper: trace+lower on CPU, compile+run on the default
    backend. Caches one compiled callable per (static args, avals) key."""

    def __init__(self, fn: Callable, static_argnames=()):
        self._fn = fn
        self._static = tuple(static_argnames)
        self._cache: dict = {}

    def __call__(self, *args, **kwargs):
        static_kw = tuple(sorted((k, kwargs[k]) for k in self._static if k in kwargs))
        dyn_kwargs = {k: v for k, v in kwargs.items() if k not in self._static}
        leaves, treedef = jax.tree.flatten((args, dyn_kwargs))
        avals = tuple(
            jax.ShapeDtypeStruct(x.shape, x.dtype)
            for x in (jax.numpy.asarray(l) for l in leaves)
        )
        key = (static_kw, treedef, avals)
        compiled = self._cache.get(key)
        if compiled is None:
            fn = self._fn
            if static_kw:
                fn = functools.partial(fn, **dict(static_kw))

            def flat_fn(*flat):
                a, kw = jax.tree.unflatten(treedef, flat)
                return fn(*a, **kw)

            with jax.default_device(_cpu_device()):
                # tpu-only: multi-platform export would try to lower Pallas
                # kernels for CPU, which only supports interpret mode
                exported = jax.export.export(
                    jax.jit(flat_fn), platforms=("tpu",)
                )(*avals)
            compiled = jax.jit(exported.call)
            self._cache[key] = compiled
        return compiled(*leaves)


def fast_jit(
    fn: Callable,
    static_argnames=(),
    donate_argnums=(),
    static_argnums=(),
) -> Callable:
    """``jax.jit`` with the export-lowering workaround on tunneled TPUs.

    Note: the export path drops donation (the exported module manages its own
    buffers); at these state sizes (<1 MB per chain set) that is free.
    """
    if not is_tunneled_tpu():
        return jax.jit(
            fn,
            static_argnames=static_argnames,
            donate_argnums=donate_argnums,
            static_argnums=static_argnums,
        )
    if static_argnums:
        raise ValueError("fast_jit export path supports static_argnames only")
    return _ExportJit(fn, static_argnames)
