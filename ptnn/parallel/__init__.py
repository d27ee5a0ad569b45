"""Parallelism: device meshes and the replica-exchange collective."""

from ptnn.parallel import mesh, swap

__all__ = ["mesh", "swap"]
