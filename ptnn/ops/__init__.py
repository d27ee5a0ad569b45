"""Core numerical ops: likelihoods, priors, ladders, Langevin drift."""

from ptnn.ops import drift, ladder, likelihood

__all__ = ["drift", "ladder", "likelihood"]  # ess/evidence/ic import lazily
