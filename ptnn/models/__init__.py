"""Model zoo: pure-function neural nets for the tempered sampler."""

from ptnn.models import fnn

__all__ = ["fnn"]
