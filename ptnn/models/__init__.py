"""Model zoo: pure-function neural nets for the tempered sampler."""

from ptnn.models import api, cnn, fnn, mlp

__all__ = ["api", "cnn", "fnn", "mlp"]
