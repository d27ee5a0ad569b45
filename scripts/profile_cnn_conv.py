"""Profile the vmapped per-chain CNN conv likelihood on-chip.

SURVEY §7 stage 7 / VERDICT r1 #4: the 1024-chain CNN config needs either a
Pallas-fused per-chain conv likelihood or an on-chip profile of XLA's vmapped
conv justifying the waiver. This measures the eval (forward + log-softmax
likelihood over the full train split, vmapped over chains) and the grad
drift at 256/512/1024 chains on the digits shapes, and reports achieved
FLOP/s and effective HBM bandwidth against the chip's roofline, which
decides memory- vs compute-bound.

FLOP count per image (digits 8x8, channels (8,16), hidden 32, f32):
  conv1 3x3x1x8  @ 64 px : 2*576*8    =  9,216
  conv2 3x3x8x16 @ 16 px : 2*9216*16  = 36,864   (after 2x2 pool)
  dense (64->32) + out (32->10)       ~  4,736
  ~50.8 kFLOP forward; drift (fwd+bwd) ~3x that.

Usage (serial on the tunneled chip): python scripts/profile_cnn_conv.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ptnn.data import load_digits
from ptnn.models import cnn


def main() -> None:
    prob = load_digits(0)
    spec = cnn.digits_spec()
    x = jnp.asarray(prob.train[:, :64], jnp.float32)
    y = prob.train[:, 64].astype(np.int32)
    t = jnp.asarray(np.eye(10)[y], jnp.float32)
    n = x.shape[0]
    flop_fwd_img = 50_800.0

    def eval_ll(ws):
        def one(w):
            logp = spec.log_probs(spec.forward(w, x))
            return jnp.sum(t * logp)

        return jax.vmap(one)(ws)

    def drift(ws):
        return jax.vmap(lambda w: spec.drift(w, x, t, 0.01))(ws)

    for chains in (256, 512, 1024):
        key = jax.random.PRNGKey(0)
        ws = 0.1 * jax.random.normal(key, (chains, spec.w_size), jnp.float32)
        for tag, fn, flop_mult in (("eval", eval_ll, 1.0), ("drift", drift, 3.0)):
            f = jax.jit(fn)
            out = f(ws)
            jax.block_until_ready(out)
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(ws)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps
            images = chains * n
            gflops = images * flop_fwd_img * flop_mult / dt / 1e9
            # bytes: activations dominate — conv1 out (N,8,8,8), pooled
            # (N,4,4,8), conv2 out (N,4,4,16), pooled (N,2,2,16) + input
            # read ~ (64 + 512 + 128 + 256 + 64) * 4 B/img per pass
            bytes_img = (64 + 512 + 128 + 256 + 64) * 4 * flop_mult
            gbps = images * bytes_img / dt / 1e9
            print(
                json.dumps(
                    {
                        "chains": chains,
                        "op": tag,
                        "ms": round(dt * 1e3, 2),
                        "images_per_s": round(images / dt / 1e6, 2),
                        "achieved_gflop_s": round(gflops, 1),
                        "est_activation_gb_s": round(gbps, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
