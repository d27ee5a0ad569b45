"""Multi-host (multi-process) validation of the chain-sharded sampler.

The reference's parallelism is one OS process per chain on ONE host
(SURVEY.md §2.3); ptnn's multi-host story is "the same jitted program over a
global mesh via jax.distributed" (SURVEY.md §5). This test actually runs it:
two OS processes x 4 virtual CPU devices form one 8-device global mesh (gloo
collectives standing in for DCN), and the full PT sampler — including the
cross-process replica-exchange permutation — must reproduce the
single-process 8-device result.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    return env


def _run(nproc: int, timeout: int = 600) -> dict:
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=_clean_env(),
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    for o in outs:
        for line in o.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT ") :])
    raise AssertionError(f"no RESULT line:\n{outs[0][-3000:]}")


@pytest.mark.slow
def test_two_process_mesh_matches_single_process():
    ref = _run(1)
    dist = _run(2)
    # identical global program; collectives may reorder float reductions
    assert dist["swaps_proposed"] == ref["swaps_proposed"] > 0
    assert abs(dist["swaps_accepted"] - ref["swaps_accepted"]) <= 1
    for k in ("mean_ll_first", "mean_ll_last", "rmse_test_mean", "accept_mean"):
        np.testing.assert_allclose(dist[k], ref[k], rtol=1e-3, atol=1e-4)
    # sanity: the sampler actually moved
    assert dist["mean_ll_last"] > dist["mean_ll_first"]
    assert dist["accept_mean"] > 10
