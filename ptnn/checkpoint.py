"""Checkpoint/resume for long PT runs.

The reference has no mid-run persistence — chains write traces once at exit
and a crash loses the whole run (SURVEY.md §5 "Checkpoint / resume: None").
Here every chunk boundary is a natural resume point: the full sampler state
(ChainState + step counter + accumulated host traces + a config fingerprint)
round-trips through one compressed ``.npz`` written atomically.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from ptnn.config import PTConfig
from ptnn.kernel import ChainState


def config_fingerprint(cfg: PTConfig, seed: int, spec_name: str = "") -> str:
    blob = json.dumps(
        {**dataclasses.asdict(cfg), "seed": seed, "model_spec": spec_name},
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def save(
    path: str,
    state: ChainState,
    done_steps: int,
    traces: Dict[str, np.ndarray],
    cfg: PTConfig,
    seed: int,
    spec_name: str = "",
) -> None:
    """Atomic checkpoint write (tmp + rename)."""
    payload = {
        f"state__{k}": np.asarray(v)
        for k, v in state._asdict().items()
        if v is not None and not isinstance(v, tuple)
        # nested NamedTuples (surrogate ring buffer, delayed-acceptance
        # segment state) are flattened below so resume is bit-identical to an
        # uninterrupted run in every mode
    }
    if getattr(state, "surr", None) is not None:
        payload |= {
            f"state__surr__{k}": np.asarray(v)
            for k, v in state.surr._asdict().items()
        }
    if getattr(state, "da", None) is not None:
        payload |= {
            f"state__da__{k}": np.asarray(v)
            for k, v in state.da._asdict().items()
        }
    payload |= {f"trace__{k}": v for k, v in traces.items()}
    payload["done_steps"] = np.asarray(done_steps)
    payload["fingerprint"] = np.asarray(config_fingerprint(cfg, seed, spec_name))
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **payload)
    os.replace(tmp, path)


def load(
    path: str, cfg: PTConfig, seed: int, spec_name: str = ""
) -> Optional[Tuple[ChainState, int, Dict[str, np.ndarray]]]:
    """Load a checkpoint; returns None when absent or from a different
    config/seed/model (resuming someone else's run would silently corrupt
    the statistics)."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        if str(z["fingerprint"]) != config_fingerprint(cfg, seed, spec_name):
            return None
        fields = {}
        for name in ChainState._fields:
            key = f"state__{name}"
            fields[name] = z[key] if key in z else None
        surr_keys = [k for k in z.files if k.startswith("state__surr__")]
        if surr_keys:
            from ptnn.surrogate import SurrogateState

            fields["surr"] = SurrogateState(
                **{k[len("state__surr__") :]: z[k] for k in surr_keys}
            )
        da_keys = [k for k in z.files if k.startswith("state__da__")]
        if da_keys:
            from ptnn.kernel import DAState

            fields["da"] = DAState(
                **{k[len("state__da__") :]: z[k] for k in da_keys}
            )
        state = ChainState(**fields)
        traces = {
            k[len("trace__") :]: z[k] for k in z.files if k.startswith("trace__")
        }
        return state, int(z["done_steps"]), traces
