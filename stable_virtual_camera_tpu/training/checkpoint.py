"""Train-state checkpoint / resume (params + optimizer state + step).

The reference is inference-only, so this has no counterpart there (SURVEY.md
§5.4 covers only weight conversion); it completes the training subsystem:
interrupt a fine-tune and resume bit-identically. Storage is orbax, matching
models/io.py's converted-weight cache.

Optax optimizer states are pytrees of NamedTuples; a plain orbax restore
returns generic containers, so `restore_train_state` rebuilds the exact
structure from a template (`optimizer.init(params)`-shaped) via treedef
unflattening — leaf order is deterministic for a fixed structure.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_train_state(path: str, params, opt_state, step: int, ema_params=None) -> None:
    """Write params, optimizer state, the step counter and (optionally) the
    EMA shadow params to `path`."""
    import orbax.checkpoint as ocp

    payload = {
        "params": params,
        "opt_leaves": list(jax.tree.leaves(opt_state)),
        "step": np.asarray(step, np.int64),
    }
    if ema_params is not None:
        payload["ema_params"] = ema_params
    with ocp.PyTreeCheckpointer() as ckptr:
        # force: periodic saves overwrite the same path (orbax errors on an
        # existing destination otherwise)
        ckptr.save(os.path.abspath(path), payload, force=True)


def restore_train_state(path: str, opt_state_template):
    """Returns the fixed 4-tuple (params, opt_state, step, ema_params);
    ema_params is None for checkpoints saved without an EMA, so caller arity
    never depends on checkpoint contents. `opt_state_template` supplies the
    optax state STRUCTURE (e.g. `optimizer.init(params)` on fresh params);
    its leaf values are ignored."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.abspath(path))
    treedef = jax.tree.structure(opt_state_template)
    opt_state = jax.tree.unflatten(treedef, payload["opt_leaves"])
    return (
        payload["params"],
        opt_state,
        int(payload["step"]),
        payload.get("ema_params"),
    )
