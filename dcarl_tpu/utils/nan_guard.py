"""Runtime NaN/Inf sanitizer.

Re-design of the SB fork's ``VecCheckNan``
(common/vec_env/vec_check_nan.py — the reference's only runtime
sanitizer, SURVEY.md §5): detect NaN/inf in actions, observations and
rewards and either raise (host-side) or surface a boolean flag
(in-jit, where raising is impossible)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def check_finite(tree: Any) -> jax.Array:
    """In-jit: scalar bool — True when every leaf is finite."""
    leaves = [jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(tree)
              if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    out = leaves[0]
    for l in leaves[1:]:
        out = out & l
    return out


def first_nonfinite(tree: Any) -> Dict[str, int]:
    """Host-side diagnosis: leaf-path -> count of non-finite entries."""
    out = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        arr = np.asarray(jax.device_get(leaf))
        if np.issubdtype(arr.dtype, np.floating):
            bad = int((~np.isfinite(arr)).sum())
            if bad:
                out[jax.tree_util.keystr(path)] = bad
    return out


def assert_finite(tree: Any, context: str = "") -> None:
    """Raise ValueError naming the offending leaves (VecCheckNan's
    error-with-provenance behavior)."""
    bad = first_nonfinite(tree)
    if bad:
        raise ValueError(
            f"NaN/Inf detected{' in ' + context if context else ''}: {bad}")


def guard_step(step_fn, context: str = "step"):
    """Wrap a host-called step function: checks inputs and outputs
    (check_array_value pattern of vec_check_nan.py)."""

    def wrapped(*args, **kwargs):
        assert_finite((args, kwargs), context + " inputs")
        out = step_fn(*args, **kwargs)
        assert_finite(out, context + " outputs")
        return out

    return wrapped
