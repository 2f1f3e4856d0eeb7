"""Checkpoint / resume for the full system state.

The reference persists three things (SURVEY.md §5): SB's params zip
(base_class.py save contract), the PyTorch Q-nets + entire replay
buffer every 10k frames (drl dqn.py:417-447), and the RLS confidence
dataset as append-only text + an on-disk R-tree reloaded on
construction (RLS.py:34-76) — the "continuous improvement" store.

Here every piece of state is a pytree, so one orbax checkpoint covers
{params, optimizer, replay, confidence store, env state, counters};
``save``/``restore``/``latest_step`` wrap orbax with a flat directory
layout.  Plain-numpy fallbacks (`save_npz`) cover environments without
orbax.  The store's append-only text mirror (visited_state.txt /
visited_value.txt format, RLS.py:55-60) is provided for parity
tooling.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _orbax():
    import orbax.checkpoint as ocp

    return ocp


def save(directory: str, step: int, state: Any) -> str:
    """Save a pytree checkpoint at ``directory/step_<N>``."""
    ocp = _orbax()
    path = os.path.abspath(os.path.join(directory, f"step_{step:010d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def restore(directory: str, step: int, target: Any) -> Any:
    """Restore into the structure of ``target`` (shapes/dtypes)."""
    ocp = _orbax()
    path = os.path.abspath(os.path.join(directory, f"step_{step:010d}"))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def load_or_init(directory: str, init_fn, *args, **kwargs):
    """The reference's load-or-create pattern (DCARL_agent.py:21-26,
    dqn_value_collect.py:148-167): restore the latest checkpoint if one
    exists, else initialize fresh."""
    target = init_fn(*args, **kwargs)
    step = latest_step(directory)
    if step is None:
        return target, 0
    return restore(directory, step, target), step


# ---------------------------------------------------------------------------
# numpy fallbacks + text-format store mirror
# ---------------------------------------------------------------------------


def save_npz(path: str, state: Any) -> None:
    leaves, treedef = jax.tree.flatten(state)
    np.savez(path, treedef=np.asarray(str(treedef)),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_npz(path: str, target: Any) -> Any:
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree.flatten(target)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)


def export_store_text(store, state_path: str, value_path: str) -> None:
    """Mirror the confidence store to the reference's append-only text
    format: visited_state.txt rows = state||action, visited_value.txt
    rows = (action, value) (RLS.py:55-60, :196-199)."""
    keys = np.asarray(jax.device_get(store.keys))
    actions = np.asarray(jax.device_get(store.actions))
    values = np.asarray(jax.device_get(store.values))
    n = int(jax.device_get(store.size))
    with open(state_path, "w") as f:
        for row in keys[:n]:
            f.write(" ".join(f"{x:f}" for x in row) + "\n")
    with open(value_path, "w") as f:
        for a, v in zip(actions[:n], values[:n]):
            f.write(f"{a:f} {v:f}\n")


def ring_delta_slots(old_head: int, new_head: int, n_inserted: int,
                     capacity: int) -> np.ndarray:
    """Ring slots written between two snapshots, oldest first.

    Valid only when fewer than ``capacity`` rows were inserted between
    the snapshots (otherwise some rows were overwritten before they
    could be observed — the spooler raises in that case)."""
    if n_inserted > capacity:
        raise ValueError(
            f"{n_inserted} inserts since last snapshot exceed capacity "
            f"{capacity}: rows were lost before spooling; snapshot more "
            f"often than once per `capacity` inserts")
    assert (old_head + n_inserted) % capacity == new_head % capacity
    return (old_head + np.arange(n_inserted)) % capacity


class StoreSpooler:
    """Host-side append-only persistence of a ring store's history.

    The reference store is append-only and persisted forever
    (visited_state.txt / visited_value.txt, RLS.py:34-76, :185-215);
    the device store ring-overwrites once full (core/store.py
    ``store_insert``).  The spooler closes that gap: feed it each
    periodic store snapshot and it appends exactly the rows written
    since the previous snapshot to the reference text format, so the
    on-disk history grows without bound while the device keeps a
    fixed-shape working set.  Snapshots must happen at least once per
    ``capacity`` inserts or the spooler raises (data would already have
    been overwritten).
    """

    def __init__(self, state_path: str, value_path: str):
        self.state_path = state_path
        self.value_path = value_path
        self._head = 0
        self._total = 0  # cumulative inserts observed
        self._digest = None  # content fingerprint of the last snapshot

    def spool(self, store, n_inserted: Optional[int] = None) -> int:
        """Append rows written since the previous ``spool`` call.

        ``n_inserted`` is the number of inserts since last spool; if
        omitted it is inferred from the head delta — which wraps to 0
        whenever an exact multiple of ``capacity`` inserts happened, so
        inferred mode additionally fingerprints the store contents and
        raises when the contents changed under a zero head delta (the
        only way a whole-ring wrap can masquerade as "no inserts").
        Rows stamped with :data:`~dcarl_tpu.core.store.SENTINEL_KEY`
        (dense-block write padding — they match no query) are skipped,
        not persisted.  Returns the number of rows appended."""
        import hashlib

        from dcarl_tpu.core.store import SENTINEL_KEY

        keys = np.asarray(jax.device_get(store.keys))
        actions = np.asarray(jax.device_get(store.actions))
        values = np.asarray(jax.device_get(store.values))
        head = int(jax.device_get(store.head))
        capacity = keys.shape[0]
        digest = hashlib.sha256(
            np.ascontiguousarray(keys).tobytes()
            + np.ascontiguousarray(values).tobytes()).digest()
        if n_inserted is None:
            n_inserted = (head - self._head) % capacity
            if (n_inserted == 0 and self._digest is not None
                    and digest != self._digest):
                raise ValueError(
                    "store contents changed but the head returned to its "
                    "previous slot: a whole multiple of `capacity` inserts "
                    "happened since the last spool, so rows were "
                    "overwritten before they could be persisted; spool "
                    "more often or pass n_inserted explicitly")
        slots = ring_delta_slots(self._head, head, n_inserted, capacity)
        real = np.abs(keys[slots]).max(axis=1) < SENTINEL_KEY / 2 \
            if len(slots) else np.zeros((0,), bool)
        slots = slots[real]
        with open(self.state_path, "a") as f:
            for row in keys[slots]:
                f.write(" ".join(f"{x:f}" for x in row) + "\n")
        with open(self.value_path, "a") as f:
            for a, v in zip(actions[slots], values[slots]):
                f.write(f"{a:f} {v:f}\n")
        self._head = head % capacity
        self._total += n_inserted
        self._digest = digest
        return len(slots)

    @property
    def total_spooled(self) -> int:
        return self._total


def import_store_text(state_path: str, value_path: str, capacity: int):
    """Reload a text-mirrored store (the RLS.py:47-52 load path)."""
    import jax.numpy as jnp

    from dcarl_tpu.core.store import store_init, store_insert

    keys = np.loadtxt(state_path, ndmin=2)
    vals = np.loadtxt(value_path, ndmin=2)
    store = store_init(capacity, keys.shape[1])
    n = len(keys)
    return store_insert(
        store,
        jnp.asarray(keys, jnp.float32),
        jnp.asarray(vals[:, 0], jnp.float32),
        jnp.asarray(vals[:, 1], jnp.float32),
        jnp.ones((n,), bool))
