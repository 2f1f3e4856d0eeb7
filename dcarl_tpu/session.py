"""Cross-session training lifecycle — persist, reload, keep improving.

The reference's deployment story is multi-session by construction: the
RLS confidence dataset lives in append-only text + an on-disk R-tree
that is reloaded every time the agent process starts
(deepq/RLS.py:34-76), and the agent itself is load-or-new
(DCARL_agent.py:18-43) — a vehicle accumulates evidence over its whole
life, across every ignition cycle.  This module gives the TPU trainer
the same contract:

* :class:`TrainSession` wraps ``make_trainer_fast`` with a checkpoint
  directory (orbax: params, optimizer, replay, device store, env state,
  counters — every leaf of ``FastTrainState``) and per-shard
  :class:`~dcarl_tpu.utils.checkpoint.StoreSpooler` instances that
  append each chunk's new store rows to the reference text format
  (visited_state.txt / visited_value.txt), using the trainer's exact
  ``store_total`` insert counters (no head-aliasing).
* ``init_or_resume`` is the reference's load-or-new: restore the latest
  checkpoint if one exists, else a fresh state.
* :func:`seed_store_from_text` is the RLS.py:47-52 reload path: a NEW
  session (fresh params, empty replay) whose confidence store starts
  from the spooled history of every previous session — the exact sense
  in which improvement is "continuous".

``tests/test_session.py`` pins save -> restore -> bit-identical
continuation and the spool -> import -> keep-improving loop;
``examples/run_improvement.py --sessions 2`` demonstrates it at fleet
scale.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcarl_tpu.config import DCARLConfig
from dcarl_tpu.core.store import ConfidenceStore
from dcarl_tpu.train_fast import FastTrainState, make_trainer_fast
from dcarl_tpu.utils import checkpoint as CKPT


def _shard_store(state: FastTrainState, s: int) -> ConfidenceStore:
    return ConfidenceStore(
        keys=jax.device_get(state.store_keys)[s],
        actions=jax.device_get(state.store_actions)[s],
        values=jax.device_get(state.store_values)[s],
        size=jax.device_get(state.store_size)[s],
        head=jax.device_get(state.store_head)[s],
    )


class TrainSession:
    """A checkpointed, history-spooling wrapper of the fast trainer.

    Parameters mirror :func:`dcarl_tpu.train_fast.make_trainer_fast`;
    ``session_dir`` holds ``ckpt/`` (orbax steps) plus the append-only
    ``visited_state.txt`` / ``visited_value.txt`` history shared by all
    sessions that point at the same directory.
    """

    def __init__(self, session_dir: str, mesh, axis: str = "env",
                 cfg: DCARLConfig = DCARLConfig(), **trainer_kwargs):
        self.session_dir = session_dir
        self.ckpt_dir = os.path.join(session_dir, "ckpt")
        self.state_path = os.path.join(session_dir, "visited_state.txt")
        self.value_path = os.path.join(session_dir, "visited_value.txt")
        self.meta_path = os.path.join(session_dir, "session_meta.json")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.n_shards = mesh.shape[axis]
        (self.init_fn, self.step_fn, self.learner,
         self.run_factory) = make_trainer_fast(mesh, axis, cfg,
                                               **trainer_kwargs)
        self._spoolers = [
            CKPT.StoreSpooler(self.state_path, self.value_path)
            for _ in range(self.n_shards)]
        self._spooled_total = [0] * self.n_shards

    # -- load-or-new (DCARL_agent.py:18-43) -----------------------------
    def init_or_resume(self, seed: int = 0) -> Tuple[FastTrainState, int]:
        """Restore the latest checkpoint into this trainer's state
        structure, else initialize fresh.  Returns (state, step)."""
        template = self.init_fn(seed=seed)
        step = CKPT.latest_step(self.ckpt_dir)
        if step is None:
            return template, 0
        state = CKPT.restore(self.ckpt_dir, step, template)
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                meta = json.load(f)
            for s, sp in enumerate(self._spoolers):
                sp._head = meta["spool_heads"][s]
                self._spooled_total[s] = meta["spooled_totals"][s]
        return state, step

    def mark_synced(self, state: FastTrainState) -> None:
        """Declare the state's current store contents already persisted
        (e.g. just imported from a previous session's history via
        :func:`seed_store_from_text`): subsequent ``spool`` calls append
        only rows written AFTER this point."""
        totals = np.asarray(jax.device_get(state.store_total))
        heads = np.asarray(jax.device_get(state.store_head))
        for s in range(self.n_shards):
            self._spooled_total[s] = int(totals[s])
            self._spoolers[s]._head = int(heads[s])
            self._spoolers[s]._digest = None

    # -- history spooling (RLS.py:185-215 unbounded persistence) --------
    def spool(self, state: FastTrainState) -> int:
        """Append every store row written since the last spool to the
        text history.  Uses the trainer's per-shard cumulative insert
        counters, so whole-capacity ring wraps raise instead of losing
        rows.  Returns rows appended (sentinel padding excluded)."""
        totals = np.asarray(jax.device_get(state.store_total))
        appended = 0
        for s in range(self.n_shards):
            # i32 wrapping delta of cumulative slots written
            delta = int(np.uint32(np.int64(totals[s])
                                  - np.int64(self._spooled_total[s])))
            appended += self._spoolers[s].spool(
                _shard_store(state, s), n_inserted=delta)
            self._spooled_total[s] = int(totals[s])
        return appended

    # -- checkpointing ---------------------------------------------------
    def save(self, state: FastTrainState, step: int,
             spool_first: bool = True) -> str:
        if spool_first:
            self.spool(state)
        path = CKPT.save(self.ckpt_dir, step, state)
        with open(self.meta_path, "w") as f:
            json.dump({
                "step": step,
                "spool_heads": [sp._head for sp in self._spoolers],
                "spooled_totals": self._spooled_total,
            }, f)
        return path

    def history_rows(self) -> int:
        if not os.path.exists(self.value_path):
            return 0
        with open(self.value_path) as f:
            return sum(1 for _ in f)


def seed_store_from_text(state: FastTrainState, state_path: str,
                         value_path: str) -> FastTrainState:
    """Start a NEW session from the spooled history of previous ones.

    The reference reloads its entire visited_state/visited_value history
    into the R-tree on every construction (RLS.py:34-76).  Here the
    history rows round-robin across the state's store shards (queries
    psum over shards, so placement is semantics-free); if a shard's
    share exceeds its capacity the NEWEST rows win, matching the device
    ring's overwrite direction.  Replay, params, optimizer, and env
    state stay as given (fresh session), only the confidence store is
    seeded — evidence transfers across sessions, exploration restarts.
    """
    hist_keys = np.loadtxt(state_path, ndmin=2).astype(np.float32)
    hist_vals = np.loadtxt(value_path, ndmin=2).astype(np.float32)
    n_rows = hist_keys.shape[0]
    s_shards, capacity, d = np.asarray(state.store_keys.shape)
    if n_rows and hist_keys.shape[1] != d:
        raise ValueError(f"history key dim {hist_keys.shape[1]} != "
                         f"store dim {d}")

    new_keys = np.zeros((s_shards, capacity, d), np.float32)
    new_actions = np.zeros((s_shards, capacity), np.float32)
    new_values = np.zeros((s_shards, capacity), np.float32)
    new_size = np.zeros((s_shards,), np.int32)
    new_head = np.zeros((s_shards,), np.int32)
    new_total = np.zeros((s_shards,), np.int32)
    for s in range(s_shards):
        rows = np.arange(s, n_rows, s_shards)
        new_total[s] = len(rows)
        if len(rows) > capacity:
            rows = rows[-capacity:]          # newest win, ring semantics
        k = len(rows)
        new_keys[s, :k] = hist_keys[rows]
        new_actions[s, :k] = hist_vals[rows, 0]
        new_values[s, :k] = hist_vals[rows, 1]
        new_size[s] = k
        new_head[s] = k % capacity

    def put(old, new):
        return jax.device_put(jnp.asarray(new, old.dtype), old.sharding)

    return state._replace(
        store_keys=put(state.store_keys, new_keys),
        store_actions=put(state.store_actions, new_actions),
        store_values=put(state.store_values, new_values),
        store_size=put(state.store_size, new_size),
        store_head=put(state.store_head, new_head),
        store_total=put(state.store_total, new_total),
    )
