"""Utils tests: metrics logger sinks, checkpoint round-trips (orbax +
npz + text store mirror), NaN guard."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dcarl_tpu.core.store import store_init, store_insert
from dcarl_tpu.utils import checkpoint as CK
from dcarl_tpu.utils import logging as L
from dcarl_tpu.utils import nan_guard as NG


def test_metrics_logger_csv_jsonl(tmp_path):
    csv_path = str(tmp_path / "log.csv")
    jsonl_path = str(tmp_path / "log.jsonl")
    lg = L.MetricsLogger([L.CSVWriter(csv_path), L.JSONLWriter(jsonl_path)])
    lg.logkv("a", 1.0)
    lg.logkv_mean("b", 2.0)
    lg.logkv_mean("b", 4.0)
    out = lg.dumpkvs()
    assert out["b"] == pytest.approx(3.0)
    lg.logkv("a", 2.0)
    lg.logkv("c", 7)  # schema growth
    lg.dumpkvs()
    lg.close()

    import csv as csvmod

    with open(csv_path) as f:
        rows = list(csvmod.DictReader(f))
    assert rows[0]["a"] == "1.0"
    assert rows[1]["c"] == "7"

    import json

    with open(jsonl_path) as f:
        lines = [json.loads(l) for l in f]
    assert lines[0]["b"] == pytest.approx(3.0)


def test_episode_stats(tmp_path):
    path = str(tmp_path / "record.txt")
    es = L.EpisodeStats(path)
    assert es.update(np.zeros(4, bool), np.zeros(4, bool),
                     np.zeros(4, bool)) is None
    row = es.update(np.asarray([True, True, False, True]),
                    np.asarray([True, False, False, False]),
                    np.asarray([False, True, False, False]))
    assert row["task_num"] == 3
    assert row["pass_rate"] == pytest.approx(1 / 3)
    assert os.path.exists(path)


def test_checkpoint_orbax_roundtrip(tmp_path):
    state = {"w": jnp.arange(6.0).reshape(2, 3), "n": jnp.int32(5)}
    CK.save(str(tmp_path / "ck"), 3, state)
    assert CK.latest_step(str(tmp_path / "ck")) == 3
    zero = jax.tree.map(jnp.zeros_like, state)
    back = CK.restore(str(tmp_path / "ck"), 3, zero)
    np.testing.assert_allclose(np.asarray(back["w"]), np.asarray(state["w"]))
    assert int(back["n"]) == 5

    # load_or_init: fresh when empty, restored otherwise
    fresh, step = CK.load_or_init(str(tmp_path / "nope"), lambda: zero)
    assert step == 0
    loaded, step = CK.load_or_init(str(tmp_path / "ck"), lambda: zero)
    assert step == 3
    assert int(loaded["n"]) == 5


def test_checkpoint_npz_roundtrip(tmp_path):
    state = {"a": jnp.ones((3,)), "b": {"c": jnp.arange(4)}}
    path = str(tmp_path / "s.npz")
    CK.save_npz(path, state)
    back = CK.load_npz(path, jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_allclose(np.asarray(back["b"]["c"]), np.arange(4))


def test_store_text_mirror_roundtrip(tmp_path):
    store = store_init(16, 4)
    keys = jnp.asarray([[1.0, 2.0, 3.0, 0.0], [4.0, 5.0, 6.0, 2.0]])
    store = store_insert(store, keys, jnp.asarray([0.0, 2.0]),
                         jnp.asarray([0.5, -1.5]), jnp.ones(2, bool))
    sp, vp = str(tmp_path / "visited_state.txt"), str(tmp_path / "visited_value.txt")
    CK.export_store_text(store, sp, vp)
    back = CK.import_store_text(sp, vp, 16)
    assert int(back.size) == 2
    np.testing.assert_allclose(np.asarray(back.keys[:2]), np.asarray(keys),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.values[:2]), [0.5, -1.5],
                               atol=1e-5)


def test_nan_guard():
    good = {"x": jnp.ones((3,)), "i": jnp.arange(3)}
    assert bool(NG.check_finite(good))
    bad = {"x": jnp.asarray([1.0, jnp.nan, 2.0])}
    assert not bool(NG.check_finite(bad))
    assert NG.first_nonfinite(bad)
    with pytest.raises(ValueError, match="NaN/Inf"):
        NG.assert_finite(bad, "test")

    calls = []

    def step(x):
        calls.append(1)
        return x * 2

    wrapped = NG.guard_step(step)
    np.testing.assert_allclose(np.asarray(wrapped(jnp.ones(2))), 2.0)
    with pytest.raises(ValueError):
        wrapped(jnp.asarray([np.inf]))
