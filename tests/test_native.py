"""C++ host-runtime tests: build, geometry parity vs the Python oracle,
box-store query parity vs brute force and vs the reference R-tree
semantics, record-log round trip."""

import numpy as np
import pytest

from dcarl_tpu.utils import native as NV

lib = NV.load_library()
pytestmark = pytest.mark.skipif(lib is None,
                                reason="native build unavailable")


def test_wrap_angle_native():
    for th in [0.0, 3.1, -3.1, 9.0, -7.5]:
        got = lib.dcarl_wrap_angle(th)
        want = (th + np.pi) % (2 * np.pi) - np.pi
        assert abs(got - want) < 1e-12


def test_dense_polyline_native_matches_numpy():
    rng = np.random.default_rng(0)
    line = np.cumsum(rng.normal(1.0, 0.3, (15, 2)), axis=0)
    from dcarl_tpu.ops.geometry import dense_polyline2d_np

    want = dense_polyline2d_np(line, 0.5)
    got = NV.dense_polyline2d(line, 0.5)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_project_native_matches_oracle():
    rng = np.random.default_rng(1)
    from dcarl_tpu.ops.geometry import project_point_to_polyline_np

    for _ in range(25):
        n = rng.integers(3, 30)
        line = np.cumsum(rng.normal(1.0, 0.4, (n, 2)), axis=0)
        p = rng.normal(0, 2, 2) + line[rng.integers(0, n)]
        got = NV.project_point_to_polyline(p[0], p[1], line)
        want = project_point_to_polyline_np(p[0], p[1], line)
        assert got[1] == want[1] and got[2] == want[2]
        np.testing.assert_allclose(got[0], want[0], atol=1e-9)
        np.testing.assert_allclose(got[3], want[3], atol=1e-9)
        np.testing.assert_allclose(got[4], want[4], atol=1e-9)


def test_boxstore_grid_matches_bruteforce():
    rng = np.random.default_rng(2)
    d = 5
    widths = np.asarray([1.0, 0.3, 2.0, 5.0, 0.1])
    store = NV.HostBoxStore(widths)
    for i in range(500):
        key = rng.normal(0, 3, d)
        key[-1] = float(rng.integers(0, 8))
        store.insert(key, key[-1], rng.normal())
    assert len(store) == 500

    for _ in range(50):
        q = rng.normal(0, 3, d)
        q[-1] = float(rng.integers(0, 8))
        fast = store.query(q)
        slow = store.query(q, exact=True)
        assert fast[0] == slow[0]
        np.testing.assert_allclose(fast[1:], slow[1:], atol=1e-12)


def test_boxstore_matches_jax_store():
    """Host index and device store agree on counts/means."""
    import jax.numpy as jnp

    from dcarl_tpu.core import store as S

    rng = np.random.default_rng(3)
    d = 4
    widths = np.asarray([1.0, 1.0, 1.0, 0.1])
    host = NV.HostBoxStore(widths)
    dev = S.store_init(256, d)
    keys = rng.normal(0, 2, (120, d))
    vals = rng.normal(0, 1, 120)
    for i in range(120):
        host.insert(keys[i], 0.0, vals[i])
    dev = S.store_insert(dev, jnp.asarray(keys, jnp.float32),
                         jnp.zeros(120), jnp.asarray(vals, jnp.float32),
                         jnp.ones(120, bool))
    queries = rng.normal(0, 2, (20, d))
    stats = S.box_query_stats(dev, jnp.asarray(queries, jnp.float32),
                              jnp.asarray(widths, jnp.float32),
                              use_pallas=False)
    for i in range(20):
        cnt, mean, var = host.query(queries[i])
        assert cnt == int(stats.count[i])
        if cnt:
            np.testing.assert_allclose(mean, float(stats.mean[i]), atol=1e-4)


def test_boxstore_save_load(tmp_path):
    widths = np.asarray([0.5, 0.5])
    store = NV.HostBoxStore(widths)
    store.insert(np.asarray([1.0, 2.0]), 1.0, 3.0)
    store.insert(np.asarray([4.0, 5.0]), 0.0, -1.0)
    path = str(tmp_path / "store.bin")
    store.save(path)
    back = NV.HostBoxStore.load(path)
    assert len(back) == 2
    cnt, mean, var = back.query(np.asarray([1.1, 2.1]))
    assert cnt == 1 and mean == pytest.approx(3.0)


def test_record_log_roundtrip(tmp_path):
    path = str(tmp_path / "driving_record.bin")
    log = NV.RecordLog(path, width=4)
    rows = np.arange(12.0).reshape(3, 4)
    log.append(rows)
    log.append(np.asarray([100.0, 101.0, 102.0, 103.0]))
    log.close()
    back = NV.RecordLog.read(path, 4)
    assert back.shape == (4, 4)
    np.testing.assert_allclose(back[:3], rows)
    np.testing.assert_allclose(back[3], [100, 101, 102, 103])


def test_async_log_writer(tmp_path):
    from dcarl_tpu.utils.native import AsyncLogWriter

    path = str(tmp_path / "records.txt")
    with AsyncLogWriter(path) as w:
        for i in range(500):
            w.append(f"row {i}, value {i * 0.5}")
        w.flush()
        assert w.lines_written == 500
    lines = open(path).read().splitlines()
    assert len(lines) == 500
    assert lines[0] == "row 0, value 0.0"
    assert lines[499] == "row 499, value 249.5"

    # append mode across reopen
    with AsyncLogWriter(path) as w:
        w.append("tail")
    assert open(path).read().splitlines()[-1] == "tail"


def test_npy_mmap_roundtrip(tmp_path):
    import numpy as np

    from dcarl_tpu.utils.native import npy_mmap

    for dtype in (np.float32, np.float64, np.int32, np.int64, np.uint8):
        arr = (np.arange(60).reshape(3, 4, 5) % 250).astype(dtype)
        p = str(tmp_path / f"a_{np.dtype(dtype).name}.npy")
        np.save(p, arr)
        back = npy_mmap(p)
        assert back.dtype == dtype and back.shape == (3, 4, 5)
        np.testing.assert_array_equal(back, arr)

    vec = np.random.default_rng(0).normal(size=(17,))
    p = str(tmp_path / "vec.npy")
    np.save(p, vec)
    np.testing.assert_array_equal(npy_mmap(p), vec)


def test_npy_stream_chunks(tmp_path):
    import numpy as np

    from dcarl_tpu.utils.native import NpyStream

    rng = np.random.default_rng(1)
    data = rng.normal(size=(1003, 4)).astype(np.float64)
    p = str(tmp_path / "data.npy")
    np.save(p, data)

    with NpyStream(p, chunk_rows=100, n_buffers=3) as s:
        assert s.total_rows == 1003 and s.row_bytes == 32
        chunks = list(s)
    sizes = [len(c) for c in chunks]
    assert sizes == [100] * 10 + [3]
    np.testing.assert_array_equal(np.concatenate(chunks), data)

    # stream the real bundled dataset when the reference mount exists
    import os

    ref = "/root/reference/Simulation_testing/Simulation_1/data_carla.npy"
    if os.path.exists(ref):
        with NpyStream(ref, chunk_rows=4096) as s:
            total = sum(len(c) for c in s)
        assert total == 20000
