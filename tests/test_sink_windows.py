"""Sink crash-safety and window-assignment unit tests (no Ray)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from raystat.streaming.sink import ExactlyOnceParquetSink
from raystat.windows import Hopping, Tumbling, assign_windows


def test_sink_crash_mid_write_invisible(tmp_path):
    """A temp file left by a crashed write must not be visible to
    readers and must not block a later successful commit."""
    sink = ExactlyOnceParquetSink(str(tmp_path), "agg")
    # simulate a crash: stray temp file, no manifest
    with open(os.path.join(sink.tmp_dir, "epoch-000003.parquet"), "wb") as f:
        f.write(b"garbage-partial-write")
    assert sink.committed_epochs() == []
    assert sink.read_all().num_rows == 0
    t = pa.table({"source": pa.array(["a", "b"]), "v": pa.array([1.0, 2.0])})
    assert sink.commit(3, t, sort_by=["source"]) is True
    assert sink.committed_epochs() == [3]
    assert sink.read_all().num_rows == 2


def test_sink_reader_sees_only_manifested(tmp_path):
    sink = ExactlyOnceParquetSink(str(tmp_path), "agg")
    t = pa.table({"v": pa.array([1.0])})
    sink.commit(0, t)
    # an epoch directory WITHOUT a manifest (crash between rename and
    # manifest write) must be invisible
    d = os.path.join(sink.root, "epoch=000001")
    os.makedirs(d)
    import pyarrow.parquet as pq

    pq.write_table(t, os.path.join(d, "part-0.parquet"))
    assert sink.committed_epochs() == [0]
    assert sink.read_all().num_rows == 1


def test_sink_deterministic_bytes(tmp_path):
    """Same rows in different input order -> identical committed bytes
    (determinism requirement for exactly-once re-execution)."""
    t1 = pa.table({"source": pa.array(["b", "a"]), "v": pa.array([2.0, 1.0])})
    t2 = pa.table({"source": pa.array(["a", "b"]), "v": pa.array([1.0, 2.0])})
    s1 = ExactlyOnceParquetSink(str(tmp_path / "x"), "agg")
    s2 = ExactlyOnceParquetSink(str(tmp_path / "y"), "agg")
    s1.commit(0, t1, sort_by=["source"])
    s2.commit(0, t2, sort_by=["source"])
    b1 = open(os.path.join(s1.root, "epoch=000000", "part-0.parquet"), "rb").read()
    b2 = open(os.path.join(s2.root, "epoch=000000", "part-0.parquet"), "rb").read()
    assert b1 == b2


def _brute_hopping(ts_s: int, size: int, hop: int) -> list[int]:
    return [
        w
        for w in range(
            (ts_s // hop - size // hop - 2) * hop, ts_s + hop, hop
        )
        if w <= ts_s < w + size and w % hop == 0
    ]


@pytest.mark.parametrize("size,hop", [(10, 5), (9, 3), (7, 7), (10, 1)])
def test_hopping_assignment_matches_bruteforce(size, hop):
    ts = np.array([0, 1, 4, 5, 9, 10, 13, 100, 101], dtype=np.int64)
    batch = pa.table(
        {"ts": pa.array(ts), "row": pa.array(np.arange(len(ts)))}
    )
    out, ws = assign_windows(batch, "ts", Hopping(size, hop))
    rows = out["row"].to_numpy()
    got: dict[int, list[int]] = {}
    for r, w in zip(rows, ws):
        got.setdefault(int(r), []).append(int(w))
    for i, t in enumerate(ts):
        assert sorted(got[i]) == sorted(_brute_hopping(int(t), size, hop)), (
            i, t, size, hop,
        )


def test_tumbling_assignment():
    ts = np.array([0, 3599, 3600, 7199], dtype=np.int64)
    batch = pa.table({"ts": pa.array(ts)})
    out, ws = assign_windows(batch, "ts", Tumbling(3600))
    assert out.num_rows == 4
    assert list(ws) == [0, 0, 3600, 3600]


def test_hopping_invalid():
    with pytest.raises(ValueError):
        Hopping(5, 10)
    with pytest.raises(ValueError):
        Hopping(0, 0)
