"""Streaming windowed HLL distinct: streamed registers equal the
batch registers over the same rows (max-merge order independence),
ingest idempotence (replay safety), late-drop behaviour, and
crash/resume exactly-once."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from raystat.dataops.sketches import _M, _rho_and_idx, hll_estimate
from raystat.streaming.sketch import (
    HllStatePartition,
    HllStreamDriver,
    events_stream_fixture,
)

SF = "/root/testdata/sf0.001"
WEEK = 7 * 86400
LATENESS = 200 * 3600  # > the fixture's one-epoch arrival lag: zero drops


def _expected(fix: str, size_s: int) -> pd.DataFrame:
    """Direct register computation per (key, window) over ALL rows."""
    fs = sorted(glob.glob(os.path.join(fix, "arrival=*", "*.parquet")))
    df = pa.concat_tables([pq.read_table(f) for f in fs]).to_pandas()
    df["w"] = (df["ts_us"] // 1_000_000 // size_s) * size_s
    rows = []
    for (k, w), g in df.groupby(["event_type", "w"]):
        regs = np.zeros(_M, dtype=np.uint8)
        idx, rho = _rho_and_idx(g["user_id"].to_numpy())
        np.maximum.at(regs, idx, rho)
        rows.append(
            {"key": k, "window_start_s": int(w),
             "approx_distinct": hll_estimate(regs)}
        )
    return pd.DataFrame(rows).sort_values(
        ["key", "window_start_s"], ignore_index=True
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["key", "window_start_s"], ignore_index=True)[
        ["key", "window_start_s", "approx_distinct"]
    ]


def test_streamed_equals_batch_registers(ray_session):
    fix = events_stream_fixture(SF, n_epochs=4)
    out = tempfile.mkdtemp(prefix="rs_hll_")
    try:
        drv = HllStreamDriver(
            fix, out, window_size_s=WEEK, allowed_lateness_s=LATENESS,
            n_partitions=4,
        )
        m = drv.run()
        got = _norm(drv.result_table().to_pandas())
        exp = _norm(_expected(fix, WEEK))
        pd.testing.assert_frame_equal(got, exp)
        assert sum(e["late_dropped"] for k, e in m["epochs"].items() if k != "final") == 0
        # windows close progressively, not only at the tail flush
        nonempty = sum(
            1 for p in drv.sink.committed_paths()
            if pq.read_metadata(p).num_rows > 0
        )
        assert nonempty >= 2
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_ingest_idempotence(ray_session):
    """Max-merge is idempotent: replaying the SAME partial changes
    nothing — the property that makes epoch replay safe without
    de-duplication bookkeeping."""
    idx, rho = _rho_and_idx(np.arange(1000))
    regs = np.zeros(_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    partial = pa.table(
        {
            "key": pa.array(["a"], pa.string()),
            "window_start_s": pa.array([0], pa.int64()),
            "regs": pa.array([regs.tobytes()], pa.binary()),
        }
    )
    actor = HllStatePartition.remote(0, 3600)
    ray.get(actor.ingest.remote(partial))
    once = ray.get(actor.close_windows.remote(2**62)).to_pandas()

    actor2 = HllStatePartition.remote(0, 3600)
    ray.get(actor2.ingest.remote(partial))
    ray.get(actor2.ingest.remote(partial))
    ray.get(actor2.ingest.remote(partial))
    thrice = ray.get(actor2.close_windows.remote(2**62)).to_pandas()
    pd.testing.assert_frame_equal(once, thrice)


def test_late_rows_drop_when_window_closed(ray_session):
    """With tight lateness, rows for already-closed windows are
    dropped at the router and counted."""
    fix = events_stream_fixture(SF, n_epochs=4)
    out = tempfile.mkdtemp(prefix="rs_hll_")
    try:
        drv = HllStreamDriver(
            fix, out, window_size_s=3600, allowed_lateness_s=0, n_partitions=4
        )
        m = drv.run()
        late = sum(e["late_dropped"] for k, e in m["epochs"].items() if k != "final")
        assert late > 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_crash_resume_exactly_once(ray_session):
    fix = events_stream_fixture(SF, n_epochs=4)
    out1 = tempfile.mkdtemp(prefix="rs_hll_")
    out2 = tempfile.mkdtemp(prefix="rs_hll_")
    try:
        kw = dict(window_size_s=WEEK, allowed_lateness_s=LATENESS, n_partitions=4)
        ref = HllStreamDriver(fix, out1, **kw)
        ref.run()
        expected = _norm(ref.result_table().to_pandas())

        d1 = HllStreamDriver(fix, out2, **kw)
        d1.run(stop_after_epoch=1)
        d2 = HllStreamDriver(fix, out2, **kw)
        d2.run(resume=True)
        got = _norm(d2.result_table().to_pandas())
        pd.testing.assert_frame_equal(got, expected)
    finally:
        shutil.rmtree(out1, ignore_errors=True)
        shutil.rmtree(out2, ignore_errors=True)
