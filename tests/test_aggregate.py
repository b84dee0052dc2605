"""Batch grouped/windowed aggregation vs DuckDB oracles on the driver
testdata (sf0.001).  Mirrors the reference's end-to-end integration
layer (AllUdafIT.java:162-452) with SQL twins of the power-sum
formulas."""

from __future__ import annotations

import pytest

from raystat.aggregate import grouped_moments, session_moments
from raystat.windows import Hopping, Tumbling
from tests.util import assert_frames_close, duck

SF = "/root/testdata/sf0.001"

WAVG = "sum(l_quantity*l_extendedprice)/sum(l_quantity)"
WVAR = f"(sum(l_quantity*l_extendedprice*l_extendedprice)/sum(l_quantity) - pow({WAVG},2))"


@pytest.fixture(scope="module")
def con():
    c = duck(SF)
    yield c
    c.close()


@pytest.fixture(scope="module")
def lineitem(ray_session):
    import ray.data as rd

    return rd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )


@pytest.fixture(scope="module")
def events(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])


def test_weighted_grouped(lineitem, con):
    got = grouped_moments(
        lineitem,
        {
            "wavg": "weighted_average",
            "wstd": "stddev_weighted",
            "wskew": "skewness_weighted",
            "wkurt": "kurtosis_weighted",
        },
        ["l_returnflag"],
        value="l_extendedprice",
        weight="l_quantity",
    )
    expected = con.sql(f"""
        SELECT l_returnflag,
          {WAVG} AS wavg,
          sqrt(greatest({WVAR},0)) AS wstd,
          (sum(l_quantity*pow(l_extendedprice,3))/sum(l_quantity)
            - 3*({WAVG})*(sum(l_quantity*l_extendedprice*l_extendedprice)/sum(l_quantity))
            + 2*pow({WAVG},3)) / pow(greatest({WVAR},0), 1.5) AS wskew,
          (sum(l_quantity*pow(l_extendedprice,4))/sum(l_quantity)
            - 4*({WAVG})*(sum(l_quantity*pow(l_extendedprice,3))/sum(l_quantity))
            + 6*pow({WAVG},2)*(sum(l_quantity*l_extendedprice*l_extendedprice)/sum(l_quantity))
            - 3*pow({WAVG},4)) / pow({WVAR},2) AS wkurt
        FROM lineitem GROUP BY l_returnflag
    """).df()
    assert_frames_close(got, expected, ["l_returnflag"], rel=1e-9)


def test_unweighted_grouped(events, con):
    got = grouped_moments(
        events,
        {"skew": "skewness", "kurt": "kurtosis"},
        ["event_type"],
        value="value",
    )
    expected = con.sql("""
        SELECT event_type,
          CASE WHEN var_pop(value)=0 THEN 0.0 ELSE
            (sum(pow(value,3))/count(value) - 3*avg(value)*(sum(value*value)/count(value)) + 2*pow(avg(value),3))
            / pow(sum(value*value)/count(value) - pow(avg(value),2), 1.5) END AS skew,
          CASE WHEN var_pop(value)=0 THEN 0.0 ELSE
            (sum(pow(value,4))/count(value) - 4*avg(value)*(sum(pow(value,3))/count(value))
             + 6*pow(avg(value),2)*(sum(value*value)/count(value)) - 3*pow(avg(value),4))
            / pow(sum(value*value)/count(value) - pow(avg(value),2), 2) END AS kurt
        FROM events GROUP BY event_type
    """).df()
    assert_frames_close(got, expected, ["event_type"], rel=1e-7)


def test_tumbling_window(events, con):
    got = grouped_moments(
        events,
        {"wavg": "weighted_average", "wstd": "stddev_weighted"},
        ["event_type"],
        value="value",
        weight="value",
        window=Tumbling(86400),
        ts="ts",
    )
    wa = "sum(value*value)/sum(value)"
    expected = con.sql(f"""
        SELECT event_type,
          cast(floor(epoch(ts)/86400)*86400 as bigint) AS window_start,
          {wa} AS wavg,
          sqrt(greatest(sum(value*value*value)/sum(value) - pow({wa},2),0)) AS wstd
        FROM events GROUP BY event_type, window_start
    """).df()
    assert_frames_close(got, expected, ["event_type", "window_start"], rel=1e-9)


def test_hopping_window(events, con):
    got = grouped_moments(
        events,
        {"avg_v": "weighted_average"},
        ["event_type"],
        value="value",
        weight="value",
        window=Hopping(2 * 86400, 86400),
        ts="ts",
    )
    expected = con.sql("""
        SELECT event_type,
          (cast(floor(epoch(ts)/86400) as bigint) - k.i) * 86400 AS window_start,
          sum(value*value)/sum(value) AS avg_v
        FROM events CROSS JOIN (VALUES (0),(1)) k(i)
        WHERE (cast(floor(epoch(ts)/86400) as bigint) - k.i) * 86400 > epoch(ts) - 2*86400
        GROUP BY event_type, window_start
    """).df()
    assert_frames_close(got, expected, ["event_type", "window_start"], rel=1e-9)


def test_session_window(events, con):
    gap = 7200
    got = session_moments(
        events,
        {"wavg": "weighted_average"},
        ["event_type"],
        value="value",
        weight="value",
        ts="ts",
        gap_s=gap,
    )
    expected = con.sql(f"""
        WITH t AS (
          SELECT event_type, value, epoch_us(ts) AS tu,
                 lag(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY epoch_us(ts)) AS prev
          FROM events
        ), s AS (
          SELECT *, sum(CASE WHEN prev IS NULL OR tu - prev > cast({gap} as bigint)*1000000 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY event_type ORDER BY tu ROWS UNBOUNDED PRECEDING) AS sess
          FROM t
        )
        SELECT event_type, min(tu) AS session_start_us, max(tu) AS session_end_us,
               sum(value*value)/sum(value) AS wavg
        FROM s GROUP BY event_type, sess
    """).df()
    assert_frames_close(
        got, expected, ["event_type", "session_start_us"], rel=1e-9
    )


def test_global_aggregate(lineitem, con):
    got = grouped_moments(
        lineitem, {"wavg": "weighted_average"}, None,
        value="l_extendedprice", weight="l_quantity",
    )
    expected = con.sql(f"SELECT {WAVG} AS wavg FROM lineitem").df()
    assert_frames_close(got, expected, ["wavg"], rel=1e-9)


def test_partial_batch_invariance(lineitem, con, ray_session):
    """Result is independent of batch slicing (merge associativity in
    the distributed setting)."""
    a = grouped_moments(
        lineitem, {"wstd": "stddev_weighted"}, ["l_returnflag"],
        value="l_extendedprice", weight="l_quantity", batch_size=128,
    ).to_pandas()
    b = grouped_moments(
        lineitem.repartition(7), {"wstd": "stddev_weighted"}, ["l_returnflag"],
        value="l_extendedprice", weight="l_quantity", batch_size=1024,
    ).to_pandas()
    assert_frames_close(a, b, ["l_returnflag"], rel=1e-9)
