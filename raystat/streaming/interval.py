"""STREAMING stream-stream interval join (ksqlDB ``JOIN ... WITHIN``)
— the stateful, watermark-driven counterpart of the batch
``dataops.interval_join`` operator, running through the same
engine conventions as the windowed-aggregate driver: arrival-epoch
micro-batches, key-hash-partitioned state actors, an ingest barrier,
event-time watermarks with allowed lateness, per-epoch checkpoints,
and an exactly-once pair sink.

Semantics: emit every (left, right) pair with equal ``by`` key and
``left.on - before <= right.on <= left.on + after`` (inclusive).  A
left row becomes EMITTABLE once the watermark passes ``left.on +
after`` — at that point every matching right row has arrived (the
watermark guarantee), so each left row emits its complete pair set
exactly once and retires.  Right rows retire when no retained or
future left row can still reach them (``right.on + before`` falls
below both the watermark and the oldest retained left row).

State per partition is therefore bounded by the rows whose event time
lies within ``before + after + allowed_lateness`` of the stream head —
the same bound ksqlDB's WITHIN grace puts on its join state — NOT by
stream length.  The only shuffle is the one key-hash route of both
sides; pair expansion happens inside the owning partition.

Rows are pre-tagged (``_side``: 1 = left, 0 = right) on a unified
schema, mirroring how the batch operator's tagged union ships both
sides through one exchange.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from raystat.dataops.asof import _key_u64
from raystat.dataops.interval_join import interval_join_frames
from raystat.streaming.epochs import EpochDriverBase
from raystat.streaming.sink import ExactlyOnceParquetSink

__all__ = [
    "IntervalJoinConfig",
    "IntervalStreamDriver",
    "events_interval_fixture",
]

_NEG = -(2**62)


@dataclass
class IntervalJoinConfig:
    by: str = "user_id"
    on: str = "ts_us"  # int64 microseconds (fixture-normalized)
    right_cols: tuple = ("touch_id", "touch_ts_us")
    before_s: int = 7200
    after_s: int = 0
    allowed_lateness_s: int = 3600
    n_partitions: int = 8
    batch_size: int | None = None

    @property
    def before_us(self) -> int:
        return int(self.before_s) * 1_000_000

    @property
    def after_us(self) -> int:
        return int(self.after_s) * 1_000_000


@ray.remote(num_cpus=0)
class IntervalJoinPartition:
    """Join state for one key-hash partition: buffered rows of BOTH
    sides on the unified tagged schema.  ``ingest`` only appends (O(1)
    hot path); the pair sweep happens once per epoch in
    ``emit_pairs`` as a single vectorized ``interval_join_frames``
    call over (newly-emittable lefts x all buffered rights)."""

    def __init__(self, pid: int, by: str, on: str, right_cols: list[str],
                 before_us: int, after_us: int):
        self.pid = pid
        self.by = by
        self.on = on
        self.right_cols = list(right_cols)
        self.before_us = int(before_us)
        self.after_us = int(after_us)
        self.pending: list[pa.Table] = []
        self.state: pd.DataFrame | None = None  # unified schema + _side
        self.error: str | None = None
        self.metrics = {
            "rows_in": 0, "ingests": 0, "pairs_emitted": 0,
            "left_buffered": 0, "right_buffered": 0, "right_retired": 0,
        }

    def ingest_count(self) -> int:
        if self.error is not None:
            raise RuntimeError(f"interval partition {self.pid} ingest failed: {self.error}")
        return self.metrics["ingests"]

    def ingest(self, table: pa.Table) -> int:
        try:
            n = table.num_rows
            if n:
                self.pending.append(table)
            self.metrics["rows_in"] += n
        except Exception as e:
            self.error = repr(e)
            n = 0
        self.metrics["ingests"] += 1
        return n

    def _consolidate(self) -> None:
        if self.pending:
            new = pa.concat_tables(self.pending, promote_options="default").to_pandas()
            self.pending = []
            new[self.on] = new[self.on].astype(np.int64)
            self.state = (
                new if self.state is None or not len(self.state)
                else pd.concat([self.state, new], ignore_index=True)
            )

    def emit_pairs(self, watermark_us: int) -> pa.Table:
        """Pairs for every left row whose ``on + after`` is now below
        the watermark; retires those lefts and any unreachable rights."""
        self._consolidate()
        df = self.state
        empty = pa.table({})
        if df is None or not len(df):
            return empty
        side = df["_side"].to_numpy()
        ts = df[self.on].to_numpy()
        is_left = side == 1
        ready = is_left & (ts + self.after_us < watermark_us)

        out = empty
        if ready.any():
            cand = df[ready | ~is_left]
            pairs = interval_join_frames(
                cand, by=self.by, on=self.on, right_cols=self.right_cols,
                before=self.before_us, after=self.after_us,
            )
            self.metrics["pairs_emitted"] += len(pairs)
            if len(pairs):
                out = pa.Table.from_pandas(pairs, preserve_index=False)

        # retire emitted lefts; retire rights no retained-or-future left reaches
        keep_left = is_left & ~ready
        left_min = int(ts[keep_left].min()) if keep_left.any() else watermark_us
        reach = min(int(watermark_us), left_min)
        keep_right = (~is_left) & (ts + self.before_us >= reach)
        self.metrics["right_retired"] += int((~is_left).sum() - keep_right.sum())
        self.state = df[keep_left | keep_right].reset_index(drop=True)
        self.metrics["left_buffered"] = int(keep_left.sum())
        self.metrics["right_buffered"] = int(keep_right.sum())
        return out

    def get_metrics(self) -> dict:
        return {"partition": self.pid, **self.metrics}

    # -- checkpoint ---------------------------------------------------------

    def snapshot(self, ckpt_dir: str, epoch: int) -> str:
        os.makedirs(ckpt_dir, exist_ok=True)
        self._consolidate()
        path = os.path.join(ckpt_dir, f"ivj-p{self.pid:04d}.parquet")
        tmp = path + ".tmp"
        df = self.state if self.state is not None else pd.DataFrame()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
        os.replace(tmp, path)
        return path

    def restore(self, ckpt_dir: str) -> int:
        """Rebuild buffers from the snapshot WITHOUT touching metrics
        (the ingest barrier counts calls since restart)."""
        path = os.path.join(ckpt_dir, f"ivj-p{self.pid:04d}.parquet")
        self.pending = []
        self.state = None
        if not os.path.exists(path):
            return 0
        t = pq.read_table(path)
        if t.num_rows:
            df = t.to_pandas()
            df[self.on] = df[self.on].astype(np.int64)
            self.state = df
        return t.num_rows


class IntervalRouter:
    """Fused late-drop + route stage: drops rows older than the
    watermark in force at ingest, key-hash-routes the rest to their
    owning partition actor (fire-and-forget; the driver barriers on
    the actors' ingest counters), and emits one bookkeeping row per
    batch for the driver's watermark and metrics."""

    def __init__(self, actors: list, n_partitions: int, by: str, on: str,
                 watermark_us: int):
        self.actors = actors
        self.P = n_partitions
        self.by = by
        self.on = on
        self.wm = int(watermark_us)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows_in = batch.num_rows
        ts = batch[self.on].to_numpy(zero_copy_only=False).astype(np.int64)
        max_ts = int(ts.max()) if rows_in else -1
        live = ts >= self.wm
        late = int(rows_in - live.sum())
        calls = 0
        if live.any():
            tbl = batch.filter(pa.array(live)) if late else batch
            k = tbl[self.by].to_numpy(zero_copy_only=False)
            part = (_key_u64(k) % np.uint64(self.P)).astype(np.int64)
            order = np.argsort(part, kind="stable")
            tbl = tbl.take(pa.array(order))
            sp = part[order]
            bounds = np.flatnonzero(np.diff(sp)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [sp.size]))
            for s, e in zip(starts, ends):
                self.actors[int(sp[s])].ingest.remote(tbl.slice(int(s), int(e - s)))
                calls += 1
        return pa.table(
            {
                "max_ts_us": pa.array([max_ts], pa.int64()),
                "late_dropped": pa.array([late], pa.int64()),
                "rows_in": pa.array([rows_in], pa.int64()),
                "ingest_calls": pa.array([calls], pa.int64()),
            }
        )


class IntervalStreamDriver(EpochDriverBase):
    """Epoch loop for the streaming interval join: read arrival=N →
    route/ingest → barrier → advance watermark → emit complete pairs →
    exactly-once commit → checkpoint.  Crash/resume replays the failed
    epoch from the last checkpoint; committed epochs re-commit as
    no-ops (same protocol as the aggregate driver).  Epoch/barrier/
    checkpoint plumbing comes from EpochDriverBase."""

    def __init__(self, input_dir: str, out_dir: str, cfg: IntervalJoinConfig | None = None):
        super().__init__(input_dir, out_dir)
        self.cfg = cfg or IntervalJoinConfig()
        self.sink = ExactlyOnceParquetSink(out_dir, "pairs")
        self.watermark_us = _NEG

    def _ensure_actors(self):
        if self.actors is None:
            c = self.cfg
            self.actors = [
                IntervalJoinPartition.remote(
                    p, c.by, c.on, list(c.right_cols), c.before_us, c.after_us
                )
                for p in range(c.n_partitions)
            ]

    def _driver_state(self) -> dict:
        return {"watermark_us": self.watermark_us,
                "committed": self.sink.committed_epochs()}

    def _load_driver_state(self, state: dict) -> None:
        self.watermark_us = int(state["watermark_us"])

    def _run_epoch(self, epoch: int):
        ds = self._epoch_dataset(epoch)
        em = {"rows_in": 0, "late_dropped": 0, "max_ts_us": -1}
        if ds is not None:
            router = IntervalRouter(
                self.actors, self.cfg.n_partitions, self.cfg.by, self.cfg.on,
                self.watermark_us,
            )
            kwargs = {"batch_format": "pyarrow", "max_retries": 0,
                      "zero_copy_batch": True}
            if self.cfg.batch_size:
                kwargs["batch_size"] = self.cfg.batch_size
            stats = ds.map_batches(router, **kwargs).to_pandas()
            if len(stats):
                em["rows_in"] = int(stats["rows_in"].sum())
                em["late_dropped"] = int(stats["late_dropped"].sum())
                em["max_ts_us"] = int(stats["max_ts_us"].max())
                self._ingest_expected += int(stats["ingest_calls"].sum())
            self._ingest_barrier()
        if em["max_ts_us"] >= 0:
            self.watermark_us = max(
                self.watermark_us,
                em["max_ts_us"] - self.cfg.allowed_lateness_s * 1_000_000,
            )
        self._emit(epoch, self.watermark_us)
        em["watermark_us"] = self.watermark_us
        self.metrics[str(epoch)] = em

    def _emit(self, epoch: int, watermark_us: int):
        tables = [
            t for t in ray.get(
                [a.emit_pairs.remote(watermark_us) for a in self.actors]
            )
            if t.num_rows
        ]
        if tables:
            out = pa.concat_tables(tables, promote_options="default")
            sort_cols = [c for c in out.column_names if not c.startswith("_")]
            self.sink.commit(epoch, out, sort_by=sort_cols)
        else:
            self.sink.commit(epoch, pa.table({}))

    def _finalize_stream(self, final_epoch: int):
        self._emit(final_epoch, 2**62)  # end of stream: everything closes
        self.metrics["final"] = {
            "epoch": final_epoch,
            "state_metrics": ray.get([a.get_metrics.remote() for a in self.actors]),
        }

    def result_table(self) -> pa.Table:
        return self.sink.read_all()


# -- fixture ------------------------------------------------------------------


def events_interval_fixture(
    sf_dir: str,
    n_epochs: int = 4,
    root: str = "/tmp/raystat_fixtures",
) -> str:
    """Materialize the events table as an arrival-partitioned tagged
    two-sided stream for the interval join: purchases are the LEFT
    side, click/view touches the RIGHT, on the unified schema
    ``(user_id, ts_us, _side, purchase_id, touch_id, touch_ts_us)``.
    Arrival epoch = event-time quantile, except a deterministic 5% of
    rows (event_id % 20 == 0) arrive one epoch LATE — inside the
    driver's allowed lateness, so results still equal the batch join.
    Cached per sf_dir; returns the fixture dir."""
    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(root, f"events_ivj_{tag}_e{n_epochs}")
    done = os.path.join(out, "_fixture.json")
    params = {"sf_dir": sf_dir, "n_epochs": n_epochs, "v": 1}
    if os.path.exists(done):
        try:
            with open(done) as f:
                if json.load(f) == params:
                    return out
        except Exception:
            pass
    import shutil

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(tmp)
    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    ev_type = t["event_type"].to_numpy(zero_copy_only=False)
    is_left = ev_type == "purchase"
    is_right = np.isin(ev_type, ("click", "view"))
    keep = is_left | is_right
    eid = t["event_id"].to_numpy(zero_copy_only=False)[keep]
    uid = t["user_id"].to_numpy(zero_copy_only=False)[keep]
    ts_us = (
        t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)[keep]
    )
    side = is_left[keep].astype(np.int8)
    n = len(eid)
    # event-time quantile epoch, then the deterministic late subset
    order = np.argsort(ts_us, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    epoch = np.minimum((rank * n_epochs) // max(n, 1), n_epochs - 1)
    late = (eid % 20) == 0
    epoch = np.minimum(epoch + late, n_epochs - 1)
    tbl = pa.table(
        {
            "user_id": pa.array(uid, pa.int64()),
            "ts_us": pa.array(ts_us, pa.int64()),
            "_side": pa.array(side, pa.int8()),
            "purchase_id": pa.array(np.where(side == 1, eid, -1), pa.int64()).cast(pa.int64()),
            "touch_id": pa.array(np.where(side == 0, eid, -1), pa.int64()),
            "touch_ts_us": pa.array(np.where(side == 0, ts_us, -1), pa.int64()),
        }
    )
    for e in range(n_epochs):
        d = os.path.join(tmp, f"arrival={e}")
        os.makedirs(d)
        pq.write_table(
            tbl.filter(pa.array(epoch == e)), os.path.join(d, "part-0.parquet")
        )
    with open(os.path.join(tmp, "_fixture.json"), "w") as f:
        json.dump(params, f)
    os.replace(tmp, out)
    return out
