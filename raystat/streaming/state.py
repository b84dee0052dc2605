"""Keyed state-store actors + the salted hash-routing stage.

The reference's state lives in ksqlDB's RocksDB stores partitioned by
the GROUP BY key, with ``merge()`` combining partials across partitions
(SURVEY.md §4.1).  Here: ``P`` ``StatePartition`` actors each own a
hash range of ``(source, salt)``; the routing stage inside the epoch's
``map_batches`` pipeline pushes *partial moment structs* (never raw
rows) to their owner — the explicit, tiny shuffle mandated by
BASELINE.json:north_star.

Skew: partials are pre-aggregated per ``(source, salt, window)`` with
``salt = numeric_doc_id % S``, so a hot source's state spreads over up
to S actors; the cross-salt merge happens once per window close on
O(closed windows) rows.

Fault tolerance: Ray does not recover actor state — each partition
checkpoints its accumulator dict per epoch (tiny: O(groups × windows ×
sums)) and the driver records the epoch frontier; resume restores the
snapshot and replays from the next epoch (SURVEY.md §4.2).
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

__all__ = ["StatePartition", "route_partition", "Router"]


def route_partition(source: np.ndarray, salt: np.ndarray, n_partitions: int) -> np.ndarray:
    """Stable partition assignment for (source, salt) pairs."""
    uniq, inv = np.unique(source, return_inverse=True)
    h = np.array([zlib.crc32(s.encode()) for s in uniq], dtype=np.int64)[inv]
    return ((h * 31 + salt.astype(np.int64)) % n_partitions).astype(np.int64)


_KEY = ["source", "salt", "window_start"]


@ray.remote(num_cpus=0)
class StatePartition:
    # num_cpus=0: merge work is tiny (partial structs); reserving CPU
    # shares would starve the map_batches stages in small sessions.
    """Owns per-(source, salt, window_start) accumulator sums.

    Merge strategy: ``ingest`` only APPENDS the incoming partial table
    (O(1) in the hot path — it runs once per upstream batch); the
    field-wise merge happens lazily at epoch boundaries
    (close/peek/snapshot) as ONE vectorized pandas concat + groupby-sum
    over everything pending, so per-key cost is C-loop, not Python-loop,
    at any key cardinality."""

    def __init__(self, partition_id: int, sum_cols: list[str], window_size_s: int):
        self.pid = partition_id
        self.sum_cols = list(sum_cols)
        self.window_size_s = window_size_s
        # consolidated state: MultiIndex (source, salt, window_start) ->
        # float64 sum columns
        self.state = pd.DataFrame(
            columns=self.sum_cols,
            index=pd.MultiIndex.from_arrays([[], [], []], names=_KEY),
            dtype=np.float64,
        )
        self.pending: list[pa.Table] = []
        self.error: str | None = None
        self.metrics = {"partial_rows_in": 0, "ingests": 0, "windows_closed": 0}

    def ingest_count(self) -> int:
        """Barrier probe; raises if any prior (fire-and-forget) ingest
        failed so errors surface at the next barrier poll instead of as
        a timeout 600s later."""
        if self.error is not None:
            raise RuntimeError(f"state partition {self.pid} ingest failed: {self.error}")
        return self.metrics["ingests"]

    def ingest(self, table: pa.Table) -> int:
        """Buffer a partial-sums table (cols: source, salt,
        window_start, *sum_cols).  Field-wise addition == the
        reference's merge(); deferred to _consolidate()."""
        try:
            n = table.num_rows
            if n:
                self.pending.append(table)
            self.metrics["partial_rows_in"] += n
        except Exception as e:  # surface via ingest_count, not a timeout
            self.error = repr(e)
            n = 0
        self.metrics["ingests"] += 1
        return n

    def _consolidate(self) -> None:
        if not self.pending:
            return
        tbl = pa.concat_tables(self.pending)
        self.pending = []
        df = tbl.select(_KEY + self.sum_cols).to_pandas()
        for c in self.sum_cols:
            if df[c].dtype != np.float64:
                df[c] = df[c].astype(np.float64)
        merged = df.groupby(_KEY, sort=False).sum()
        self.state = (
            merged
            if self.state.empty
            else self.state.add(merged, fill_value=0.0)
        )

    def _emit_table(self, df: pd.DataFrame) -> pa.Table:
        """(source, window_start, sums) rows, pre-merged across the
        salts this actor owns — the driver only concatenates shards and
        merges the (rare) cross-actor residue."""
        if not len(df):
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "window_start": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.float64()) for c in self.sum_cols},
                }
            )
        g = df.groupby(level=["source", "window_start"], sort=False).sum()
        idx = g.index
        return pa.table(
            {
                "source": pa.array(idx.get_level_values("source"), pa.string()),
                "window_start": pa.array(
                    idx.get_level_values("window_start").astype(np.int64)
                ),
                **{c: pa.array(g[c].to_numpy()) for c in self.sum_cols},
            }
        )

    def close_windows(self, watermark_s) -> pa.Table:
        """Pop and return all state whose window has fully passed the
        watermark (window_start + size <= watermark), merged across
        this actor's salts.  ``watermark_s`` may be a per-source dict
        (cfg.watermark_scope='per_source'): each row closes against its
        OWN source's frontier; sources absent from the dict never
        close (no events seen yet)."""
        self._consolidate()
        ws = self.state.index.get_level_values("window_start").to_numpy()
        if isinstance(watermark_s, dict):
            srcs = self.state.index.get_level_values("source")
            wm = srcs.map(lambda s: watermark_s.get(s, -(2**62))).to_numpy()
            closed_mask = ws + self.window_size_s <= wm
        else:
            closed_mask = ws + self.window_size_s <= watermark_s
        closed = self.state[closed_mask]
        self.state = self.state[~closed_mask]
        self.metrics["windows_closed"] += int(len(closed))
        return self._emit_table(closed)

    def get_metrics(self) -> dict:
        self._consolidate()
        return {"partition": self.pid, **self.metrics, "live_groups": len(self.state)}

    def get_state_size(self) -> int:
        self._consolidate()
        return len(self.state)

    def peek_state(self) -> pa.Table:
        """Non-destructive snapshot of ALL live state (EMIT CHANGES:
        finalize may be applied repeatedly to intermediate state)."""
        self._consolidate()
        return self._emit_table(self.state)

    # -- checkpoint / restore ---------------------------------------------

    def snapshot(self, ckpt_dir: str, epoch: int) -> str:
        self._consolidate()
        os.makedirs(ckpt_dir, exist_ok=True)
        df = self.state.sort_index()
        idx = df.index
        t = pa.table(
            {
                "source": pa.array(idx.get_level_values("source"), pa.string()),
                "salt": pa.array(idx.get_level_values("salt").astype(np.int64)),
                "window_start": pa.array(
                    idx.get_level_values("window_start").astype(np.int64)
                ),
                **{c: pa.array(df[c].to_numpy()) for c in self.sum_cols},
            }
        )
        path = os.path.join(ckpt_dir, f"state-p{self.pid:04d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return path

    def restore(self, ckpt_dir: str) -> int:
        """Rebuild state directly (no metrics side effects — see
        SessionStatePartition.restore)."""
        path = os.path.join(ckpt_dir, f"state-p{self.pid:04d}.parquet")
        self.pending = []
        self.state = self.state.iloc[0:0]
        if not os.path.exists(path):
            return 0
        t = pq.read_table(path)
        if t.num_rows:
            df = t.select(_KEY + self.sum_cols).to_pandas()
            for c in self.sum_cols:
                df[c] = df[c].astype(np.float64)
            self.state = df.set_index(_KEY)
        return t.num_rows


class Router:
    """Fused partial+route map_batches stage: computes the per-batch
    partial sums (via ``partial_fn``), pushes them to their owning
    StatePartition actor, and emits one bookkeeping row per batch
    (max event ts seen, late-drop count, raw row count) for the
    driver's watermark/metrics.  Fused into ONE stage so bookkeeping
    never crosses a rebatching boundary.  Ingests are fire-and-forget
    (blocking in ray.get inside tasks makes the raylet oversubscribe
    with fresh worker processes); the driver barriers at epoch end by
    polling the actors' ingest counters against the submitted-call
    count summed from the bookkeeping rows."""

    def __init__(self, actors: list, n_partitions: int, partial_fn):
        self.actors = actors
        self.P = n_partitions
        self.partial_fn = partial_fn
        self._crc: dict[str, int] = {}  # per-worker source-hash cache

    def _hash_sources(self, srcs: list) -> np.ndarray:
        cache = self._crc
        h = np.empty(len(srcs), dtype=np.int64)
        for i, s in enumerate(srcs):
            v = cache.get(s)
            if v is None:
                v = cache[s] = zlib.crc32(s.encode())
            h[i] = v
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        t0 = _time.monotonic()
        partial, info = self.partial_fn(batch)
        sec_fn = _time.monotonic() - t0
        max_ts = info["max_ts_us"]
        late = info["late_dropped"]
        rows_in = info["rows_in"]
        calls = 0
        if partial.num_rows:
            h = self._hash_sources(partial["source"].to_pylist())
            salt = partial["salt"].to_numpy(zero_copy_only=False)
            part = (h * 31 + salt.astype(np.int64)) % self.P
            # ONE take into partition order, then zero-copy slices per
            # partition (vs one filter pass per partition)
            order = np.argsort(part, kind="stable")
            tbl = partial.take(pa.array(order))
            sp = part[order]
            bounds = np.flatnonzero(np.diff(sp)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [sp.size]))
            for s, e in zip(starts, ends):
                self.actors[int(sp[s])].ingest.remote(tbl.slice(int(s), int(e - s)))
                calls += 1
        sec_route = _time.monotonic() - t0 - sec_fn
        return pa.table(
            {
                "max_ts_us": pa.array([max_ts], pa.int64()),
                "late_dropped": pa.array([late], pa.int64()),
                "rows_in": pa.array([rows_in], pa.int64()),
                "partial_rows": pa.array([partial.num_rows], pa.int64()),
                "ingest_calls": pa.array([calls], pa.int64()),
                "sec_fn": pa.array([sec_fn], pa.float64()),
                "sec_route": pa.array([sec_route], pa.float64()),
                # per-source max event ts (JSON; "" when the stage runs
                # with a global watermark) for per_source watermarking
                "src_max_json": pa.array(
                    [info.get("src_max_json", "")], pa.string()
                ),
            }
        )


@ray.remote(num_cpus=0)
class SessionStatePartition:
    """Session-window state store: open partial sessions
    ``(source, start_us, end_us, sums...)`` merged by the gap rule.

    Sessions are NOT salted: one source's session state must be
    contiguous to merge correctly (ksqlDB likewise processes one key in
    one partition).  This is exactly the case where the reference's
    ``merge()`` on overlapping partials is load-bearing (SESSION windows
    merge partial aggregates, SURVEY.md §2.2).

    Merge strategy mirrors StatePartition: ``ingest`` only APPENDS the
    incoming partial table (O(1) in the hot path); the gap-rule merge
    happens lazily at epoch boundaries as ONE vectorized sweep over
    everything pending — factorize sources, lexsort by (source, start),
    grouped end-cummax, cluster breaks where ``start - cummax(end) >
    gap``, then ``np.add.reduceat`` per sum column.  (The global
    grouped cummax is sufficient: a row starting beyond it is provably
    a new cluster, and any row inside a new cluster has ``end >= start
    > previous cummax``, so earlier clusters never leak into a later
    cluster's end.)  Same interval algorithm the batch path uses
    (aggregate.session_moments); C-loop per key at any source
    cardinality — no per-source or per-row Python."""

    def __init__(self, partition_id: int, sum_cols: list[str], gap_s: int):
        self.pid = partition_id
        self.sum_cols = list(sum_cols)
        self.gap_us = int(gap_s) * 1_000_000
        self._cols = ["session_start_us", "session_end_us"] + self.sum_cols
        self.state: pd.DataFrame = self._empty_state()
        self.pending: list[pa.Table] = []
        self.error: str | None = None
        self.metrics = {"partial_rows_in": 0, "ingests": 0, "sessions_closed": 0}

    def _empty_state(self) -> pd.DataFrame:
        d = {
            "source": pd.Series(dtype=object),
            "session_start_us": pd.Series(dtype=np.int64),
            "session_end_us": pd.Series(dtype=np.int64),
        }
        d.update({c: pd.Series(dtype=np.float64) for c in self.sum_cols})
        return pd.DataFrame(d)

    def ingest_count(self) -> int:
        if self.error is not None:
            raise RuntimeError(f"session partition {self.pid} ingest failed: {self.error}")
        return self.metrics["ingests"]

    def ingest(self, table: pa.Table) -> int:
        """Buffer a partial-sessions table (cols: source,
        session_start_us, session_end_us, *sum_cols); gap-rule merge
        deferred to _consolidate()."""
        try:
            n = table.num_rows
            if n:
                self.pending.append(table.select(["source"] + self._cols))
            self.metrics["partial_rows_in"] += n
        except Exception as e:  # surface via ingest_count, not a timeout
            self.error = repr(e)
            n = 0
        self.metrics["ingests"] += 1
        return n

    def _consolidate(self) -> None:
        if not self.pending:
            return
        new = pa.concat_tables(self.pending).to_pandas()
        self.pending = []
        new["session_start_us"] = new["session_start_us"].astype(np.int64)
        new["session_end_us"] = new["session_end_us"].astype(np.int64)
        for c in self.sum_cols:
            if new[c].dtype != np.float64:
                new[c] = new[c].astype(np.float64)
        allf = (
            pd.concat([self.state, new], ignore_index=True)
            if len(self.state)
            else new
        )
        codes, _ = pd.factorize(allf["source"], sort=False)
        start = allf["session_start_us"].to_numpy()
        end = allf["session_end_us"].to_numpy()
        order = np.lexsort((start, codes))
        codes_s, start_s, end_s = codes[order], start[order], end[order]
        cm = pd.Series(end_s).groupby(codes_s).cummax().to_numpy()
        n = len(codes_s)
        brk = np.ones(n, dtype=bool)
        brk[1:] = (codes_s[1:] != codes_s[:-1]) | (
            start_s[1:] - cm[:-1] > self.gap_us
        )
        starts_idx = np.flatnonzero(brk)
        last_idx = np.append(starts_idx[1:], n) - 1
        S = allf[self.sum_cols].to_numpy()[order]
        sums = np.add.reduceat(S, starts_idx, axis=0)
        merged = pd.DataFrame(
            {
                "source": allf["source"].to_numpy()[order][starts_idx],
                "session_start_us": start_s[starts_idx],
                "session_end_us": cm[last_idx].astype(np.int64),
            }
        )
        for j, c in enumerate(self.sum_cols):
            merged[c] = sums[:, j]
        self.state = merged

    def _emit_table(self, df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "source": pa.array(df["source"].tolist(), pa.string()),
                "session_start_us": pa.array(
                    df["session_start_us"].to_numpy().astype(np.int64)
                ),
                "session_end_us": pa.array(
                    df["session_end_us"].to_numpy().astype(np.int64)
                ),
                **{c: pa.array(df[c].to_numpy()) for c in self.sum_cols},
            }
        )

    def close_windows(self, watermark_s) -> pa.Table:
        """Pop sessions that can no longer be extended:
        end + gap <= watermark.  Accepts a per-source watermark dict
        like StatePartition.close_windows."""
        self._consolidate()
        if isinstance(watermark_s, dict):
            wm_us = (
                self.state["source"]
                .map(lambda s: watermark_s.get(s, -(2**62)))
                .to_numpy(dtype=np.float64)
                * 1_000_000
            )
        else:
            wm_us = watermark_s * 1_000_000
        closed_mask = (
            self.state["session_end_us"].to_numpy() + self.gap_us <= wm_us
        )
        closed = self.state[closed_mask]
        self.state = self.state[~closed_mask].reset_index(drop=True)
        self.metrics["sessions_closed"] += int(len(closed))
        return self._emit_table(closed)

    def get_metrics(self) -> dict:
        self._consolidate()
        return {
            "partition": self.pid,
            **self.metrics,
            "live_sources": int(self.state["source"].nunique()),
        }

    def peek_state(self) -> pa.Table:
        """Non-destructive snapshot of all live sessions."""
        self._consolidate()
        return self._emit_table(
            self.state.sort_values(
                ["source", "session_start_us"], ignore_index=True
            )
        )

    def snapshot(self, ckpt_dir: str, epoch: int) -> str:
        os.makedirs(ckpt_dir, exist_ok=True)
        t = self.peek_state()
        path = os.path.join(ckpt_dir, f"sess-p{self.pid:04d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return path

    def restore(self, ckpt_dir: str) -> int:
        """Rebuild ``self.state`` directly from the snapshot WITHOUT
        touching metrics: the driver's ingest barrier compares the
        actors' cumulative ingest counters against the calls submitted
        since (re)start, so a restore routed through ``ingest()`` would
        give the counters a head start and let the barrier pass while
        the current epoch's ingests are still queued."""
        path = os.path.join(ckpt_dir, f"sess-p{self.pid:04d}.parquet")
        self.pending = []
        self.state = self._empty_state()
        if not os.path.exists(path):
            return 0
        t = pq.read_table(path)
        if t.num_rows:
            df = t.select(["source"] + self._cols).to_pandas()
            df["session_start_us"] = df["session_start_us"].astype(np.int64)
            df["session_end_us"] = df["session_end_us"].astype(np.int64)
            for c in self.sum_cols:
                df[c] = df[c].astype(np.float64)
            self.state = df
        return t.num_rows


class SessionRouter:
    """Fused partial-session + route stage: builds within-batch partial
    sessions per source and pushes them to the owning session actor
    (hash on source alone)."""

    def __init__(self, actors: list, n_partitions: int, partial_fn):
        self.actors = actors
        self.P = n_partitions
        self.partial_fn = partial_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        t0 = _time.monotonic()
        partial, info = self.partial_fn(batch)
        sec_fn = _time.monotonic() - t0
        calls = 0
        if partial.num_rows:
            src = np.asarray(partial["source"].to_pylist())
            part = route_partition(src, np.zeros(len(src), dtype=np.int64), self.P)
            for p in np.unique(part):
                sub = partial.filter(pa.array(part == p))
                self.actors[int(p)].ingest.remote(sub)
                calls += 1
        sec_route = _time.monotonic() - t0 - sec_fn
        return pa.table(
            {
                "max_ts_us": pa.array([info["max_ts_us"]], pa.int64()),
                "late_dropped": pa.array([info["late_dropped"]], pa.int64()),
                "rows_in": pa.array([info["rows_in"]], pa.int64()),
                "partial_rows": pa.array([partial.num_rows], pa.int64()),
                "ingest_calls": pa.array([calls], pa.int64()),
                "sec_fn": pa.array([sec_fn], pa.float64()),
                "sec_route": pa.array([sec_route], pa.float64()),
                "src_max_json": pa.array(
                    [info.get("src_max_json", "")], pa.string()
                ),
            }
        )
