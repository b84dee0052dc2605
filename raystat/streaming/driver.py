"""The streaming driver: epoch loop, watermarks, window close, join,
exactly-once commit, checkpoint/resume (SURVEY.md §3.2 trace).

Input layout: ``input_dir/arrival={e}/*.parquet`` — each arrival epoch
is a group of Parquet files of token rows (the sandbox stand-in for a
partitioned log; per-epoch file groups are what a streamed source
delivers).  Event time is derived from ``doc_id``
(:mod:`raystat.extract`), so the watermark is reproducible from the
input alone.

Per epoch ``e``:

1. build a lazy Dataset over epoch ``e``'s files
2. ``map_batches`` partial stage (stateless, zero-copy Arrow): derive
   event time, assign tumbling/hopping windows, drop+count rows whose
   window already closed (late beyond watermark), pre-aggregate power
   sums per ``(source, salt, window_start)``
3. ``map_batches`` Router stage: push partials to their owning
   StatePartition actor (the explicit salted hash shuffle); bookkeeping
   rows (max event ts, late counts) flow back through the Dataset
4. advance watermark to ``max_event_ts - allowed_lateness``; actors pop
   state of windows with ``window_end <= watermark``; cross-salt merge
   (field-wise add) + vectorized finalize
5. join against the metadata stream state (grace-buffered left join)
6. commit via the exactly-once sink; optional exact per-row passthrough
   (same late-drop predicate, token arrays untouched)
7. checkpoint actor snapshots + driver state (watermark, join buffer,
   metrics, lineage) — resume replays from the next epoch; re-commits
   of already-manifested epochs are no-ops.
"""

from __future__ import annotations

import glob
import json
import os
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from raystat.accumulators import canonical_sums_for, get_spec
from raystat.aggregate import partial_sums
from raystat.extract import event_time_us_from_numeric, numeric_doc_id
from raystat.streaming.join import MetadataJoin
from raystat.streaming.sink import ExactlyOnceParquetSink
from raystat.streaming.state import Router, StatePartition

__all__ = ["StreamConfig", "StreamDriver"]


@dataclass
class StreamConfig:
    specs: dict[str, str] = field(
        default_factory=lambda: {
            "wavg": "weighted_average",
            "wstd": "stddev_weighted",
            "skew": "skewness",
            "kurt": "kurtosis",
        }
    )
    value_col: str = "n_tok"  # token-length statistics by default
    weight_col: str | None = "n_tok"  # weight for the weighted variants
    window_size_s: int = 3600
    hop_s: int | None = None  # None => tumbling; else hopping
    allowed_lateness_s: int = 1800
    n_partitions: int = 8  # state-store actors (fix >= max CPUs for N/4N runs)
    n_salts: int = 4  # salt buckets per source for skew spreading
    join_grace_epochs: int = 2
    batch_size: int | None = None
    passthrough: bool = False


def _partial_stage(cfg: StreamConfig, needed, u_order, w_order, watermark_s: int):
    size_s = cfg.window_size_s
    hop_s = cfg.hop_s
    value_col, weight_col, n_salts = cfg.value_col, cfg.weight_col, cfg.n_salts

    def fn(batch: pa.Table) -> tuple[pa.Table, dict]:
        rows_in = batch.num_rows
        ids = numeric_doc_id(batch["doc_id"])
        ts_us = event_time_us_from_numeric(ids)
        max_ts = int(ts_us.max()) if rows_in else -1
        ts_s = ts_us // 1_000_000
        salt = (ids % n_salts).astype(np.int64)
        src = batch["source"]
        x = batch[value_col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        w = (
            batch[weight_col].cast(pa.float64()).to_numpy(zero_copy_only=False)
            if weight_col is not None
            else None
        )
        if hop_s is None:
            ws = (ts_s // size_s) * size_s
        else:
            k_max = ts_s // hop_s
            k_min = (ts_s - size_s) // hop_s + 1
            counts = (k_max - k_min + 1).astype(np.int64)
            idx = np.repeat(np.arange(rows_in, dtype=np.int64), counts)
            offs = np.arange(idx.size, dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            ws = (np.repeat(k_min, counts) + offs) * hop_s
            src = src.take(pa.array(idx))
            salt = salt[idx]
            x = x[idx]
            w = w[idx] if w is not None else None
        keep = (ws + size_s) > watermark_s  # drop fully-closed windows
        late_n = int((~keep).sum())
        if late_n:
            ka = pa.array(keep)
            src = src.filter(ka)
            salt, ws, x = salt[keep], ws[keep], x[keep]
            w = w[keep] if w is not None else None
        part = partial_sums(
            {"source": src, "salt": salt, "window_start": ws}, x, w, u_order, w_order
        )
        return part, {
            "max_ts_us": max_ts,
            "late_dropped": late_n,
            "rows_in": rows_in,
        }

    return fn


class StreamDriver:
    def __init__(
        self,
        input_dir: str,
        out_dir: str,
        cfg: StreamConfig | None = None,
        metadata: pa.Table | None = None,
    ):
        """``metadata``: optional (source, quality, arrival_epoch) table —
        the late-arriving side stream."""
        self.input_dir = input_dir
        self.out_dir = out_dir
        self.cfg = cfg or StreamConfig()
        self.metadata = metadata
        self.resolved = {k: get_spec(v) for k, v in self.cfg.specs.items()}
        self.needed, self.u_order, self.w_order = canonical_sums_for(
            self.resolved.values()
        )
        self.sink = ExactlyOnceParquetSink(out_dir, "agg")
        self.pass_sink = (
            ExactlyOnceParquetSink(out_dir, "passthrough")
            if self.cfg.passthrough
            else None
        )
        self.ckpt_root = os.path.join(out_dir, "_checkpoints")
        os.makedirs(self.ckpt_root, exist_ok=True)
        self.watermark_s = -(2**62)
        self.join = MetadataJoin(self.cfg.join_grace_epochs)
        self.metrics: dict[str, dict] = {}
        self.actors: list | None = None

    # -- epochs ------------------------------------------------------------

    def arrival_epochs(self) -> list[int]:
        out = []
        for d in glob.glob(os.path.join(self.input_dir, "arrival=*")):
            m = re.search(r"arrival=(\d+)$", d)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _ensure_actors(self):
        if self.actors is None:
            self.actors = [
                StatePartition.remote(p, list(self.needed), self.cfg.window_size_s)
                for p in range(self.cfg.n_partitions)
            ]

    # -- checkpoint / resume ----------------------------------------------

    def _ckpt_dir(self, epoch: int) -> str:
        return os.path.join(self.ckpt_root, f"epoch-{epoch:06d}")

    def _checkpoint(self, epoch: int):
        d = self._ckpt_dir(epoch)
        os.makedirs(d, exist_ok=True)
        ray.get([a.snapshot.remote(d, epoch) for a in self.actors])
        state = {
            "epoch": epoch,
            "watermark_s": self.watermark_s,
            "join": self.join.to_state(),
            "metrics": self.metrics,
        }
        tmp = os.path.join(d, "driver.json.tmp")
        with open(tmp, "w") as f:
            json.dump(state, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(d, "driver.json"))

    def latest_checkpoint(self) -> int | None:
        done = [
            int(m.group(1))
            for d in glob.glob(os.path.join(self.ckpt_root, "epoch-*"))
            if (m := re.search(r"epoch-(\d+)$", d))
            and os.path.exists(os.path.join(d, "driver.json"))
        ]
        return max(done) if done else None

    def _restore(self, epoch: int):
        d = self._ckpt_dir(epoch)
        with open(os.path.join(d, "driver.json")) as f:
            st = json.load(f)
        self.watermark_s = st["watermark_s"]
        self.join = MetadataJoin.from_state(st["join"])
        self.metrics = {str(k): v for k, v in st["metrics"].items()}
        self._ensure_actors()
        ray.get([a.restore.remote(d) for a in self.actors])

    # -- main loop ---------------------------------------------------------

    def run(self, stop_after_epoch: int | None = None, resume: bool = False) -> dict:
        """Process all arrival epochs (optionally stopping early to
        simulate a crash); returns the final metrics dict."""
        epochs = self.arrival_epochs()
        if not epochs:
            raise FileNotFoundError(f"no arrival=* dirs under {self.input_dir}")
        start = 0
        if resume:
            ck = self.latest_checkpoint()
            if ck is not None:
                self._restore(ck)
                start = ck + 1
        self._ensure_actors()
        last = epochs[-1]
        for e in [x for x in epochs if x >= start]:
            self._run_epoch(e)
            self._checkpoint(e)
            if stop_after_epoch is not None and e >= stop_after_epoch:
                return self._final_metrics()
        # end of stream: close everything (watermark -> +inf), flush joins
        self._finalize_stream(last + 1)
        return self._final_metrics()

    def _epoch_dataset(self, epoch: int):
        import ray.data as rd

        files = sorted(
            glob.glob(os.path.join(self.input_dir, f"arrival={epoch}", "*.parquet"))
        )
        return rd.read_parquet(files) if files else None

    def _run_epoch(self, epoch: int):
        ds = self._epoch_dataset(epoch)
        wm_at_ingest = self.watermark_s  # late-drop predicate for BOTH sinks
        em = {"rows_in": 0, "late_dropped": 0, "partial_rows": 0, "max_ts_us": -1}
        if ds is not None:
            fn = _partial_stage(
                self.cfg, self.needed, self.u_order, self.w_order, self.watermark_s
            )
            router = Router(self.actors, self.cfg.n_partitions, fn)
            kwargs = {"batch_format": "pyarrow"}
            if self.cfg.batch_size:
                kwargs["batch_size"] = self.cfg.batch_size
            book = ds.map_batches(router, **kwargs)
            stats = book.to_pandas()  # tiny: one row per partial batch
            if len(stats):
                em["rows_in"] = int(stats["rows_in"].sum())
                em["late_dropped"] = int(stats["late_dropped"].sum())
                em["partial_rows"] = int(stats["partial_rows"].sum())
                em["max_ts_us"] = int(stats["max_ts_us"].max())
        if em["max_ts_us"] >= 0:
            self.watermark_s = max(
                self.watermark_s,
                em["max_ts_us"] // 1_000_000 - self.cfg.allowed_lateness_s,
            )
        self._emit(epoch, self.watermark_s)
        if self.pass_sink is not None and ds is not None:
            self.pass_sink.commit_dataset(
                epoch, self._passthrough_ds(ds, wm_at_ingest)
            )
        em["watermark_s"] = self.watermark_s
        self.metrics[str(epoch)] = em

    def _passthrough_ds(self, ds, wm: int):
        """Exact per-row passthrough: same late-drop predicate (the
        watermark in force at ingest), token arrays byte-identical
        (pure Arrow filter, no rewrite)."""
        size_s = self.cfg.window_size_s

        def keep(batch: pa.Table) -> pa.Table:
            ids = numeric_doc_id(batch["doc_id"])
            ts_s = event_time_us_from_numeric(ids) // 1_000_000
            ws = (ts_s // size_s) * size_s
            return batch.filter(pa.array((ws + size_s) > wm))

        return ds.map_batches(keep, batch_format="pyarrow")

    def _ingest_metadata(self, epoch: int):
        if self.metadata is None:
            return
        mask = pa.compute.equal(self.metadata["arrival_epoch"], epoch)
        sub = self.metadata.filter(mask)
        if sub.num_rows:
            self.join.update(
                sub["source"].to_pylist(), sub["quality"].to_pylist()
            )

    def _emit(self, epoch: int, watermark_s: int):
        self._ingest_metadata(epoch)
        closed = ray.get(
            [a.close_windows.remote(watermark_s) for a in self.actors]
        )
        tbl = pa.concat_tables(closed)
        if tbl.num_rows:
            df = tbl.to_pandas()
            # cross-salt / cross-actor merge: field-wise sum (== merge())
            merged = df.groupby(["source", "window_start"], as_index=False)[
                list(self.needed)
            ].sum()
            cols = {c: merged[c].to_numpy() for c in self.needed}
            out = merged[["source", "window_start"]].copy()
            out["window_end"] = out["window_start"] + self.cfg.window_size_s
            for name, spec in self.resolved.items():
                out[name] = np.atleast_1d(spec.finalize_arrays(cols))
            out["n_rows"] = cols["u_n"].astype(np.int64) if "u_n" in cols else 0
        else:
            out = pd.DataFrame(
                columns=["source", "window_start", "window_end", *self.resolved, "n_rows"]
            )
        emitted = self.join.process(out, epoch)
        if len(emitted) == 0:
            emitted = pd.DataFrame(
                columns=[
                    "source", "window_start", "window_end", *self.resolved,
                    "n_rows", "quality",
                ]
            )
        emitted["epoch"] = epoch
        self.sink.commit(
            epoch,
            pa.Table.from_pandas(emitted, preserve_index=False),
            sort_by=["source", "window_start"],
        )

    def _finalize_stream(self, final_epoch: int):
        closed = ray.get(
            [a.close_windows.remote(2**62) for a in self.actors]
        )
        tbl = pa.concat_tables(closed)
        if tbl.num_rows:
            df = tbl.to_pandas()
            merged = df.groupby(["source", "window_start"], as_index=False)[
                list(self.needed)
            ].sum()
            cols = {c: merged[c].to_numpy() for c in self.needed}
            out = merged[["source", "window_start"]].copy()
            out["window_end"] = out["window_start"] + self.cfg.window_size_s
            for name, spec in self.resolved.items():
                out[name] = np.atleast_1d(spec.finalize_arrays(cols))
            out["n_rows"] = cols["u_n"].astype(np.int64) if "u_n" in cols else 0
        else:
            out = pd.DataFrame(
                columns=["source", "window_start", "window_end", *self.resolved, "n_rows"]
            )
        emitted = self.join.process(out, final_epoch)
        tail = self.join.flush_all()
        emitted = pd.concat([emitted, tail], ignore_index=True) if len(tail) else emitted
        if len(emitted) == 0:
            emitted = pd.DataFrame(
                columns=[
                    "source", "window_start", "window_end", *self.resolved,
                    "n_rows", "quality",
                ]
            )
        emitted["epoch"] = final_epoch
        self.sink.commit(
            final_epoch,
            pa.Table.from_pandas(emitted, preserve_index=False),
            sort_by=["source", "window_start"],
        )
        self.final_metrics = {
            "epoch": final_epoch,
            "state_metrics": ray.get([a.get_metrics.remote() for a in self.actors]),
            "join_metrics": self.join.metrics,
        }

    def _final_metrics(self) -> dict:
        return {
            "epochs": self.metrics,
            "final": getattr(self, "final_metrics", None),
            "watermark_s": self.watermark_s,
            "committed": self.sink.committed_epochs(),
        }

    def result_table(self) -> pa.Table:
        return self.sink.read_all()
