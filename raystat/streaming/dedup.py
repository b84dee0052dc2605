"""STREAMING exact deduplication — first-occurrence-wins over an
arrival-epoch stream, through the engine's epoch/checkpoint/
exactly-once conventions.  The LLM-data crux (dedup) crossed with the
streaming tier: at ingest time a 100-TB crawl is deduped as it
ARRIVES, not in a batch pass after the fact.

Semantics: a document survives iff its content hash has not been seen
in any earlier epoch; within its first epoch the min doc_id copy wins
(deterministic, so the whole run is replayable).  With
``retention_epochs=None`` the seen-set is exact and the survivor set
equals the batch rule "first (arrival, doc_id) per text" — the SQL
twin (queries.py: streaming_dedup_documents).  With a finite
``retention_epochs`` the state is BOUNDED: hashes idle longer than the
retention are evicted (the Flink/Spark dropDuplicates-with-watermark
tradeoff) and a later copy re-emits; evictions land in ``metrics`` so
the recall loss is observable, never silent — the same honesty
contract as the capped LSH pair generators (dedup_overflow_metrics).

Scale shape: rows never shuffle — the router computes md5-64 content
hashes per batch, pre-groups to (hash, min doc_id) (a local combiner:
per-batch duplicate copies collapse before any network hop), and
routes ONLY (hash, doc_id) pairs to the owning state partition by
hash.  Actor state is O(distinct hashes / partitions) int64s (16 B per
distinct doc; bounded further by retention), merged per epoch with one
lexsort — no Python loops, no text in state or transit.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from raystat.dataops.dedup import _md5_64_col
from raystat.streaming.epochs import EpochDriverBase
from raystat.streaming.sink import ExactlyOnceParquetSink

__all__ = ["DedupStreamDriver", "docs_stream_fixture"]


def _empty_pending() -> pa.Table:
    return pa.table(
        {"content_hash": pa.array([], pa.int64()),
         "doc_id": pa.array([], pa.int64())}
    )


@ray.remote(num_cpus=0)
class DedupStatePartition:
    """Seen-hash state for one hash partition: sorted int64 hash array
    + last-seen epoch per hash.  ``ingest`` appends (hash, doc_id)
    partials; ``close_epoch`` resolves the epoch's winners in one
    lexsort + searchsorted against the seen set."""

    def __init__(self, pid: int, retention_epochs: int | None):
        self.pid = pid
        self.retention = retention_epochs
        self.pending: list[pa.Table] = []
        self.seen = np.zeros(0, dtype=np.int64)  # sorted
        self.last_seen = np.zeros(0, dtype=np.int64)  # aligned epochs
        self.error: str | None = None
        self.metrics = {
            "rows_in": 0, "ingests": 0, "winners": 0,
            "dup_dropped": 0, "evicted": 0,
        }

    def ingest_count(self) -> int:
        if self.error is not None:
            raise RuntimeError(f"dedup partition {self.pid} ingest failed: {self.error}")
        return self.metrics["ingests"]

    def ingest(self, table: pa.Table) -> int:
        try:
            n = table.num_rows
            if n:
                self.pending.append(table)
            self.metrics["rows_in"] += n
        except Exception as e:  # pragma: no cover - defensive
            self.error = repr(e)
            n = 0
        self.metrics["ingests"] += 1
        return n

    def close_epoch(self, epoch: int) -> pa.Table:
        """Resolve this epoch: winners = min-doc_id row of each hash
        NOT in the seen set; refresh last_seen of every hash observed;
        evict hashes idle past the retention."""
        if self.pending:
            new = pa.concat_tables(self.pending)
            self.pending = []
        else:
            new = _empty_pending()
        h = new["content_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = new["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if h.size:
            # min doc_id per hash: lexsort then first row of each run
            order = np.lexsort((d, h))
            hs, ds = h[order], d[order]
            first = np.ones(hs.size, dtype=bool)
            first[1:] = hs[1:] != hs[:-1]
            uh, ud = hs[first], ds[first]
            self.metrics["dup_dropped"] += int(h.size - uh.size)
        else:
            uh = ud = np.zeros(0, dtype=np.int64)

        if self.seen.size:
            pos_c = np.minimum(np.searchsorted(self.seen, uh), self.seen.size - 1)
            known = self.seen[pos_c] == uh
        else:
            pos_c = np.zeros(uh.size, dtype=np.int64)
            known = np.zeros(uh.size, dtype=bool)
        # refresh last_seen of re-observed hashes (keeps hot dups alive)
        if self.seen.size and known.any():
            self.last_seen[pos_c[known]] = epoch
            self.metrics["dup_dropped"] += int(known.sum())
        fresh = ~known
        win_h, win_d = uh[fresh], ud[fresh]
        self.metrics["winners"] += int(win_h.size)

        # merge winners into the sorted seen set
        if win_h.size:
            seen = np.concatenate([self.seen, win_h])
            last = np.concatenate([self.last_seen, np.full(win_h.size, epoch)])
            order = np.argsort(seen, kind="stable")
            self.seen, self.last_seen = seen[order], last[order]

        if self.retention is not None and self.seen.size:
            keep = self.last_seen > epoch - int(self.retention)
            self.metrics["evicted"] += int(self.seen.size - int(keep.sum()))
            self.seen, self.last_seen = self.seen[keep], self.last_seen[keep]

        return pa.table(
            {"doc_id": pa.array(win_d), "content_hash": pa.array(win_h),
             "epoch": pa.array(np.full(win_d.size, epoch, dtype=np.int64))}
        )

    def get_metrics(self) -> dict:
        return {"partition": self.pid, "state_size": int(self.seen.size),
                **self.metrics}

    def snapshot(self, ckpt_dir: str, epoch: int) -> str:
        os.makedirs(ckpt_dir, exist_ok=True)
        path = os.path.join(ckpt_dir, f"dedup-p{self.pid:04d}.parquet")
        tmp = path + ".tmp"
        t = pa.table(
            {"seen": pa.array(self.seen), "last_seen": pa.array(self.last_seen)}
        )
        t = t.replace_schema_metadata({b"metrics": json.dumps(self.metrics).encode()})
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return path

    def restore(self, ckpt_dir: str) -> int:
        path = os.path.join(ckpt_dir, f"dedup-p{self.pid:04d}.parquet")
        self.pending = []
        self.seen = np.zeros(0, dtype=np.int64)
        self.last_seen = np.zeros(0, dtype=np.int64)
        if not os.path.exists(path):
            return 0
        t = pq.read_table(path)
        self.seen = t["seen"].to_numpy(zero_copy_only=False).astype(np.int64).copy()
        self.last_seen = (
            t["last_seen"].to_numpy(zero_copy_only=False).astype(np.int64).copy()
        )
        md = t.schema.metadata or {}
        if b"metrics" in md:
            saved = json.loads(md[b"metrics"].decode())
            # 'ingests' is the ingest-barrier counter: it must count calls
            # since THIS restart only (the new driver resets its expected
            # count to 0), or close_epoch could race ahead of in-flight
            # routed batches after a crash/resume — matching
            # IntervalJoinPartition.restore's contract.
            self.metrics.update(
                {k: v for k, v in saved.items() if k != "ingests"}
            )
        return int(self.seen.size)


class DedupRouter:
    """Fused hash+combine+route stage: md5-64 content hash per batch,
    local min-doc_id combiner per hash, then hash routing — only
    (hash, doc_id) pairs leave the read stage."""

    def __init__(self, actors: list, n_partitions: int, text_col: str,
                 id_col: str):
        self.actors = actors
        self.P = n_partitions
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows_in = batch.num_rows
        calls = 0
        local_dropped = 0
        if rows_in:
            h = _md5_64_col(batch[self.text_col])
            d = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            # local combiner: min doc_id per hash inside the batch
            order = np.lexsort((d, h))
            hs, ds = h[order], d[order]
            first = np.ones(hs.size, dtype=bool)
            first[1:] = hs[1:] != hs[:-1]
            hs, ds = hs[first], ds[first]
            local_dropped = int(rows_in - hs.size)
            part = (hs.astype(np.uint64) % np.uint64(self.P)).astype(np.int64)
            po = np.argsort(part, kind="stable")
            hs, ds, sp = hs[po], ds[po], part[po]
            tbl = pa.table(
                {"content_hash": pa.array(hs), "doc_id": pa.array(ds)}
            )
            bounds = np.flatnonzero(np.diff(sp)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [sp.size]))
            for s, e in zip(starts, ends):
                self.actors[int(sp[s])].ingest.remote(tbl.slice(int(s), int(e - s)))
                calls += 1
        return pa.table(
            {"rows_in": pa.array([rows_in], pa.int64()),
             "local_dropped": pa.array([local_dropped], pa.int64()),
             "ingest_calls": pa.array([calls], pa.int64())}
        )


class DedupStreamDriver(EpochDriverBase):
    """Epoch loop for streaming exact dedup: read arrival=N → hash +
    local combine + route → barrier → resolve winners per partition →
    exactly-once commit → checkpoint.  ``retention_epochs=None`` keeps
    the survivor set exact; a finite retention bounds state."""

    def __init__(self, input_dir: str, out_dir: str, *,
                 text_col: str = "text", id_col: str = "doc_id",
                 retention_epochs: int | None = None,
                 n_partitions: int = 8, batch_size: int | None = None):
        super().__init__(input_dir, out_dir)
        self.text_col = text_col
        self.id_col = id_col
        self.retention = retention_epochs
        self.n_partitions = n_partitions
        self.batch_size = batch_size
        self.sink = ExactlyOnceParquetSink(out_dir, "winners")

    def _ensure_actors(self):
        if self.actors is None:
            self.actors = [
                DedupStatePartition.remote(p, self.retention)
                for p in range(self.n_partitions)
            ]

    def _driver_state(self) -> dict:
        return {"committed": self.sink.committed_epochs()}

    def _load_driver_state(self, state: dict) -> None:
        pass

    def _run_epoch(self, epoch: int):
        ds = self._epoch_dataset(epoch)
        em = {"rows_in": 0, "local_dropped": 0, "ingest_calls": 0}
        if ds is not None:
            router = DedupRouter(
                self.actors, self.n_partitions, self.text_col, self.id_col
            )
            kwargs = {"batch_format": "pyarrow", "max_retries": 0,
                      "zero_copy_batch": True}
            if self.batch_size:
                kwargs["batch_size"] = self.batch_size
            stats = ds.map_batches(router, **kwargs).to_pandas()
            if len(stats):
                em["rows_in"] = int(stats["rows_in"].sum())
                em["local_dropped"] = int(stats["local_dropped"].sum())
                em["ingest_calls"] = int(stats["ingest_calls"].sum())
                self._ingest_expected += em["ingest_calls"]
            self._ingest_barrier()
        tables = [
            t for t in ray.get(
                [a.close_epoch.remote(epoch) for a in self.actors]
            )
            if t.num_rows
        ]
        if tables:
            out = pa.concat_tables(tables)
            self.sink.commit(epoch, out, sort_by=["doc_id"])
        else:
            self.sink.commit(epoch, pa.table({}))
        self.metrics[str(epoch)] = em

    def _finalize_stream(self, final_epoch: int):
        self.metrics["final"] = {
            "epoch": final_epoch,
            "state_metrics": ray.get([a.get_metrics.remote() for a in self.actors]),
        }

    def result_table(self) -> pa.Table:
        return self.sink.read_all()


# -- fixture ------------------------------------------------------------------


def docs_stream_fixture(
    sf_dir: str,
    n_epochs: int = 4,
    root: str = "/tmp/raystat_fixtures",
) -> str:
    """Materialize the documents table as an arrival-partitioned
    stream for the dedup driver.  The sf documents table has NO exact
    duplicate texts, so the fixture plants them: every doc_id%10==3
    document is echoed as (doc_id + 1_000_001, same text).  Arrival
    epoch = doc_id % n_epochs for every row — deterministic and
    SQL-reproducible — so an echo arrives one epoch AFTER its original
    (offset ≡ 1 mod 4), except originals in the last epoch, whose echo
    wraps to epoch 0 and arrives FIRST: the echo (larger id) wins
    there, pinning that the rule is first-ARRIVAL, not min-id.  Cached
    per sf_dir; returns the fixture dir."""
    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(root, f"docs_str_{tag}_e{n_epochs}")
    done = os.path.join(out, "_fixture.json")
    params = {"sf_dir": sf_dir, "n_epochs": n_epochs, "v": 3}
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
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    echo_sel = did % 10 == 3
    echo = pa.table(
        {
            "doc_id": pa.array(did[echo_sel] + 1_000_001),
            "text": t["text"].filter(pa.array(echo_sel)),
        }
    )
    t = pa.concat_tables([t, echo])
    did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    epoch = did % n_epochs
    for e in range(n_epochs):
        sub = t.filter(pa.array(epoch == e))
        d = os.path.join(tmp, f"arrival={e}")
        os.makedirs(d)
        pq.write_table(sub, os.path.join(d, "part-0.parquet"))
    with open(os.path.join(tmp, "_fixture.json"), "w") as f:
        json.dump(params, f)
    os.replace(tmp, out)
    return out
