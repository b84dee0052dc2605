"""Stateful stream-stream join of window aggregates against a
late-arriving source-metadata stream (BASELINE.json:north_star; no
counterpart exists in the reference repo — SURVEY.md §2.2 last row).

Semantics (ksqlDB-style left join with grace): a closed window's
aggregate row joins ``source -> quality`` metadata if already known;
otherwise it is buffered until the metadata arrives (emitted in that
epoch) or until ``grace_epochs`` epochs pass, after which it is emitted
with null ``quality`` (left-outer after grace).

Scaling note: metadata is per-source (small side) so this state is
O(sources) and lives beside the driver; at larger key cardinality the
same class shards into the hash-partitioned StatePartition actors,
co-partitioned on ``source`` — the shuffle key is already the join key,
so no second shuffle would be needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["MetadataJoin"]


class MetadataJoin:
    def __init__(self, grace_epochs: int = 2):
        self.grace = grace_epochs
        self.meta: dict[str, float] = {}
        self.pending: list[dict] = []  # buffered aggregate rows + _deadline
        self.metrics = {"joined": 0, "buffered": 0, "expired_null": 0}

    def update(self, sources: list[str], qualities: list[float]) -> None:
        for s, q in zip(sources, qualities):
            self.meta[s] = float(q)

    def process(self, df: pd.DataFrame, epoch: int) -> pd.DataFrame:
        """Join this epoch's closed-window rows + re-check the pending
        buffer; returns all rows emittable this epoch."""
        rows = df.to_dict("records") if len(df) else []
        for r in rows:
            r["_deadline"] = epoch + self.grace
        candidates = self.pending + rows
        out, still = [], []
        for r in candidates:
            q = self.meta.get(r["source"])
            if q is not None:
                r["quality"] = q
                self.metrics["joined"] += 1
                out.append(r)
            elif r["_deadline"] <= epoch:
                r["quality"] = np.nan
                self.metrics["expired_null"] += 1
                out.append(r)
            else:
                still.append(r)
        self.pending = still
        self.metrics["buffered"] = len(still)
        res = pd.DataFrame(out)
        if len(res):
            res = res.drop(columns=["_deadline"])
        return res

    def flush_all(self) -> pd.DataFrame:
        """End of stream: emit everything left, null quality where
        metadata never arrived."""
        out = []
        for r in self.pending:
            r["quality"] = self.meta.get(r["source"], np.nan)
            out.append(r)
        self.pending = []
        res = pd.DataFrame(out)
        if len(res):
            res = res.drop(columns=["_deadline"])
        return res

    # -- checkpoint --------------------------------------------------------

    def to_state(self) -> dict:
        def py(v):  # numpy scalars -> exact native types for JSON
            return v.item() if hasattr(v, "item") else v

        return {
            "grace": self.grace,
            "meta": {k: float(v) for k, v in self.meta.items()},
            "pending": [{k: py(v) for k, v in r.items()} for r in self.pending],
            "metrics": self.metrics,
        }

    @classmethod
    def from_state(cls, st: dict) -> "MetadataJoin":
        j = cls(st["grace"])
        j.meta = dict(st["meta"])
        j.pending = list(st["pending"])
        j.metrics = dict(st["metrics"])
        return j
