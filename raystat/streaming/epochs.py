"""Shared epoch-loop skeleton for the specialised streaming drivers
(the interval-join driver and the sketch driver): arrival-epoch
discovery, the fire-and-forget ingest barrier, checkpoint directory
layout with crash/resume, and the run loop.  The aggregate
``StreamDriver`` predates this base and keeps its own copy of the
plumbing (salted routing, per-source watermarks, multiple sinks — a
strictly larger surface); the specialised drivers share it here
instead of re-pasting it.

Subclasses provide: ``_ensure_actors``, ``_run_epoch(epoch)``,
``_finalize_stream(final_epoch)``, ``_driver_state()`` /
``_load_driver_state(state)`` for the checkpoint payload, and the
actors must expose ``ingest_count / snapshot / restore / get_metrics``.
"""

from __future__ import annotations

import glob
import json
import os
import re

import ray


class EpochDriverBase:
    def __init__(self, input_dir: str, out_dir: str):
        self.input_dir = input_dir
        self.out_dir = out_dir
        self.ckpt_root = os.path.join(out_dir, "_checkpoints")
        os.makedirs(self.ckpt_root, exist_ok=True)
        self.metrics: dict[str, dict] = {}
        self.actors: list | None = None
        self._ingest_expected = 0

    # -- epochs -------------------------------------------------------------

    def arrival_epochs(self) -> list[int]:
        out = []
        for d in glob.glob(os.path.join(self.input_dir, "arrival=*")):
            m = re.search(r"arrival=(\d+)$", d)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _epoch_dataset(self, epoch: int):
        import ray.data as rd

        files = sorted(
            glob.glob(os.path.join(self.input_dir, f"arrival={epoch}", "*.parquet"))
        )
        if not files:
            return None
        total_bytes = sum(os.path.getsize(f) for f in files)
        # cap at len(files): never split past file count (fusion; BASELINE.md)
        nblocks = min(max(1, total_bytes // (2 * 1024 * 1024)), len(files))
        return rd.read_parquet(files, override_num_blocks=int(nblocks))

    def prepare(self):
        self._ensure_actors()
        ray.get([a.get_metrics.remote() for a in self.actors])
        return self

    def _ingest_barrier(self, timeout_s: float = 600.0):
        import time as _time

        deadline = _time.monotonic() + timeout_s
        while True:
            done = sum(ray.get([a.ingest_count.remote() for a in self.actors]))
            if done >= self._ingest_expected:
                return
            if _time.monotonic() > deadline:
                raise TimeoutError(f"ingest barrier: {done}/{self._ingest_expected}")
            _time.sleep(0.02)

    # -- checkpoint / resume -------------------------------------------------

    def _ckpt_dir(self, epoch: int) -> str:
        return os.path.join(self.ckpt_root, f"epoch-{epoch:06d}")

    def _checkpoint(self, epoch: int):
        d = self._ckpt_dir(epoch)
        os.makedirs(d, exist_ok=True)
        ray.get([a.snapshot.remote(d, epoch) for a in self.actors])
        state = {"epoch": epoch, "metrics": self.metrics, **self._driver_state()}
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
        self.metrics = {str(k): v for k, v in st["metrics"].items()}
        self._load_driver_state(st)
        self._ensure_actors()
        ray.get([a.restore.remote(d) for a in self.actors])

    # -- main loop ------------------------------------------------------------

    def run(self, stop_after_epoch: int | None = None, resume: bool = False) -> dict:
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
        for e in [x for x in epochs if x >= start]:
            self._run_epoch(e)
            self._checkpoint(e)
            if stop_after_epoch is not None and e >= stop_after_epoch:
                return self._final_metrics()
        self._finalize_stream(epochs[-1] + 1)
        return self._final_metrics()

    def _final_metrics(self) -> dict:
        return {"epochs": self.metrics, **self._driver_state()}

    # -- subclass hooks --------------------------------------------------------

    def _ensure_actors(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def _run_epoch(self, epoch: int):  # pragma: no cover - abstract
        raise NotImplementedError

    def _finalize_stream(self, final_epoch: int):  # pragma: no cover - abstract
        raise NotImplementedError

    def _driver_state(self) -> dict:
        return {}

    def _load_driver_state(self, state: dict) -> None:
        pass
