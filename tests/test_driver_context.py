"""Regression guard for the driver's import context.

The grading driver imports ``__ray_entry__`` from OUTSIDE the repo
(cwd elsewhere, repo on sys.path), which registers raystat for
by-value pickling; Ray workers that can also import raystat from
sys.path then hold a SECOND copy of every raystat class.  An
``isinstance(x, RaystatClass)`` inside a worker UDF fails across the
two copies (caught live with Tumbling in assign_windows).  This test
reproduces that exact context in a subprocess and runs a windowed
query end-to-end."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR", ignore_reinit_error=True)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as e
qs = e.queries()
import ray.data
for name in ("distinct_users_windowed", "correlation_windowed_events"):
    out = qs[name]("/root/testdata/sf0.001")
    n = out.count() if isinstance(out, ray.data.Dataset) else len(out)
    assert n > 0, name
print("CONTEXT_OK")
ray.shutdown()
"""


def test_windowed_queries_from_driver_import_context():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("RAY_ADDRESS", None)
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        cwd="/tmp",  # NOT the repo: forces the by-value + sys.path dual copy
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "CONTEXT_OK" in r.stdout, (r.stdout[-2000:], r.stderr[-2000:])
