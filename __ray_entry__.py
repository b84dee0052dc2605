"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module, so
nothing here (or in raystat) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship pipeline on sf0.001 — the streaming windowed
  token-statistics engine over the token stream derived from
  ``documents`` (SURVEY.md §3.2).
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator
  (SURVEY.md §2); SQL twins use the reference's power-sum formulas.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _register_by_value() -> None:
    """Ship raystat code to Ray workers by value: the driver may call
    ``ray.init`` before this repo is on sys.path, in which case worker
    processes cannot import ``raystat`` by reference."""
    import importlib
    import pkgutil

    import raystat
    from ray import cloudpickle

    mods = [raystat]
    for m in pkgutil.walk_packages(raystat.__path__, "raystat."):
        if m.name.endswith("__main__"):
            continue  # the CLI module runs argparse on import
        try:
            mods.append(importlib.import_module(m.name))
        except ImportError:
            pass
    for m in mods:
        try:
            cloudpickle.register_pickle_by_value(m)
        except Exception:
            pass


_register_by_value()


def entry() -> Any:
    """Flagship: streaming windowed aggregate over the derived token
    stream at sf0.001; returns the committed window-aggregate table."""
    from raystat.pipelines.queries import _streaming_tokens

    return _streaming_tokens("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from raystat.pipelines.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from raystat.pipelines.queries import oracle_sql as _o

    return _o()
