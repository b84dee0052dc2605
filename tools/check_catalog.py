"""Full-catalog correctness check: run EVERY registered query against its DuckDB
oracle with the driver's comparison semantics (schema / row count / value match on
name-sorted columns) and write one JSON row per query.

The round driver only records the first 50 catalog entries in CORRECTNESS_r{N}.json;
this tool closes the gap by producing the same evidence for the whole catalog, so
every operator family has a checkable green row (see VERDICT round 3, "What's
missing" #1).

Usage:
    python tools/check_catalog.py [SF_DIR] [OUT_JSON]
Defaults: SF_DIR=/root/testdata/sf0.01, OUT_JSON=CATALOG_CHECK.json in the cwd.

This is a CLI entry point, so it owns its Ray session (the __ray_entry__ module
itself never calls ray.init — the round driver initializes Ray before importing it).
"""
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import ray  # noqa: E402

if not ray.is_initialized():
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __ray_entry__ as entry  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def to_pandas(out):
    if isinstance(out, pd.DataFrame):
        return out
    if hasattr(out, "to_pandas"):
        return out.to_pandas()
    return pd.DataFrame(out)


def key_cols(df):
    # Deterministic row order for the value compare: string/window columns first,
    # then integer columns; fall back to every column.
    pref = [c for c in df.columns
            if df[c].dtype == object or "window" in c or "session" in c]
    ints = [c for c in df.columns
            if c not in pref and np.issubdtype(df[c].dtype, np.integer)]
    return (pref + ints) or list(df.columns)


def compare(got, exp):
    rec = {}
    cols_ok = sorted(got.columns) == sorted(exp.columns)
    keys = key_cols(exp)
    g = got.sort_values(keys, ignore_index=True)[sorted(got.columns)] if cols_ok else got
    e = exp.sort_values(keys, ignore_index=True)[sorted(exp.columns)]
    rows_ok = len(g) == len(e)
    vals_ok = cols_ok and rows_ok
    if vals_ok:
        for c in e.columns:
            try:
                gc = np.asarray(g[c])
                if np.issubdtype(e[c].dtype, np.number) and np.issubdtype(gc.dtype, np.number):
                    np.testing.assert_allclose(g[c].astype(float), e[c].astype(float),
                                               rtol=1e-6, atol=1e-9)
                else:
                    assert g[c].tolist() == e[c].tolist()
            except Exception:
                vals_ok = False
                rec["bad_col"] = c
                break
    rec.update({
        "status": "pass" if (cols_ok and rows_ok and vals_ok) else "FAIL",
        "schema_match": cols_ok, "rows_match": rows_ok, "values_match": vals_ok,
        "rows": len(got), "oracle_rows": len(exp),
    })
    return rec


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CATALOG_CHECK.json"
    qs = entry.queries()
    only = os.environ.get("RAYSTAT_ONLY")
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        qs = {n: f for n, f in qs.items() if n in names}
    sqls = entry.oracle_sql()
    con = duck(sf_dir)
    results = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
            sql = sqls.get(name)
            if sql is None:
                rec = {"status": "no_oracle", "rows": len(got)}
            else:
                rec = compare(got, con.sql(sql).df())
        except Exception as ex:
            rec = {"status": "ERROR", "err": f"{type(ex).__name__}: {ex}"}
            traceback.print_exc()
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        print(name, rec, flush=True)

    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    n_no_oracle = sum(1 for r in results.values() if r["status"] == "no_oracle")
    summary = {"sf_dir": sf_dir, "queries": len(results), "pass": n_pass,
               "no_oracle": n_no_oracle,
               "fail": len(results) - n_pass - n_no_oracle}
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1)
    print("SUMMARY", summary)
    ray.shutdown()
    return 0 if summary["fail"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
