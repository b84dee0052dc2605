"""Standalone Arrow parquet decode probe: no Ray, no raystat.
Each process decodes a distinct fixture file repeatedly; measures files/s
at 8 and 32 processes, interleaved best-of-3."""
import glob, os, sys, time
import multiprocessing as mp

FILES = sorted(glob.glob("/tmp/raystat_fixtures/bench_52000000/arrival=*/*.parquet"))

def worker(args):
    path, reps = args
    os.environ.setdefault("MALLOC_CONF", "dirty_decay_ms:-1,muzzy_decay_ms:-1")
    import pyarrow.parquet as pq
    t0 = time.perf_counter()
    for _ in range(reps):
        pq.read_table(path)
    return time.perf_counter() - t0

def run(nproc, reps=3):
    files = (FILES * ((nproc // len(FILES)) + 1))[:nproc]
    with mp.Pool(nproc) as pool:
        t0 = time.perf_counter()
        pool.map(worker, [(f, reps) for f in files])
        wall = time.perf_counter() - t0
    return nproc * reps / wall  # files/s aggregate

if __name__ == "__main__":
    # warm page cache
    for f in FILES[:32]:
        with open(f, "rb") as fh: fh.read()
    out = {"8": [], "32": []}
    for _ in range(3):
        out["8"].append(round(run(8), 1))
        out["32"].append(round(run(32), 1))
    best8, best32 = max(out["8"]), max(out["32"])
    print({"files_per_s_8": out["8"], "files_per_s_32": out["32"],
           "best_8": best8, "best_32": best32, "eff": round(best32 / (4 * best8), 3)})
