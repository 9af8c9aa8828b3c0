"""Round-6 auxiliary benchmarks (guide §1.4): per-query noop-sink isolation
at an arbitrary SF, per-stage decomposition for the queries the round
optimizes, and `.explain("formatted")` capture for plans/r06/.

`bench.py` is FROZEN for measurement (driver contract) — everything extra
lives here.  Usage::

    python3 bench_extra.py time <query> [query...]     # min-of-2 noop runs
    python3 bench_extra.py plans <query> [query...]    # write plans/r06/*_after.txt
    python3 bench_extra.py stages                      # stage decompositions

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from fs2_data_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SUFFIX = os.environ.get("PLAN_SUFFIX", "after")


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(mk, passes=2):
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        _noop(mk())
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    mode, names = sys.argv[1], sys.argv[2:]
    spark = get_spark(master=f"local[{CPUS}]", app_name="bench_extra",
                      shuffle_partitions=max(CPUS, 8))
    from fs2_data_spark.queries import REGISTRY

    if mode == "time":
        out = {}
        for n in names:
            fn, _ = REGISTRY[n]
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            out[n] = timed(lambda: fn(spark, SF_DIR))
            print(json.dumps({n: out[n]}), flush=True)
        print(json.dumps({"sf_dir": SF_DIR, "queries": out}))
    elif mode == "plans":
        os.makedirs("plans/r06", exist_ok=True)
        for n in names:
            fn, _ = REGISTRY[n]
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"plans/r06/{n}_{SUFFIX}.txt", "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote plans/r06/{n}_{SUFFIX}.txt")
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
