"""Per-entry profiler: split an entry's wall time into DataFrame
construction (frontend lowering + Catalyst analysis — driver-side)
vs execution (noop sink), and optionally dump explain("formatted").

Usage:
    python tools/profile_entry.py name1 [name2 ...] [--explain DIR]
    python tools/profile_entry.py --runs 3 name1

Prints one line per entry:
    name  build=BUILDs  exec=EXECs  total=TOTALs   (best of --runs)

The split matters because several suite entries lower to very large
expression trees: their bench seconds are dominated by driver-side
analysis/optimization, not by cluster work — a different optimization
target (shrink the tree) than an execution-bound entry (shrink the
shuffle). Guide §7.3 (driver-side planning) / §1.1 (measure first).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--explain", metavar="DIR", default=None,
                    help="write <name>.txt explain('formatted') to DIR")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from nutdb_spark.session import get_spark
    from nutdb_spark.suite import QUERIES

    spark = get_spark("nutdb_profile")
    # same warmup as bench.py
    QUERIES["tpch_q1"](spark, args.sf_dir).write.format("noop").mode(
        "overwrite").save()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    for name in args.names:
        fn = QUERIES[name]
        best = None
        for _ in range(args.runs):
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            rec = (t1 - t0, t2 - t1, t2 - t0)
            if best is None or rec[2] < best[2]:
                best = rec
            try:
                spark.streams.resetTerminated()
                spark.catalog.clearCache()
                spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
            except Exception:  # noqa: BLE001
                pass
        print(f"{name}  build={best[0]:.2f}s  exec={best[1]:.2f}s  "
              f"total={best[2]:.2f}s")
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf_dir)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))


if __name__ == "__main__":
    main()
