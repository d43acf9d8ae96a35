"""Derive an sf1-scale dataset from the driver's sf0.1 fixtures.

The driver generates sf{0.001,0.01,0.1} only; the scale-slope check
(BASELINE.md "sf1 scaling") needs one point 10x larger. This script
replicates sf0.1 ten times with key offsets that PRESERVE referential
integrity (orders.o_custkey follows customer's offset, lineitem
follows orders, etc.) and leave value distributions untouched — so a
query's work grows 10x while its selectivities stay put, which is
exactly what a scaling slope should measure. Output:
/root/repo/.testdata_sf1 (gitignored; ~170 MB).

Copy-structure caveat, documented where the numbers land: documents'
text and embeddings' vectors repeat verbatim across the 10 copies, so
near-dup/similarity entries see 10 exact clones of every item — a
boilerplate-heavy corpus, the stress shape the hot-shingle/hot-bucket
guards exist for.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
# `python tools/make_sf1.py [copies]` — default 10 (sf1). Other values
# build .testdata_sf{copies/10} (e.g. 50 → .testdata_sf5), the
# VERDICT-r8 #5 points past sf1 for the steepest-sloped entries. The
# key strides below are per-copy offsets, so they hold for any copy
# count until cust/part copies reach their 100k stride (sf ~150) —
# far past anything this box can hold.
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
_TAG = "sf1" if COPIES == 10 else f"sf{COPIES // 10}"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    f".testdata_{_TAG}",
)

# per-table key columns to offset, as (column, stride-key) pairs; all
# strides are >= the sf0.1 max of their key space so copies never clash
OFFSETS = {
    "region": {},     # tiny dims replicate once (keys must stay 0-4)
    "nation": {},
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "ord",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "ev", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

STRIDES = {
    "cust": 100_000,
    "supp": 10_000,
    "part": 100_000,
    "ord": 10_000_000,
    "ev": 10_000_000,
    "user": 1_000_000,
    "doc": 1_000_000,
    "vec": 1_000_000,
}


def main() -> None:
    from nutdb_spark.session import get_spark

    spark = get_spark("make_sf1")
    os.makedirs(DST, exist_ok=True)
    for table, cols in OFFSETS.items():
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        out_path = f"{DST}/{table}.parquet"
        if os.path.exists(out_path):
            print(f"skip {table} (exists)")
            continue
        if not cols:
            src.write.mode("overwrite").parquet(out_path)
            print(f"copied {table}")
            continue
        copies = src.withColumn(
            "__c",
            F.explode(F.array(*[F.lit(c) for c in range(COPIES)])),
        )
        for col, key in cols.items():
            copies = copies.withColumn(
                col,
                (F.col(col) + F.col("__c") * F.lit(STRIDES[key])).cast(
                    dict(src.dtypes)[col]
                ),
            )
        copies.drop("__c").write.mode("overwrite").parquet(out_path)
        print(f"wrote {table} x{COPIES}")
    spark.stop()


if __name__ == "__main__":
    main()
