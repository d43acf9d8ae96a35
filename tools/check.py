"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against its
``oracle_sql()`` twin in DuckDB: row count, column-name set, and
order-insensitive exact value comparison (columns sorted by name, rows
sorted). Exact equality is the bar — the suite's aggregation convention
(functions/exact.py) is designed to make doubles bit-identical across
engines.

Usage: python tools/check.py [name ...]   (default: all)
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # exact repr — we demand bit-identical doubles
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(norm_cell(x) for x in v))
    return (type(v).__name__, str(v))


_TYPE_CLASS = {
    name: cls
    for cls, names in (
        ("int", ("tinyint", "smallint", "int", "integer", "bigint",
                 "byte", "short", "long", "utinyint", "usmallint",
                 "uinteger", "ubigint")),
        ("float", ("float", "double", "real")),
        ("decimal", ("decimal", "numeric", "hugeint", "uhugeint")),
        ("bool", ("boolean", "bool")),
        ("string", ("string", "varchar", "text", "char")),
        ("date", ("date",)),
        ("timestamp", ("timestamp", "timestamp_ns", "timestamp_ntz",
                       "datetime")),
        ("array", ("array", "list")),
        ("struct", ("struct", "row")),
    )
    for name in names
}


def _num_class(t: str) -> str:
    """Coarse cross-engine type class; width doesn't matter, class does.

    Matches on the exact leading type word (split at '(' / '<' /
    whitespace) — prefix matching was order-sensitive ('datetime' hit
    the 'date' prefix, 'interval*' hit 'int')."""
    t = t.lower()
    if t.endswith("[]"):  # duckdb list syntax, e.g. BIGINT[]
        return "array"
    head = t.split("(")[0].split("<")[0].split()[0] if t.strip() else t
    return _TYPE_CLASS.get(head, "unknown")


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main(names: list[str]) -> int:
    import __spark_entry__ as e
    from nutdb_spark.session import get_spark

    spark = get_spark("check")
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    targets = names or sorted(qs)
    # Not-oracle-safe function audit: warn when an oracled entry's
    # source (python + embedded dialect SQL) mentions a function from
    # the consolidated PYTEST_ONLY list in functions/registry.py —
    # those cannot be hash-compared cross-engine (libm last-ulp drift
    # or nondeterminism), so a new entry using one is a bug-in-waiting.
    import inspect
    import re as _re

    from nutdb_spark.functions.registry import PYTEST_ONLY

    for name in targets:
        if name not in oracles:
            continue
        try:
            src = inspect.getsource(qs[name])
        except (OSError, TypeError):
            continue
        for fn, why in PYTEST_ONLY.items():
            if _re.search(rf"\b{_re.escape(fn)}\s*\(", src):
                print(
                    f"WARN {name}: oracled entry mentions {fn}() — "
                    f"not oracle-safe ({why})"
                )
    failed = []
    for name in targets:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            typed = con.execute("DESCRIBE " + oracles[name]).fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        problems = []
        # Driver-canon hazard: the driver canonicalizes through pandas
        # sort_values, which raises `unhashable type: 'list'` on any
        # top-level array/struct/map column (r4 q_dedup_minhash_sig
        # went driver-red on exactly this). Explode to scalar rows or
        # array_join before returning.
        nested = [
            c
            for c, t in sdf.dtypes
            if _num_class(t) in ("array", "struct") or t.startswith("map")
        ]
        if nested:
            problems.append(
                f"result columns {nested} are array/struct/map — the "
                "driver canonicalizer cannot sort them; emit scalars"
            )
        # Spark DECIMAL survives toPandas() as object decimal.Decimal
        # while the oracle's DECIMAL degrades to float64 in duckdb's
        # .df() — the driver canonicalizes through pandas, so every
        # decimal cell hash-mismatches even when the values are exactly
        # equal (r13: sql_fn_tier18's hmd5 failed the driver on exactly
        # this, 49/50). Carry the value as a digit string or a DOUBLE.
        decs = [c for c, t in sdf.dtypes if _num_class(t) == "decimal"]
        if decs:
            problems.append(
                f"result columns {decs} are DECIMAL — spark's pandas "
                "keeps Decimal objects, duckdb's .df() degrades to "
                "float64, and the driver hash mismatches; carry as a "
                "digit string or a double"
            )
        # The driver compares through Arrow, where DuckDB HUGEINT (the
        # result type of SUM over any integer) becomes decimal128(38,0)
        # and hash-mismatches Spark's BIGINT even when values are equal.
        hugeint = [r[0] for r in typed if "HUGEINT" in (r[1] or "").upper()]
        if hugeint:
            problems.append(
                f"oracle columns {hugeint} are HUGEINT — CAST(... AS BIGINT)"
            )
        # Broader class audit: an int-class column on one side and a
        # float/decimal-class on the other hashes differently through
        # Arrow/pandas even when every value is equal (ints survive as
        # ints, DECIMAL/HUGEINT degrade to float/Decimal objects).
        # Width differences (int vs bigint) are fine; class flips not.
        sdt = dict(sdf.dtypes)
        odt = {r[0]: (r[1] or "") for r in typed}
        for c in set(sdt) & set(odt):
            sc, oc = _num_class(sdt[c]), _num_class(odt[c])
            if sc != oc and "unknown" not in (sc, oc):
                problems.append(
                    f"column {c!r} type-class mismatch: spark {sdt[c]} "
                    f"({sc}) vs oracle {odt[c]} ({oc})"
                )
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems and frame_key(scols, srows) != frame_key(ocols, orows):
            sk, ok = frame_key(scols, srows), frame_key(ocols, orows)
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sk, ok)) if a != b
            )
            problems.append(f"values differ, first at sorted-row {diff[0]}:"
                            f"\n  spark : {diff[1]}\n  oracle: {diff[2]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(targets)-len(failed)}/{len(targets)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
