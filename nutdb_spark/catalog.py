"""Managed catalog: parquet tables + JSON sidecar metadata.

The dialect's DDL surface (SURVEY.md §2.1 S6-S15) maps to:
- a directory per table of parquet files, written with
  ``partitionBy(PARTITION BY)`` and ``sortWithinPartitions(ORDER BY)``
  (clustering → parquet row-group min/max skipping, the dialect's
  `minmax` INDEX intent for free)
- a JSON sidecar per object holding what parquet can't: dialect types
  (unsigned/serial/enum), PRIMARY KEY, ORDER BY, skip indexes, CHECK
  constraints, defaults, comments, nullability (dialect default is
  NON-nullable — the inverse of Spark), serial counters, and for views
  the merge strategy + defining query (pickled AST)

Correctness-enforced at INSERT time (the write path is the only gate a
storage-less dialect has): arity, type coercion, non-null, CHECK
constraints, Enum membership, DEFAULT fill-in, Serial generation.
"""

from __future__ import annotations

import base64
import json
import os
import pickle
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as S

from nutdb_spark.frontend import ast_nodes as A

# --- §1.3 type mapping ----------------------------------------------------

_SIMPLE_TYPES: dict[str, S.DataType] = {
    "int8": S.ByteType(),
    "int16": S.ShortType(),
    "int32": S.IntegerType(),
    "int64": S.LongType(),
    "int128": S.DecimalType(38, 0),
    "uint8": S.ShortType(),  # widen to preserve range (no unsigned in Spark)
    "uint16": S.IntegerType(),
    "uint32": S.LongType(),
    "uint64": S.DecimalType(20, 0),
    "uint128": S.DecimalType(38, 0),
    "serial32": S.IntegerType(),
    "serial64": S.LongType(),
    "serial128": S.DecimalType(38, 0),
    "userial32": S.IntegerType(),
    "userial64": S.LongType(),
    "userial128": S.DecimalType(38, 0),
    "float32": S.FloatType(),
    "float64": S.DoubleType(),
    "boolean": S.BooleanType(),
    "string": S.StringType(),
    "chars": S.StringType(),
    "uuid": S.StringType(),
    "date": S.DateType(),
    "datetime": S.TimestampType(),
}

_SERIAL_TYPES = {
    "serial32", "serial64", "serial128", "userial32", "userial64", "userial128",
}


def to_spark_type(dt: A.DataType) -> S.DataType:
    name = dt.name
    if name in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[name]
    if name in ("decimal32", "decimal64"):
        scale = dt.args[0]
        return S.DecimalType(9 if name == "decimal32" else 18, scale)
    if name == "array":
        return S.ArrayType(to_spark_type(dt.args[0]))
    if name == "enum":
        return S.StringType()  # names stored; id map kept in metadata
    if name == "tuple":
        return S.StructType(
            [
                S.StructField(f"_{i + 1}", to_spark_type(a))
                for i, a in enumerate(dt.args)
            ]
        )
    if name == "map":
        return S.MapType(to_spark_type(dt.args[0]), to_spark_type(dt.args[1]))
    if name == "dictionary":
        # encoding hint only; parquet dictionary-encodes automatically
        return to_spark_type(dt.args[0])
    raise ValueError(f"unmapped dialect type {name!r}")


def _dtype_meta(dt: A.DataType) -> dict:
    out = {"name": dt.name, "nullable": dt.nullable}
    if dt.name == "enum":
        out["members"] = {b.name: b.value for b in dt.args}
    elif dt.args and all(isinstance(a, A.DataType) for a in dt.args):
        out["args"] = [_dtype_meta(a) for a in dt.args]
    elif dt.args:
        out["args"] = list(dt.args)
    return out


class CatalogError(ValueError):
    pass


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out += [
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        ]
    return out


# --- incremental-view eligibility (S7) ------------------------------------


def _unionall_branches(q) -> list | None:
    """Flatten a view query into UNION ALL branches; None if any other
    set operator appears (those are not delta-decomposable)."""
    if isinstance(q, A.SetOp):
        if q.op != "union_all":
            return None
        left = _unionall_branches(q.left)
        right = _unionall_branches(q.right)
        if left is None or right is None:
            return None
        return left + right
    return [q]


def _walk_ast(node):
    yield node
    for f in getattr(node, "__dataclass_fields__", {}):
        v = getattr(node, f)
        items = v if isinstance(v, list) else [v]
        for x in items:
            if isinstance(x, tuple):
                for y in x:
                    if hasattr(y, "__dataclass_fields__"):
                        yield from _walk_ast(y)
            elif hasattr(x, "__dataclass_fields__"):
                yield from _walk_ast(x)


def _has_subquery(node) -> bool:
    """Any subquery construct inside an expression tree (their value
    depends on whole-table state, so a per-insert delta through them
    would be silently wrong)."""
    if isinstance(
        node, (A.ScalarSubquery, A.Exists, A.InSubquery, A.QuantCompare)
    ):
        return True
    for f in getattr(node, "__dataclass_fields__", {}):
        v = getattr(node, f, None)
        if isinstance(v, list):
            for x in v:
                if isinstance(x, tuple):
                    if any(
                        hasattr(y, "__dataclass_fields__") and _has_subquery(y)
                        for y in x
                    ):
                        return True
                elif hasattr(x, "__dataclass_fields__") and _has_subquery(x):
                    return True
        elif hasattr(v, "__dataclass_fields__") and _has_subquery(v):
            return True
    return False


def _branch_delta_ok(b) -> bool:
    """A UNION ALL branch is delta-decomposable iff applying it to a
    batch of newly inserted rows yields exactly that batch's
    contribution to the view: per-row projection/filter over base
    tables, inner joins only, each table referenced at most once (a
    self-join of T needs ΔT⋈T_old and T_old⋈ΔT terms), and no
    aggregates/subqueries (their value depends on the whole input).
    This is the ClickHouse materialized-view contract: the insert block
    flows through the query."""
    from nutdb_spark.frontend.lower import _AGG_NAMES

    if not isinstance(b, A.SelectCore):
        return False
    if (
        b.distinct
        or b.distinct_on is not None
        or b.group_by
        or b.having is not None
        or b.limit is not None
        or b.ctes
        or b.from_ is None
        # whole-input constructs added by the dialect extensions:
        # SAMPLE is per-row-pure but conservative-reject keeps the
        # contract obvious; QUALIFY and window functions depend on the
        # entire input, so a per-insert delta would be silently wrong
        or getattr(b, "qualify", None) is not None
        or getattr(b, "group_modifier", None) is not None
        or getattr(b.from_, "sample", None) is not None
    ):
        return False
    if not isinstance(b.from_.source, A.TableRef):
        return False
    for j in b.joins:
        if isinstance(j, A.ArrayJoin):
            # row-local generator — but its lockstep/LEFT shapes are
            # untested under delta merge; take the always-correct
            # full-refresh path
            return False
        if j.kind != "inner" or not isinstance(j.source, A.TableRef):
            return False
    refs: dict[str, int] = {}
    for node in _walk_ast(b):
        if isinstance(node, A.TableRef):
            refs[node.name] = refs.get(node.name, 0) + 1
        if isinstance(node, (A.Exists, A.InSubquery, A.ScalarSubquery)):
            return False
        if isinstance(node, A.WindowCall):
            # window results depend on the whole partition, not the
            # insert batch
            return False
        if isinstance(node, A.FnCall) and node.name.lower() in _AGG_NAMES:
            return False
    return all(c == 1 for c in refs.values())


class Catalog:
    def __init__(self, spark: SparkSession, root: str | None = None):
        self.spark = spark
        self.root = root or os.environ.get("NUTDB_CATALOG_DIR") or os.path.join(
            tempfile.gettempdir(), "nutdb_catalog"
        )
        os.makedirs(self.root, exist_ok=True)

    # --- metadata plumbing ------------------------------------------------

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.json")

    def _data_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _load_meta(self, name: str) -> dict | None:
        p = self._meta_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _save_meta(self, name: str, meta: dict) -> None:
        with open(self._meta_path(name), "w") as f:
            json.dump(meta, f, indent=1)

    def has_table(self, name: str) -> bool:
        m = self._load_meta(name)
        return m is not None and m["type"] == "table"

    def has_view(self, name: str) -> bool:
        m = self._load_meta(name)
        return m is not None and m["type"] == "view"

    # --- CREATE TABLE (S6) ------------------------------------------------

    def create_table(self, d: A.TableDefinition, low=None) -> None:
        existing = self._load_meta(d.name)
        replace_entity: str | None = None
        if existing is not None:
            if d.if_not_exists:
                return
            if getattr(d, "or_replace", False):
                # [EXT] CREATE OR REPLACE TABLE. For CTAS the drop is
                # DEFERRED until the new data is staged — dropping
                # first would destroy the source of a self-referencing
                # `CREATE OR REPLACE TABLE t AS SELECT ... FROM t` and
                # leave nothing behind if the query fails.
                replace_entity = existing["type"]
            else:
                raise CatalogError(f"table {d.name!r} already exists")
        if getattr(d, "as_query", None) is not None:
            self._create_table_as(d, low, replace_entity=replace_entity)
            return
        if replace_entity is not None:
            self.drop(A.DropStmt(replace_entity, d.name, True))
        meta = {
            "type": "table",
            "name": d.name,
            "columns": [
                {
                    "name": c.name,
                    "dtype": _dtype_meta(c.dtype),
                    "spark_type": to_spark_type(c.dtype).json(),
                    "nullable": c.dtype.nullable,
                    "serial": c.dtype.name in _SERIAL_TYPES,
                    "default": _pickle_ast(c.default) if c.default else None,
                    "comment": c.comment,
                    "max_len": (
                        c.dtype.args[0]
                        if c.dtype.name in ("chars", "string") and c.dtype.args
                        else None
                    ),
                }
                for c in d.columns
            ],
            "primary_key": d.primary_key,
            "order_by": d.order_by,
            "partition_by": _pickle_ast(d.partition_by) if d.partition_by else None,
            "indexes": [
                {"name": i.name, "fn": i.fn.name, "args": _pickle_ast(i.fn.args)}
                for i in d.indexes
            ],
            "constraints": [
                {"name": c.name, "check": _pickle_ast(c.check)}
                for c in d.constraints
            ],
            "comment": d.comment,
            "serial_next": {
                c.name: 1 for c in d.columns if c.dtype.name in _SERIAL_TYPES
            },
        }
        self._save_meta(d.name, meta)
        os.makedirs(self._data_path(d.name), exist_ok=True)

    def _create_table_as(
        self, d: A.TableDefinition, low, replace_entity: str | None = None
    ) -> None:
        """[EXT] CREATE TABLE ... AS SELECT: the schema is the query's
        output schema; data is written through the same
        partition/order-aware parquet path as INSERT. The write is the
        query's own distributed plan — nothing materializes on the
        driver. An ENGINE clause is recorded for ClickHouse parity but
        storage is always parquet + JSON sidecar.

        Atomicity: the query writes to a tmp dir FIRST, then the
        sidecar metadata is saved and the directory swapped into place
        — a failed CTAS never leaves a registered table with partial
        data, and OR REPLACE drops the old table only after the new
        data is fully staged (so a self-referencing query reads the old
        data while it runs)."""
        if low is None:
            raise CatalogError("CTAS requires a query lowerer")
        df = low.lower_query(d.as_query)
        meta = {
            "type": "table",
            "name": d.name,
            "columns": [
                {
                    "name": f.name,
                    "dtype": {
                        "name": f.dataType.simpleString(),
                        "nullable": True,
                    },
                    "spark_type": f.dataType.json(),
                    "nullable": True,
                    "serial": False,
                    "default": None,
                    "comment": None,
                    "max_len": None,
                }
                for f in df.schema.fields
            ],
            "primary_key": d.primary_key,
            "order_by": d.order_by,
            "partition_by": (
                _pickle_ast(d.partition_by) if d.partition_by else None
            ),
            "indexes": [],
            "constraints": [],
            "comment": d.comment,
            "engine": d.engine,
            "serial_next": {},
        }
        for c in d.order_by or []:
            if c not in df.columns:
                raise CatalogError(f"ORDER BY column {c!r} not in CTAS output")
        path = self._data_path(d.name)
        tmp = path + ".tmp"
        staged = df
        part_cols: list[str] = []
        if d.partition_by is not None:
            if isinstance(d.partition_by, A.Ident):
                part_cols = [d.partition_by.name]
            else:
                staged = staged.withColumn(
                    "__part", low._expr(d.partition_by, None, {}, [])
                )
                part_cols = ["__part"]
        if d.order_by:
            staged = staged.sortWithinPartitions(*d.order_by)
        writer = staged.write.mode("overwrite")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        # the query executes HERE, against the pre-drop catalog state;
        # a failed write must not orphan the staging dir
        try:
            writer.parquet(tmp)
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        # true swap (OR REPLACE): rename the OLD data aside, rename the
        # new data in, THEN delete the old — at no instant is the table
        # name without a data directory, and a crash mid-swap leaves
        # either the old table intact (before the rename-in) or the new
        # one fully in place (after). Metadata is saved only after the
        # new directory exists, so a registered table always has data.
        old = path + ".old"
        had_old = os.path.exists(path)
        if had_old:
            shutil.rmtree(old, ignore_errors=True)
            os.rename(path, old)
        try:
            os.rename(tmp, path)
        except Exception:
            if had_old:
                os.rename(old, path)  # roll the old table back in
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        self._save_meta(d.name, meta)
        if had_old:
            shutil.rmtree(old, ignore_errors=True)

    def _schema(self, meta: dict) -> S.StructType:
        return S.StructType(
            [
                S.StructField(
                    c["name"],
                    _parse_type(c["spark_type"]),
                    # physical files stay nullable (Spark writes nullable
                    # parquet anyway); logical non-nullability is enforced
                    # on the write path
                    True,
                )
                for c in meta["columns"]
            ]
        )

    def read_table(self, name: str) -> DataFrame:
        meta = self._load_meta(name)
        path = self._data_path(name)
        if not any(
            not f.startswith(("_", ".")) for f in os.listdir(path)
        ):
            return self.spark.createDataFrame([], self._schema(meta))
        return self.spark.read.schema(self._schema(meta)).parquet(path)

    # --- INSERT (S2-S4) ---------------------------------------------------

    def insert(self, stmt: A.InsertStmt, low) -> None:
        meta = self._load_meta(stmt.table)
        if meta is None or meta["type"] != "table":
            raise CatalogError(f"unknown table {stmt.table!r}")
        kind, payload = stmt.source
        col_meta = meta["columns"]
        declared = [c["name"] for c in col_meta]
        serial_cols = [c["name"] for c in col_meta if c["serial"]]
        target_cols = stmt.columns or [
            c for c in declared if c not in serial_cols
        ]
        for c in target_cols:
            if c not in declared:
                raise CatalogError(f"unknown column {c!r}")

        if kind == "values":
            # One inline(array(struct(row)…)) over range(1): a single
            # one-task relation and ONE codegen segment however many
            # rows the statement lists. (The previous shape — one
            # range(1).select per row chained through unionByName —
            # made every downstream job (validation aggregate, write)
            # plan and run N branches.) Cells are cast to the DECLARED
            # column type here so every struct is same-typed (the
            # array() requirement); the staged-output projection below
            # applies the identical cast, so this is the same coercion
            # one step earlier, not a new one.
            types_by_name = {
                c["name"]: _parse_type(c["spark_type"]) for c in col_meta
            }
            row_structs = []
            for i, row in enumerate(payload):
                if len(row) != len(target_cols):
                    # reference: ragged INSERT rows are a Conflicts error
                    # (/root/reference/src/parser/mod.rs:657-664)
                    raise CatalogError(
                        f"INSERT row {i + 1} has {len(row)} values but "
                        f"{len(target_cols)} target columns"
                    )
                vals = [
                    low._expr(cell, None, {}, [])
                    .cast(types_by_name[n])
                    .alias(n)
                    for cell, n in zip(row, target_cols)
                ]
                row_structs.append(F.struct(*vals))
            src = self.spark.range(1).select(
                F.inline(F.array(*row_structs))
            )
        elif kind == "query":
            src = low.lower_query(payload)
            if len(src.columns) != len(target_cols):
                raise CatalogError("INSERT…SELECT arity mismatch")
            src = src.toDF(*target_cols)
        elif kind == "fn":
            src = low._table_fn(payload)
            if len(src.columns) != len(target_cols):
                raise CatalogError("INSERT…FROM fn arity mismatch")
            src = src.toDF(*target_cols)
        elif kind == "frame":
            # internal: a pre-lowered DataFrame (the MERGE INTO
            # not-matched path) rides the same defaults/serials/CHECK
            # machinery as every other insert source
            src = payload
            if len(src.columns) != len(target_cols):
                raise CatalogError("MERGE INSERT arity mismatch")
            src = src.toDF(*target_cols)
        else:  # pragma: no cover
            raise CatalogError(f"bad insert source {kind}")

        # fill defaults / serials, coerce types
        out_cols: list = []
        serial_bases = dict(meta.get("serial_next") or {})
        need_serial = [
            c for c in col_meta if c["serial"] and c["name"] not in src.columns
        ]
        n_rows = 0
        if need_serial:
            # pin partition layout: the counts job and the write job must
            # see identical partition ids / local indexes (also avoids
            # recomputing the source between validation and write)
            src = src.persist()
            # Dense, distributed serial assignment: one small aggregate
            # computes per-partition row counts; each row's id is
            # base + rows-before-its-partition + its local index (from
            # monotonically_increasing_id's low 33 bits, which ARE the
            # dense within-partition index). No global window, no RDD
            # round-trip — scales to arbitrarily large INSERT…SELECT.
            # Contract: ids are DENSE and UNIQUE; which row draws
            # which id follows the partition layout (the distributed-
            # sequence semantics every parallel engine has) — a
            # content-correlated order would force a global sort the
            # statement never asked for.
            pid = F.spark_partition_id()
            counts = {
                r["p"]: r["n"]
                for r in src.groupBy(pid.alias("p"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            offsets, acc = {}, 0
            for p in sorted(counts):
                offsets[p] = acc
                acc += counts[p]
            n_rows = acc
            # flat array-literal lookup (1-based element_at), not a
            # chained CASE — constant expression depth at any partition
            # count
            off_arr = F.array(
                *[
                    F.lit(offsets.get(p, 0)).cast("long")
                    for p in range(max(counts, default=0) + 1)
                ]
            )
            local_idx = F.monotonically_increasing_id() - (
                pid.cast("long") * F.lit(1 << 33)
            )
            dense_idx = F.element_at(off_arr, pid + 1) + local_idx
        for c in col_meta:
            name = c["name"]
            stype = _parse_type(c["spark_type"])
            if name in src.columns:
                col = F.col(name).cast(stype)
            elif c["serial"]:
                base = serial_bases.get(name, 1)
                col = (F.lit(base) + dense_idx).cast(stype)
                serial_bases[name] = base + n_rows
            elif c["default"] is not None:
                col = low._expr(_unpickle_ast(c["default"]), None, {}, []).cast(
                    stype
                )
            else:
                col = F.lit(None).cast(stype)
            out_cols.append(col.alias(name))
        staged = src.select(*out_cols)

        # Validation rides the WRITE job itself (observe() metrics
        # evaluated while the rows stream to parquet) instead of a
        # separate aggregate pass: the source plan is computed ONCE,
        # not twice — at 100 TB an INSERT…SELECT's source is the whole
        # statement cost. Atomicity is preserved by staging into a tmp
        # dir next to the table and moving the files in only after the
        # flags come back clean; a violation (or a failed write) leaves
        # the live table directory untouched, exactly as before.
        violations = self._violation_conds(meta, low)
        obs = None
        if violations:
            from pyspark.sql import Observation

            obs = Observation()
            staged = staged.observe(
                obs,
                *[
                    F.max(F.coalesce(cond, F.lit(False))).alias(f"v{i}")
                    for i, (cond, _) in enumerate(violations)
                ],
            )
        part_cols: list[str] = []
        if meta["partition_by"]:
            part_expr = _unpickle_ast(meta["partition_by"])
            if isinstance(part_expr, A.Ident):
                part_cols = [part_expr.name]
            else:
                staged = staged.withColumn(
                    "__part", low._expr(part_expr, None, {}, [])
                )
                part_cols = ["__part"]
        if meta["order_by"]:
            staged = staged.sortWithinPartitions(*meta["order_by"])
        writer = staged.write.mode("overwrite")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        data_path = self._data_path(stmt.table)
        # per-statement staging dir: concurrent inserts into the same
        # table must not clobber each other's staging output, and a
        # crashed statement's leftover dir must never be swept into a
        # later statement's move loop
        import uuid

        tmp = data_path + f".__insert_tmp_{uuid.uuid4().hex}"
        new_files: list[str] = []
        try:
            writer.parquet(tmp)
            if obs is not None:
                flags = obs.get
                for i, (_, msg) in enumerate(violations):
                    if flags.get(f"v{i}"):
                        raise CatalogError(msg)
            # clean: move the written files into the live dir
            # (partition subdirs preserved; part-file names carry
            # write-unique UUIDs so appends never collide)
            for root, _dirs, files in os.walk(tmp):
                rel = os.path.relpath(root, tmp)
                dst_dir = (
                    data_path
                    if rel == "."
                    else os.path.join(data_path, rel)
                )
                for f in files:
                    if not f.endswith(".parquet"):
                        continue
                    os.makedirs(dst_dir, exist_ok=True)
                    dst = os.path.join(dst_dir, f)
                    os.rename(os.path.join(root, f), dst)
                    new_files.append(dst)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            if need_serial:
                src.unpersist()
        meta["serial_next"] = serial_bases
        self._save_meta(stmt.table, meta)
        # Delta for incremental view maintenance: exactly the files this
        # insert wrote (re-planning `staged` after unpersist could
        # regenerate serial ids differently; the written bytes can't).
        # Built lazily — only if an incremental view actually consumes it.
        new_files = sorted(new_files)
        cols = [c["name"] for c in col_meta]

        def delta() -> DataFrame | None:
            if not new_files:
                return None
            return (
                self.spark.read.option("basePath", data_path)
                .parquet(*new_files)
                .select(*cols)
            )

        self._refresh_dependent_views(stmt.table, low, delta)

    def _violation_conds(self, meta: dict, low) -> list[tuple[object, str]]:
        """The (flag expression, message) list behind constraint
        enforcement: NOT-NULL, enum membership, max length, CHECKs."""
        violations: list[tuple[object, str]] = []
        for c in meta["columns"]:
            if not c["nullable"] and not c["serial"]:
                violations.append(
                    (
                        F.col(c["name"]).isNull(),
                        f"column {c['name']!r} is not Nullable but got NULL",
                    )
                )
            members = c["dtype"].get("members")
            if members:
                violations.append(
                    (
                        ~F.col(c["name"]).isin(list(members.keys())),
                        f"enum column {c['name']!r} got a non-member value",
                    )
                )
            if c["max_len"]:
                violations.append(
                    (
                        F.length(F.col(c["name"])) > c["max_len"],
                        f"column {c['name']!r} exceeds max length "
                        f"{c['max_len']}",
                    )
                )
        for con in meta["constraints"]:
            check = low._expr(_unpickle_ast(con["check"]), None, {}, [])
            # SQL semantics: a CHECK whose predicate is UNKNOWN passes.
            violations.append(
                (
                    ~F.coalesce(check, F.lit(True)),
                    f"CHECK constraint {con['name']!r} violated",
                )
            )
        return violations

    def _referenced_tables(self, node, out: set[str]) -> None:
        if isinstance(node, A.TableRef):
            out.add(node.name)
            return
        if isinstance(node, (str, int, float, bool, bytes)) or node is None:
            return
        if isinstance(node, (list, tuple)):
            for x in node:
                self._referenced_tables(x, out)
            return
        for f in getattr(node, "__dataclass_fields__", {}):
            self._referenced_tables(getattr(node, f), out)

    def _refresh_dependent_views(
        self, table: str, low, delta=None
    ) -> None:
        """Keep `UPDATE BY <strategy>` views maintained: any view whose
        defining query references the written table re-merges.
        Incrementally-maintained Summing views merge ONLY the insert's
        delta rows (O(touched buckets) via streaming/summing.py); every
        other view takes the full refresh. ``delta`` is a zero-arg
        callable returning the insert's rows (or None) — evaluated only
        if an incremental view needs it, so plain inserts pay nothing."""
        delta_df: DataFrame | None | bool = False  # False = not built yet
        for f in os.listdir(self.root):
            if not f.endswith(".json"):
                continue
            meta = self._load_meta(f[:-5])
            if meta and meta["type"] == "view":
                refs: set[str] = set()
                self._referenced_tables(_unpickle_ast(meta["query"]), refs)
                if table not in refs:
                    continue
                if meta.get("maintenance") == "incremental" and delta is not None:
                    if delta_df is False:
                        delta_df = delta()
                    if delta_df is not None:
                        self._delta_merge_view(meta, table, delta_df, low)
                    continue
                self.refresh_view(meta["name"], low)

    def _rename_refs(self, node, old: str, new: str) -> None:
        if isinstance(node, A.TableRef):
            if node.name == old:
                node.name = new
            return
        if isinstance(node, (str, int, float, bool, bytes)) or node is None:
            return
        if isinstance(node, (list, tuple)):
            for x in node:
                self._rename_refs(x, old, new)
            return
        for f in getattr(node, "__dataclass_fields__", {}):
            self._rename_refs(getattr(node, f), old, new)

    def _rename_in_views(self, old: str, new: str) -> None:
        """Follow a table rename through every dependent view's stored
        query AST (ALTER … RENAME would otherwise orphan the views:
        refreshes and delta merges resolve by name)."""
        for f in os.listdir(self.root):
            if not f.endswith(".json"):
                continue
            meta = self._load_meta(f[:-5])
            if not meta or meta["type"] != "view":
                continue
            refs: set[str] = set()
            q = _unpickle_ast(meta["query"])
            self._referenced_tables(q, refs)
            if old not in refs:
                continue
            self._rename_refs(q, old, new)
            meta["query"] = _pickle_ast(q)
            self._save_meta(meta["name"], meta)

    def _repair_dependent_views(self, table: str, low) -> None:
        """Full repair for base-table mutations that bypass the insert
        delta path (TRUNCATE / ALTER data rewrites / DROP PARTITION /
        OPTIMIZE): incremental bucketed state only ever merges insert
        deltas, so removed or rewritten base rows would otherwise stay
        in the view forever and reads would be silently wrong. Rebuild
        incremental state from the full query; re-run full-refresh
        views for read-consistency before the next insert."""
        for f in os.listdir(self.root):
            if not f.endswith(".json"):
                continue
            meta = self._load_meta(f[:-5])
            if not meta or meta["type"] != "view":
                continue
            refs: set[str] = set()
            self._referenced_tables(_unpickle_ast(meta["query"]), refs)
            if table not in refs:
                continue
            if meta.get("maintenance") == "incremental":
                self._rebuild_incremental(meta, low)
            else:
                self.refresh_view(meta["name"], low)

    # --- views (S7): CREATE VIEW … UPDATE BY <strategy> -------------------

    _VIEW_STRATEGIES = ("summing", "replacing", "aggregating")

    def create_view(self, v: A.ViewDefinition, low) -> None:
        existing = self._load_meta(v.name)
        if existing is not None:
            if v.if_not_exists:
                return
            if getattr(v, "or_replace", False):
                # [EXT] CREATE OR REPLACE VIEW — drop-and-recreate
                self.drop(A.DropStmt(existing["type"], v.name, True))
            else:
                raise CatalogError(f"view {v.name!r} already exists")
        strategy = v.strategy.lower()
        if strategy == "plain":
            # [EXT] non-materialized view: store the query, nothing
            # else — reads lower it fresh (engine.resolve_table), so
            # there is no state to maintain, refresh, or repair.
            self._save_meta(
                v.name,
                {
                    "type": "view",
                    "name": v.name,
                    "strategy": "plain",
                    "order_by": v.order_by,
                    "primary_key": v.primary_key,
                    "query": _pickle_ast(v.query),
                },
            )
            return
        if strategy not in self._VIEW_STRATEGIES:
            raise CatalogError(f"unsupported view strategy {v.strategy!r}")
        if not v.order_by:
            raise CatalogError(
                f"{v.strategy} view requires ORDER BY merge keys"
            )
        if strategy == "replacing" and not v.primary_key:
            raise CatalogError(
                "Replacing view requires PRIMARY KEY (version columns): "
                "the kept row per ORDER BY key is the one with the "
                "greatest version"
            )
        meta = {
            "type": "view",
            "name": v.name,
            "strategy": strategy,
            "order_by": v.order_by,
            "primary_key": v.primary_key,
            "query": _pickle_ast(v.query),
        }
        self._mark_incremental_if_eligible(meta, low)
        self._save_meta(v.name, meta)
        if meta.get("maintenance") == "incremental":
            self._rebuild_incremental(meta, low)
        else:
            self.refresh_view(v.name, low)

    def _mark_incremental_if_eligible(self, meta: dict, low) -> None:
        """A view maintains incrementally when the defining query is a
        UNION ALL of delta-decomposable branches; Summing additionally
        requires every non-key output column to be numeric (summable),
        Replacing requires its version columns in the output (keep-max
        merges any column type). State is then bucketed parquet merged
        per insert — O(touched buckets) per batch instead of a full
        recompute, the property that keeps a 100 TB view maintainable."""
        q = _unpickle_ast(meta["query"])
        if meta["strategy"] == "aggregating":
            # [EXT] Aggregating views carry their OWN GROUP BY; the
            # delta contract is re-aggregatability (sum/count/min/max
            # merge associatively), not row-flow
            self._mark_aggregating_incremental(meta, q, low)
            return
        branches = _unionall_branches(q)
        if branches is None or not all(_branch_delta_ok(b) for b in branches):
            meta["maintenance"] = "full"
            return
        df = low.lower_query(q)
        keys = meta["order_by"]
        if not set(keys) <= set(df.columns):
            meta["maintenance"] = "full"
            return
        non_key = [f for f in df.schema.fields if f.name not in keys]
        if meta["strategy"] == "replacing":
            if not set(meta["primary_key"] or []) <= set(df.columns):
                meta["maintenance"] = "full"
                return
            merged_schema = df.schema.json()
        else:
            if not all(
                isinstance(f.dataType, S.NumericType) for f in non_key
            ):
                meta["maintenance"] = "full"
                return
            probe = df.groupBy(*keys).agg(
                *[F.sum(f.name).alias(f.name) for f in non_key]
            )
            merged_schema = probe.select(*df.columns).schema.json()
        meta["maintenance"] = "incremental"
        meta["out_columns"] = df.columns
        meta["n_buckets"] = 16  # state-layout knob; raise at real scale
        meta["merged_schema"] = merged_schema

    def _mark_aggregating_incremental(self, meta: dict, q, low) -> None:
        """[EXT] UPDATE BY Aggregating — ClickHouse AggregatingMergeTree
        for the re-aggregatable functions. Eligible shape: ONE
        SelectCore `SELECT keys..., agg(x) AS a, ... FROM t [WHERE
        row-local] GROUP BY keys` where every aggregate is sum / count
        / min / max (merge ops: counts ADD, min/max keep-extreme — all
        associative+commutative, so agg(old ∪ Δ) = merge(agg(old),
        agg(Δ)) exactly; avg is NOT re-aggregatable and falls back to
        full refresh, spell it sum/count). State is the same bucketed
        parquet as Summing, merged per insert in O(touched buckets)."""
        meta["maintenance"] = "full"
        if not isinstance(q, A.SelectCore):
            return
        b = q
        if (
            b.distinct
            or b.distinct_on is not None
            or not b.group_by
            or b.having is not None
            or b.limit is not None
            or b.ctes
            or b.joins
            or b.from_ is None
            or getattr(b, "qualify", None) is not None
            or getattr(b, "group_modifier", None) is not None
            or getattr(b, "group_sets", None) is not None
            or getattr(b.from_, "sample", None) is not None
            or not isinstance(b.from_.source, A.TableRef)
        ):
            return
        if b.where is not None and _has_subquery(b.where):
            return
        group_names = set()
        for g in b.group_by:
            if not (isinstance(g, A.Ident) and g.qualifier is None):
                return
            group_names.add(g.name)
        _AGG_OPS = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
        ops: dict[str, str] = {}
        out_keys: list[str] = []
        for e, alias in b.columns:
            if isinstance(e, A.Ident) and e.qualifier is None:
                if e.name not in group_names:
                    return
                out_keys.append(alias or e.name)
                continue
            if (
                isinstance(e, A.FnCall)
                and e.name.lower() in _AGG_OPS
                and e.params is None
                and alias
            ):
                ops[alias] = _AGG_OPS[e.name.lower()]
                continue
            return
        keys = meta["order_by"]
        if set(keys) != set(out_keys) or not ops:
            return
        df = low.lower_query(q)
        meta["maintenance"] = "incremental"
        meta["out_columns"] = df.columns
        meta["merge_ops"] = ops
        meta["n_buckets"] = 16
        meta["merged_schema"] = df.schema.json()

    def show_create(self, meta: dict) -> str:
        """[EXT] SHOW CREATE TABLE/VIEW — DDL text reconstructed from
        the sidecar metadata. Not a byte replay of the original
        statement: types print as the catalog stored them (dialect
        names for declared tables, Spark simpleStrings for
        CTAS-derived schemas) and clause order is normalized."""

        def _type_str(d: dict) -> str:
            name = d["name"]
            if d.get("members"):
                inner = ", ".join(
                    f"'{k}' = {v}" for k, v in d["members"].items()
                )
                base = f"Enum({inner})"
            elif d.get("args") and all(
                isinstance(a, dict) for a in d["args"]
            ):
                base = (
                    f"{name.capitalize()}("
                    + ", ".join(_type_str(a) for a in d["args"])
                    + ")"
                )
            elif d.get("args"):
                base = (
                    f"{name.capitalize()}("
                    + ", ".join(str(a) for a in d["args"])
                    + ")"
                )
            else:
                base = {
                    "int8": "Int8", "int16": "Int16", "int32": "Int32",
                    "int64": "Int64", "uint8": "UInt8", "uint16": "UInt16",
                    "uint32": "UInt32", "uint64": "UInt64",
                    "float32": "Float32", "float64": "Float64",
                    "string": "String", "boolean": "Boolean",
                    "date": "Date", "datetime": "Datetime",
                    "serial64": "Serial64", "serial32": "Serial32",
                    "uuid": "Uuid", "chars": "Chars",
                }.get(name, name)
            if d.get("nullable"):
                return f"Nullable({base})"
            return base

        if meta["type"] == "view":
            # best-effort re-executable query text; exotic clauses the
            # printer doesn't cover fall back to the loud placeholder
            try:
                from nutdb_spark.frontend.printer import query as _pq

                q = _pq(_unpickle_ast(meta["query"]))
            except Exception:
                q = "<stored query>"
            if meta.get("strategy") == "plain":
                return f"CREATE VIEW {meta['name']} AS {q}"
            out = (
                f"CREATE VIEW {meta['name']} UPDATE BY "
                f"{meta['strategy'].capitalize()}"
            )
            if meta.get("order_by"):
                out += f" ORDER BY ({', '.join(meta['order_by'])})"
            return out + f" AS {q}"
        cols = ", ".join(
            f"{c['name']} {_type_str(c['dtype'])}" for c in meta["columns"]
        )
        out = f"CREATE TABLE {meta['name']} ({cols})"
        if meta.get("primary_key"):
            out += f" PRIMARY KEY ({', '.join(meta['primary_key'])})"
        if meta.get("order_by"):
            out += f" ORDER BY ({', '.join(meta['order_by'])})"
        if meta.get("partition_by"):
            out += " PARTITION BY <expr>"
        if meta.get("engine"):
            out += f" ENGINE = {meta['engine']}"
        return out

    def _state_path(self, name: str) -> str:
        return self._data_path(name)

    def _state_merge(self, meta: dict, batch: DataFrame) -> None:
        """Merge one batch of view-query output rows into the bucketed
        state per the view's strategy."""
        from nutdb_spark.streaming.summing import (
            replacing_merge_batch,
            summing_merge_batch,
        )

        keys = meta["order_by"]
        state = self._state_path(meta["name"])
        buckets = meta.get("n_buckets", 64)
        batch = batch.select(*meta["out_columns"])
        if meta["strategy"] == "replacing":
            replacing_merge_batch(
                batch, keys, meta["primary_key"], state, buckets
            )
        elif meta["strategy"] == "aggregating":
            from nutdb_spark.streaming.summing import aggregating_merge_batch

            aggregating_merge_batch(
                batch, keys, meta["merge_ops"], state, buckets
            )
        else:
            sums = [c for c in meta["out_columns"] if c not in keys]
            summing_merge_batch(batch, keys, sums, state, buckets)

    def _rebuild_incremental(self, meta: dict, low) -> None:
        """(Re)build the bucketed state from the full defining query —
        the bootstrap at CREATE time (and the fallback repair path)."""
        state = self._state_path(meta["name"])
        if os.path.exists(state):
            shutil.rmtree(state)
        os.makedirs(state, exist_ok=True)
        self._state_merge(
            meta, low.lower_query(_unpickle_ast(meta["query"]))
        )

    def _delta_merge_view(
        self, meta: dict, table: str, delta: DataFrame, low
    ) -> None:
        """Apply one insert's delta through the view query and merge it
        into the bucketed state (ClickHouse MV semantics: the insert
        block flows through the query; branches not referencing the
        inserted table contribute nothing)."""
        from nutdb_spark.frontend.lower import Lowerer

        branches = _unionall_branches(_unpickle_ast(meta["query"]))
        base_resolve = low.resolve_table

        def resolve(name: str) -> DataFrame:
            if name == table:
                return delta
            return base_resolve(name)

        low2 = Lowerer(self.spark, resolve, low.params)
        parts = []
        for b in branches:
            refs: set[str] = set()
            self._referenced_tables(b, refs)
            if table in refs:
                parts.append(low2.lower_query(b))
        if not parts:
            return
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        self._state_merge(meta, out)

    def refresh_view(self, name: str, low) -> None:
        if (self._load_meta(name) or {}).get("strategy") == "plain":
            return  # nothing materialized to refresh
        """Full refresh: re-run the defining query and apply the merge
        strategy — Summing: sum numeric non-key columns per ORDER BY
        key (ClickHouse SummingMergeTree semantics; non-numeric
        non-key columns keep an arbitrary representative via `first`);
        Replacing: keep, per ORDER BY key, the row with the greatest
        PRIMARY KEY version (ReplacingMergeTree(ver) semantics)."""
        meta = self._load_meta(name)
        df = low.lower_query(_unpickle_ast(meta["query"]))
        keys = meta["order_by"]
        if meta.get("strategy") == "replacing":
            from nutdb_spark.operators import relational as R

            order = [(F.col(v), False) for v in meta["primary_key"]]
            merged = R.distinct_on(
                df, [F.col(k) for k in keys], order_by=order
            ).select(*df.columns)
        else:
            numeric = {
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, S.NumericType) and f.name not in keys
            }
            aggs = [
                F.sum(c).alias(c) if c in numeric else F.first(c).alias(c)
                for c in df.columns
                if c not in keys
            ]
            merged = df.groupBy(*keys).agg(*aggs).select(*df.columns)
        tmp = self._data_path(name) + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = self._data_path(name)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    def read_view(self, name: str) -> DataFrame:
        meta = self._load_meta(name)
        if meta and meta.get("maintenance") == "incremental":
            state = self._state_path(name)
            if not any(
                d.startswith("__bucket=")
                for d in (os.listdir(state) if os.path.isdir(state) else [])
            ):
                schema = S.StructType.fromJson(
                    json.loads(meta["merged_schema"])
                )
                return self.spark.createDataFrame([], schema)
            return self.spark.read.parquet(state).select(
                *meta["out_columns"]
            )
        return self.spark.read.parquet(self._data_path(name))

    # --- [EXT] operational DDL: DETACH/ATTACH, BACKUP/RESTORE -------------

    def detach(self, name: str, attach: bool) -> None:
        """[EXT] DETACH/ATTACH TABLE — CH's visibility toggle. DETACH
        renames the sidecar meta to <name>.json.detached (data
        untouched, resolution stops finding the table); ATTACH renames
        it back. Views that reference a detached table fail at read
        time, exactly like CH."""
        active = self._meta_path(name)
        parked = active + ".detached"
        if attach:
            if os.path.exists(active):
                raise CatalogError(f"table {name!r} is already attached")
            if not os.path.exists(parked):
                raise CatalogError(f"no detached table {name!r}")
            os.rename(parked, active)
            return
        meta = self._load_meta(name)
        if meta is None:
            raise CatalogError(f"unknown table {name!r}")
        if meta["type"] != "table":
            raise CatalogError("DETACH supports tables")
        os.rename(active, parked)

    def backup(self, name: str, path: str, restore: bool) -> None:
        """[EXT] BACKUP/RESTORE TABLE — copy meta + parquet data
        to/from a directory. RESTORE refuses to clobber an existing
        table (drop first); BACKUP replaces its target only when the
        target is empty or is itself a prior backup (meta.json +
        data/) — anything else at the path raises instead of being
        deleted, so a typo'd or reused destination can never wipe
        unrelated data (ClickHouse's BACKUP likewise refuses to
        overwrite)."""
        import shutil

        if restore:
            if self._load_meta(name) is not None:
                raise CatalogError(
                    f"table {name!r} already exists — DROP it before "
                    "RESTORE"
                )
            src_meta = os.path.join(path, "meta.json")
            src_data = os.path.join(path, "data")
            if not (os.path.exists(src_meta) and os.path.isdir(src_data)):
                raise CatalogError(f"no backup at {path!r}")
            shutil.copytree(src_data, self._data_path(name))
            shutil.copyfile(src_meta, self._meta_path(name))
            return
        meta = self._load_meta(name)
        if meta is None or meta["type"] != "table":
            raise CatalogError(
                f"unknown table {name!r} (BACKUP supports tables)"
            )
        if os.path.exists(path) and not os.path.isdir(path):
            raise CatalogError(
                f"BACKUP target {path!r} exists and is not a directory"
            )
        if os.path.isdir(path) and os.listdir(path):
            looks_like_backup = os.path.exists(
                os.path.join(path, "meta.json")
            ) and os.path.isdir(os.path.join(path, "data"))
            if not looks_like_backup:
                raise CatalogError(
                    f"BACKUP target {path!r} is a non-empty directory "
                    "that is not a prior backup — refusing to delete "
                    "it; remove it explicitly first"
                )
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        shutil.copytree(self._data_path(name), os.path.join(path, "data"))
        shutil.copyfile(self._meta_path(name), os.path.join(path, "meta.json"))

    # --- DESCRIBE / DROP / TRUNCATE / ALTER / OPTIMIZE --------------------

    def describe(self, stmt: A.DescribeStmt, engine) -> DataFrame:
        if stmt.entity == "database":
            rows = []
            for f in sorted(os.listdir(self.root)):
                if f.endswith(".json"):
                    m = self._load_meta(f[:-5])
                    rows.append((m["name"], m["type"]))
            return self.spark.createDataFrame(
                rows or [("", "")], "name: string, type: string"
            )
        meta = self._load_meta(stmt.name)
        if meta is None:
            # fixture tables are DESCRIBE-able too
            df = engine.resolve_table(stmt.name)
            rows = [(f.name, f.dataType.simpleString(), f.nullable, None) for f in df.schema.fields]
        elif meta["type"] == "view":
            df = (
                engine.resolve_table(stmt.name)
                if meta.get("strategy") == "plain"
                else self.read_view(stmt.name)
            )
            rows = [(f.name, f.dataType.simpleString(), True, None) for f in df.schema.fields]
        else:
            rows = [
                (
                    c["name"],
                    c["dtype"]["name"],
                    bool(c["nullable"]),
                    c["comment"],
                )
                for c in meta["columns"]
            ]
        return self.spark.createDataFrame(
            rows, "name: string, type: string, nullable: boolean, comment: string"
        )

    def drop(self, stmt: A.DropStmt) -> None:
        meta = self._load_meta(stmt.name)
        if meta is None or meta["type"] != stmt.entity:
            if stmt.if_exists:
                return
            raise CatalogError(f"unknown {stmt.entity} {stmt.name!r}")
        os.remove(self._meta_path(stmt.name))
        if os.path.exists(self._data_path(stmt.name)):
            shutil.rmtree(self._data_path(stmt.name))

    def truncate(self, stmt: A.TruncateStmt, low=None) -> None:
        meta = self._load_meta(stmt.name)
        if meta is None or meta["type"] != stmt.entity:
            if stmt.if_exists:
                return
            raise CatalogError(f"unknown {stmt.entity} {stmt.name!r}")
        path = self._data_path(stmt.name)
        shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        if stmt.entity == "table" and low is not None:
            self._repair_dependent_views(stmt.name, low)

    def alter(self, stmt: A.AlterStmt, low) -> None:
        meta = self._load_meta(stmt.table)
        if meta is None or meta["type"] != "table":
            raise CatalogError(f"unknown table {stmt.table!r}")
        act = stmt.action
        if act == "add_column":
            col: A.ColumnDef = stmt.payload
            if any(c["name"] == col.name for c in meta["columns"]):
                if stmt.if_clause:
                    return
                raise CatalogError(f"column {col.name!r} exists")
            entry = {
                "name": col.name,
                "dtype": _dtype_meta(col.dtype),
                "spark_type": to_spark_type(col.dtype).json(),
                "nullable": col.dtype.nullable,
                "serial": col.dtype.name in _SERIAL_TYPES,
                "default": _pickle_ast(col.default) if col.default else None,
                "comment": col.comment,
                "max_len": None,
            }
            if stmt.position == ("first",):
                meta["columns"].insert(0, entry)
            elif stmt.position and stmt.position[0] == "after":
                idx = next(
                    i
                    for i, c in enumerate(meta["columns"])
                    if c["name"] == stmt.position[1]
                )
                meta["columns"].insert(idx + 1, entry)
            else:
                meta["columns"].append(entry)
            # rewrite data files with the new column (default or NULL)
            self._rewrite(stmt.table, meta, low)
        elif act == "drop_column":
            meta["columns"] = [
                c for c in meta["columns"] if c["name"] != stmt.payload
            ]
            self._rewrite(stmt.table, meta, low)
        elif act == "rename_column":
            old, new = stmt.payload
            for c in meta["columns"]:
                if c["name"] == old:
                    c["name"] = new
            self._rewrite(stmt.table, meta, low, rename=(old, new))
        elif act == "modify_column":
            # [EXT] retype in the metadata, then let the schema-
            # evolution rewrite cast the stored data (it already casts
            # every surviving column to its meta spark_type).
            col = stmt.payload
            entry = next(
                (c for c in meta["columns"] if c["name"] == col.name),
                None,
            )
            if entry is None:
                raise CatalogError(f"unknown column {col.name!r}")
            entry["dtype"] = _dtype_meta(col.dtype)
            entry["spark_type"] = to_spark_type(col.dtype).json()
            entry["nullable"] = col.dtype.nullable
            if col.default is not None:
                entry["default"] = _pickle_ast(col.default)
            self._rewrite(stmt.table, meta, low)
        elif act == "add_index":
            meta["indexes"].append(
                {
                    "name": stmt.payload.name,
                    "fn": stmt.payload.fn.name,
                    "args": _pickle_ast(stmt.payload.fn.args),
                }
            )
        elif act == "drop_index":
            meta["indexes"] = [
                i for i in meta["indexes"] if i["name"] != stmt.payload
            ]
        elif act == "add_constraint":
            meta["constraints"].append(
                {"name": stmt.payload.name, "check": _pickle_ast(stmt.payload.check)}
            )
        elif act == "drop_constraint":
            meta["constraints"] = [
                c for c in meta["constraints"] if c["name"] != stmt.payload
            ]
        elif act == "drop_partition":
            # partition value → delete that partition directory
            val = stmt.payload
            col = None
            if meta["partition_by"]:
                pexpr = _unpickle_ast(meta["partition_by"])
                col = pexpr.name if isinstance(pexpr, A.Ident) else "__part"
            if col is None:
                raise CatalogError("table is not partitioned")
            lit = val.value if isinstance(val, A.Lit) else None
            pdir = os.path.join(self._data_path(stmt.table), f"{col}={lit}")
            if os.path.exists(pdir):
                shutil.rmtree(pdir)
        elif act == "update":
            # [EXT] ClickHouse mutation: rewrite matched rows in place.
            # Same scale shape as ClickHouse's own mutations: a full
            # read → conditional projection → rewrite, distributed end
            # to end (no driver materialization), atomic via tmp+rename.
            assignments, cond = stmt.payload
            by_name = {c["name"]: c for c in meta["columns"]}
            for cname, _ in assignments:
                if cname not in by_name:
                    raise CatalogError(f"unknown column {cname!r}")
                if by_name[cname]["serial"]:
                    raise CatalogError(
                        f"cannot UPDATE serial column {cname!r}"
                    )
            df = self.read_table(stmt.table)
            hit = F.coalesce(
                low._expr(cond, None, {}, []).cast("boolean"), F.lit(False)
            )
            upd = {}
            for cname, e in assignments:
                stype = _parse_type(by_name[cname]["spark_type"])
                upd[cname] = F.when(
                    hit, low._expr(e, None, {}, []).cast(stype)
                ).otherwise(F.col(cname))
            out = df.withColumns(upd)
            # a mutation must not sneak past the table's invariants —
            # validated on the rewrite job itself (one pass)
            self._overwrite(stmt.table, meta, out, low, validate=True)
        elif act == "delete":
            # [EXT] ClickHouse mutation: DELETE WHERE cond — rows whose
            # predicate is TRUE go; NULL/UNKNOWN rows stay (standard
            # DELETE semantics).
            df = self.read_table(stmt.table)
            hit = F.coalesce(
                low._expr(stmt.payload, None, {}, []).cast("boolean"),
                F.lit(False),
            )
            self._overwrite(stmt.table, meta, df.filter(~hit), low)
        elif act == "rename_table":
            new = stmt.payload
            os.rename(self._meta_path(stmt.table), self._meta_path(new))
            if os.path.exists(self._data_path(stmt.table)):
                os.rename(self._data_path(stmt.table), self._data_path(new))
            meta["name"] = new
            self._save_meta(new, meta)
            # dependent views' pickled queries still name the old table
            # — rewrite their TableRefs or every future refresh breaks
            self._rename_in_views(stmt.table, new)
            return
        else:
            raise CatalogError(f"unsupported ALTER action {act}")
        self._save_meta(stmt.table, meta)
        # Data-mutating ALTERs invalidate incremental view state (the
        # delta-merge path never sees removed/rewritten rows).
        if act in (
            "add_column", "drop_column", "rename_column", "drop_partition",
            "update", "delete",
        ):
            self._repair_dependent_views(stmt.table, low)

    def merge(self, stmt: "A.MergeStmt", low) -> None:
        """[EXT] ANSI MERGE INTO — the warehouse upsert, executed over
        the same primitives as the ClickHouse-style mutations: one
        source⋈target decision join, an atomic full rewrite
        (tmp+rename) for updates/deletes, and the standard INSERT path
        (defaults, serials, CHECK enforcement) for the not-matched
        rows. Semantics pinned by tests: WHEN clauses apply in order
        (first matching clause per row wins); a target row matching
        MULTIPLE source rows is an error (the ANSI cardinality rule —
        a nondeterministic multi-update must never be silent); rows
        matching no clause pass through untouched.

        Scale shape: the decision join is a plain equi/theta join the
        optimizer plans (broadcast for small sources, shuffle
        otherwise); the cardinality check is ONE aggregate over the
        join (max matches per target row id — a 1-row driver value);
        inserts ride INSERT…SELECT. Nothing row-at-a-time."""
        import copy as _copy

        meta = self._load_meta(stmt.table)
        if meta is None or meta["type"] != "table":
            raise CatalogError(f"unknown table {stmt.table!r}")
        by_name = {c["name"]: c for c in meta["columns"]}
        # --- source frame, columns renamed to the __ms_ namespace ---
        if isinstance(stmt.source, str):
            src0 = low.resolve_table(stmt.source)
            src_name = stmt.source
        elif isinstance(stmt.source, DataFrame):
            # internal programmatic form (e.g. a streaming foreachBatch
            # applying each micro-batch as a MERGE)
            src0 = stmt.source
            src_name = None
        else:
            src0 = low.lower_query(stmt.source)
            src_name = None
        pfx = "__ms_"
        scols = list(src0.columns)
        src = src0.select(
            *[F.col(c).alias(pfx + c) for c in scols]
        )
        tcols = set(by_name)  # declared target column names
        t_names = {stmt.table}
        if stmt.target_alias:
            t_names.add(stmt.target_alias)
        s_names = set()
        if stmt.source_alias:
            s_names.add(stmt.source_alias)
        if src_name is not None:
            s_names.add(src_name)

        def rw(node):
            node = _copy.deepcopy(node)

            def walk(e):
                if isinstance(e, A.Ident):
                    if e.qualifier in s_names:
                        if e.name not in scols:
                            raise CatalogError(
                                f"unknown source column {e.name!r}"
                            )
                        return A.Ident(pfx + e.name, None)
                    if e.qualifier in t_names:
                        if e.name not in tcols:
                            raise CatalogError(
                                f"unknown target column {e.name!r}"
                            )
                        return A.Ident(e.name, None)
                    if e.qualifier is None:
                        if e.name in tcols and e.name in scols:
                            raise CatalogError(
                                f"ambiguous MERGE column {e.name!r}: "
                                "qualify it with the target or source "
                                "alias"
                            )
                        if e.name in scols:
                            return A.Ident(pfx + e.name, None)
                        return e
                    return e
                if not hasattr(e, "__dataclass_fields__"):
                    return e
                for f in e.__dataclass_fields__:
                    v = getattr(e, f)
                    if isinstance(v, list):
                        setattr(
                            e, f,
                            [walk(x) if hasattr(
                                x, "__dataclass_fields__"
                            ) else x for x in v],
                        )
                    elif hasattr(v, "__dataclass_fields__"):
                        setattr(e, f, walk(v))
                return e

            return walk(node)

        def _refs_source(e) -> bool:
            if isinstance(e, A.Ident):
                return e.qualifier is None and e.name.startswith(pfx)
            if not hasattr(e, "__dataclass_fields__"):
                return False
            for f in e.__dataclass_fields__:
                v = getattr(e, f)
                if isinstance(v, list):
                    if any(
                        _refs_source(x)
                        for x in v
                        if hasattr(x, "__dataclass_fields__")
                    ):
                        return True
                elif hasattr(v, "__dataclass_fields__"):
                    if _refs_source(v):
                        return True
            return False

        def compile_(node, forbid_source: bool = False) -> Column:
            r = rw(node)
            if forbid_source and _refs_source(r):
                raise CatalogError(
                    "WHEN NOT MATCHED BY SOURCE expressions may reference "
                    "target columns only"
                )
            return low._expr(r, None, {}, [])

        # --- decision join (target row id is pinned by an eager
        # checkpoint so the id survives across the jobs below) ---
        tgt = (
            self.read_table(stmt.table)
            .withColumn("__mtid", F.monotonically_increasing_id())
            .localCheckpoint()
        )
        on_col = compile_(stmt.on)
        marked = src.withColumn("__ms__hit", F.lit(1))
        joined = tgt.join(marked, on_col, "left")
        mx = (
            joined.groupBy("__mtid")
            .agg(F.count("__ms__hit").alias("k"))
            .agg(F.max("k"))
            .collect()[0][0]
        )
        if mx is not None and mx > 1:
            raise CatalogError(
                "MERGE: a target row matched multiple source rows"
            )
        # --- matched clauses (then the [EXT] NOT MATCHED BY SOURCE
        # clauses over stale target rows): first matching clause per
        # row wins (a when-chain evaluates in clause order) ---
        is_m = F.col("__ms__hit").isNotNull()
        by_src = getattr(stmt, "not_matched_by_source", []) or []
        clauses = [
            (cond, action, True) for cond, action in stmt.matched
        ] + [(cond, action, False) for cond, action in by_src]
        idx_col = None
        for i, (cond, action, on_match) in enumerate(clauses):
            gate = is_m if on_match else ~is_m
            c = gate if cond is None else gate & F.coalesce(
                compile_(cond, forbid_source=not on_match).cast("boolean"),
                F.lit(False),
            )
            idx_col = (
                F.when(c, F.lit(i + 1))
                if idx_col is None
                else idx_col.when(c, F.lit(i + 1))
            )
        idx = (
            idx_col.otherwise(F.lit(0)) if idx_col is not None else F.lit(0)
        )
        decided = joined.withColumn("__midx", idx)
        del_idx = [
            i + 1
            for i, (_, action, _m) in enumerate(clauses)
            if action[0] == "delete"
        ]
        out_cols = []
        for c in tgt.columns:
            if c == "__mtid":
                continue
            col = F.col(c)
            for i, (_, action, on_match) in enumerate(clauses):
                if action[0] != "update":
                    continue
                for cname, e in action[1]:
                    if cname not in by_name:
                        raise CatalogError(f"unknown column {cname!r}")
                    if by_name[cname]["serial"]:
                        raise CatalogError(
                            f"cannot UPDATE serial column {cname!r}"
                        )
                    if cname != c:
                        continue
                    stype = _parse_type(by_name[cname]["spark_type"])
                    col = F.when(
                        F.col("__midx") == i + 1,
                        compile_(e, forbid_source=not on_match).cast(
                            stype
                        ),
                    ).otherwise(col)
            out_cols.append(col.alias(c))
        kept = decided
        if del_idx:
            kept = kept.where(~F.col("__midx").isin(del_idx))
        out = kept.select(*out_cols)
        # --- not-matched inserts: built from the PRE-rewrite source,
        # materialized before the target files are swapped ---
        ins_frames = []
        if stmt.not_matched:
            anti = src.join(tgt, on_col, "left_anti")
            remaining = anti
            for cond, cols, exprs in stmt.not_matched:
                part = remaining
                if cond is not None:
                    hit = F.coalesce(
                        compile_(cond).cast("boolean"), F.lit(False)
                    )
                    part = remaining.where(hit)
                    remaining = remaining.where(~hit)
                else:
                    remaining = remaining.limit(0)
                target_cols = cols or [
                    c["name"] for c in meta["columns"] if not c["serial"]
                ]
                if len(exprs) != len(target_cols):
                    raise CatalogError(
                        "MERGE INSERT arity does not match the target "
                        "column list"
                    )
                row = part.select(
                    *[
                        compile_(e).alias(n)
                        for e, n in zip(exprs, target_cols)
                    ]
                ).localCheckpoint()  # pin before the target dir swap
                ins_frames.append((target_cols, row))
        # --- apply: atomic rewrite (constraints validated on the
        # rewrite job itself), then the standard insert path ---
        self._overwrite(stmt.table, meta, out, low, validate=True)
        for target_cols, row in ins_frames:
            if row.isEmpty():
                continue
            self.insert(
                A.InsertStmt(stmt.table, list(target_cols), ("frame", row)),
                low,
            )
        self._repair_dependent_views(stmt.table, low)

    def exchange(self, a: str, b: str, low) -> None:
        """[EXT] EXCHANGE TABLES a AND b: both tables (and their
        dependent views' references) swap names — three renames
        through a temp name, each riding the rename_table path so
        metadata, data dirs, and view TableRefs all follow."""
        for n in (a, b):
            if self._load_meta(n) is None:
                raise CatalogError(f"unknown table {n!r}")
        tmp = f"__exchange_{a}__{b}"
        if self._load_meta(tmp) is not None:
            raise CatalogError(f"exchange temp name {tmp!r} exists")
        for old_name, new_name in ((a, tmp), (b, a), (tmp, b)):
            self.alter(A.AlterStmt(old_name, "rename_table", new_name), low)

    def _overwrite(
        self,
        name: str,
        meta: dict,
        df: DataFrame,
        low,
        *,
        validate: bool = False,
    ) -> None:
        """Atomic full-table rewrite preserving the declared partition
        layout and ORDER BY clustering (tmp write + dir swap, same as
        _rewrite/optimize). With ``validate=True`` the constraint
        flags ride the tmp write itself via observe() — one pass over
        the rewritten rows instead of a validation aggregate plus the
        write — and a violation aborts BEFORE the dir swap, so the
        live table is untouched either way."""
        path = self._data_path(name)
        violations = self._violation_conds(meta, low) if validate else []
        obs = None
        if violations:
            from pyspark.sql import Observation

            obs = Observation()
            df = df.observe(
                obs,
                *[
                    F.max(F.coalesce(cond, F.lit(False))).alias(f"v{i}")
                    for i, (cond, _) in enumerate(violations)
                ],
            )
        part_cols: list[str] = []
        if meta["partition_by"]:
            pe = _unpickle_ast(meta["partition_by"])
            if isinstance(pe, A.Ident):
                part_cols = [pe.name]
            else:
                df = df.withColumn("__part", low._expr(pe, None, {}, []))
                part_cols = ["__part"]
        if meta["order_by"]:
            df = df.sortWithinPartitions(*meta["order_by"])
        tmp = path + ".tmp"
        try:
            w = df.write.mode("overwrite")
            if part_cols:
                w = w.partitionBy(*part_cols)
            w.parquet(tmp)
            if obs is not None:
                flags = obs.get
                for i, (_, msg) in enumerate(violations):
                    if flags.get(f"v{i}"):
                        raise CatalogError(msg)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        shutil.rmtree(path, ignore_errors=True)
        os.rename(tmp, path)

    def _rewrite(self, name: str, meta: dict, low, rename=None) -> None:
        """Schema-evolution rewrite (columns added/dropped/renamed)."""
        old = self.read_table(name) if rename is None else (
            self.spark.read.parquet(self._data_path(name))
        )
        if rename:
            old = old.withColumnRenamed(*rename)
        cols = []
        for c in meta["columns"]:
            stype = _parse_type(c["spark_type"])
            if c["name"] in old.columns:
                cols.append(F.col(c["name"]).cast(stype).alias(c["name"]))
            elif c["default"] is not None:
                cols.append(
                    low._expr(_unpickle_ast(c["default"]), None, {}, [])
                    .cast(stype)
                    .alias(c["name"])
                )
            else:
                cols.append(F.lit(None).cast(stype).alias(c["name"]))
        out = old.select(*cols)
        tmp = self._data_path(name) + ".tmp"
        out.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self._data_path(name))
        os.rename(tmp, self._data_path(name))

    def optimize(self, stmt: A.OptimizeStmt, low) -> None:
        """S14: small-file compaction (Delta-style OPTIMIZE by hand):
        read → repartition to ~128 MB targets → atomic overwrite."""
        meta = self._load_meta(stmt.table)
        if meta is None:
            raise CatalogError(f"unknown table {stmt.table!r}")
        path = self._data_path(stmt.table)
        df = self.read_table(stmt.table)
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path)
            for f in fs
        )
        target = max(1, size // (128 << 20) + 1)
        tmp = path + ".tmp"
        if getattr(stmt, "deduplicate", False):
            by = getattr(stmt, "dedup_by", None)
            if by:
                # [EXT] DEDUPLICATE BY cols: keep ONE row per key,
                # deterministically (min over the remaining columns'
                # sort order — CH keeps an arbitrary row; a rewrite
                # that can differ per run is untestable).
                missing = [c for c in by if c not in df.columns]
                if missing:
                    raise CatalogError(
                        f"DEDUPLICATE BY unknown column(s) {missing}"
                    )
                rest = [c for c in df.columns if c not in by]
                if rest:
                    from pyspark.sql import Window

                    w = Window.partitionBy(*by).orderBy(
                        *[F.col(c).asc_nulls_first() for c in rest]
                    )
                    rn = "__optimize_rn"
                    df = (
                        df.withColumn(rn, F.row_number().over(w))
                        .where(F.col(rn) == 1)
                        .drop(rn)
                    )
                else:
                    df = df.dropDuplicates()
            else:
                df = df.dropDuplicates()
        out = df.repartition(target)
        if meta["order_by"]:
            out = out.sortWithinPartitions(*meta["order_by"])
        out.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path)
        os.rename(tmp, path)
        # Compaction preserves content, but rebuild dependent
        # incremental state anyway: OPTIMIZE is the documented repair
        # hook for views knocked stale by external file surgery.
        self._repair_dependent_views(stmt.table, low)


def _pickle_ast(node) -> str:
    return base64.b64encode(pickle.dumps(node)).decode()


def _upgrade_ast(node, _seen=None):
    """Fill dataclass fields added AFTER a pickled AST was persisted
    with their declared defaults, so every walker (getattr over
    __dataclass_fields__) keeps working on catalogs written by older
    engine versions."""
    import dataclasses

    if _seen is None:
        _seen = set()
    if id(node) in _seen:
        return node
    _seen.add(id(node))
    if isinstance(node, (list, tuple)):
        for x in node:
            _upgrade_ast(x, _seen)
        return node
    if not hasattr(node, "__dataclass_fields__"):
        return node
    for f in dataclasses.fields(node):
        if f.name not in node.__dict__:
            if f.default is not dataclasses.MISSING:
                setattr(node, f.name, f.default)
            elif f.default_factory is not dataclasses.MISSING:
                setattr(node, f.name, f.default_factory())
            else:
                setattr(node, f.name, None)
        _upgrade_ast(getattr(node, f.name), _seen)
    return node


def _unpickle_ast(s: str):
    return _upgrade_ast(pickle.loads(base64.b64decode(s)))


def _parse_type(js: str) -> S.DataType:
    return S._parse_datatype_json_string(js)

