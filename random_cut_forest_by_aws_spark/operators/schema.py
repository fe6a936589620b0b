"""Structural schema validation — column presence / type / nullability.

The north-rule "schema + constraint validation engine" has two layers:
data-level rules (operators/checks.py, operators/constraints.py) and the
STRUCTURAL contract — "this table has these columns, with these types,
and key columns are declared non-nullable". The structural layer is pure
metadata: it reads ``df.schema`` (for parquet/Iceberg that's the file
footer / table metadata — ZERO data scanned at any table size) and
emits verdict rows, so a wrong upstream writer fails the run before a
single row is processed.

Expected types are DDL strings (``"bigint"``, ``"array<int>"``,
``"struct<a:int,b:string>"``) parsed with Spark's own parser, so
comparison is on canonical DataType equality, not string spelling.
Nullability: a column expected non-nullable must be DECLARED
non-nullable in the schema (a nullable declaration means the writer
permits nulls — the contract violation exists even if today's data has
none; pair with ``Check.is_complete`` for the data-level assertion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import DataType


def _parse(ddl: str, spark) -> DataType:
    from pyspark.sql.types import _parse_datatype_string

    try:
        return _parse_datatype_string(ddl)
    except Exception:
        # remote/connect-safe fallback: parse via a DDL schema string
        return spark.createDataFrame([], f"x {ddl}").schema[0].dataType


def validate_schema(
    df: DataFrame,
    expected: dict[str, str],
    non_nullable: tuple[str, ...] = (),
    allow_extra: bool = True,
) -> DataFrame:
    """One verdict row per expected column (plus one per unexpected
    column when ``allow_extra=False``):
    ``(column, status, expected_type, actual_type, passed)`` with
    status ∈ {ok, missing, type_mismatch, nullable_violation,
    unexpected}.
    """
    if not expected:
        raise ValueError("expected schema must name at least one column")
    unknown = set(non_nullable) - set(expected)
    if unknown:
        raise ValueError(f"non_nullable names columns not in expected: {sorted(unknown)}")

    spark = df.sparkSession
    actual = {f.name: f for f in df.schema.fields}
    rows: list[tuple] = []
    for name, ddl in expected.items():
        want = _parse(ddl, spark)
        f = actual.get(name)
        if f is None:
            rows.append((name, "missing", ddl, None, False))
        elif f.dataType != want:
            rows.append((name, "type_mismatch", ddl, f.dataType.simpleString(), False))
        elif name in non_nullable and f.nullable:
            rows.append((name, "nullable_violation", f"{ddl} not null",
                         f"{f.dataType.simpleString()} nullable", False))
        else:
            rows.append((name, "ok", ddl, f.dataType.simpleString(), True))
    if not allow_extra:
        for name, f in actual.items():
            if name not in expected:
                rows.append((name, "unexpected", None,
                             f.dataType.simpleString(), False))
    return spark.createDataFrame(
        rows,
        "column string, status string, expected_type string, "
        "actual_type string, passed boolean",
    )
