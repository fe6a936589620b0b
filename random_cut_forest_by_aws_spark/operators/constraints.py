"""Row-level invariant checks → violation rows.

The per-row invariant mandated by ``input_hint`` is token-array equality:
``n_tok == size(tokens)`` and tokens round-trip unchanged through the
engine. These are pure narrow (no-shuffle) filters, fully codegen'd; at
10^12 rows they cost one scan that Catalyst fuses with whatever else reads
the table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_invariant_violations(
    df: DataFrame,
    invariants: dict[str, Column],
    id_cols: Sequence[str],
) -> DataFrame:
    """Rows failing any named invariant, tagged with the failed names.

    ``invariants`` maps name → boolean Column that must hold. One scan
    evaluates all invariants; output keeps only ``id_cols`` plus the
    array of failed constraint names.

    Plan shape (round 6): filter FIRST on the plain boolean conjunction
    of the conditions, then build the ``failed_constraints`` name array
    only for the (rare) surviving rows. Filtering on ``size(failed) >
    0`` instead pushes the filter below the projection and evaluates
    the whole array+filter(lambda) construction for EVERY row (~4x the
    scan measured at 2M rows); the conjunction is equivalent — the
    array is non-empty iff some condition is not true. Violating rows
    pay each condition twice (filter + array), which is the right
    trade-off exactly because violations are rare.
    """
    all_ok = F.lit(True)
    for cond in invariants.values():
        all_ok = all_ok & F.coalesce(cond, F.lit(False))
    failed = F.filter(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name)).otherwise(F.lit(None))
                for name, cond in invariants.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return (
        df.filter(~all_ok)
        .withColumn("failed_constraints", failed)
        .select(*id_cols, "failed_constraints")
    )


def token_equality_violations(
    df: DataFrame,
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    id_cols: Sequence[str] = ("doc_id", "source", "seq"),
) -> DataFrame:
    """The input_hint invariant: n_tok must equal size(tokens); tokens
    must be non-null; token values must be non-negative."""
    t, n = F.col(tokens_col), F.col(n_tok_col)
    return row_invariant_violations(
        df,
        {
            "tokens_not_null": t.isNotNull(),
            "n_tok_matches_size": t.isNotNull() & (F.size(t) == n),
            "n_tok_positive": n > 0,
            "token_values_in_range": t.isNotNull()
            & ~F.exists(t, lambda x: (x < 0) | x.isNull()),  # short-circuits
        },
        id_cols,
    )
