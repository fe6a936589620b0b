"""Deterministic synthesizer for the engine's primary input table.

Schema (BASELINE.json ``input_hint``)::

    doc_id: string, tokens: array<int32>, n_tok: int32, source: string

plus ``seq: bigint`` (monotone stream order used by the drift operator —
the analogue of the reference's sequence index,
``Java/core/.../sampler/CompactSampler.java:83``).

Everything is generated from ``spark.range(n)`` with built-in JVM-side
expressions only (``xxhash64`` counter-based PRNG → Box-Muller / inverse
CDF), so the table is deterministic for a given (n_rows, seed), scales to
any row count without driver-side work, and never touches Python. Planted
violations and the drifted partition follow FIXTURES.md §1/§3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Skewed source distribution (FIXTURES.md §1): web ~80% → exercises
# salting + AQE skew handling in downstream group-bys.
SOURCE_CDF = [("web", 0.80), ("books", 0.85), ("code", 0.91), ("wiki", 0.96), ("forums", 1.0)]
VOCAB = 50_000

# Fraction constants for planted violations (FIXTURES.md §1)
DUP_FRAC = 0.001
NULL_ID_FRAC = 0.0005
NTOK_MISMATCH_FRAC = 0.0005
N_DUP_KEYS = 32


def _u(*cols) -> F.Column:
    """Uniform(0,1) double derived from a counter-based xxhash64 — the
    Spark-idiomatic replacement for the reference's per-instance
    ``java.util.Random`` (seeded determinism, no state, fully parallel)."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1 << 30)).cast("double") / float(1 << 30))


def sequences(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    *,
    violations: bool = True,
    drift: bool = True,
    mean_log_ntok: float = 4.0,
    sigma_log_ntok: float = 0.8,
    max_ntok: int = 8192,
    vocab: int = VOCAB,
    partitions: int | None = None,
) -> DataFrame:
    """Build the deterministic tokenized-sequence table.

    ``mean_log_ntok`` defaults to 4.0 (≈55 tokens/row) so tests stay fast;
    the bench passes larger values. With ``drift=True`` the second half of
    ``source='code'`` (by ``seq``) shifts both the n_tok scale
    (μ → μ+1) and the token-value distribution (power exponent 3 → 1),
    which the drift operator must flag (FIXTURES.md §3).
    """
    s = F.lit(seed)
    base = spark.range(0, n_rows, 1, partitions) if partitions else spark.range(n_rows)
    df = base.withColumn("seq", F.col("id"))

    # --- source (skewed categorical via inverse CDF) -------------------
    u_src = _u(F.col("id"), F.lit("src"), s)
    src = F.lit(SOURCE_CDF[-1][0])
    for name, cdf in reversed(SOURCE_CDF[:-1]):
        src = F.when(u_src < cdf, F.lit(name)).otherwise(src)
    df = df.withColumn("source", src)

    # --- n_tok: lognormal via Box-Muller --------------------------------
    u1 = _u(F.col("id"), F.lit("bm1"), s)
    u2 = _u(F.col("id"), F.lit("bm2"), s)
    z = F.sqrt(-2.0 * F.log(u1 + 1e-12)) * F.cos(2.0 * 3.141592653589793 * u2)
    drifted = (
        (F.col("source") == "code") & (F.col("seq") >= F.lit(n_rows // 2))
        if drift
        else F.lit(False)
    )
    mu = F.when(drifted, F.lit(mean_log_ntok + 1.0)).otherwise(F.lit(mean_log_ntok))
    n_tok = F.least(
        F.lit(max_ntok), F.greatest(F.lit(1), F.exp(mu + sigma_log_ntok * z).cast("int"))
    )
    df = df.withColumn("n_tok", n_tok)

    # --- tokens: power-law token ids (Zipf-ish), drift flattens them ----
    expo = F.when(drifted, F.lit(1.0)).otherwise(F.lit(3.0))
    df = df.withColumn("_expo", expo)
    tok = F.transform(
        F.sequence(F.lit(1), F.col("n_tok")),
        lambda i: F.least(
            F.lit(vocab - 1),
            (F.pow(_u(F.col("id"), i, F.lit("tok"), s), F.col("_expo")) * vocab).cast("int"),
        ),
    )
    df = df.withColumn("tokens", tok).drop("_expo")

    # --- doc_id + planted violations ------------------------------------
    doc_id = F.format_string("%s-%012d", F.col("source"), F.col("id"))
    if violations:
        u_dup = _u(F.col("id"), F.lit("dup"), s)
        u_null = _u(F.col("id"), F.lit("null"), s)
        u_mis = _u(F.col("id"), F.lit("mis"), s)
        dup_key = F.format_string(
            "dup-%03d", F.pmod(F.xxhash64(F.col("id"), F.lit("dupkey"), s), F.lit(N_DUP_KEYS))
        )
        doc_id = F.when(u_null < NULL_ID_FRAC, F.lit(None).cast("string")).otherwise(
            F.when(u_dup < DUP_FRAC, dup_key).otherwise(doc_id)
        )
        df = df.withColumn(
            "n_tok",
            F.when(u_mis < NTOK_MISMATCH_FRAC, F.col("n_tok") + F.lit(1)).otherwise(
                F.col("n_tok")
            ),
        )
    df = df.withColumn("doc_id", doc_id)

    return df.select(
        "doc_id",
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.col("n_tok").cast("int").alias("n_tok"),
        "source",
        "seq",
    )


def sources_dim(spark: SparkSession, missing: str = "forums") -> DataFrame:
    """Referential-integrity dimension (FIXTURES.md §2): deliberately
    missing one source value so the anti-join yields violation rows."""
    rows = [(name, VOCAB) for name, _ in SOURCE_CDF if name != missing]
    return spark.createDataFrame(rows, "source string, expected_vocab int")
