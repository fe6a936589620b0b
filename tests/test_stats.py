

def test_rollup_stats_levels_and_null_disambiguation(spark):
    """ROLLUP emits every prefix granularity plus the grand total in
    one aggregate; grouping_lvl separates a REAL NULL dimension value
    (lvl 0) from a rollup subtotal NULL (lvl > 0)."""
    from random_cut_forest_by_aws_spark.operators.stats import rollup_stats

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "x", 3), ("a", "y", 5), ("b", "x", 7),
         (None, "x", 11)],
        "src string, band string, v long",
    )
    out = rollup_stats(df, ["src", "band"], "v").toPandas()
    # levels: 4 leaf groups + 3 src subtotals + 1 grand total
    assert len(out) == 8
    key = out.set_index(["src", "band", "grouping_lvl"])
    assert key.loc[("a", "x", 0)]["val_sum"] == 4
    assert key.loc[("a", "x", 0)]["n_rows"] == 2
    # src subtotal for 'a' rolls band up (NULL band, lvl 1)
    assert key.loc[("a", None, 1)]["val_sum"] == 9
    # the REAL NULL src leaf keeps lvl 0; its subtotal is lvl 1
    assert key.loc[(None, "x", 0)]["val_sum"] == 11
    assert key.loc[(None, None, 1)]["val_sum"] == 11
    # grand total: both rolled (lvl 3)
    assert key.loc[(None, None, 3)]["val_sum"] == 27
    assert key.loc[(None, None, 3)]["val_min"] == 1
    assert key.loc[(None, None, 3)]["val_max"] == 11


def test_rollup_stats_preserves_double_values(spark):
    """Double metrics must not be silently truncated to integers."""
    from random_cut_forest_by_aws_spark.operators.stats import rollup_stats

    df = spark.createDataFrame(
        [("a", 1.7), ("a", 2.9)], "src string, v double"
    )
    out = rollup_stats(df, ["src"], "v").toPandas().set_index("grouping_lvl")
    assert abs(out.loc[0, "val_sum"] - 4.6) < 1e-9
    assert out.loc[0, "val_min"] == 1.7 and out.loc[0, "val_max"] == 2.9
