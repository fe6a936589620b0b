

def test_tfidf_keywords_hand_computed(spark):
    """Hand-computed tf-idf on a 4-doc corpus: corpus-wide terms rank
    below doc-specific ones; ranking is by the tf/df ratio with term
    ties lexicographic; scores equal tf*ln(N/df)."""
    import math

    from random_cut_forest_by_aws_spark.operators.textqc import tfidf_keywords

    df = spark.createDataFrame(
        [(0, "apple apple banana common"),
         (1, "banana cherry common"),
         (2, "cherry cherry cherry common"),
         (3, "")],
        "doc_id long, text string",
    )
    out = tfidf_keywords(df, top_k=2).toPandas()
    by_doc = {i: g.sort_values("rank") for i, g in out.groupby("doc_id")}
    # doc 0: apple tf2/df1=2.0 > banana tf1/df2=0.5 > common tf1/df4
    assert by_doc[0]["term"].tolist() == ["apple", "banana"]
    assert by_doc[0]["tf"].tolist() == [2, 1]
    assert abs(by_doc[0]["score"].iloc[0] - round(2 * math.log(4 / 1), 6)) < 1e-9
    # doc 1: banana 1/2 == cherry 1/2 tie -> lexicographic
    assert by_doc[1]["term"].tolist() == ["banana", "cherry"]
    # doc 2: cherry 3/2 > common 1/4
    assert by_doc[2]["term"].tolist() == ["cherry", "common"]
    # empty doc: no keywords
    assert 3 not in by_doc
    # rank column is 1..k dense per doc
    for g in by_doc.values():
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
