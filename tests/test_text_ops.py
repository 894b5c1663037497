"""Text-operator compositions (corpus curation and friends)."""

def test_corpus_curation_stages_all_fire(spark):
    """Every curation stage proven on a planted corpus: the quality
    floor drops a symbol-noise doc, the language gate drops a German
    doc, and exact dedup keeps only the first of two identical texts."""
    import pandas as pd

    from go_shapefile_spark.operators.text import corpus_curation_sql

    good = ("the data and the table of values is prepared to scan in "
            "a stable order that it keeps for every run " * 3)
    rows = [
        (1, good + "one", "en", "web", 0),
        (2, good + "two", "en", "web", 0),
        (10, good + "dup", "en", "web", 0),
        (11, good + "dup", "en", "crawl", 0),      # exact duplicate
        (20, "der hund und die katze das ist nicht mit ein zu den "
             "haus der garten und die sonne das wasser " * 4,
         "de", "web", 0),                          # German -> dropped
        (30, "@@@@ #### $$$$ %%%% ^^^^ &&&& " * 20, "xx", "web", 0),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                      "source", "n_chars"])
    spark.createDataFrame(pdf).createOrReplaceTempView("cur_docs")
    got = spark.sql(corpus_curation_sql("spark", rel="cur_docs")) \
        .toPandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == [1, 2, 10]    # 11 deduped away
    assert (got["pred_lang"] == "en").all()
    assert (got["quality"] >= 0.7).all()
