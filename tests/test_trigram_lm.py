"""Character-trigram LM quality scoring (functions/text)."""

from pyspark.sql import functions as F

from dataslicer_spark.functions.text import (
    char_trigrams,
    trigram_lm_scores,
    trigram_model,
)


def test_char_trigrams_normalization(spark):
    df = spark.createDataFrame([("  Hello\t World ",), ("ab",), ("",)], ["t"])
    got = df.select(char_trigrams(F.col("t")).alias("g")).collect()
    assert got[0]["g"] == [
        "hel", "ell", "llo", "lo ", "o w", " wo", "wor", "orl", "rld",
    ]
    assert got[1]["g"] == []  # shorter than 3 chars
    assert got[2]["g"] == []


def test_gibberish_scores_below_natural_text(spark):
    natural = [
        (i, "the quick brown fox jumps over the lazy dog again and again")
        for i in range(20)
    ]
    gibberish = [(100 + i, "xq zvkj qpw zzxv jkqx wvzq") for i in range(3)]
    df = spark.createDataFrame(natural + gibberish, "doc_id long, text string")
    model = trigram_model(df.filter(F.col("doc_id") < 100))
    scores = {
        r["doc_id"]: r["score"]
        for r in trigram_lm_scores(df, model).collect()
    }
    nat = min(scores[i] for i in range(20))
    gib = max(scores[100 + i] for i in range(3))
    assert gib < nat


def test_short_docs_absent_and_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "ab"), (3, "abcdef")], "doc_id long, text string"
    )
    model = trigram_model(df)
    out = trigram_lm_scores(df, model).collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {1, 3}  # doc 2 has no trigrams
    by_id = {r["doc_id"]: (r["n_tri"], r["sum_c3"], r["score"]) for r in out}
    assert by_id[1] == by_id[3]
    # identical under repartitioning
    out2 = trigram_lm_scores(df.repartition(7), model).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
