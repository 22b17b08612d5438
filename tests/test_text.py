

def test_top_ngrams_matches_python(spark):
    from collections import Counter

    from yaschva_spark.ops.text import top_ngrams

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = [(r["ngram"], r["cnt"]) for r in top_ngrams(docs, "text", n=2, k=10).collect()]
    c = Counter()
    for r in docs.select("text").collect():
        toks = r["text"].split(" ")
        for i in range(len(toks) - 1):
            c[" ".join(toks[i:i + 2])] += 1
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == expect
    # docs shorter than n contribute nothing (and never a descending sequence)
    one = spark.createDataFrame([("ab",), ("x y",)], ["text"])
    assert [(r["ngram"], r["cnt"]) for r in top_ngrams(one, "text", n=2, k=5).collect()] \
        == [("x y", 1)]
    # plan shape: top-k is TakeOrderedAndProject (k-heap merge), not a global sort
    plan = top_ngrams(docs, "text", n=2, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan and "Python" not in plan
