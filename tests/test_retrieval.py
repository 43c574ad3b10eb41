"""BM25 retrieval: ranking semantics on controlled corpora plus the
bounded-top-k plan guard. Cross-engine exactness is covered by the
contract replica (tests/test_entry_oracle.py::bm25_search)."""

import pytest

from ocr_pipeline_fastapi_latency_optimization_spark.operators import retrieval


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_tf_monotone_same_length(spark):
    """With one query term and equal-length docs, more occurrences of
    the term must rank strictly higher (saturating but monotone)."""
    pad = "filler"
    rows = [
        (0, " ".join(["hit"] * 1 + [pad] * 9)),
        (1, " ".join(["hit"] * 3 + [pad] * 7)),
        (2, " ".join(["hit"] * 6 + [pad] * 4)),
        (3, " ".join([pad] * 10)),  # no match: absent from output
    ]
    out = retrieval.bm25_search(
        spark, "", terms=("hit",), k=10, docs=_corpus(spark, rows)
    ).toPandas()
    assert list(out["doc_id"]) == [2, 1, 0]
    assert (out["n_terms_matched"] == 1).all()
    scores = list(out["score_e4"])
    assert scores[0] > scores[1] > scores[2] > 0


def test_bm25_rare_term_outweighs_common(spark):
    """A doc matching only the RARE term beats a doc matching only the
    corpus-wide COMMON term — the idf surrogate preserves the
    rare-term-dominance property of the log idf."""
    rows = [(0, "rare x x x"), (1, "common x x x")] + [
        (i, "common y y y") for i in range(2, 12)
    ]
    out = (
        retrieval.bm25_search(
            spark, "", terms=("rare", "common"), k=20, docs=_corpus(spark, rows)
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "score_e4"] > out.loc[1, "score_e4"]


def test_bm25_length_normalization(spark):
    """Same tf in a shorter doc ranks higher (b = 0.75 length
    penalty)."""
    rows = [
        (0, "hit " + " ".join(["pad"] * 5)),
        (1, "hit " + " ".join(["pad"] * 50)),
    ]
    out = (
        retrieval.bm25_search(
            spark, "", terms=("hit",), k=5, docs=_corpus(spark, rows)
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "score_e4"] > out.loc[1, "score_e4"]


def test_bm25_topk_is_bounded_not_global_sort(spark):
    """The k cut must plan as TakeOrderedAndProject (per-partition
    heaps merged on the driver), never a corpus-wide Sort."""
    df = retrieval.bm25_search(spark, "/root/testdata/sf0.001", k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError):
        retrieval.bm25_search(spark, "", terms=())
