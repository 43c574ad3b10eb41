"""Curation operators on planted fixtures: PII masking, C4-style
boilerplate line removal, Gopher-style repetition and layout signals."""

import pandas as pd
import pytest

from ocr_pipeline_fastapi_latency_optimization_spark.operators import curation


@pytest.fixture()
def corpus(spark, tmp_path):
    rows = [
        (0, "reach me at jane.doe@corp.example.com or 192.168.1.1", "en", "s", 1),
        (1, "call +123-456-7890 and 555 123 4567 today", "en", "s", 1),
        (2, "clean text with no pii at all", "en", "s", 1),
        (3, "body three\nSHARED FOOTER\nunique 3", "en", "s", 1),
        (4, "body four\nSHARED FOOTER\nunique 4", "en", "s", 1),
        (5, "body five\nSHARED FOOTER\nunique 5", "en", "s", 1),
        (6, "spam spam spam spam spam spam spam spam", "en", "s", 1),
        (7, "- bullet\n* bullet\nplain line\ntrailing off...", "en", "s", 1),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    path = str(tmp_path / "c")
    spark.createDataFrame(pdf).write.parquet(f"{path}/documents.parquet")
    return path


def test_pii_mask_counts_and_fingerprint(spark, corpus):
    out = curation.pii_mask(spark, corpus).toPandas().set_index("doc_id")
    assert out.loc[0, "n_emails"] == 1 and out.loc[0, "n_ips"] == 1
    assert out.loc[1, "n_phones"] == 2
    assert out.loc[2, ["n_emails", "n_ips", "n_phones"]].sum() == 0
    # a clean doc's fingerprint equals the md5 of its unchanged text
    import hashlib

    assert out.loc[2, "masked_fp"] == hashlib.md5(
        b"clean text with no pii at all"
    ).hexdigest()


def test_boilerplate_removes_only_cross_doc_lines(spark, corpus):
    out = (
        curation.boilerplate_lines(spark, corpus)
        .toPandas()
        .set_index("doc_id")
    )
    # SHARED FOOTER appears in 3 docs -> dropped exactly once per doc
    for d in (3, 4, 5):
        assert out.loc[d, "n_dropped"] == 1
        assert out.loc[d, "n_kept"] == 2
    # within-doc repetition (doc 6 one line) is NOT boilerplate
    assert out.loc[6, "n_dropped"] == 0


def test_boilerplate_rebuild_preserves_order(spark, corpus):
    import hashlib

    out = (
        curation.boilerplate_lines(spark, corpus)
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[3, "cleaned_fp"] == hashlib.md5(
        b"body three\nunique 3"
    ).hexdigest()


def test_repetition_flags_degenerate_text(spark, corpus):
    out = (
        curation.repetition_stats(spark, corpus).toPandas().set_index("doc_id")
    )
    # doc 6: 8x 'spam' -> 6 trigrams, all identical
    assert out.loc[6, "top_gram_count"] == 6
    assert out.loc[6, "dup_ratio_e4"] == 8333  # floor(5/6 * 1e4)
    assert out.loc[2, "dup_ratio_e4"] == 0


def test_symbol_ratios_layout_signals(spark, corpus):
    out = curation.symbol_ratios(spark, corpus).toPandas().set_index("doc_id")
    assert out.loc[7, "bullet_ratio_e4"] == 5000  # 2 of 4 lines
    assert out.loc[7, "ellipsis_ratio_e4"] == 2500  # 1 of 4 lines
    assert out.loc[2, "bullet_ratio_e4"] == 0
