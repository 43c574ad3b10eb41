"""Training-sequence prep: chunking window/overlap semantics and the
distributed prefix sum behind sequence packing."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from ocr_pipeline_fastapi_latency_optimization_spark.operators import chunking

SF_DIR = "/root/testdata/sf0.001"


def test_prefix_sum_matches_window_cumsum(spark):
    """The two-pass global prefix sum (range partition → local cumsum →
    broadcast offsets) must equal the single-partition window cumsum,
    with more range partitions than cores so multi-partition offsets are
    exercised."""
    from pyspark.sql import Window as W

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.col("n_chars").alias("v")
    )
    got = chunking.global_prefix_sum(docs, "v", ["doc_id"], n_ranges=17).toPandas()
    want = docs.withColumn(
        "prefix",
        F.coalesce(
            F.sum("v").over(
                W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).toPandas()
    g = got.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)
    assert list(g["prefix"]) == list(w["prefix"])


def test_chunk_window_and_overlap_semantics(spark):
    """Chunks must tile each document with the configured window and
    stride: chunk i starts at word i·stride, all but the last chunk are
    full-width, consecutive chunks overlap by window-stride words, and
    every word is covered."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                " ".join(f"w{i}" for i in range(100)),  # 100 words → 2 chunks
                " ".join(f"w{i}" for i in range(64)),  # exactly one window
                "short doc",  # 2 words → 1 short chunk
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    out = chunking.chunk_documents(spark, SF_DIR, docs=docs).toPandas()
    by_doc = {k: v.reset_index(drop=True) for k, v in out.groupby("doc_id")}
    assert list(by_doc[0]["n_words"]) == [64, 100 - 48]  # 48-stride second chunk
    assert list(by_doc[1]["n_words"]) == [64]
    assert list(by_doc[2]["n_words"]) == [2]
    # coverage: distinct words across doc 0's chunks = all 100
    import hashlib

    words = [f"w{i}" for i in range(100)]
    c0 = " ".join(words[0:64])
    c1 = " ".join(words[48:100])
    assert by_doc[0]["chunk_fp"][0] == hashlib.md5(c0.encode()).hexdigest()
    assert by_doc[0]["chunk_fp"][1] == hashlib.md5(c1.encode()).hexdigest()


def test_chunking_plan_is_narrow(spark):
    """Chunk fan-out is per-row (sequence + explode + slice) — the plan
    must contain no Exchange other than the final presentation sort."""
    import contextlib
    import io

    df = chunking.chunk_documents(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    body = plan.split("AdaptiveSparkPlan")[-1]
    assert body.count("Exchange") <= 1, plan
    assert "rangepartitioning" in body.lower() or body.count("Exchange") == 0


def test_pack_sequences_stable_under_repartitioning(spark):
    """The distributed prefix sum must assign identical sequence ids no
    matter how the input is partitioned — membership depends only on the
    doc_id total order, never on task placement."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = chunking.pack_sequences(spark, SF_DIR, docs=docs).toPandas()
    b = chunking.pack_sequences(spark, SF_DIR, docs=docs.repartition(7)).toPandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_pack_sequences_conservation(spark):
    """Packing must conserve documents and tokens, bins must be
    contiguous in doc order (ranges never interleave), and every full
    bin boundary must fall at the context quantum."""
    out = (
        chunking.pack_sequences(spark, SF_DIR)
        .toPandas()
        .sort_values("seq_id")
        .reset_index(drop=True)
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    assert out["n_docs"].sum() == n_docs
    # contiguity: next bin starts after this one ends
    assert (out["first_doc"].iloc[1:].values > out["last_doc"].iloc[:-1].values).all()
    # conservation vs the oracle-proven token counter
    from ocr_pipeline_fastapi_latency_optimization_spark.functions.textstats import (
        token_count,
    )

    total = docs.select(F.sum(token_count(F.col("text")))).collect()[0][0]
    assert out["n_tokens"].sum() == total


from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(n_words=st.integers(min_value=0, max_value=500))
def test_chunk_tiling_invariants(n_words):
    """Pure-python mirror of the chunk index algebra (the same formula
    the Spark expression and the DuckDB oracle implement): chunks tile
    the word sequence with stride 48 / width 64 — full coverage, correct
    overlap, last chunk short-not-padded, at any document length."""
    W, S = 64, 48
    n_chunks = 1 + max(-(-(n_words - W) // S), 0)
    covered = set()
    for i in range(n_chunks):
        start = i * S
        width = max(min(W, n_words - start), 0)
        if i < n_chunks - 1:
            assert width == W, (n_words, i)
        covered.update(range(start, start + width))
    if n_words > 0:
        assert covered == set(range(n_words))
    else:
        assert n_chunks == 1  # one empty chunk for an empty doc


def test_encode_documents_vocab_ids_and_oov(spark, tmp_path):
    """Frequency-vocab encoding: ids are (occurrences desc, token asc)
    ranks, OOV maps to 0, position order survives the distributed
    re-assembly, token-less docs are absent, and the driver fingerprint
    matches the ids array."""
    from pyspark.sql import functions as F

    from ocr_pipeline_fastapi_latency_optimization_spark.operators.chunking import (
        encode_documents,
        encode_documents_df,
    )

    rows = [
        (0, "b a b c b a", "s"),   # b×3, a×2, c×1
        (1, "a rare b", "s"),      # 'rare' is OOV at vocab_size=3... 
        (2, "", "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    sf = str(tmp_path)
    # vocab_size=3 → vocab: b=1, a=2, c=3; 'rare' (count 1, ties with c,
    # lexicographic c < rare → c wins the cut) → OOV 0
    enc = (
        encode_documents_df(spark, sf, vocab_size=3)
        .toPandas()
        .set_index("doc_id")
    )
    assert list(enc.loc[0, "ids"]) == [1, 2, 1, 3, 1, 2]
    assert list(enc.loc[1, "ids"]) == [2, 0, 1]
    assert 2 not in enc.index  # token-less doc absent
    drv = encode_documents(spark, sf, vocab_size=3).toPandas().set_index("doc_id")
    assert drv.loc[0, "n_tokens"] == 6 and drv.loc[1, "n_tokens"] == 3
    import hashlib

    assert (
        drv.loc[1, "ids_fp"] == hashlib.md5(b"2,0,1").hexdigest()
    )


def test_global_shuffle_is_reproducible_permutation(spark):
    """The epoch shuffle must be a bijection onto 0..n-1, identical
    across re-runs (resume-safe training order), and a different salt
    must yield a different permutation (epochs decorrelate)."""
    a = chunking.global_shuffle(spark, SF_DIR).toPandas()
    n = len(a)
    assert sorted(a["pos"]) == list(range(n))
    assert len(set(a["doc_id"])) == n
    b = chunking.global_shuffle(spark, SF_DIR).toPandas()
    assert list(a["doc_id"]) == list(b["doc_id"])
    c = chunking.global_shuffle(spark, SF_DIR, salt="epoch1").toPandas()
    assert list(a["doc_id"]) != list(c["doc_id"])
    assert sorted(c["doc_id"]) == sorted(a["doc_id"])


def test_export_shards_manifest_matches_written_data(spark, tmp_path):
    """The export manifest must agree with what lands on disk: shard
    assignment is contiguous (seq_id div seqs_per_shard), the
    partitioned layout is directory-prunable, and recomputing every
    manifest column INCLUDING the order-independent content checksum
    from the written parquet reproduces it exactly. Conservation: shard
    totals sum to the pack totals."""
    out = str(tmp_path / "exp")
    man = chunking.export_shards(
        spark, SF_DIR, seqs_per_shard=4, path=out
    ).toPandas()
    assert len(man) >= 2  # several shards at sandbox scale
    assert list(man["shard_id"]) == sorted(man["shard_id"])
    # all shards full except possibly the last
    assert (man["n_seqs"].iloc[:-1] == 4).all()

    # partition-directory columns read back as int32 — restore the
    # manifest's long type before comparing
    shards = spark.read.parquet(f"{out}/shards").withColumn(
        "shard_id", F.col("shard_id").cast("long")
    )
    # directory-prunable: partition column present, one dir per shard
    import os

    dirs = [d for d in os.listdir(f"{out}/shards") if d.startswith("shard_id=")]
    assert len(dirs) == len(man)
    re_fp = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("seq_id").cast("string"),
                    F.col("n_docs").cast("string"),
                    F.col("n_tokens").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    re_man = (
        shards.groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_seqs"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("first_doc").alias("first_doc"),
            F.max("last_doc").alias("last_doc"),
            F.sum(re_fp).cast("decimal(38,0)").cast("string").alias("content_fp"),
        )
        .orderBy("shard_id")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        man.reset_index(drop=True), re_man.reset_index(drop=True)
    )
    packs = chunking.pack_sequences(spark, SF_DIR).toPandas()
    assert man["n_seqs"].sum() == len(packs)
    assert man["n_tokens"].sum() == packs["n_tokens"].sum()
    # the persisted manifest equals the returned one
    disk_man = (
        spark.read.parquet(f"{out}/_manifest")
        .orderBy("shard_id")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(man.reset_index(drop=True), disk_man)


# --- content-defined chunking -------------------------------------------------


def _cdc_ref(text, divisor=16):
    """Pure-python reference CDC: cut after any token whose 60-bit md5
    prefix ≡ 0 (mod divisor); returns the list of chunk token-lists."""
    import hashlib

    toks = [t for t in text.split(" ") if t != ""]
    chunks, cur = [], []
    for t in toks:
        cur.append(t)
        if int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % divisor == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return chunks


def test_cdc_chunks_match_python_reference(spark):
    import hashlib

    rows = [
        (0, " ".join(f"w{i}" for i in range(150))),
        (1, "single"),
        (2, ""),  # no tokens: no chunks
        (3, "a b c"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from ocr_pipeline_fastapi_latency_optimization_spark.operators import chunking

    out = chunking.cdc_chunks(spark, "", docs=docs).toPandas()
    want = []
    for d, t in rows:
        for i, c in enumerate(_cdc_ref(t)):
            want.append(
                (d, i, len(c), hashlib.md5(" ".join(c).encode()).hexdigest())
            )
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == want, (got[:5], want[:5])


def test_cdc_insertion_locality(spark):
    """The CDC selling point vs fixed-window chunking: an insertion
    early in the document only perturbs chunks up to the next boundary;
    every later chunk re-fingerprints identically. Fixed-window
    chunking shifts EVERY downstream window."""
    base = " ".join(f"tok{i}" for i in range(400))
    edited = base.split(" ")
    edited.insert(5, "INSERTED_WORD")
    edited = " ".join(edited)
    docs = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, text string"
    )
    from ocr_pipeline_fastapi_latency_optimization_spark.operators import chunking

    cdc = chunking.cdc_chunks(spark, "", docs=docs).toPandas()
    a = set(cdc[cdc.doc_id == 0].chunk_fp)
    b = set(cdc[cdc.doc_id == 1].chunk_fp)
    # all but the single edited chunk must survive the insertion
    assert len(a & b) >= len(a) - 1 and len(a) >= 10, (len(a & b), len(a))

    fixed = chunking.chunk_documents(spark, "", docs=docs).toPandas()
    fa = set(fixed[fixed.doc_id == 0].chunk_fp)
    fb = set(fixed[fixed.doc_id == 1].chunk_fp)
    assert len(fa & fb) == 0, "fixed windows all shift after an insertion"


def test_cdc_chunks_cover_every_token(spark):
    """Chunk lengths per doc sum to the doc's token count — boundaries
    partition, never drop or duplicate."""
    rows = [(d, " ".join(f"x{d}_{i}" for i in range(37 * (d + 1)))) for d in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from ocr_pipeline_fastapi_latency_optimization_spark.operators import chunking

    out = chunking.cdc_chunks(spark, "", docs=docs).toPandas()
    sums = out.groupby("doc_id").n_words.sum().to_dict()
    assert sums == {d: 37 * (d + 1) for d in range(5)}
    # chunk_idx is dense 0..k-1 per doc
    for d, g in out.groupby("doc_id"):
        assert list(g.chunk_idx) == list(range(len(g)))


def test_cdc_rejects_bad_divisor(spark):
    from ocr_pipeline_fastapi_latency_optimization_spark.operators import chunking

    with pytest.raises(ValueError):
        chunking.cdc_chunks(spark, "", divisor=1)
