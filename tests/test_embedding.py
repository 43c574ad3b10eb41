"""Deterministic text→embedding generation (round-4 verdict #1): the
Spark integer feature sums against the pure-Python oracle, decorrelation
from the MinHash permutation family, and the closed-loop semantic text
dedup on planted duplicates."""

import pandas as pd

from pyspark.sql import functions as F

from ocr_pipeline_fastapi_latency_optimization_spark.operators import (
    dedup,
    embedding,
)

SF_DIR = "/root/testdata/sf0.001"
SF_01 = "/root/testdata/sf0.01"


def test_embed_sums_match_python_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
    sums = embedding.embed_sums(docs).toPandas().set_index("doc_id")
    texts = {
        r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()
    }
    assert len(sums) > 0
    for doc_id, row in sums.iterrows():
        n, s = embedding.embed_py(texts[doc_id])
        assert row["n_tokens"] == n, doc_id
        assert [row[f"s{d}"] for d in range(embedding.EMBED_DIM)] == s, doc_id


def test_embed_consts_are_not_the_minhash_permutations():
    """The embedding projection stream must be a DIFFERENT universal-hash
    stream than the MinHash permutations — shared constants would
    correlate embedding dimensions with dedup signatures."""
    n = 32
    assert embedding._embed_consts(n) != dedup._affine_consts(n)
    # and the stream itself is deterministic
    assert embedding._embed_consts(n) == embedding._embed_consts(n)


def test_embed_multiset_and_token_handling(spark):
    """Repeated tokens count (bag semantics); consecutive/leading
    spaces contribute nothing; identical texts embed identically;
    token-less docs are absent (the sub-shingle analog)."""
    rows = [
        (0, "alpha beta alpha", "s"),
        (1, "  alpha   beta alpha  ", "s"),  # same multiset, noisy spacing
        (2, "alpha beta", "s"),
        (3, "", "s"),
        (4, "   ", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = embedding.embed_sums(docs).toPandas().set_index("doc_id").sort_index()
    assert list(out.index) == [0, 1, 2]  # 3 and 4 have no tokens
    cols = [f"s{d}" for d in range(embedding.EMBED_DIM)]
    assert out.loc[0, cols].tolist() == out.loc[1, cols].tolist()
    assert out.loc[0, "n_tokens"] == 3 and out.loc[1, "n_tokens"] == 3
    assert out.loc[0, cols].tolist() != out.loc[2, cols].tolist()
    # bag semantics: doubling a token is NOT idempotent
    n, s_ab = embedding.embed_py("alpha beta")
    _, s_aab = embedding.embed_py("alpha alpha beta")
    assert s_ab != s_aab


def test_embedding_frame_shape_matches_fixture_contract(spark):
    """embed_documents_df serves the same (id, array<double>) shape the
    fixture embeddings.parquet provides, at LSH_DIM dimensions — so the
    hyperplane index, quantizer and knn machinery apply unchanged."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.similarity import (
        LSH_DIM,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    emb = embedding.embed_documents_df(docs)
    schema = {f.name: f.dataType.simpleString() for f in emb.schema.fields}
    assert schema == {"doc_id": "bigint", "embedding": "array<double>"}
    first = emb.limit(1).collect()[0]
    assert len(first["embedding"]) == LSH_DIM == embedding.EMBED_DIM


def test_semantic_text_dedup_planted_duplicates(spark, tmp_path):
    """The closed loop: planted exact + near duplicates of real fixture
    texts must cluster to their source doc (min-id survivor keeps);
    unrelated docs keep themselves; every doc appears exactly once."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.filter(F.col("doc_id") < 40).select("doc_id", "text", "source")
    exact = (
        docs.filter(F.col("doc_id") < 3)
        .select((F.col("doc_id") + 1000).alias("doc_id"), "text", "source")
    )
    # one appended token: a bounded perturbation even for the shortest
    # base doc (doc 0 has 23 tokens → cosine 0.9785 ≥ the 0.95
    # threshold; two tokens would dilute it to 0.917 — correctly below)
    near = (
        docs.filter(F.col("doc_id") < 3)
        .select(
            (F.col("doc_id") + 2000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
            "source",
        )
    )
    base.unionByName(exact).unionByName(near).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = (
        embedding.semantic_dedup_text_corpus(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == 46 and out.index.is_unique
    for d in range(3):
        assert out.loc[d + 1000, "cluster_id"] == d
        assert not out.loc[d + 1000, "keep"]
        assert out.loc[d + 2000, "cluster_id"] == d
        assert not out.loc[d + 2000, "keep"]
        assert out.loc[d, "keep"]


def test_semantic_text_threshold_recovers_jaccard_ground_truth(spark):
    """The committed threshold claim, asserted on the CORPUS-PATH kernel
    (centered-banded candidates + raw-cosine verify): at 0.95 the
    verified pair set over the corpus's own text equals the n-gram
    Jaccard≥0.8 pair set exactly (measured in-session on sf0.01 and
    frozen here) — centering changes candidate VOLUME (75,820→32,263
    measured), never the verified result."""
    docs = spark.read.parquet(f"{SF_01}/documents.parquet")
    jac = dedup.ngram_jaccard_pairs(spark, SF_01).toPandas()
    jset = set(zip(jac["doc_a"], jac["doc_b"]))
    pairs = embedding.text_near_dup_pairs(docs).toPandas()
    assert set(zip(pairs["id_a"], pairs["id_b"])) == jset


def test_auto_text_family_rule():
    """The derived-from-N default family (round-5 verdict #1): the
    frozen bands table matches its documented recall formula, the bit
    width GROWS with corpus size (the quadratic-candidates fix the
    scale rung measured), small corpora keep the round-5 floor family
    bit-identically, and the Python rule equals the SQL twin's CASE
    rule over the oracle-enumerated range."""
    import math

    # bands(bits) = ceil(ln 0.003 / ln(1 - 0.93^bits)) — the documented
    # ≥0.997 per-pair recall hold at measured per-bit agreement 0.93
    for bits, bands in embedding._TEXT_BANDS_FOR_BITS.items():
        want = math.ceil(math.log(0.003) / math.log(1 - 0.93**bits))
        assert bands == want, (bits, bands, want)
        assert 1 - (1 - 0.93**bits) ** bands >= 0.997

    # floor family below the first knee: bit-identical to the round-5
    # frozen default (sf0.001/sf0.01 oracles unchanged by construction)
    for n in (0, 1, 500, 4096):
        assert embedding.auto_text_family(n) == (
            embedding.TEXT_LSH_PLANES,
            embedding.TEXT_LSH_BANDS,
        )
    # width scales with N: keys per band = 2^bits grows monotonically,
    # keeping expected bucket width ≤ TARGET_BUCKET until the cap
    prev_bits = 0
    for n in (1, 10**3, 10**4, 10**5, 10**6, 10**7, 10**8):
        n_planes, bands = embedding.auto_text_family(n)
        bits = n_planes // bands
        assert bits >= prev_bits
        prev_bits = bits
        if bits < embedding.TEXT_LSH_MAX_BITS:
            assert (1 << bits) * embedding.TEXT_LSH_TARGET_BUCKET >= n
    assert embedding.auto_text_family(4097) == (72, 8)  # first step up
    assert embedding.auto_text_family(50_000) == (132, 11)  # the rung scale
    # cap: beyond MAX_BITS the family freezes (manual override territory)
    cap = embedding.auto_text_family(10**12)
    assert cap[0] // cap[1] == embedding.TEXT_LSH_MAX_BITS

    # Python rule == the SQL twin's integer CASE rule over the
    # enumerated oracle range (bits 8..12, n ≤ 2^12·16)
    def sql_bits(n):
        for bits in range(8, 12):
            if n <= (1 << bits) * embedding.TEXT_LSH_TARGET_BUCKET:
                return bits
        return 12
    for n in list(range(0, 70000, 137)) + [4096, 4097, 8192, 8193, 65536]:
        n_planes, bands = embedding.auto_text_family(n)
        if n <= (1 << 12) * embedding.TEXT_LSH_TARGET_BUCKET:
            assert n_planes // bands == sql_bits(n), n


def test_persist_family_override_rule():
    """The documented past-MAX_BITS lever exists on the persist path
    (round-6 review #5): default auto-sizes, an explicit (n_planes,
    bands) pair passes through, partial or indivisible overrides
    raise."""
    import pytest

    assert embedding._resolve_persist_family(None, None, 500) == (
        embedding.TEXT_LSH_PLANES,
        embedding.TEXT_LSH_BANDS,
    )
    assert embedding._resolve_persist_family(156, 12, 10**9) == (156, 12)
    with pytest.raises(ValueError, match="BOTH"):
        embedding._resolve_persist_family(156, None, 500)
    with pytest.raises(ValueError, match="multiple"):
        embedding._resolve_persist_family(100, 8, 500)


def test_band_keys_udf_rejects_indivisible_family(spark):
    """planes_list whose length is not a multiple of bands must raise
    (silently dropped trailing hyperplanes weaken recall — round-5
    ADVICE #3)."""
    import pytest

    with pytest.raises(ValueError, match="not a multiple"):
        embedding._text_band_keys_udf(embedding._text_planes(65), bands=8)


def test_centered_banding_balances_buckets(spark):
    """The skew fix, asserted structurally: centered band buckets over
    the sf0.01 corpus are near-balanced (max bucket ≤ 4× the ideal
    N·bands/keys width), while RAW banding concentrates the corpus's
    shared-vocabulary direction into dominant buckets (max bucket > 4×
    ideal — the O(Σ bucket²) blowup the 11 s bench number exposed)."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.similarity import (
        LSH_BANDS,
        LSH_PLANES,
        cosine_band_buckets,
    )

    docs = spark.read.parquet(f"{SF_01}/documents.parquet")
    sums = embedding.embed_sums(docs)
    n_docs = sums.count()
    keys = 2 ** (LSH_PLANES // LSH_BANDS)
    ideal = n_docs / keys  # per (band, key) cell if perfectly balanced
    cent_w = (
        embedding.centered_band_buckets(sums, embedding.embed_totals(sums))
        .groupBy("band", "key")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    raw_w = (
        cosine_band_buckets(
            embedding._sums_to_array(sums).select(
                F.col("doc_id").alias("vec_id"), "embedding"
            )
        )
        .groupBy("band", "key")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    assert cent_w <= 4 * ideal, (cent_w, ideal)
    assert raw_w > 4 * ideal, (raw_w, ideal)


def test_semantic_dedup_by_domain_planted_dups_and_balance(spark, tmp_path):
    """Round-6 multi-domain operator: per-domain centering finds planted
    near-dups WITHIN each disjoint-vocabulary domain (where the global
    path's single center leaves per-domain clusters); cross-domain
    near-identity is out of scope by construction; and per-domain
    centered buckets are near-balanced on a 2-domain mixture while
    globally-centered buckets skew (the rung's measured failure mode)."""
    from pyspark.sql import functions as F

    def text(i, tag):
        return " ".join(f"{tag}w{i}t{j}" for j in range(15))

    rows = []
    for d, tag in enumerate(["alpha", "beta"]):
        for i in range(40):
            rows.append((d * 1000 + i, text(i, tag), f"src{d}"))
        # planted near-dup of doc 0 of this domain
        rows.append((d * 1000 + 500, text(0, tag) + " x", f"src{d}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = (
        embedding.semantic_dedup_text_by_domain(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    assert len(out) == 82 and out.index.is_unique
    for d in range(2):
        assert out.loc[d * 1000 + 500, "cluster_id"] == d * 1000
        assert not out.loc[d * 1000 + 500, "keep"]
        assert out.loc[d * 1000, "keep"]

    # balance: per-domain centering vs one global center on the mixture
    sums = embedding.embed_sums(docs)
    sums_dom = sums.join(
        docs.select("doc_id", F.col("source").alias("domain")), "doc_id"
    )
    n_dom = (
        embedding.domain_centered_band_buckets(sums_dom)
        .groupBy("domain", "band", "key")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    n_glob = (
        embedding.centered_band_buckets(sums, embedding.embed_totals(sums))
        .groupBy("band", "key")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    # 82 docs over 256 keys: balanced ⇒ widest bucket stays small;
    # a domain cluster the global center cannot remove concentrates
    # one domain's docs into few buckets
    assert n_dom < n_glob, (n_dom, n_glob)
    assert n_dom <= 8, n_dom


def test_semantic_dedup_clustered_unlabeled_mixture(spark, tmp_path):
    """Round-6 verdict #5 (the unlabeled lever): on a disjoint-vocabulary
    2-domain mixture WITHOUT labels, k-means-derived coarse domains +
    per-cluster centering find the same planted near-dups as the labeled
    by-domain path — identical (doc_id, cluster_id, keep) verdicts — and
    the derived-cluster centered buckets are tighter than one global
    center's (the rung's measured failure mode, fixed without labels)."""
    from pyspark.sql import functions as F

    from ocr_pipeline_fastapi_latency_optimization_spark.operators.similarity import (
        _assign_topn,
        kmeans_centroids,
    )

    def text(i, tag):
        return " ".join(f"{tag}w{i}t{j}" for j in range(15))

    rows = []
    for d, tag in enumerate(["alpha", "beta"]):
        for i in range(40):
            rows.append((d * 1000 + i, text(i, tag), f"src{d}"))
        rows.append((d * 1000 + 500, text(0, tag) + " x", f"src{d}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    docs.write.parquet(f"{tmp_path}/documents.parquet")

    out = (
        embedding.semantic_dedup_text_clustered(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    labeled = (
        embedding.semantic_dedup_text_by_domain(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    assert len(out) == 82 and out.index.is_unique
    # the planted dups are found without labels…
    for d in range(2):
        assert out.loc[d * 1000 + 500, "cluster_id"] == d * 1000
        assert not out.loc[d * 1000 + 500, "keep"]
        assert out.loc[d * 1000, "keep"]
    # …and every verdict equals the labeled path's (exact verify makes
    # the candidate route irrelevant once recall holds)
    assert out.sort_index().equals(labeled.sort_index())

    # balance: derived-cluster centering vs one global center
    sums = embedding.embed_sums(docs)
    emb = embedding._scaled_text_emb(sums)
    cents = kmeans_centroids(emb, n_centroids=embedding.DEDUP_CLUSTERS)
    asg = _assign_topn(emb, cents, n=embedding.DEDUP_SOFT_ASSIGN)
    primary = asg.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("doc_id"), F.col("centroid_id").alias("domain")
    )
    totals = embedding.domain_totals(sums.join(primary, "doc_id"))
    soft = asg.select(
        F.col("vec_id").alias("doc_id"), F.col("centroid_id").alias("domain")
    )
    n_clu = (
        embedding.domain_centered_band_buckets(
            sums.join(soft, "doc_id"), totals_dom=totals
        )
        .groupBy("domain", "band", "key")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    n_glob = (
        embedding.centered_band_buckets(sums, embedding.embed_totals(sums))
        .groupBy("band", "key")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert n_clu < n_glob, (n_clu, n_glob)


def test_assign_empty_centroids_yields_no_rows(spark):
    """Round-8 closure-matrix assignment: an EMPTY centroid frame must
    degrade to zero assignment rows with the original schema (the
    retired crossJoin forms' behavior — crossJoin([]) == no rows), not
    crash in the matrix builder (np.reshape(0, -1) raises)."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators import (
        similarity,
    )

    vecs = spark.createDataFrame(
        [(1, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [], "centroid_id long, c_emb array<double>"
    )
    a = similarity._assign(vecs, cents)
    assert a.columns == ["vec_id", "embedding", "centroid_id"]
    assert a.count() == 0
    t = similarity._assign_topn(vecs, cents, n=2)
    assert t.columns == ["vec_id", "centroid_id", "rn"]
    assert t.count() == 0


def test_assign_topn_rn1_equals_assign(spark):
    """The soft top-n assignment's rn=1 slice is exactly ``_assign``'s
    argmax (same quantized score, same min-cid tie-break) — the primary
    centering population is the argmax population."""
    from pyspark.sql import functions as F

    from ocr_pipeline_fastapi_latency_optimization_spark.operators.similarity import (
        _assign,
        _assign_topn,
        kmeans_centroids,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sums = embedding.embed_sums(docs)
    emb = embedding._scaled_text_emb(sums)
    cents = kmeans_centroids(emb, n_centroids=4)
    top = (
        _assign_topn(emb, cents, n=2)
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    ref = (
        _assign(emb, cents)
        .select("vec_id", "centroid_id")
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert top.equals(ref)
    # and rn ≤ n rows per vector, rn values contiguous from 1
    counts = (
        _assign_topn(emb, cents, n=2).groupBy("vec_id").count().toPandas()
    )
    assert set(counts["count"]) == {2}


def test_text_verify_is_pure_jvm_and_matches_arrow_cosine(spark):
    """Round-5 verdict #4: the exact-verify stage of the text dedup path
    is a pure-JVM integer-sum cosine — the ONLY Python node in the whole
    text_near_dup_pairs plan is the banding key UDF — and its quantized
    scores are byte-identical to the Arrow cosine_e6 UDF over the same
    candidate pairs."""
    import contextlib
    import io
    import re

    from pyspark.sql import functions as F

    from ocr_pipeline_fastapi_latency_optimization_spark.operators.similarity import (
        cosine_e6,
    )

    docs = spark.read.parquet(f"{SF_01}/documents.parquet")
    pairs = embedding.text_near_dup_pairs(docs, threshold_e6=0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pairs.explain(mode="formatted")
    plan = buf.getvalue()
    # the ONLY Arrow evals are the band-keys UDF — one per branch of
    # the candidate self-join (formatted mode emits one "(n) Node"
    # detail header per physical node); the verify stage contributes
    # zero Python nodes
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 2, plan
    for banned in ("BatchEvalPython", "MapInPandas", "FlatMapGroups"):
        assert banned not in plan, (banned, plan)

    got = pairs.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(got) > 0
    emb = embedding.embed_documents_df(docs)
    ea = emb.select(F.col("doc_id").alias("id_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("doc_id").alias("id_b"), F.col("embedding").alias("eb"))
    want = (
        pairs.select("id_a", "id_b")
        .join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", cosine_e6(F.col("ea"), F.col("eb")).alias("score_e6"))
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_incremental_text_semantic_dedup_paths_agree(spark, tmp_path):
    """The indexed probe (persist_text_cosine_index + index_table=) must
    return byte-identical verdicts to the boundary-split driver-oracle
    path, and the full text ingest cycle works: probe → append the
    batch's embeddings → a later batch of near-copies is flagged
    near_dup BECAUSE of the append."""
    import pandas as pd

    def text(i, tag):
        return " ".join(f"{tag}{i}w{j}" for j in range(15))

    existing = [(i, text(i, "base"), "s") for i in range(60)]
    batch1 = [(250 + i, text(i, "novel"), "s") for i in range(8)]
    batch2 = [(400 + i, text(i, "novel") + " x", "s") for i in range(8)]
    docs = spark.createDataFrame(
        existing + batch1 + batch2, "doc_id long, text string, source string"
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    sf = str(tmp_path)
    try:
        embedding.persist_text_cosine_index(
            spark,
            docs.filter(F.col("doc_id") < 250),
            "t_txt_idx",
            str(tmp_path / "tidx"),
            n_storage_buckets=4,
        )
        got = (
            embedding.incremental_text_semantic_dedup(
                spark, sf, boundary=250, index_table="t_txt_idx"
            )
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = (
            embedding.incremental_text_semantic_dedup(spark, sf, boundary=250)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        # batch1 (novel vocab) is new against the base-only index
        b1 = got[got["doc_id"] < 400]
        assert (b1["verdict"] == "new").all() and len(b1) == 8

        # append batch1, then probe batch2 (near-copies of batch1): the
        # appended rows flip the verdict. The append MUST go through the
        # text-aware variant — the raw cosine append refuses a centered
        # text index (mixing hash families would corrupt probes).
        import pytest

        from ocr_pipeline_fastapi_latency_optimization_spark.operators.similarity import (
            append_to_cosine_index,
        )

        batch1_docs = docs.filter(
            (F.col("doc_id") >= 250) & (F.col("doc_id") < 400)
        )
        emb1 = embedding.embed_documents_df(batch1_docs).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        with pytest.raises(ValueError, match="CENTERED text index"):
            append_to_cosine_index(spark, emb1, "t_txt_idx")
        r = embedding.append_to_text_cosine_index(spark, batch1_docs, "t_txt_idx")
        assert r["status"] == "appended"
        r2 = embedding.append_to_text_cosine_index(spark, batch1_docs, "t_txt_idx")
        assert r2["status"] == "noop"
        p2 = embedding.incremental_text_semantic_dedup(
            spark, sf, boundary=400, index_table="t_txt_idx"
        ).toPandas()
        assert (p2["verdict"] == "near_dup").all() and len(p2) == 8
    finally:
        spark.sql("DROP TABLE IF EXISTS t_txt_idx")


def test_text_domain_index_full_cycle(spark, tmp_path):
    """The fourth index family (per-domain centers): persist → indexed
    probe byte-identical to the boundary-split oracle path → append
    flips later near-copies to near_dup → double-append no-op → a batch
    with an unrecorded domain fails fast on append (probe degrades to
    'new') → the global text probe refuses a domain index and vice
    versa."""
    import pandas as pd
    import pytest

    def text(i, tag):
        return " ".join(f"{tag}{i}w{j}" for j in range(15))

    existing = (
        [(i, text(i, "alpha"), "srcA") for i in range(40)]
        + [(100 + i, text(i, "beta"), "srcB") for i in range(40)]
    )
    batch1 = [(250 + i, text(i, "nova"), "srcA") for i in range(6)]
    batch2 = [(400 + i, text(i, "nova") + " x", "srcA") for i in range(6)]
    docs = spark.createDataFrame(
        existing + batch1 + batch2, "doc_id long, text string, source string"
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    sf = str(tmp_path)
    try:
        embedding.persist_text_domain_index(
            spark,
            docs.filter(F.col("doc_id") < 250),
            "t_dom_idx",
            str(tmp_path / "didx"),
            n_storage_buckets=4,
        )
        got = (
            embedding.incremental_text_domain_dedup(
                spark, sf, boundary=250, index_table="t_dom_idx"
            )
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = (
            embedding.incremental_text_domain_dedup(spark, sf, boundary=250)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        b1 = got[got["doc_id"] < 400]
        assert (b1["verdict"] == "new").all() and len(b1) == 6

        # cross-family guards: the global probe refuses a domain index;
        # the domain probe refuses a global index
        with pytest.raises(ValueError, match="no text centering"):
            embedding.incremental_text_semantic_dedup(
                spark, sf, boundary=250, index_table="t_dom_idx"
            )
        embedding.persist_text_cosine_index(
            spark,
            docs.filter(F.col("doc_id") < 250),
            "t_glob_for_dom",
            str(tmp_path / "gidx"),
            n_storage_buckets=4,
        )
        with pytest.raises(ValueError, match="no per-domain centering"):
            embedding.incremental_text_domain_dedup(
                spark, sf, boundary=250, index_table="t_glob_for_dom"
            )

        # append batch1, probe batch2 (near-copies of batch1)
        batch1_docs = docs.filter(
            (F.col("doc_id") >= 250) & (F.col("doc_id") < 400)
        )
        r = embedding.append_to_text_domain_index(
            spark, batch1_docs, "t_dom_idx"
        )
        assert r["status"] == "appended"
        r2 = embedding.append_to_text_domain_index(
            spark, batch1_docs, "t_dom_idx"
        )
        assert r2["status"] == "noop"
        p2 = embedding.incremental_text_domain_dedup(
            spark, sf, boundary=400, index_table="t_dom_idx"
        ).toPandas()
        assert (p2["verdict"] == "near_dup").all() and len(p2) == 6

        # the probe adopts the index's RECORDED domain column (round-6
        # review #1): an index keyed on a DIFFERENT column than the
        # probe's default must still center on the right values —
        # byte-identical to probing with the column named explicitly
        docs_lang = docs.withColumn("lang", F.col("source"))
        docs_lang.write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        embedding.persist_text_domain_index(
            spark,
            docs_lang.filter(F.col("doc_id") < 250),
            "t_dom_lang_idx",
            str(tmp_path / "lidx"),
            domain_col="lang",
            n_storage_buckets=4,
        )
        by_default_col = embedding.incremental_text_domain_dedup(
            spark, sf, boundary=250, index_table="t_dom_lang_idx"
        ).toPandas()
        pd.testing.assert_frame_equal(
            by_default_col.sort_values("doc_id").reset_index(drop=True), want
        )
        spark.sql("DROP TABLE IF EXISTS t_dom_lang_idx")
        docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

        # unseen domain: append fails fast, probe degrades to 'new'
        oddball = spark.createDataFrame(
            [(999, text(0, "omega"), "srcNEW")],
            "doc_id long, text string, source string",
        )
        with pytest.raises(ValueError, match="no recorded center"):
            embedding.append_to_text_domain_index(spark, oddball, "t_dom_idx")
        docs.unionByName(oddball).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        p3 = embedding.incremental_text_domain_dedup(
            spark, sf, boundary=999, index_table="t_dom_idx"
        ).toPandas()
        assert p3["verdict"].tolist() == ["new"]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_dom_idx")
        spark.sql("DROP TABLE IF EXISTS t_glob_for_dom")


def test_text_clustered_index_full_cycle(spark, tmp_path):
    """The SEVENTH index family (unlabeled clustered centers): persist →
    indexed probe byte-identical to the boundary-split path (frozen
    repr-round-trip centroids + frozen per-cluster centers + frozen
    family) → append flips later near-copies to near_dup → double-append
    no-op → cross-family guards both ways (a global text index carries
    no quantizer; a clustered index carries no global center)."""
    import pandas as pd
    import pytest

    def text(i, tag):
        return " ".join(f"{tag}{i}w{j}" for j in range(15))

    existing = (
        [(i, text(i, "alpha"), "srcA") for i in range(40)]
        + [(100 + i, text(i, "beta"), "srcB") for i in range(40)]
    )
    batch1 = [(250 + i, text(i, "nova"), "srcA") for i in range(6)]
    batch2 = [(400 + i, text(i, "nova") + " x", "srcA") for i in range(6)]
    docs = spark.createDataFrame(
        existing + batch1 + batch2, "doc_id long, text string, source string"
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    sf = str(tmp_path)
    try:
        embedding.persist_text_clustered_index(
            spark,
            docs.filter(F.col("doc_id") < 250),
            "t_clu_idx",
            str(tmp_path / "cidx"),
            n_storage_buckets=4,
        )
        got = (
            embedding.incremental_text_clustered_dedup(
                spark, sf, boundary=250, index_table="t_clu_idx"
            )
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = (
            embedding.incremental_text_clustered_dedup(spark, sf, boundary=250)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        b1 = got[got["doc_id"] < 400]
        assert (b1["verdict"] == "new").all() and len(b1) == 6

        # cross-family guards
        with pytest.raises(ValueError, match="no text centering"):
            embedding.incremental_text_semantic_dedup(
                spark, sf, boundary=250, index_table="t_clu_idx"
            )
        embedding.persist_text_cosine_index(
            spark,
            docs.filter(F.col("doc_id") < 250),
            "t_glob_for_clu",
            str(tmp_path / "gidx"),
            n_storage_buckets=4,
        )
        with pytest.raises(ValueError, match="no frozen k-means"):
            embedding.incremental_text_clustered_dedup(
                spark, sf, boundary=250, index_table="t_glob_for_clu"
            )

        # append batch1, probe batch2 (near-copies of batch1)
        batch1_docs = docs.filter(
            (F.col("doc_id") >= 250) & (F.col("doc_id") < 400)
        )
        r = embedding.append_to_text_clustered_index(
            spark, batch1_docs, "t_clu_idx"
        )
        assert r["status"] == "appended"
        r2 = embedding.append_to_text_clustered_index(
            spark, batch1_docs, "t_clu_idx"
        )
        assert r2["status"] == "noop"
        p2 = embedding.incremental_text_clustered_dedup(
            spark, sf, boundary=400, index_table="t_clu_idx"
        ).toPandas()
        assert (p2["verdict"] == "near_dup").all() and len(p2) == 6
    finally:
        spark.sql("DROP TABLE IF EXISTS t_clu_idx")
        spark.sql("DROP TABLE IF EXISTS t_glob_for_clu")


def test_knn_text_heap_matches_window_and_retrieves_planted_dup(spark, tmp_path):
    """Text-side similarity search: heap and window forms byte-identical
    (same contract as the fixture knn), and a planted near-copy of a
    query doc is its top-1 neighbor."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.filter(F.col("doc_id") < 40).select("doc_id", "text", "source")
    copy = docs.filter(F.col("doc_id") == 2).select(
        F.lit(999).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "source",
    )
    base.unionByName(copy).write.parquet(f"{tmp_path}/documents.parquet")
    sf = str(tmp_path)
    heap = embedding.knn_text(spark, sf).toPandas()
    window = embedding.knn_text(spark, sf, topk="window").toPandas()
    pd.testing.assert_frame_equal(heap, window)
    top1 = heap[(heap["query_id"] == 2) & (heap["rnk"] == 1)].iloc[0]
    assert top1["neighbor_id"] == 999
    assert top1["score_e6"] >= embedding.TEXT_NEAR_DUP_THRESHOLD_E6


def test_embed_documents_plan_is_jvm_only(spark):
    """Structural freeze of the audited plan property: the embedding
    query is pure JVM (no Python/Arrow eval nodes, no pandas stages)
    and shuffles exactly once on doc_id (plus the oracle orderBy's
    range partitioning)."""
    import contextlib
    import io
    import re

    df = embedding.embed_documents(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    for banned in ("Python", "ArrowEval", "MapInPandas", "FlatMapGroups"):
        assert banned not in plan, (banned, plan)
    # formatted mode puts partitioning in the node-detail Arguments
    assert len(re.findall(r"hashpartitioning\(doc_id", plan)) >= 1, plan
    # one data shuffle + one orderBy range exchange — nothing else
    assert len(set(re.findall(r"\(\d+\) Exchange", plan))) <= 2, plan


def test_embed_py_hypothesis_unicode_totality():
    """Property: the pure-Python embed kernel is total and deterministic
    over arbitrary unicode text (md5 hashes UTF-8 bytes — no encoding
    edge can diverge between engines), sums are bounded by the documented
    envelope |S_d| < 2^30 * n_tokens, and multiset semantics hold:
    permuting token order never changes the embedding."""
    from hypothesis import given, settings, strategies as st

    token = st.text(
        alphabet=st.characters(blacklist_characters=" ", blacklist_categories=("Cs",)),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(token, min_size=0, max_size=20))
    def prop(tokens):
        text = " ".join(tokens)
        n, s = embedding.embed_py(text)
        assert n == len(tokens)
        assert (n, s) == embedding.embed_py(text)  # deterministic
        bound = (1 << 30) * max(n, 1)
        assert all(abs(v) <= bound for v in s)
        # multiset invariance: sorted token order gives the same sums
        _, s2 = embedding.embed_py(" ".join(sorted(tokens)))
        assert s2 == s

    prop()


def test_embed_spark_matches_python_on_unicode_edge_docs(spark):
    """Spark/JVM md5 and Python hashlib md5 must agree on non-ASCII
    token bytes: accented text, CJK, emoji, RTL, combining marks."""
    rows = [
        (0, "café naïve jalapeño", "s"),
        (1, "東京 大阪 京都 テスト", "s"),
        (2, "🚀 data 🧪 test 🔬", "s"),
        (3, "مرحبا بالعالم اختبار", "s"),
        (4, "étoile à ça", "s"),  # combining marks
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sums = embedding.embed_sums(docs).toPandas().set_index("doc_id")
    for doc_id, text, _ in rows:
        n, s = embedding.embed_py(text)
        assert sums.loc[doc_id, "n_tokens"] == n, doc_id
        assert [sums.loc[doc_id, f"s{d}"] for d in range(embedding.EMBED_DIM)] == s


def test_text_index_probe_is_shuffle_free_on_index_side(spark, tmp_path):
    """Completes the plan evidence across all three index families
    (MinHash, fixture-cosine, text-cosine): with broadcast disabled, a
    probe batch semi-joining the persisted text index reads the index
    co-located (SelectedBucketsCount in the scan) with exactly one
    (band, key)-keyed exchange — the probe batch aligning to the
    index's bucketing; zero on the index branch."""
    import contextlib
    import io
    import re

    def text(i, tag):
        return " ".join(f"{tag}{i}w{j}" for j in range(15))

    docs = spark.createDataFrame(
        [(i, text(i, "base"), "s") for i in range(60)]
        + [(250 + i, text(i, "probe"), "s") for i in range(8)],
        "doc_id long, text string, source string",
    )
    try:
        embedding.persist_text_cosine_index(
            spark,
            docs.filter(F.col("doc_id") < 250),
            "t_txt_plan_idx",
            str(tmp_path / "pidx"),
            n_storage_buckets=4,
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            from ocr_pipeline_fastapi_latency_optimization_spark.sources.catalog import (
                get_table_properties,
            )

            props = get_table_properties(spark, "t_txt_plan_idx")
            totals = embedding._center_literals_frame(spark, props)
            probe = embedding.centered_band_buckets(
                embedding.embed_sums(docs.filter(F.col("doc_id") >= 250)),
                totals,
            )
            idx = (
                spark.table("t_txt_plan_idx")
                .filter(F.col("vec_id") < 250)
                .select("band", "key")
                .distinct()
            )
            j = probe.join(idx, ["band", "key"], "left_semi")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                j.explain(mode="simple")
            plan = buf.getvalue()
            assert "SelectedBucketsCount" in plan, plan
            # the probe branch owns exactly two hash exchanges — its
            # embed aggregate (doc_id) and the join alignment (Catalyst
            # keeps the posexplode names pos/col there); the INDEX
            # branch contributes none: its band/key-named attributes
            # never appear under an Exchange
            assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan
            assert not re.search(r"Exchange hashpartitioning\(band#", plan), plan
            assert re.search(r"Exchange hashpartitioning\(pos#", plan), plan
            assert re.search(r"Exchange hashpartitioning\(doc_id#", plan), plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_txt_plan_idx")


def test_knn_text_ivf_probe_all_equals_brute_force(spark):
    """The recall-vs-work dial proven at both ends: with
    nprobe = n_centroids the text IVF probes every bucket and must be
    BYTE-IDENTICAL to knn_text brute force (scores included — the 2⁻³⁰
    scaling is exact, cosine-neutral); with nprobe = 1 it is a subset
    computation whose surviving rows carry the same exact scores."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.similarity import (
        IVF_CENTROIDS,
    )

    bf = embedding.knn_text(spark, SF_DIR).toPandas()
    ivf_all = embedding.knn_text_ivf(
        spark, SF_DIR, nprobe=IVF_CENTROIDS
    ).toPandas()
    pd.testing.assert_frame_equal(ivf_all, bf)

    ivf1 = embedding.knn_text_ivf(spark, SF_DIR, nprobe=1).toPandas()
    assert len(ivf1) <= len(bf)
    merged = ivf1.merge(
        bf[["query_id", "neighbor_id", "score_e6"]].rename(
            columns={"score_e6": "bf_score"}
        ),
        on=["query_id", "neighbor_id"],
        how="left",
    )
    # any neighbor IVF found that brute force also ranked has the same
    # exact quantized score
    both = merged.dropna(subset=["bf_score"])
    assert (both["score_e6"] == both["bf_score"]).all()


def test_centering_decimal_carries_past_int64(spark):
    """The centering product n·s_d − t_d runs in decimal(38,0) (HUGEINT
    in the DuckDB twin): a frozen center with past-2⁶³ totals must
    evaluate without ANSI overflow, and the resulting band keys must
    equal a Python-bigint reference (exact integers → one correctly
    rounded float64 conversion → plane signs)."""
    from decimal import Decimal

    import numpy as np

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta", "s"), (1, "epsilon zeta", "s")],
        "doc_id long, text string, source string",
    )
    sums = embedding.embed_sums(docs)
    n = 10**10
    ts = [Decimal((-1) ** d) * Decimal(10) ** 20 + d for d in range(64)]
    totals = spark.createDataFrame(
        [tuple([n] + ts)],
        "n long, " + ", ".join(f"t{d} decimal(38,0)" for d in range(64)),
    )
    got = (
        embedding.centered_band_buckets(sums, totals)
        .toPandas()
        .sort_values(["vec_id", "band"])
        .reset_index(drop=True)
    )
    planes = np.array(embedding._text_planes(), dtype=np.float64)
    per_band = embedding.TEXT_LSH_PLANES // embedding.TEXT_LSH_BANDS
    w = (1 << np.arange(per_band - 1, -1, -1)).astype(np.int64)
    for doc_id, text in [(0, "alpha beta gamma delta"), (1, "epsilon zeta")]:
        _, s = embedding.embed_py(text)
        # the engine computes round(n·s) − t in float64 — replicate the
        # same two-rounding IEEE sequence, not exact-bigint-then-round
        centered = np.array(
            [float(n) * float(s[d]) - float(ts[d]) for d in range(64)],
            dtype=np.float64,
        )
        bits = (planes @ centered) >= 0.0
        want = [
            int(bits[b * per_band : (b + 1) * per_band].astype(np.int64) @ w)
            for b in range(embedding.TEXT_LSH_BANDS)
        ]
        rows = got[got["vec_id"] == doc_id].sort_values("band")
        assert rows["key"].tolist() == want, doc_id
