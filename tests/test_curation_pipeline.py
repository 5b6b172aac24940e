"""Capstone: the full training-data curation chain — source filtering,
PII scrubbing, quality gating, exact + paragraph dedup, benchmark
decontamination, quality-weighted sampling — composed over real testdata
parquet, the way a C4/Dolma-style pipeline would run it."""

import pytest

from pyspark.sql import functions as F

from wrangler_spark import Pipeline
from wrangler_spark.datapipe import curation, dedup, text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_full_curation_chain(spark, docs):
    n0 = docs.count()

    # 1. drop blocked sources, scrub PII (recipe surface)
    staged = Pipeline.compile(
        "source-filter :source 'src13,src17'\npii-redact :text"
    ).apply(docs)
    n1 = staged.count()
    assert 0 < n1 < n0

    # 2. quality gate: keep docs passing the word-count + stopword rules
    gated = text.gopher_quality(staged, "text").filter(
        F.col("g_word_count") | F.col("g_stopwords")
    )
    n2 = gated.count()
    assert 0 < n2 <= n1

    # 3. exact dedup (content hash), then paragraph-level dedup
    keep_ids = dedup.exact_dedup(gated, "doc_id", "text").select("doc_id")
    exact = gated.join(keep_ids, "doc_id")
    n3 = exact.count()
    assert 0 < n3 <= n2

    para = curation.paragraph_dedup(exact, "doc_id", "text")
    assert para.count() == n3  # reassembly preserves doc count

    # 4. decontaminate against a held-out benchmark slice
    bench = docs.filter(F.col("doc_id") % 23 == 5)
    deconned = curation.decontaminate(exact, bench, "doc_id", "text", n=8, threshold=0.5)
    clean = exact.join(
        deconned.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    n4 = clean.count()
    assert 0 < n4 <= n3

    # 5. quality-weighted deterministic sampling
    q = text.quality_score(clean, "text")
    b = q.withColumn(
        "bucket",
        F.when(F.col("quality") >= 0.65, "high")
        .when(F.col("quality") >= 0.5, "mid")
        .otherwise("low"),
    )
    sampled = curation.sample_stratified(b, "doc_id", "bucket", {"high": 1.0, "mid": 0.5, "low": 0.1})
    n5 = sampled.count()
    assert 0 < n5 <= n4
    # deterministic: the same chain yields the same sample
    again = curation.sample_stratified(b, "doc_id", "bucket", {"high": 1.0, "mid": 0.5, "low": 0.1})
    assert {r["doc_id"] for r in sampled.select("doc_id").collect()} == {
        r["doc_id"] for r in again.select("doc_id").collect()
    }

    # the funnel is monotone and ends non-empty
    assert n0 >= n1 >= n2 >= n3 >= n4 >= n5 > 0
