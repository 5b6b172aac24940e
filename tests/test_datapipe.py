"""Dedup / similarity / text-analysis / multimodal operator tests."""

import pytest

from pyspark.sql import functions as F

from wrangler_spark.datapipe import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
            (3, "completely different content about spark engines"),
            (4, "THE  QUICK   brown fox jumps over the lazy dog"),  # exact dup of 1 after normalize
        ],
        ["doc_id", "text"],
    )


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs, "doc_id", "text").orderBy("doc_id").collect()
    ids = [r["doc_id"] for r in out]
    assert ids == [1, 2, 3]
    assert {r["doc_id"]: r["n_dups"] for r in out}[1] == 2  # doc 4 collapsed into 1


def test_minhash_finds_near_dup(docs):
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3).collect()
    pairset = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in pairset or (1, 4) in pairset  # near/exact dups surface
    for r in pairs:
        assert 0.0 <= r["jaccard"] <= 1.0


def test_ngram_jaccard(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=5, threshold=0.5).collect()
    pairset = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 4) in pairset  # normalized-identical pair has jaccard 1.0


def test_simhash_close_for_near_dups(docs):
    out = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, "doc_id", "text").collect()}
    ham_12 = bin(out[1] ^ out[2]).count("1")
    ham_13 = bin(out[1] ^ out[3]).count("1")
    assert out[1] == out[4]  # identical after normalization
    assert ham_12 < ham_13  # near-dup closer than unrelated


def test_cosine_topk(spark):
    rows = [(i, [float(i == j) for j in range(4)], 0) for i in range(4)]
    rows.append((4, [1.0, 0.01, 0.0, 0.0], 0))  # nearly parallel to vec 0
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = similarity.cosine_topk(df, df.filter(F.col("vec_id") == 0), k=1).collect()
    assert out[0]["vec_id"] == 4 and out[0]["rank"] == 1


def test_text_ops(docs):
    out = text.token_count(text.quality_score(text.langid(docs, "text"), "text"), "text")
    r = {x["doc_id"]: x for x in out.collect()}
    assert r[1]["lang_pred"] == "en"
    assert 0.0 <= r[1]["quality"] <= 1.0
    assert r[1]["n_tokens_ws"] == 9
    fp = {x["doc_id"]: x["fingerprint"] for x in text.fingerprint(docs, "text").collect()}
    assert fp[1] == fp[4]  # order/dup-insensitive identical token sets


def test_multimodal_plumbing(docs):
    with_payload = multimodal.attach_binary(docs, "text")
    feats = multimodal.extract_features(with_payload).select("doc_id", "features.*").collect()
    r = {x["doc_id"]: x for x in feats}
    assert r[1]["n_bytes"] == len("the quick brown fox jumps over the lazy dog")
    assert len(r[1]["md5_prefix"]) == 12
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(with_payload)


def test_dedup_directives(spark, docs):
    from wrangler_spark import Pipeline

    out = Pipeline.compile("token-count :text\nfingerprint :text\nlangid :text").apply(docs)
    assert {"n_tokens", "n_tokens_ws", "fingerprint", "lang_pred"} <= set(out.columns)
    dd = Pipeline.compile("dedup-exact :doc_id :text").apply(docs)
    assert dd.count() == 3
