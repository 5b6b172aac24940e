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


def test_substring_dup_spans_cross_doc(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"intro one {shared} outro one"),
        (2, f"different lead {shared} different tail here"),
        (3, "nothing in common with the others at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           curation.substring_dup_spans(df, "doc_id", "text", window=8).collect()}
    assert len(out) == 3
    # docs 1 and 2 share the 8-token run -> both have covered spans
    assert out[1]["n_covered"] >= 8 and out[2]["n_covered"] >= 8
    assert out[3]["n_covered"] == 0 and out[3]["dup_ratio"] == 0.0
    # the shared run is gone from the deduped text, the unique frame stays
    assert "gamma delta" not in out[1]["text_deduped"]
    assert "intro one" in out[1]["text_deduped"]
    assert "different lead" in out[2]["text_deduped"]
    assert out[3]["text_deduped"] == rows[2][1]


def test_substring_dup_spans_within_doc_repetition(spark):
    run = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, f"{run} filler middle words {run}")], "doc_id long, text string"
    )
    out = curation.substring_dup_spans(df, "doc_id", "text", window=8).collect()[0]
    # the same 8-token window occurs twice inside one doc -> count > 1
    assert out["n_covered"] >= 16
    assert "three four" not in out["text_deduped"]
    assert "filler middle words" in out["text_deduped"]


def test_substring_dup_spans_short_docs_unscathed(spark):
    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           curation.substring_dup_spans(df, "doc_id", "text", window=8).collect()}
    # identical but below the window width: no window ever fires
    for d in (1, 2):
        assert out[d]["n_covered"] == 0
        assert out[d]["text_deduped"] == "too short"
        assert out[d]["n_tokens"] == 2


def test_substring_dup_spans_full_coverage(spark):
    t = "exactly eight tokens in this duplicated document body"
    df = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
    out = curation.substring_dup_spans(df, "doc_id", "text", window=8).collect()
    for r in out:
        assert r["dup_ratio"] == 1.0
        assert r["text_deduped"] == ""


def test_substring_dup_spans_keep_first_survivor(spark):
    """keep_first=True implements the Lee et al. survivor contract: the
    globally-first occurrence (min doc_id, min pos) keeps its tokens."""
    t = "exactly eight tokens in this duplicated document body"
    df = spark.createDataFrame([(2, t), (1, t), (3, t)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           curation.substring_dup_spans(df, "doc_id", "text", window=8,
                                        keep_first=True).collect()}
    # doc 1 is the min-id occurrence: survives untouched
    assert out[1]["n_covered"] == 0 and out[1]["text_deduped"] == t
    # the later occurrences are removed
    for d in (2, 3):
        assert out[d]["dup_ratio"] == 1.0 and out[d]["text_deduped"] == ""


def test_substring_dup_spans_keep_first_within_doc(spark):
    run = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, f"{run} filler middle words {run}")], "doc_id long, text string"
    )
    out = curation.substring_dup_spans(
        df, "doc_id", "text", window=8, keep_first=True
    ).collect()[0]
    # first in-doc occurrence survives, the repeat at the tail is removed
    assert out["n_covered"] == 8
    assert out["text_deduped"].startswith(run)
    assert out["text_deduped"].count("three four") == 1


def test_dsir_target_affinity(spark):
    # target distribution: cooking text; raw pool: cooking + legal
    cooking = [
        "whisk the eggs with butter and fold in the flour gently",
        "simmer the onions in olive oil until golden and fragrant",
        "knead the dough and let it rest before baking the bread",
    ]
    legal = [
        "the party of the first part hereby waives all claims",
        "pursuant to the agreement the licensee shall indemnify the licensor",
    ]
    raw_rows = [(i, t) for i, t in enumerate(cooking + legal)]
    tgt_rows = [(100 + i, t) for i, t in enumerate(cooking)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")

    out = {r["doc_id"]: r for r in
           curation.dsir_logratio(raw, tgt, "doc_id", "text", buckets=512).collect()}
    assert len(out) == 5
    cook_scores = [out[i]["dsir_lr"] for i in range(3)]
    legal_scores = [out[i]["dsir_lr"] for i in range(3, 5)]
    # every cooking doc outscores every legal doc under a cooking target
    assert min(cook_scores) > max(legal_scores)
    # n_feat = unigrams + bigrams = 2*len(words) - 1 for these clean texts
    for i, t in raw_rows:
        assert out[i]["n_feat"] == 2 * len(t.split()) - 1


def test_dsir_feature_less_docs_null(spark):
    raw = spark.createDataFrame([(1, "some words here"), (2, "")], "doc_id long, text string")
    tgt = spark.createDataFrame([(9, "some words here")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           curation.dsir_logratio(raw, tgt, "doc_id", "text", buckets=64).collect()}
    assert out[2]["dsir_lr"] is None and out[2]["n_feat"] is None
    assert out[1]["dsir_lr"] is not None


def test_pack_sequences_matches_serial_reference(spark):
    import re

    rows = [(i, " ".join(f"tok{j}" for j in range(i % 37))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           curation.pack_sequences(df, "doc_id", "text", seq_len=64).collect()}

    tok_re = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+")
    run = 0
    for i, t in rows:
        n = len(tok_re.findall(t))
        r = out[i]
        assert r["n_tokens"] == n
        assert r["start_pos"] == run
        assert r["seq_id"] == run // 64 and r["seq_offset"] == run % 64
        want_span = 0 if n == 0 else (run + n - 1) // 64 - run // 64 + 1
        assert r["n_seqs"] == want_span
        run += n


def test_pack_sequences_partition_invariant(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(1 + i % 11))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, curation.pack_sequences(df, "doc_id", "text", 32, range_partitions=1).collect()))
    b = sorted(map(tuple, curation.pack_sequences(df, "doc_id", "text", 32, range_partitions=7).collect()))
    c = sorted(map(tuple, curation.pack_sequences(df, "doc_id", "text", 32, range_partitions=64).collect()))
    assert a == b == c


def test_new_datapipe_directives_run(spark, docs):
    out = Pipeline.compile("dedup-minhash-cluster :doc_id :text 0.5").apply(docs)
    assert set(out.columns) == {"doc_id", "component", "is_dup"}
    assert out.count() == docs.count()
    out = Pipeline.compile("dedup-substring :doc_id :text 8").apply(docs)
    assert {"n_covered", "dup_ratio", "text_deduped"} <= set(out.columns)
    out = Pipeline.compile("pack-sequences :doc_id :text 256").apply(docs)
    assert {"start_pos", "seq_id", "seq_offset", "n_seqs"} <= set(out.columns)


def test_url_canonicalize_rules(spark):
    rows = [
        (1, "https://WWW.Example.com:443/path/?b=2&utm_source=x&a=1#frag"),
        (2, "http://Tracker.org:80/a/b?z=9&fbclid=abc&gclid=q&y=8"),
        (3, "https://plain.net/static/img.png"),
        (4, "not a url at all"),
        (5, "https://dup.com/x?utm_campaign=only"),
        # port is stripped only when it matches the scheme's default:
        # https on :80 / http on :443 are DIFFERENT resources
        (6, "https://odd.io:80/x"),
        (7, "http://odd.io:443/x"),
        (8, "http://alt.example:8080/q"),
        # a valueless tracking param still tracks — dropped bare
        (9, "https://bare.com/p?fbclid&a=1"),
        # 'referrer' must NOT be eaten by the 'ref' rule
        (10, "https://keep.com/p?referrer=x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: (r["url_canonical"], r["url_host"]) for r in
           curation.url_canonicalize(df, "url").collect()}
    assert out[1] == ("https://example.com/path?a=1&b=2", "example.com")
    assert out[2] == ("http://tracker.org/a/b?y=8&z=9", "tracker.org")
    assert out[3] == ("https://plain.net/static/img.png", "plain.net")
    assert out[4] == ("not a url at all", None)
    assert out[5] == ("https://dup.com/x", "dup.com")
    assert out[6] == ("https://odd.io:80/x", "odd.io:80")
    assert out[7] == ("http://odd.io:443/x", "odd.io:443")
    assert out[8] == ("http://alt.example:8080/q", "alt.example:8080")
    assert out[9] == ("https://bare.com/p?a=1", "bare.com")
    assert out[10] == ("https://keep.com/p?referrer=x", "keep.com")
    # the canonical key actually dedups: same page under different
    # tracking params / host casing collapses
    pair = spark.createDataFrame(
        [(10, "https://www.A.com/p?utm_source=1&k=v"), (11, "https://a.com/p/?k=v&utm_source=2")],
        "doc_id long, url string",
    )
    keys = {r["url_canonical"] for r in curation.url_canonicalize(pair, "url").collect()}
    assert keys == {"https://a.com/p?k=v"}


def test_c4_quality_line_and_doc_rules(spark):
    from wrangler_spark.datapipe import text as dtext

    good = "This is a proper sentence with enough words here.\nAnother fine long sentence follows right after it!\nA third complete sentence closes out the document."
    rows = [
        (1, good),
        (2, "short line\nenable javascript to view this page now please.\nNo terminal punctuation on this long line here"),
        (3, "Lorem ipsum dolor sit amet consectetur adipiscing elit sed.\nA second proper sentence lives right here today.\nAnd a third one completes the minimum count now."),
        (4, "function f() { return 1; }\nThis sentence is fine and long enough to keep.\nSo is this second one with plenty of words.\nAnd a third keeps the count at three."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dtext.c4_quality(df, "text").collect()}
    # doc 1: every line kept, 3 sentences, passes
    assert out[1]["n_kept_lines"] == 3 and out[1]["c4_pass"] is True
    assert out[1]["text_clean"] == good
    # doc 2: short line (<5 words), javascript line, unterminated line all drop
    assert out[2]["n_kept_lines"] == 0 and out[2]["c4_pass"] is False
    # doc 3: lines are fine but 'lorem ipsum' flags the document
    assert out[3]["n_kept_lines"] == 3 and out[3]["has_lorem"] is True
    assert out[3]["c4_pass"] is False
    # doc 4: brace flags code
    assert out[4]["has_brace"] is True and out[4]["c4_pass"] is False


def test_perplexity_buckets_tertiles(spark):
    from wrangler_spark.datapipe import text as dtext

    rows = [(i, "en", float(i)) for i in range(1, 10)] + [(100, "en", None), (200, "fr", 5.0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, lp double")
    out = {r["doc_id"]: r["lp_bucket"] for r in
           dtext.perplexity_buckets(df, "lp", by_col="lang").collect()}
    # en group 1..9: tertile boundaries at 1/3 and 2/3 quantiles
    # (type-7: ~3.67 and ~6.33) -> 1-3 head, 4-6 middle, 7-9 tail
    assert [out[i] for i in range(1, 10)] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    assert out[100] is None            # null score -> null bucket
    assert out[200] == "head"          # singleton group: its own tertiles
    # global mode (no by_col)
    g = {r["doc_id"]: r["lp_bucket"] for r in
         dtext.perplexity_buckets(df, "lp").collect()}
    assert g[1] == "head" and g[9] == "tail" and g[100] is None


def test_mixture_sample_temperature(spark):
    big = [(i, "web") for i in range(200)]
    small = [(1000 + i, "books") for i in range(20)]
    df = spark.createDataFrame(big + small, "doc_id long, source string")
    # tau=0: flat mixture -> big domain rate (200/20)^-1 = 0.1, small anchors at 1.0
    out = curation.mixture_sample(df, "doc_id", "source", temperature=0.0)
    rows = out.collect()
    rates = {r["source"]: r["sample_rate"] for r in rows}
    assert rates["books"] == 1.0 and abs(rates["web"] - 0.1) < 1e-9
    kept_small = sum(1 for r in rows if r["source"] == "books")
    kept_big = sum(1 for r in rows if r["source"] == "web")
    assert kept_small == 20                       # anchor domain untouched
    assert 5 <= kept_big <= 40                    # ~20 expected, hash-gated
    # deterministic: same rows on re-run
    again = curation.mixture_sample(df, "doc_id", "source", temperature=0.0)
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in again.collect())
    # tau=1: identity
    assert curation.mixture_sample(df, "doc_id", "source", temperature=1.0).count() == 220
    # tau outside [0, 1] is rejected (would silently no-op)
    import pytest as _pt
    with _pt.raises(ValueError, match="temperature"):
        curation.mixture_sample(df, "doc_id", "source", temperature=1.5)


def test_quality_classifier_learns_separation(spark):
    cooking = [
        "whisk the eggs with butter and fold in the flour gently",
        "simmer the onions in olive oil until golden and fragrant",
        "knead the dough and let it rest before baking the bread",
        "roast the garlic and toss with pasta and fresh basil",
    ]
    legal = [
        "the party of the first part hereby waives all claims",
        "pursuant to the agreement the licensee shall indemnify the licensor",
        "the undersigned agrees to the terms and conditions herein",
        "this contract shall be governed by the laws of the state",
    ]
    pos = spark.createDataFrame(list(enumerate(cooking)), "doc_id long, text string")
    neg = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(legal)], "doc_id long, text string"
    )
    w = curation.train_quality_classifier(pos, neg, "doc_id", "text", buckets=256, iters=5)
    out = {r["doc_id"]: r["clf_score"] for r in curation.quality_classifier_score(
        pos.unionByName(neg), w, "doc_id", "text", 256).collect()}
    assert min(out[i] for i in range(4)) > max(out[100 + i] for i in range(4))
    # held-out docs from each register score on the right side of 0.5
    held = spark.createDataFrame(
        [(900, "saute the mushrooms in butter with fresh thyme and serve"),
         (901, "the licensor shall retain all right title and interest herein")],
        "doc_id long, text string",
    )
    ho = {r["doc_id"]: r["clf_score"] for r in curation.quality_classifier_score(
        held, w, "doc_id", "text", 256).collect()}
    assert ho[900] > 0.5 > ho[901]


def test_quality_classifier_empty_doc_bias_only(spark):
    pos = spark.createDataFrame([(1, "good words here")], "doc_id long, text string")
    neg = spark.createDataFrame([(2, "bad words there"), (3, "")], "doc_id long, text string")
    # the empty doc contributes no features and is EXCLUDED from training
    w = curation.train_quality_classifier(pos, neg, "doc_id", "text", buckets=64, iters=2)
    # ...but still scores (bias only) instead of dropping out
    out = {r["doc_id"]: r["clf_score"] for r in curation.quality_classifier_score(
        neg, w, "doc_id", "text", 64).collect()}
    assert out[3] is not None and 0.0 <= out[3] <= 1.0


def test_train_and_score_matches_separate_path(spark):
    """The r13 fused train_and_score (one feature build) must be
    byte-identical to train(pos, neg) + score(all) — including a
    feature-less doc, which trains nowhere but scores sigmoid(bias)."""
    rows = [
        (1, "whisk the eggs with butter and fold in the flour"),
        (2, "simmer the onions in olive oil until golden"),
        (3, "the party of the first part hereby waives all claims"),
        (4, "pursuant to the agreement the licensee shall indemnify"),
        (5, ""),  # feature-less: excluded from training, bias-only score
        (6, "knead the dough and let it rest before baking"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lab", (F.col("doc_id") % 2 == 0).cast("int")
    )
    pos = d.filter(F.col("lab") == 1)
    neg = d.filter(F.col("lab") == 0)
    w = curation.train_quality_classifier(pos, neg, "doc_id", "text", buckets=128, iters=3)
    sep = {r["doc_id"]: r["clf_score"] for r in curation.quality_classifier_score(
        d, w, "doc_id", "text", 128).collect()}
    fused = {r["doc_id"]: r["clf_score"] for r in
             curation.train_and_score_quality_classifier(
                 d, "doc_id", "text", "lab", buckets=128, iters=3).collect()}
    assert fused == sep
    assert fused[5] is not None  # the empty doc still scores (bias row)


def test_round7_directive_wrappers(spark, docs):
    """Recipe-surface parity for the library ops added in rounds 6-7:
    every single-frame datapipe op is reachable from a recipe."""
    out = Pipeline.compile(
        "langid-multi :text\nscript-ratios :text\nc4-quality :text"
    ).apply(docs)
    assert {"lang_pred", "lang_score", "script_latin", "c4_pass"} <= set(out.columns)
    assert out.count() == docs.count()
    sh = Pipeline.compile("dedup-simhash :doc_id :text 16").apply(docs)
    assert "simhash" in sh.columns
    ng = Pipeline.compile("dedup-ngram :doc_id :text 3 0.5 'word'").apply(docs)
    assert set(ng.columns) == {"id_a", "id_b", "jaccard"} and ng.count() > 0
    u = docs.selectExpr("doc_id", "'https://WWW.D.com:443/p/?gclid=1&z=2#f' AS link")
    cu = Pipeline.compile("url-canonicalize :link").apply(u)
    assert cu.select("link_canonical").first()[0] == "https://d.com/p?z=2"


def test_chunk_documents_coverage_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(1, 21))  # 20 words
    df = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, ""), (4, None)], "doc_id long, text string"
    )
    out = curation.chunk_documents(df, "doc_id", "text", chunk_words=8, overlap=2)
    rows = sorted(out.collect(), key=lambda r: (r["doc_id"], r["chunk_id"]))
    d1 = [r for r in rows if r["doc_id"] == 1]
    # stride 6: starts 1, 7, 13 — tail chunk covers w13..w20
    assert [r["chunk_start"] for r in d1] == [1, 7, 13]
    assert d1[0]["chunk_text"].startswith("w1 ") and d1[-1]["chunk_text"].endswith("w20")
    assert d1[-1]["n_chunk_words"] == 8
    # consecutive chunks share exactly `overlap` words
    a, b = d1[0]["chunk_text"].split(), d1[1]["chunk_text"].split()
    assert a[-2:] == b[:2]
    # every word appears in some chunk (full coverage)
    covered = {w for r in d1 for w in r["chunk_text"].split()}
    assert covered == set(words.split())
    # sub-window doc -> one chunk; empty/null -> zero rows
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "short doc"
    assert not [r for r in rows if r["doc_id"] in (3, 4)]
    # chunking then re-joining a no-overlap split reconstructs the doc
    nj = curation.chunk_documents(df.filter("doc_id = 1"), "doc_id", "text", 8, 0)
    rebuilt = " ".join(r["chunk_text"] for r in sorted(nj.collect(), key=lambda r: r["chunk_id"]))
    assert rebuilt == words


def test_chunk_docs_directive(spark, docs):
    out = Pipeline.compile("chunk-docs :doc_id :text 64 8").apply(docs)
    assert set(out.columns) == {"doc_id", "chunk_id", "chunk_start", "chunk_text", "n_chunk_words"}
    assert out.count() >= docs.count()


def test_mixture_plan_and_budget_sampling(spark):
    rows = ([(i, "w " * 100, "big") for i in range(100)]          # 10k tokens avail
            + [(1000 + i, "w " * 100, "small") for i in range(10)]  # 1k tokens avail
            + [(2000, "w " * 100, "other")])                        # unweighted
    df = spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "n_tokens", F.lit(100).cast("long")
    )
    plan = {r["domain"]: r for r in curation.mixture_plan(
        df, "source", "n_tokens", {"big": 0.5, "small": 0.5}, budget=2000).collect()}
    # shares renormalize over the named domains; 'other' gets 0
    assert plan["big"]["target_share"] == 0.5 and plan["other"]["target_share"] == 0.0
    # big: want 1000 of 10000 -> rate 0.1; small: want 1000 of 1000 -> rate 1, no shortfall
    assert abs(plan["big"]["sample_rate"] - 0.1) < 1e-9 and plan["big"]["shortfall"] == 0
    assert plan["small"]["sample_rate"] == 1.0 and plan["small"]["shortfall"] == 0
    # a domain that cannot fill its share reports the shortfall
    plan2 = {r["domain"]: r for r in curation.mixture_plan(
        df, "source", "n_tokens", {"small": 1.0}, budget=5000).collect()}
    assert plan2["small"]["sample_rate"] == 1.0 and plan2["small"]["shortfall"] == 4000
    # applying the plan: small kept whole, big downsampled toward its want,
    # unweighted domain dropped entirely; deterministic across runs
    kept = curation.sample_to_budget(df, "doc_id", "source", "n_tokens",
                                     {"big": 0.5, "small": 0.5}, 2000)
    by = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by.get("small") == 10 and "other" not in by
    assert 2 <= by.get("big", 0) <= 25  # ~10 expected at rate 0.1
    again = curation.sample_to_budget(df, "doc_id", "source", "n_tokens",
                                      {"big": 0.5, "small": 0.5}, 2000)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(r["doc_id"] for r in again.collect())


def test_full_curation_pipeline_end_to_end(spark):
    """The complete curation chain on real corpus data, library-level:
    quality rules -> near-dup clusters -> quality-aware survivors ->
    per-domain cap -> leakage-free split -> shard layout. Every stage is
    an operator graded elsewhere; this drives them COMPOSED, the way a
    production pipeline runs them."""
    from pyspark.sql import functions as F

    from wrangler_spark.datapipe import curation, dedup, text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = docs.count()

    scored = text.gopher_quality(text.c4_quality(docs, "text"), "text")
    kept = scored.filter(F.col("c4_pass") | F.col("gopher_pass"))

    comp = dedup.minhash_components(kept, "doc_id", "text", 0.5)
    surv = dedup.cluster_survivors(comp, kept, "doc_id", "component", "n_chars")
    deduped = kept.join(surv.filter("keep").select("doc_id"), "doc_id")

    capped_ids = curation.cap_per_group(deduped, "source", "doc_id", 50, "n_chars")
    capped = deduped.join(capped_ids.select("doc_id"), "doc_id")

    split = curation.split_by_cluster(comp, 0.1, salt="e2e")
    final = capped.join(split.select("doc_id", "split"), "doc_id")
    final = curation.shuffle_shards(final, "doc_id", 4, "ep0")

    n_train = final.filter("split = 'train'").count()
    n_test = final.filter("split = 'test'").count()
    assert 0 < n_test < n_train and n_train + n_test <= n0
    # no near-dup cluster straddles the split
    leak = (
        final.join(comp.select("doc_id", "component"), "doc_id")
        .groupBy("component").agg(F.countDistinct("split").alias("sides"))
        .filter(F.col("sides") > 1).count()
    )
    assert leak == 0
    # every shard present, deterministic replay
    assert final.select("shard").distinct().count() == 4
