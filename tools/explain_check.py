"""Plan-quality gate: assert the physical plans have the shape we want at
scale — filters pushed to the parquet scan, lookups broadcast, no Python
UDFs outside the explicitly-UDF directives, codegen spans present.

Usage: python tools/explain_check.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name: str, plan: str, must: list[str] = (), must_not: list[str] = ()) -> list[str]:
    problems = []
    for s in must:
        if s.lower() not in plan.lower():
            problems.append(f"{name}: expected {s!r} in plan")
    for s in must_not:
        if s.lower() in plan.lower():
            problems.append(f"{name}: found forbidden {s!r} in plan")
    return problems


def main() -> int:
    import __spark_entry__ as e
    from wrangler_spark import Pipeline, get_spark

    spark = get_spark("explain_check", cpus=8)
    qs = e.queries()
    problems: list[str] = []

    # 1. filter-row compiles to a scan-pushed filter (predicate pushdown)
    p = plan_of(qs["filter_row_expr"](spark, SF_DIR))
    problems += check("filter_row_expr", p, must=["PushedFilters: [", "codegen id"], must_not=["BatchEvalPython", "ArrowEvalPython"])
    if "PushedFilters: []" in p:
        problems.append("filter_row_expr: PushedFilters is EMPTY — predicate not reaching the scan")

    # 2. keep-only projection prunes the parquet read schema
    pr = Pipeline.compile("keep :l_orderkey,:l_quantity").apply(
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    )
    p = plan_of(pr)
    problems += check("column_pruning", p, must=["ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"])

    # 3. table-lookup is a broadcast join (fact side must not shuffle)
    p = plan_of(qs["table_lookup"](spark, SF_DIR))
    problems += check("table_lookup", p, must=["BroadcastHashJoin"], must_not=["SortMergeJoin"])

    # 4. ANN top-k broadcasts the query side AND ranks via two-phase
    # partial aggregation — a Window here would mean all N×Q scored rows
    # funnel through Q reducers (the 100×-corpus scale-killer)
    for ann in ("ann_cosine_topk", "ann_ivf_topk", "ann_ivf_kmeans_topk"):
        p = plan_of(qs[ann](spark, SF_DIR))
        problems += check(ann, p, must=["Broadcast"], must_not=["Window"])

    # 5. the cleanse recipe stays fully native (no Python in the hot path)
    # AND parses each row exactly once: without the parsers._pin_expensive
    # guard, predicate pushdown substitutes the whole from_csv into the
    # filter condition and every row is parsed twice. The repartition that
    # spreads the parse makes AQE hide codegen annotations in the
    # *unexecuted* formatted plan, so run it and read the final plan.
    df = qs["cleanse_recipe"](spark, SF_DIR)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    # codegen spans render as "*(n)" in the executed simple plan string
    problems += check("cleanse_recipe", p, must=["*("], must_not=["BatchEvalPython", "ArrowEvalPython"])
    n_parses = df._jdf.queryExecution().optimizedPlan().toString().count("from_csv")
    if n_parses != 1:
        problems.append(f"cleanse_recipe: from_csv appears {n_parses}x in the optimized plan (want 1 — pushdown duplication)")

    # 6. every oracled single-table transform query is UDF-free
    udf_expected = {"mask_shuffle", "multimodal_features", "text_nfc"}
    for name in (
        "uppercase", "expression_el", "dq_checks", "text_quality", "text_fingerprint",
        "dedup_simhash", "pii_redact", "text_gopher_quality", "sample_by_quality",
    ):
        p = plan_of(qs[name](spark, SF_DIR))
        problems += check(name, p, must_not=["BatchEvalPython", "ArrowEvalPython"])

    # 7. decontaminate: the benchmark gram set is broadcast; the corpus
    # side must never sort-merge
    p = plan_of(qs["decontaminate"](spark, SF_DIR))
    problems += check("decontaminate", p, must=["BroadcastHashJoin"], must_not=["SortMergeJoin"])

    # 8. asof-join compiles to the single-sort window plan, not a range
    # join (no cross/nested-loop join may appear)
    p = plan_of(qs["ext_asof_join"](spark, SF_DIR))
    problems += check(
        "ext_asof_join", p, must=["Window"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # 9. paragraph dedup: window + hash aggregate, no self-join
    p = plan_of(qs["dedup_paragraphs"](spark, SF_DIR))
    problems += check(
        "dedup_paragraphs", p, must=["Window"],
        must_not=["SortMergeJoin", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 10. multi-probe IVF obeys the same no-Window ANN discipline as the
    # other three ANN paths
    p = plan_of(qs["ann_ivf_probe_topk"](spark, SF_DIR))
    problems += check("ann_ivf_probe_topk", p, must=["Broadcast"], must_not=["Window"])

    # 11. substring-span dedup is all native (explode + hash agg +
    # equi-join inverted index): no Python, no window, no nested-loop —
    # and the against-benchmark variant shares the same contract
    for nm in ("dedup_substring", "decontam_spans"):
        p = plan_of(qs[nm](spark, SF_DIR))
        problems += check(
            nm, p,
            must_not=["BatchEvalPython", "ArrowEvalPython", "Window", "CartesianProduct"],
        )

    # 12. DSIR scoring join broadcasts the bucket weight table (≤ B rows);
    # the corpus side must never sort-merge against it
    p = plan_of(qs["text_dsir"](spark, SF_DIR))
    problems += check(
        "text_dsir", p, must=["BroadcastHashJoin"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
    )

    # 13. BM25: query terms and the df table broadcast; the corpus-side
    # dl join is the only wide join and must be an equi-join (no cartesian)
    p = plan_of(qs["text_bm25"](spark, SF_DIR))
    problems += check(
        "text_bm25", p, must=["BroadcastHashJoin"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
    )

    # 14. multi-language LID is scan-side only: no shuffle, no Python,
    # no window — the whole argmax lives in one projection
    p = plan_of(qs["text_langid_multi"](spark, SF_DIR))
    problems += check(
        "text_langid_multi", p,
        must_not=["Exchange", "Window", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 15. C4 quality is scan-side only (the gopher_quality plan family):
    # no shuffle, no Python, no window
    p = plan_of(qs["text_c4_quality"](spark, SF_DIR))
    problems += check(
        "text_c4_quality", p,
        must_not=["Exchange", "Window", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 16. mixture sampling: the rate table broadcasts back; the corpus
    # must not shuffle or sort-merge for the gate
    p = plan_of(qs["sample_mixture"](spark, SF_DIR))
    problems += check(
        "sample_mixture", p, must=["BroadcastHashJoin"],
        must_not=["SortMergeJoin", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 17. perplexity buckets: the per-group boundary table broadcasts
    # (a SortMergeJoin is allowed ONLY for unigram_logprob's lp-attach —
    # that join is corpus×corpus by design; the two-double boundary
    # table must never be the SMJ side)
    p = plan_of(qs["text_lp_buckets"](spark, SF_DIR))
    problems += check(
        "text_lp_buckets", p, must=["BroadcastHashJoin"],
        must_not=["CartesianProduct"],
    )

    # 18. the hash-space ngram prefix join is still an equi-join on int
    # keys (no cartesian, no Python) for BOTH gram units
    for name in ("dedup_ngram_jaccard", "dedup_ngram_word"):
        p = plan_of(qs[name](spark, SF_DIR))
        problems += check(
            name, p,
            must_not=["CartesianProduct", "BroadcastNestedLoopJoin",
                      "BatchEvalPython", "ArrowEvalPython"],
        )

    # 19. classifier scoring: weight table broadcast, never cartesian,
    # no Python anywhere in train+score
    p = plan_of(qs["text_clf_score"](spark, SF_DIR))
    problems += check(
        "text_clf_score", p, must=["BroadcastHashJoin"],
        must_not=["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 20. chunking is a pure scan-side generator: zero shuffle
    p = plan_of(qs["text_chunk"](spark, SF_DIR))
    problems += check(
        "text_chunk", p,
        must_not=["Exchange", "Window", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 21. bigram LM: the unigram vocab broadcasts; the corpus-sized
    # bigram join may SMJ (it grows with the corpus, by design) but
    # nothing may go cartesian or through Python
    p = plan_of(qs["text_bigram_lp"](spark, SF_DIR))
    problems += check(
        "text_bigram_lp", p, must=["BroadcastHashJoin"],
        must_not=["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 22. JL projection + int8 quantize are pure scan-side transforms:
    # zero shuffle, no Window, no Python
    for name in ("emb_project", "emb_quantize"):
        p = plan_of(qs[name](spark, SF_DIR))
        problems += check(
            name, p,
            must_not=["Exchange", "Window", "BatchEvalPython", "ArrowEvalPython"],
        )

    # 23. survivor selection: argmax is a hash aggregate (never a rank
    # window), winners join back without a cartesian
    p = plan_of(qs["dedup_survivors"](spark, SF_DIR))
    problems += check(
        "dedup_survivors", p, must=["HashAggregate"],
        must_not=["Window", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 24. pair_eval: pair frames meet in an equi-join (full outer on the
    # pair key), single global aggregate — no window, no cartesian
    p = plan_of(qs["dedup_lsh_eval"](spark, SF_DIR))
    problems += check(
        "dedup_lsh_eval", p,
        must_not=["Window", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 25b. winnowing fingerprints: pure scan-side lambda chain — zero
    # shuffle, no Python (the lambda-binding shape that keeps the
    # split/md5 chain out of the window fold)
    p = plan_of(qs["text_winnow"](spark, SF_DIR))
    problems += check(
        "text_winnow", p,
        must_not=["Exchange", "Window", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 25g. entity matching: candidates come from the block aggregate's
    # native pair expansion + equi-joins — no cartesian, no Python,
    # levenshtein stays JVM-side
    p = plan_of(qs["entity_match"](spark, SF_DIR))
    problems += check(
        "entity_match", p,
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # 25e. shard shuffle + corpus report: scan-side / single-aggregate —
    # no window, no Python
    for name in ("shuffle_shards", "corpus_report"):
        p = plan_of(qs[name](spark, SF_DIR))
        problems += check(
            name, p,
            must_not=["Window", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
        )

    # 25f. MMR: the ONLY Python in the plan is the sanctioned grouped
    # Arrow op (FlatMapGroupsInPandas); candidates join vectors via an
    # equi-join, never cartesian
    p = plan_of(qs["ann_mmr_rerank"](spark, SF_DIR))
    problems += check(
        "ann_mmr_rerank", p, must=["FlatMapGroupsInPandas"],
        must_not=["CartesianProduct", "BatchEvalPython"],
    )

    # 25d. keyword tagging: dictionary slices broadcast, corpus never
    # shuffles before the per-doc count aggregate
    p = plan_of(qs["keyword_tag"](spark, SF_DIR))
    problems += check(
        "keyword_tag", p, must=["BroadcastHashJoin"],
        must_not=["CartesianProduct", "SortMergeJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # 25c. winnow overlap: fingerprint inverted-index equi-join — no
    # cartesian, no Python
    p = plan_of(qs["text_winnow_overlap"](spark, SF_DIR))
    problems += check(
        "text_winnow_overlap", p,
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # 25a. per-domain cap: two-phase slice aggregates, NEVER a rank
    # window (the hot-domain skew this op exists to fight)
    p = plan_of(qs["sample_domain_cap"](spark, SF_DIR))
    problems += check(
        "sample_domain_cap", p, must=["HashAggregate"],
        must_not=["Window", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 25. cross-corpus dedup: key/band equi-joins only — no cartesian,
    # no window, no Python
    for name in ("dedup_cross_exact", "dedup_cross_minhash"):
        p = plan_of(qs[name](spark, SF_DIR))
        problems += check(
            name, p,
            must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "Window",
                      "BatchEvalPython", "ArrowEvalPython"],
        )

    # 26. round-8 ops.
    # entity_match_against / dedup_overlap: equi-joins + hash aggregates
    # only — no cartesian, no Python, no rank window
    for name in ("entity_match_against", "dedup_overlap"):
        p = plan_of(qs[name](spark, SF_DIR))
        problems += check(
            name, p,
            must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "Window",
                      "BatchEvalPython", "ArrowEvalPython"],
        )
    # winnow_overlap's shared fingerprint subtree is checkpointed: the
    # EXECUTED plan must read cached blocks, never re-scan parquet
    # (r7 measured 4 FileScans / 0 ReusedExchange without it)
    df = qs["text_winnow_overlap"](spark, SF_DIR)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    if "FileScan" in p:
        problems.append(
            "text_winnow_overlap: executed plan re-scans parquet — the "
            "fps checkpoint is not being hit"
        )
    # dedup_cross_embedding's OLD side is checkpointed once (it feeds the
    # bucket aggregate AND the vector verification): the executed plan
    # may scan the embeddings parquet only for the NEW side — exactly one
    # FileScan of the source
    df = qs["dedup_cross_embedding"](spark, SF_DIR)
    df.collect()
    # AQE's toString appends the pre-adaptive plan after an
    # "== Initial Plan ==" marker — count scans in the FINAL plan only
    p = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    n_scans = p.count("FileScan")
    if n_scans > 1:
        problems.append(
            f"dedup_cross_embedding: executed plan has {n_scans} FileScans — "
            "the old-side signature checkpoint is not being hit (only the "
            "NEW side may scan the source)"
        )
    # quantile bins / MAD outliers: broadcast-scalar shape — the corpus
    # side must never sort-merge against the 1-row stats frame
    for name in ("num_qbins", "num_mad"):
        p = plan_of(qs[name](spark, SF_DIR))
        problems += check(
            name, p,
            must_not=["SortMergeJoin", "Window", "CartesianProduct",
                      "BatchEvalPython", "ArrowEvalPython"],
        )
    # char entropy: two hash aggregates + id join — no window, no Python
    p = plan_of(qs["text_entropy"](spark, SF_DIR))
    problems += check(
        "text_entropy", p, must=["HashAggregate"],
        must_not=["Window", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    )
    # top-ngrams: distributed TakeOrdered, never a global Sort+Window
    p = plan_of(qs["text_top_ngrams"](spark, SF_DIR))
    problems += check(
        "text_top_ngrams", p, must=["TakeOrderedAndProject"],
        must_not=["Window", "BatchEvalPython", "ArrowEvalPython"],
    )
    # drift: reference boundaries broadcast; per-side bin counts are
    # hash aggregates; the n-row outer join may be any join shape
    p = plan_of(qs["corpus_drift"](spark, SF_DIR))
    problems += check(
        "corpus_drift", p, must=["HashAggregate"],
        must_not=["Window", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 27. PQ / IVF-PQ ANN: ADC tables broadcast against the code scan;
    # no Python, no rank window anywhere in train+encode+score (pq_topk's
    # table crossJoin is the sanctioned broadcast-1-row-per-query shape)
    for name in ("ann_pq_topk", "ann_ivf_pq_topk"):
        p = plan_of(qs[name](spark, SF_DIR))
        problems += check(
            name, p, must=["Broadcast"],
            must_not=["Window", "BatchEvalPython", "ArrowEvalPython"],
        )
    # embedding outliers: broadcast assignment + <=n_clusters threshold
    # rows joined back broadcast — never a window or a corpus sort-merge
    p = plan_of(qs["emb_outliers"](spark, SF_DIR))
    problems += check(
        "emb_outliers", p, must=["HashAggregate"],
        must_not=["Window", "SortMergeJoin", "BatchEvalPython", "ArrowEvalPython"],
    )
    # Bloom-prefiltered cross-corpus dedup: the probe is pure JVM
    # broadcast joins; the only sort-merge allowed is the verification
    # equi-join over bloom-positive candidates
    p = plan_of(qs["dedup_cross_bloom"](spark, SF_DIR))
    problems += check(
        "dedup_cross_bloom", p, must=["BroadcastHashJoin"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "Window",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # 28. events analytics: both checkpoint their k-row/cohort-row summary
    # (shared shuffle-bearing branch rule), so the RETURNED plan reads the
    # checkpoint — zero parquet scans, no window, no Python; funnel's
    # 1-row denominator crossJoin is the sanctioned broadcast shape and
    # retention's size join-back must be a broadcast hash join
    p = plan_of(qs["events_funnel"](spark, SF_DIR))
    problems += check(
        "events_funnel", p,
        must_not=["FileScan", "Window", "BatchEvalPython", "ArrowEvalPython"],
    )
    p = plan_of(qs["events_retention"](spark, SF_DIR))
    problems += check(
        "events_retention", p, must=["BroadcastHashJoin"],
        must_not=["FileScan", "Window", "CartesianProduct",
                  "BatchEvalPython", "ArrowEvalPython"],
    )
    # transitions: the |types|^2 pair table is checkpointed (no re-scan)
    # and the row-normalizer joins back broadcast; the per-user lead
    # window is the sanctioned sequential use, executed before the cut
    p = plan_of(qs["events_transitions"](spark, SF_DIR))
    problems += check(
        "events_transitions", p, must=["BroadcastHashJoin"],
        must_not=["FileScan", "CartesianProduct",
                  "BatchEvalPython", "ArrowEvalPython"],
    )
    # paths: top-k is a distributed TakeOrdered, never a rank window
    # over the corpus (the only Window is the per-user max_len trim)
    p = plan_of(qs["events_paths"](spark, SF_DIR))
    problems += check(
        "events_paths", p, must=["TakeOrderedAndProject"],
        must_not=["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    )

    # 29. strip_boilerplate: frequency filter + reassembly are hash
    # aggregates + one equi-join on the md5 key — no window (a hot
    # boilerplate line must never become a hot sort partition), no Python
    p = plan_of(qs["strip_boilerplate"](spark, SF_DIR))
    problems += check(
        "strip_boilerplate", p, must=["HashAggregate"],
        must_not=["Window", "CartesianProduct", "BroadcastNestedLoopJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # 30. cross-corpus embedding dedup: signature-bucket equi-join +
    # candidates-only cosine verify — no window, no nested loop, no Python
    p = plan_of(qs["dedup_cross_embedding"](spark, SF_DIR))
    problems += check(
        "dedup_cross_embedding", p,
        must_not=["Window", "CartesianProduct", "BroadcastNestedLoopJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # 31. round-9 plan fixes.
    # vocab_coverage: the shared word-count aggregate is checkpointed —
    # the RETURNED (lazy) plan reads the checkpoint, so exactly zero
    # parquet scans and no window appear (r8 measured 3 corpus
    # scans + 2 plan-build-time collects without this); the stats
    # join-back is the sanctioned broadcast-1-row crossJoin
    p = plan_of(qs["text_vocab"](spark, SF_DIR))
    problems += check(
        "text_vocab", p,
        must_not=["FileScan", "Window", "SortMergeJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )
    # vocabulary: top-k is a distributed TakeOrdered over the token
    # aggregate, never a global rank window (a web-scale raw vocabulary
    # is 10^8+ rows — one sort task otherwise)
    p = plan_of(qs["text_vocabulary"](spark, SF_DIR))
    problems += check(
        "text_vocabulary", p, must=["TakeOrderedAndProject"],
        must_not=["Window", "BatchEvalPython", "ArrowEvalPython"],
    )

    # ngram repetition: the statistic is per-document, so the r10 shape
    # computes it entirely scan-side (array_sort + run-length fold per
    # n) — ZERO Exchange: the r9 shape shuffled raw gram strings, ~50x
    # the corpus text bytes through one exchange at 100 TB
    p = plan_of(qs["text_ngram_rep"](spark, SF_DIR))
    problems += check(
        "text_ngram_rep", p,
        must_not=["Exchange", "Window", "CartesianProduct",
                  "BatchEvalPython", "ArrowEvalPython"],
    )
    # oov rate: the vocabulary side broadcasts; the token explode joins
    # it without a corpus sort-merge or a window
    p = plan_of(qs["text_oov"](spark, SF_DIR))
    problems += check(
        "text_oov", p, must=["BroadcastHashJoin"],
        must_not=["Window", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    )
    # per-group top terms: the two-phase per-group slice — never a rank
    # window over the (groups x vocabulary) table
    p = plan_of(qs["text_group_terms"](spark, SF_DIR))
    problems += check(
        "text_group_terms", p, must=["HashAggregate"],
        must_not=["Window", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    )
    # repetition filter: both signal families (line ratios + n-gram
    # fracs) are scan-side per-row expressions — the whole filter is
    # ZERO Exchange (see text_ngram_rep)
    p = plan_of(qs["text_rep_filter"](spark, SF_DIR))
    problems += check(
        "text_rep_filter", p,
        must_not=["Exchange", "Window", "CartesianProduct",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # weighted group terms: marginals ride a term-keyed join + broadcast
    # group/total frames; the top-k stays the two-phase slice — no rank
    # window, no sort-merge join, no Python
    p = plan_of(qs["text_group_terms_weighted"](spark, SF_DIR))
    problems += check(
        "text_group_terms_weighted", p, must=["HashAggregate"],
        must_not=["Window", "SortMergeJoin", "BatchEvalPython", "ArrowEvalPython"],
    )
    # token-budget sampling: the only Window nodes are the two-phase
    # scan's partition-local and P*G-offset windows (both bounded) — no
    # Python, no cartesian; the final budget filter is scan-side
    p = plan_of(qs["sample_token_budget_by"](spark, SF_DIR))
    problems += check(
        "sample_token_budget_by", p,
        must_not=["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    )

    # rolling active users: collapsed (user, day) pairs explode to
    # contribution days and hash-aggregate — never a sliding window over
    # users, never a per-day self-join of the event log; the pair
    # subtree is checkpointed (it feeds bounds AND the explode), so the
    # RETURNED plan reads the checkpoint — zero parquet scans
    p = plan_of(qs["events_active_users"](spark, SF_DIR))
    problems += check(
        "events_active_users", p, must=["HashAggregate"],
        must_not=["FileScan", "Window", "CartesianProduct", "SortMergeJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # round 11 — graph family: the returned plan reads the final ranks/
    # labels checkpoint (iterations already executed), so the residual
    # plan must be trivially scan-free and Python-free; the iteration
    # plans themselves are join+hash-aggregate by construction
    for gq in ("events_pagerank", "events_communities"):
        p = plan_of(qs[gq](spark, SF_DIR))
        problems += check(
            gq, p,
            must_not=["FileScan", "CartesianProduct",
                      "BatchEvalPython", "ArrowEvalPython"],
        )

    # quantile sketch: one hash aggregate to the 1-row bin array, the
    # nearest-rank pick is a scan-side fold — NO window ever (this is
    # the whole point vs a naive cumulative-window selection), the only
    # nested-loop join is the sanctioned 1-row stats broadcast
    p = plan_of(qs["num_quantiles_sketch"](spark, SF_DIR))
    problems += check(
        "num_quantiles_sketch", p, must=["HashAggregate"],
        must_not=["Window", "CartesianProduct", "SortMergeJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # round 11 session 2 — quality gate: the whole rule list is ONE
    # aggregation job (conditional sums; the unique rule's distinct adds
    # an Expand, never a second scan), report exploded from 1 row
    p = plan_of(qs["dq_constraints"](spark, SF_DIR))
    problems += check(
        "dq_constraints", p, must=["HashAggregate"],
        must_not=["Window", "CartesianProduct",
                  "BatchEvalPython", "ArrowEvalPython"],
    )
    import re as _re

    n_scans = len(_re.findall(r"^\(\d+\) Scan parquet", p, _re.M))
    if n_scans > 1:
        problems.append(f"dq_constraints: {n_scans} scans (must be 1)")

    # resample: the per-key cell aggregate is checkpointed (the guard's
    # collect already executed it — shared-shuffle-branch rule), so the
    # returned plan is a scan-free fold+explode; rolling adds its own
    # hash aggregate over the grid. No window functions anywhere.
    p = plan_of(qs["events_resample"](spark, SF_DIR))
    problems += check(
        "events_resample", p,
        must_not=["FileScan", "Window", "CartesianProduct",
                  "BatchEvalPython", "ArrowEvalPython"],
    )
    # rolling's own hash aggregate now executes during the max_cells
    # pre-flight (guard collect + checkpoint — the resample rule), so
    # the returned plan is a scan-free transform+explode like resample
    p = plan_of(qs["events_rolling"](spark, SF_DIR))
    problems += check(
        "events_rolling", p,
        must_not=["FileScan", "Window", "CartesianProduct",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # session-2 fold family: cusum/survival run their recursions as
    # scan-side folds — no Window, no Python, no cartesian anywhere;
    # js drift is two bounded hash aggregates + a broadcast total
    for gq in ("events_cusum", "events_survival", "text_js_drift",
               "events_seasonality"):
        p = plan_of(qs[gq](spark, SF_DIR))
        problems += check(
            gq, p,
            must_not=["Window", "CartesianProduct",
                      "BatchEvalPython", "ArrowEvalPython"],
        )

    # count-min estimate: the depth x width sketch side BROADCASTS; the
    # probe side never sort-merge-joins
    p = plan_of(qs["events_cms_counts"](spark, SF_DIR))
    problems += check(
        "events_cms_counts", p,
        must=["HashAggregate", "BroadcastHashJoin"],
        must_not=["Window", "CartesianProduct", "SortMergeJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # r12 session 2: the chunker is pure map-side — NO exchange at all;
    # ewma is the cusum fold shape; triangles/khop iterate bounded
    # joins with no cartesian and no windows
    p = plan_of(qs["text_chunk"](spark, SF_DIR))
    problems += check(
        "text_chunk", p,
        must=["codegen id"],
        must_not=["Exchange", "Window", "CartesianProduct",
                  "BatchEvalPython", "ArrowEvalPython"],
    )
    for gq in ("events_ewma", "dedup_triangles", "dedup_khop",
               "text_clf_calibration", "events_hits", "text_code_signals",
               "dq_suggest_shapes"):
        p = plan_of(qs[gq](spark, SF_DIR))
        problems += check(
            gq, p,
            must_not=["Window", "CartesianProduct",
                      "BatchEvalPython", "ArrowEvalPython"],
        )

    # r12 session 3: SRM is one countDistinct aggregate + arm-sized
    # broadcasts (the crossJoins carry 1-row frames — the sanctioned
    # shape); CUPED is ONE conditional-moment scan into a 1-row result
    # with no join at all
    p = plan_of(qs["events_srm"](spark, SF_DIR))
    problems += check(
        "events_srm", p,
        must=["HashAggregate", "BroadcastNestedLoopJoin"],
        must_not=["Window", "SortMergeJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )
    # acf/holt: the guarded-fold time-series shape (one per-key hash
    # aggregate, scan-side folds, no windows)
    for gq in ("events_acf", "events_holt"):
        p = plan_of(qs[gq](spark, SF_DIR))
        problems += check(
            gq, p,
            must_not=["Window", "CartesianProduct",
                      "BatchEvalPython", "ArrowEvalPython"],
        )

    # mann-whitney/benford: one histogram-sized hash aggregate + folds;
    # no rank window over the corpus, no python
    # sssp: the khop iteration shape — bounded joins, no cartesian,
    # no windows, no python
    p = plan_of(qs["events_sssp"](spark, SF_DIR))
    problems += check(
        "events_sssp", p,
        must_not=["CartesianProduct", "BatchEvalPython",
                  "ArrowEvalPython"],
    )

    # welch: ONE conditional-moment scan, no join at all; emb_drift:
    # one aggregate per side + a 1-row broadcast join
    # textrank: scan-side pair transform + vocabulary-sized pagerank
    # loop; no corpus rank window, no cartesian, no python
    p = plan_of(qs["text_textrank"](spark, SF_DIR))
    problems += check(
        "text_textrank", p,
        must_not=["CartesianProduct", "BatchEvalPython",
                  "ArrowEvalPython"],
    )

    # spearman: two histogram aggregates, a cumsum Window over each
    # CHECKPOINTED max_cells-bounded histogram (partitionBy(lit) — a
    # deliberate bounded single partition, NOT a corpus rank window;
    # the r13 O(k) rank-map rewrite), broadcast rank-map joins, one
    # moment scan
    p = plan_of(qs["num_spearman"](spark, SF_DIR))
    problems += check(
        "num_spearman", p,
        must=["HashAggregate", "BroadcastHashJoin", "Window"],
        must_not=["CartesianProduct", "SortMergeJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # ratio/msprt: the same one-conditional-scan moment shape
    for gq in ("events_ratio_ab", "num_msprt"):
        p = plan_of(qs[gq](spark, SF_DIR))
        problems += check(
            gq, p,
            must=["HashAggregate"],
            must_not=["Window", "CartesianProduct", "SortMergeJoin",
                      "BatchEvalPython", "ArrowEvalPython"],
        )

    p = plan_of(qs["num_welch"](spark, SF_DIR))
    problems += check(
        "num_welch", p,
        must=["HashAggregate"],
        must_not=["Window", "CartesianProduct", "SortMergeJoin",
                  "BroadcastHashJoin", "BatchEvalPython",
                  "ArrowEvalPython"],
    )
    p = plan_of(qs["emb_drift"](spark, SF_DIR))
    problems += check(
        "emb_drift", p,
        must=["HashAggregate"],
        must_not=["Window", "SortMergeJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )

    # kruskal: the mann-whitney histogram shape; profile_diff: two
    # one-pass profiles combined by union + re-aggregate (no join —
    # exact count_distinct renders as ObjectHashAggregate, so the gate
    # checks the absences, not the aggregate flavor)
    p = plan_of(qs["num_kruskal"](spark, SF_DIR))
    problems += check(
        "num_kruskal", p,
        must=["HashAggregate"],
        must_not=["Window", "CartesianProduct", "SortMergeJoin",
                  "BatchEvalPython", "ArrowEvalPython"],
    )
    p = plan_of(qs["dq_profile_diff"](spark, SF_DIR))
    problems += check(
        "dq_profile_diff", p,
        must_not=["Window", "CartesianProduct", "SortMergeJoin",
                  "BroadcastHashJoin", "BatchEvalPython",
                  "ArrowEvalPython"],
    )

    for gq in ("num_mannwhitney", "num_benford"):
        p = plan_of(qs[gq](spark, SF_DIR))
        problems += check(
            gq, p,
            must=["HashAggregate"],
            must_not=["Window", "CartesianProduct", "SortMergeJoin",
                      "BatchEvalPython", "ArrowEvalPython"],
        )

    # chi2/kappa: one groupBy(a,b) count; margins re-aggregated off the
    # checkpointed cell frame with broadcast joins back — no data-sized
    # second shuffle, no windows
    for gq in ("num_chi2_indep", "text_langid_kappa"):
        p = plan_of(qs[gq](spark, SF_DIR))
        problems += check(
            gq, p,
            must=["HashAggregate"],
            must_not=["Window", "CartesianProduct", "SortMergeJoin",
                      "BatchEvalPython", "ArrowEvalPython"],
        )
    p = plan_of(qs["events_cuped"](spark, SF_DIR))
    problems += check(
        "events_cuped", p,
        must=["HashAggregate"],
        must_not=["Window", "CartesianProduct", "SortMergeJoin",
                  "BroadcastHashJoin", "BatchEvalPython",
                  "ArrowEvalPython"],
    )

    if problems:
        print("PLAN PROBLEMS:")
        for pr_ in problems:
            print(" -", pr_)
        return 1
    print("all plan checks pass (pushdown, pruning, broadcast, codegen, no stray UDFs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
