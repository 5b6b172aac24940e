"""Scaling-slope bench: the headline queries at sf0.01 / sf0.1 / sf1.

sf1 does not exist in /root/testdata, so it is synthesized ONCE into
./testdata_sf1 as a 10x replication of sf0.1 with shifted keys (and, for
documents, a per-replica suffix so the corpus is near-duplicate-heavy
rather than byte-identical — the realistic worst case for the LSH path).

Prints one JSON line per scale factor plus a slope summary, and rewrites
BENCH_SCALING.md. Run from the repo root:

    PYTHONPATH=. python tools/bench_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1")
REPLICAS = 10

QUERIES = [
    "cleanse_recipe", "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_cc",
    "dedup_ngram_word", "text_quality", "pii_redact", "dedup_paragraphs",
    "decontaminate", "sample_by_quality", "ann_cosine_topk",
    # round 7
    "dedup_substring_keepfirst", "text_c4_quality", "text_lp_buckets",
    "sample_mixture", "text_clf_score", "text_bigram_lp", "text_chunk",
    # round 7, second batch
    "text_winnow", "text_winnow_overlap", "dedup_cross_minhash",
    "sample_domain_cap", "emb_project", "corpus_diff",
    "entity_match", "text_bm25_topk", "ann_rrf_fuse", "split_by_cluster",
    # round 8
    "entity_match_against", "dedup_overlap", "text_top_ngrams",
    "corpus_drift", "text_entropy", "num_mad", "num_qbins",
    # round 8, second batch (ANN compression + bloom dedup)
    "ann_pq_topk", "ann_ivf_pq_topk", "dedup_cross_bloom",
    # round 8, third batch (event analytics; sf1 replicates events 10x
    # by user-id shift — 10x users, same per-user density)
    "events_funnel", "events_retention", "events_transitions", "events_paths",
    # round 8, fourth batch (cross-corpus semantic dedup; boilerplate strip —
    # sf1's replicated embeddings make old buckets 10x denser, exercising
    # the max_bucket_size cap exactly as a mirror-heavy corpus would)
    "dedup_cross_embedding", "strip_boilerplate",
    # round 8, fifth batch (contamination spans; recall-tilted banding;
    # grouped scaling; top-fraction pruning)
    "decontam_spans", "dedup_minhash_b16r2", "num_scale_by", "sample_top_frac",
    # round 9 (single-scan vocab rewrite — the re-measure VERDICT r8 asked
    # for; distributed-top-k vocabulary; n-gram repetition; OOV gate;
    # rolling active users)
    "text_vocab", "text_vocabulary", "text_ngram_rep", "text_oov",
    "events_active_users",
    # round 10 (scan-side repetition filter incl. paragraph caps;
    # log-odds group labeling — marginal join + two-phase slice;
    # token-budget sampling — grouped distributed prefix scan)
    "text_rep_filter", "text_group_terms_weighted", "sample_token_budget_by",
    "emb_cluster_topics",
    # round 11 (pair-volume governor: the capped counterparts of the
    # three output-bound slopes — the r10 VERDICT re-measure; each capped
    # variant keeps its uncapped row's EXACT arguments + the cap, so the
    # slope delta isolates the governor. The graded dedup_overlap_capped
    # query is NOT in this list: it runs threshold 0.5 for oracle
    # coverage, which would conflate a looser threshold with the cap.)
    "dedup_overlap_capped8", "dedup_ngram_word_capped", "text_winnow_overlap_capped",
    "events_funnel_state",
    # round 12 (pre-score candidate budget: same args as the r11 capped
    # rows PLUS max_candidates_per_doc, so the slope delta isolates
    # "verify only budgeted candidates" vs "score everything, cap after")
    "dedup_ngram_word_budget", "dedup_overlap_budget8",
    # round 11, second batch (graph family: iterative join+agg loops —
    # sf1's user-id-shifted events give 10x transition edges)
    "events_pagerank", "events_communities",
    # round 11, session 2 (quality gate = one aggregation pass; resample/
    # rolling = per-key bounded folds; cms = grid-bounded aggregate)
    "dq_constraints", "events_resample", "events_rolling", "events_cms_counts",
    "events_cusum", "events_survival", "text_js_drift", "events_seasonality",
    "num_ks_drift", "num_impute",
    "events_session_stats", "events_funnel_by", "num_corr_matrix",
    # round 12, session 2 (graph density/reach over the sf1 near-dup-
    # heavy pair graph — the wedge join's worst case; map-side chunker;
    # single-scan calibration; grid fold)
    "dedup_triangles", "dedup_khop",
    "text_clf_calibration", "events_ewma", "events_hits",
    "text_code_signals", "events_graph_summary",
    # round 12, session 3 (experimentation + statistics family: one-scan
    # conditional moments; histogram folds; contingency cells; grid
    # folds; bounded Bellman-Ford rounds; per-side dim aggregates)
    "events_srm", "events_cuped", "num_chi2_indep", "text_langid_kappa",
    "events_acf", "events_holt", "num_mannwhitney", "num_benford",
    "events_sssp", "num_welch", "emb_drift", "num_kruskal",
    "dq_profile_diff", "events_ratio_ab", "num_msprt", "text_textrank",
    "num_spearman",
    # round 13 (fingerprint-sample pre-score budget: the capped winnow
    # row's exact args + fp_sample_mod, so the slope delta isolates
    # "find candidates on the 1/2 fp subset, verify survivors exactly"
    # vs "self-join every fingerprint")
    "text_winnow_budget2",
]


def _extra_queries():
    """Bench-only capped variants (NOT graded queries — the graded capped
    representative is dedup_overlap_capped): same arguments as their
    uncapped QUERIES counterparts plus max_pairs_per_doc, so the slope
    rows are directly comparable."""
    from pyspark.sql import functions as F  # noqa: F401

    from wrangler_spark.datapipe import dedup, text

    def _docs(s, d):
        return s.read.parquet(f"{d}/documents.parquet")

    return {
        "dedup_ngram_word_capped": lambda s, d: dedup.ngram_jaccard_pairs(
            _docs(s, d), "doc_id", "text", 3, 0.5, unit="word",
            max_pairs_per_doc=5,
        ),
        "text_winnow_overlap_capped": lambda s, d: text.winnow_overlap(
            _docs(s, d), "doc_id", "text", 3, 4, max_pairs_per_doc=5,
        ),
        "dedup_overlap_capped8": lambda s, d: dedup.overlap_pairs(
            _docs(s, d), "doc_id", "text", 3, 0.8, max_pairs_per_doc=5,
        ),
        # r12: the capped rows' exact args + the pre-score candidate
        # budget (budget > cap so the post-score cap still has choice)
        "dedup_ngram_word_budget": lambda s, d: dedup.ngram_jaccard_pairs(
            _docs(s, d), "doc_id", "text", 3, 0.5, unit="word",
            max_pairs_per_doc=5, max_candidates_per_doc=8,
        ),
        "dedup_overlap_budget8": lambda s, d: dedup.overlap_pairs(
            _docs(s, d), "doc_id", "text", 3, 0.8, max_pairs_per_doc=5,
            max_candidates_per_doc=8,
        ),
        # r13: the capped winnow row's exact args + the fp-sample budget
        "text_winnow_budget2": lambda s, d: text.winnow_overlap(
            _docs(s, d), "doc_id", "text", 3, 4, max_pairs_per_doc=5,
            fp_sample_mod=2,
        ),
    }


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    # versioned sentinel: v2 added the embeddings replication, v3 the
    # events replication (user-id shift) — a cache built by an older
    # script version must not be reused, and writing through a leftover
    # symlink would clobber the shared /root/testdata source, so rebuild
    if os.path.exists(os.path.join(SF1_DIR, "_DONE_v3")):
        return
    if os.path.exists(SF1_DIR):
        import shutil

        shutil.rmtree(SF1_DIR)
    os.makedirs(SF1_DIR, exist_ok=True)
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    evs = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    li_parts, doc_parts, emb_parts, ev_parts = [], [], [], []
    for k in range(REPLICAS):
        li_parts.append(li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * 10_000_000)))
        ev_parts.append(
            evs.withColumn("event_id", F.col("event_id") + F.lit(k * 10_000_000))
            .withColumn("user_id", F.col("user_id") + F.lit(k * 1_000_000))
        )
        doc_parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1_000_000)).withColumn(
                "text",
                F.concat(F.col("text"), F.lit(f" replica{k} marker{k}")) if k else F.col("text"),
            )
        )
        emb_parts.append(embs.withColumn("vec_id", F.col("vec_id") + F.lit(k * 1_000_000)))
    out_li = li_parts[0]
    for p in li_parts[1:]:
        out_li = out_li.unionByName(p)
    out_docs = doc_parts[0]
    for p in doc_parts[1:]:
        out_docs = out_docs.unionByName(p)
    out_embs = emb_parts[0]
    for p in emb_parts[1:]:
        out_embs = out_embs.unionByName(p)
    out_li.repartition(32).write.mode("overwrite").parquet(os.path.join(SF1_DIR, "lineitem.parquet"))
    out_docs.repartition(32).write.mode("overwrite").parquet(os.path.join(SF1_DIR, "documents.parquet"))
    out_embs.repartition(32).write.mode("overwrite").parquet(os.path.join(SF1_DIR, "embeddings.parquet"))
    out_evs = ev_parts[0]
    for p in ev_parts[1:]:
        out_evs = out_evs.unionByName(p)
    out_evs.repartition(32).write.mode("overwrite").parquet(os.path.join(SF1_DIR, "events.parquet"))
    # the scaling queries only touch lineitem/documents/embeddings/events;
    # link the rest so _t() keeps working if a query set grows
    for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
        dst = os.path.join(SF1_DIR, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
    open(os.path.join(SF1_DIR, "_DONE_v3"), "w").close()


def main() -> None:
    import __spark_entry__ as entry_mod
    from wrangler_spark import get_spark

    spark = get_spark("wrangler_spark_bench_scaling")
    spark.range(1).count()
    build_sf1(spark)
    qs = dict(entry_mod.queries())
    qs.update(_extra_queries())

    # subset mode: name args run only those queries and skip the MD
    # rewrite (targeted slope re-measures without a full sweep)
    subset = [a for a in sys.argv[1:] if not a.startswith("-")]
    run_queries = subset or QUERIES
    for name in run_queries:
        if name not in qs:
            raise SystemExit(f"unknown query {name!r}")

    results: dict[str, dict[str, float]] = {}
    rows: dict[str, dict[str, int]] = {}
    for sf, d in [(0.01, "/root/testdata/sf0.01"), (0.1, "/root/testdata/sf0.1"), (1.0, SF1_DIR)]:
        per: dict[str, float] = {}
        nr: dict[str, int] = {}
        from wrangler_spark.datapipe import checkpoint_scope

        for name in run_queries:
            # warm pass (JIT, file index, shuffle buffers), then the timed
            # pass — slope needs steady-state per-sf numbers, not whichever
            # sf happened to pay the session's one-time costs. Each pass
            # in a checkpoint_scope so slope numbers measure the operator,
            # not accumulated session blocks (BENCH_SCALING round-8 note).
            with checkpoint_scope():
                nr[name] = qs[name](spark, d).count()
            t0 = time.perf_counter()
            with checkpoint_scope():
                qs[name](spark, d).count()
            per[name] = round(time.perf_counter() - t0, 3)
        results[str(sf)] = per
        rows[str(sf)] = nr
        print(json.dumps({"sf": sf, "queries": per, "rows": nr}), flush=True)

    if subset:
        for name in run_queries:
            a, b, c = (results[k][name] for k in ("0.01", "0.1", "1.0"))
            slope = round(c / b, 2) if b else float("nan")
            print(f"{name}: {a} / {b} / {c} s  slope {slope}x  "
                  f"rows sf1={rows['1.0'][name]}")
        return

    lines = [
        "# BENCH_SCALING — wall-clock vs scale factor (local[32])",
        "",
        "sf1 is a synthesized 10x replication of sf0.1 (shifted keys; documents",
        "get a per-replica suffix, making the corpus near-duplicate-heavy — the",
        "adversarial case for MinHash-LSH bucket skew). A 10x data step costing",
        "well under 10x wall shows fixed plan/scan overhead still dominating;",
        "near-10x is the linear-scaling regime.",
        "",
        "| query | sf0.01 (s) | sf0.1 (s) | sf1 (s) | slope sf0.1→sf1 |",
        "|---|---|---|---|---|",
    ]
    for name in QUERIES:
        a, b, c = (results[k][name] for k in ("0.01", "0.1", "1.0"))
        slope = round(c / b, 2) if b else float("nan")
        lines.append(f"| {name} | {a} | {b} | {c} | {slope}x |")
    lines += [
        "",
        f"Output rows at sf1: {json.dumps(rows['1.0'])}",
        "",
        "Generated by tools/bench_scaling.py.",
    ]
    md = "\n".join(lines) + "\n"
    # keep hand-written analysis sections (anything from the first "## " on)
    md_path = os.path.join(os.path.dirname(SF1_DIR), "BENCH_SCALING.md")
    try:
        old = open(md_path).read()
        idx = old.index("\n## ")
        md += old[idx:]
    except (OSError, ValueError):
        pass
    with open(md_path, "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
