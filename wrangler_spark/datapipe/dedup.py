"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash,
embedding-cosine near-dup.

Scale design (100 TB):
- exact dedup is a single hash aggregation on the normalized key — one
  shuffle, map-side partial aggregation for free;
- MinHash-LSH never compares all pairs: signatures are computed scan-side
  (native higher-order functions, no UDFs), candidates come from an
  equi-join on (band, band_key) — the classic banding trick — and only
  candidates pay the exact-Jaccard verification;
- n-gram Jaccard uses an inverted-index join on shared shingles, again
  equi-join shaped, so Spark can hash-partition it;
- embedding near-dup buckets by random-hyperplane signature first
  (equi-join), brute force only within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wrangler_spark.datapipe.constants import (
    HYPERPLANES,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    SHINGLE_WORDS,
)


def normalize_text(c: Column) -> Column:
    """Lowercase, collapse whitespace — the usual exact-dedup key."""
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the smallest id per normalized text; adds n_dups.
    One hash-aggregate shuffle; at 100 TB hash the key first if texts are
    long (dedup on md5 digest, not the full document)."""
    key = F.md5(normalize_text(F.col(text_col))).alias("__key")
    return (
        df.select(F.col(id_col), key)
        .groupBy("__key")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
        .select(id_col, "n_dups")
    )


def _hash28(c: Column) -> Column:
    """28-bit base hash shared with the DuckDB oracle: md5 hex prefix."""
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def word_shingles(c: Column, k: int = SHINGLE_WORDS) -> Column:
    """Distinct k-word shingles of a whitespace-tokenized text."""
    words = F.split(normalize_text(c), " ")
    n = F.size(words)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(k)]),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def minhash_signature(shingles: Column) -> list[Column]:
    """32 minhash values over the shingle set — all JVM-side."""
    hashes = F.transform(shingles, _hash28)

    def mh(a: int, b: int):
        # separate factory: pyspark reads the lambda's arity, so default
        # args (lambda h, a=a, b=b) would look like a 3-arg lambda
        return lambda h: (a * h + b) % MINHASH_P

    return [
        F.array_min(F.transform(hashes, mh(a, b))).alias(f"mh{j}")
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.5
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding, verified with
    exact Jaccard over shingle sets. Returns (id_a, id_b, jaccard)."""
    base = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col)).alias("shingles")
    )
    sig = base.select("id", "shingles", *minhash_signature(F.col("shingles")))

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("-", *[F.col(f"mh{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]).alias("key"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    bands = sig.select("id", "shingles", F.explode(band_structs).alias("bk")).select(
        "id", "shingles", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )

    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.shingles").alias("sa"),
            F.col("r.shingles").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb"))).cast("double")
    union = F.size(F.array_union(F.col("sa"), F.col("sb"))).cast("double")
    jac = F.round(inter / union, 6)
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, threshold: float = 0.6
) -> DataFrame:
    """Character n-gram Jaccard near-dups via an inverted-index equi-join:
    only pairs sharing at least one n-gram are ever scored."""
    txt = normalize_text(F.col(text_col))
    ln = F.length(txt)
    grams = F.when(
        ln >= n,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), ln - (n - 1)), lambda i: txt.substr(i, F.lit(n)))
        ),
    ).otherwise(F.array(txt))
    base = df.select(F.col(id_col).alias("id"), grams.alias("grams"), F.size(grams).alias("ng"))
    inv = base.select("id", "ng", F.explode("grams").alias("g"))
    l, r = inv.alias("l"), inv.alias("r")
    shared = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(
            F.count("*").alias("shared"),
            F.first(F.col("l.ng")).alias("na"),
            F.first(F.col("r.ng")).alias("nb"),
        )
    )
    jac = F.round(
        F.col("shared").cast("double") / (F.col("na") + F.col("nb") - F.col("shared")).cast("double"), 6
    )
    return shared.withColumn("jaccard", jac).filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-document SimHash over word hashes (bits ≤ 32 so the bit test
    stays in exact integer range for both engines). Adds `simhash` long."""
    words = F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
    hashes = F.transform(words, _hash28)
    def voter(pw: int):
        return lambda acc, h: acc + F.when(((h / pw).cast("long") % 2) == 1, 1).otherwise(-1)

    bit_cols = []
    for b in range(bits):
        pw = 1 << b
        vote = F.aggregate(hashes, F.lit(0), voter(pw))  # sum of ±1 across words for bit b
        bit_cols.append(F.when(vote > 0, F.lit(pw)).otherwise(F.lit(0)))
    sh = bit_cols[0]
    for c in bit_cols[1:]:
        sh = sh + c
    return df.select(F.col(id_col), sh.cast("long").alias("simhash"))


def embedding_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.9, exact: bool = False
) -> DataFrame:
    """Embedding near-dup pairs. exact=False buckets by random-hyperplane
    signature first (only same-signature pairs compared — the scale path);
    exact=True brute-forces all pairs (small inputs / recall baseline)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("id"), v.alias("v"))
    if not exact:
        sig = None
        for p, plane in enumerate(HYPERPLANES):
            lit_plane = F.array(*[F.lit(float(x)) for x in plane])
            dot = F.aggregate(F.zip_with(F.col("v"), lit_plane, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
            bit = F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0"))
            sig = bit if sig is None else F.concat(sig, bit)
        base = base.withColumn("sig", sig)
        l, r = base.alias("l"), base.alias("r")
        cand = l.join(
            r, (F.col("l.sig") == F.col("r.sig")) & (F.col("l.id") < F.col("r.id"))
        )
    else:
        l, r = base.alias("l"), base.alias("r")
        cand = l.join(r, F.col("l.id") < F.col("r.id"))
    cos = F.round(_cosine(F.col("l.v"), F.col("r.v")), 6)
    return (
        cand.select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"), cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)
