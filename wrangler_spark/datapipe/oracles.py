"""DuckDB oracle SQL for the datapipe operators.

Generated from the same constants as the Spark implementations
(constants.py), so hashes, coefficients and hyperplanes are identical and
results compare value-for-value. Shared base hash:
Spark  conv(substring(md5(s),1,7),16,10)  ==  DuckDB ('0x'||substr(md5(s),1,7))::BIGINT.
"""

from __future__ import annotations

from wrangler_spark.datapipe.constants import (
    EN_STOPWORDS,
    HYPERPLANES,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
)
from wrangler_spark.datapipe.text import CODE_KEYWORDS, TOKEN_RE

_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_H = "('0x' || substr(md5({s}), 1, 7))::BIGINT"


def dedup_exact_sql(table: str = "documents") -> str:
    return (
        f"SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM "
        f"(SELECT doc_id, md5({_NORM}) AS k FROM {table}) GROUP BY k"
    )


def _shingles_cte(table: str = "documents") -> str:
    return f"""
norm AS (SELECT doc_id AS id, {_NORM} AS t FROM {table}),
wrd AS (SELECT id, string_split(t, ' ') AS w FROM norm),
sh AS (
  SELECT id,
    CASE WHEN len(w) >= 3
      THEN list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)])
      ELSE [array_to_string(w, ' ')] END AS shingles
  FROM wrd
)"""


def minhash_lsh_sql(
    threshold: float = 0.5, table: str = "documents",
    bands: int = LSH_BANDS, rows: int = LSH_ROWS,
) -> str:
    h = _H.format(s="s")
    sig_exprs = ", ".join(
        f"list_min(list_transform(h, x -> ({a} * x + {b}) % {MINHASH_P})) AS mh{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A[: bands * rows], MINHASH_B[: bands * rows]))
    )
    band_selects = " UNION ALL ".join(
        "SELECT id, shingles, {b} AS band, ".format(b=b)
        + " || '-' || ".join(f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows))
        + " AS key FROM sig"
        for b in range(bands)
    )
    return f"""
WITH {_shingles_cte(table)},
hsh AS (SELECT id, shingles, list_transform(shingles, s -> {h}) AS h FROM sh),
sig AS (SELECT id, shingles, {sig_exprs} FROM hsh),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.shingles AS sa, r.shingles AS sb
  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key AND l.id < r.id
)
SELECT id_a, id_b,
  round(len(list_intersect(sa, sb))::DOUBLE / len(list_distinct(list_concat(sa, sb)))::DOUBLE, 6) AS jaccard
FROM cand
WHERE round(len(list_intersect(sa, sb))::DOUBLE / len(list_distinct(list_concat(sa, sb)))::DOUBLE, 6) >= {threshold}
"""


def ngram_jaccard_sql(
    n: int = 5,
    threshold: float = 0.6,
    max_gram_df: int | float | None = 0.5,
    table: str = "documents",
    unit: str = "word",
) -> str:
    """Mirror of dedup.ngram_jaccard_pairs incl. stop-gram pruning: a float
    cap is corpus-relative (max(2, ceil(frac·N_docs))), an int absolute,
    None disables. Everything past the gram construction runs in 28-BIT
    HASH SPACE exactly like the Spark side: grams are hashed and deduped
    per doc first, the df cap applies to hash doc-frequency, candidates =
    any shared kept hash (a lossless superset of the Spark prefix filter,
    which is provably complete for the same hash sets), and the score is
    Jaccard over the kept-hash sets — so parity is exact by construction,
    hash collisions included."""
    return f"""
WITH {_gram_hash_ctes(n, max_gram_df, table, unit)}
SELECT id_a, id_b,
  round(len(list_intersect(a.hs, b.hs))::DOUBLE
        / len(list_distinct(list_concat(a.hs, b.hs)))::DOUBLE, 6) AS jaccard
FROM cand JOIN hsets a ON cand.id_a = a.id JOIN hsets b ON cand.id_b = b.id
WHERE round(len(list_intersect(a.hs, b.hs))::DOUBLE
            / len(list_distinct(list_concat(a.hs, b.hs)))::DOUBLE, 6) >= {threshold}
"""


def _gram_hash_ctes(
    n: int, max_gram_df: int | float | None, table: str, unit: str
) -> str:
    """Shared CTE chain for the hash-space n-gram similarity family
    (jaccard, overlap): norm → grams → 28-bit hash inverted index →
    optional stop-gram prune → per-doc hash sets + any-shared-gram
    candidates (a lossless superset of the Spark side's prefix
    filters, which are provably complete for the same hash sets)."""
    if max_gram_df is None:
        prune_ctes, inv_src = "", "inv0"
    else:
        cap_expr = (
            f"greatest(2, CAST(ceil({max_gram_df} * count(*)) AS BIGINT))"
            if isinstance(max_gram_df, float)
            else str(int(max_gram_df))
        )
        cap_cte = (
            f"cap AS (SELECT {cap_expr} AS cap FROM norm),\n"
            if isinstance(max_gram_df, float)
            else f"cap AS (SELECT {cap_expr} AS cap),\n"
        )
        prune_ctes = (
            cap_cte
            + "keep AS (SELECT g FROM inv0 CROSS JOIN cap GROUP BY g, cap.cap"
            " HAVING count(DISTINCT id) <= cap.cap),\n"
            "inv1 AS (SELECT inv0.id, inv0.g FROM inv0 JOIN keep USING (g)),\n"
        )
        inv_src = "inv1"
    if unit == "char":
        gr_cte = f"""gr AS (
  SELECT id,
    CASE WHEN len(t) >= {n}
      THEN list_distinct([substr(t, i, {n}) FOR i IN range(1, len(t) - {n - 1} + 1)])
      ELSE [t] END AS grams
  FROM norm
)"""
    else:
        gr_cte = f"""wr AS (SELECT id, string_split(t, ' ') AS w FROM norm),
gr AS (
  SELECT id,
    CASE WHEN len(w) >= {n}
      THEN list_distinct([array_to_string(list_slice(w, i, i + {n - 1}), ' ') FOR i IN range(1, len(w) - {n} + 2)])
      ELSE [array_to_string(w, ' ')] END AS grams
  FROM wr
)"""
    return f"""norm AS (SELECT doc_id AS id, {_NORM} AS t FROM {table}),
{gr_cte},
inv0 AS (SELECT DISTINCT id, {_H.format(s='g')} AS g
         FROM (SELECT id, unnest(grams) AS g FROM gr)),
{prune_ctes}hsets AS (
  SELECT id, list(g) AS hs FROM {inv_src} GROUP BY id
),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM {inv_src} l JOIN {inv_src} r ON l.g = r.g AND l.id < r.id
)"""


def overlap_pairs_sql(
    n: int = 3,
    threshold: float = 0.8,
    max_gram_df: int | float | None = 0.25,
    table: str = "documents",
    unit: str = "word",
) -> str:
    """Mirror of dedup.overlap_pairs: same hash-space front end as
    ngram_jaccard_sql; candidates = any shared kept hash (superset of
    the Spark smaller-side prefix filter); score = overlap coefficient
    with per-direction containments."""
    return f"""
WITH {_gram_hash_ctes(n, max_gram_df, table, unit)},
scored AS (
  SELECT id_a, id_b,
         len(list_intersect(a.hs, b.hs))::DOUBLE AS inter,
         len(a.hs)::DOUBLE AS la, len(b.hs)::DOUBLE AS lb
  FROM cand JOIN hsets a ON cand.id_a = a.id JOIN hsets b ON cand.id_b = b.id
)
SELECT id_a, id_b,
       round(inter / least(la, lb), 6) AS overlap_coef,
       round(inter / la, 6) AS containment_a,
       round(inter / lb, 6) AS containment_b
FROM scored
WHERE round(inter / least(la, lb), 6) >= {threshold}
"""


def ngram_budget_sql(
    n: int = 3,
    threshold: float = 0.5,
    max_gram_df: int | float | None = 0.5,
    cand_k: int = 3,
    table: str = "documents",
    unit: str = "word",
) -> str:
    """Mirror of dedup.ngram_jaccard_pairs(max_candidates_per_doc=
    cand_k) in exact mode: the symmetric both-prefix PPJoin candidates
    WITH their shared-prefix-gram multiplicity, the two-stage QUALIFY
    budget on (__shared DESC, md5 pair hash), then Jaccard scoring of
    the survivors only. The candidate set is part of the semantics
    here (see overlap_budget_sql), so the prefix + size filter are
    replicated exactly."""
    h = "md5(id_a::VARCHAR || '|' || id_b::VARCHAR)"
    return f"""
WITH {_gram_hash_ctes(n, max_gram_df, table, unit)},
gdf2 AS (SELECT g, count(DISTINCT id) AS df FROM inv0 GROUP BY g),
sized AS (
  SELECT id, list(g ORDER BY df ASC, g ASC) AS hs, count(*) AS ng
  FROM {"inv1" if max_gram_df is not None else "inv0"} JOIN gdf2 USING (g)
  GROUP BY id),
pref AS (SELECT id, ng,
                unnest(list_slice(hs, 1,
                       CAST(ng - ceil({threshold} * ng) + 1 AS INT))) AS g
         FROM sized),
candc AS (
  SELECT l.id AS id_a, r.id AS id_b, count(*) AS __shared
  FROM pref l JOIN pref r
    ON l.g = r.g AND l.id < r.id
   AND least(l.ng, r.ng)::DOUBLE >= {threshold} * greatest(l.ng, r.ng)::DOUBLE
  GROUP BY 1, 2),
capa AS (
  SELECT * FROM candc
  QUALIFY row_number() OVER (PARTITION BY id_a
                             ORDER BY __shared DESC, {h}) <= {int(cand_k)}),
capb AS (
  SELECT * FROM capa
  QUALIFY row_number() OVER (PARTITION BY id_b
                             ORDER BY __shared DESC, {h}) <= {int(cand_k)}),
scored AS (
  SELECT id_a, id_b,
         len(list_intersect(a.hs, b.hs))::DOUBLE AS inter,
         len(list_distinct(list_concat(a.hs, b.hs)))::DOUBLE AS un
  FROM capb JOIN sized a ON capb.id_a = a.id JOIN sized b ON capb.id_b = b.id)
SELECT id_a, id_b, round(inter / un, 6) AS jaccard
FROM scored WHERE round(inter / un, 6) >= {threshold}
"""


def overlap_budget_sql(
    n: int = 3,
    threshold: float = 0.8,
    max_gram_df: int | float | None = 0.25,
    cand_k: int = 3,
    table: str = "documents",
    unit: str = "word",
) -> str:
    """Mirror of dedup.overlap_pairs(max_candidates_per_doc=cand_k):
    unlike overlap_pairs_sql (whose any-shared-hash candidates are a
    harmless SUPERSET — verification filters), the candidate BUDGET
    makes the candidate set part of the semantics, so this mirror
    replicates the Spark plan exactly: per-doc kept hashes sorted
    rarest-first (full-corpus df asc, hash asc), the smaller-side
    prefix (ng - ceil(t*ng) + 1) joined against full kept sets of
    same-or-larger docs, candidate multiplicity = shared prefix-gram
    count, two QUALIFY top-k stages on (__shared DESC, md5 pair hash)
    in id_a-then-id_b order, and overlap scoring on the survivors
    only."""
    h = "md5(id_a::VARCHAR || '|' || id_b::VARCHAR)"
    return f"""
WITH {_gram_hash_ctes(n, max_gram_df, table, unit)},
gdf2 AS (SELECT g, count(DISTINCT id) AS df FROM inv0 GROUP BY g),
sized AS (
  SELECT id, list(g ORDER BY df ASC, g ASC) AS hs, count(*) AS ng
  FROM {"inv1" if max_gram_df is not None else "inv0"} JOIN gdf2 USING (g)
  GROUP BY id),
pref AS (SELECT id, ng,
                unnest(list_slice(hs, 1,
                       CAST(ng - ceil({threshold} * ng) + 1 AS INT))) AS g
         FROM sized),
flat AS (SELECT id, ng, unnest(hs) AS g FROM sized),
candc AS (
  SELECT least(l.id, r.id) AS id_a, greatest(l.id, r.id) AS id_b,
         count(*) AS __shared
  FROM pref l JOIN flat r
    ON l.g = r.g AND (l.ng < r.ng OR (l.ng = r.ng AND l.id < r.id))
  GROUP BY 1, 2),
capa AS (
  SELECT * FROM candc
  QUALIFY row_number() OVER (PARTITION BY id_a
                             ORDER BY __shared DESC, {h}) <= {int(cand_k)}),
capb AS (
  SELECT * FROM capa
  QUALIFY row_number() OVER (PARTITION BY id_b
                             ORDER BY __shared DESC, {h}) <= {int(cand_k)}),
scored AS (
  SELECT id_a, id_b,
         len(list_intersect(a.hs, b.hs))::DOUBLE AS inter,
         a.ng::DOUBLE AS la, b.ng::DOUBLE AS lb
  FROM capb JOIN sized a ON capb.id_a = a.id JOIN sized b ON capb.id_b = b.id)
SELECT id_a, id_b,
       round(inter / least(la, lb), 6) AS overlap_coef,
       round(inter / la, 6) AS containment_a,
       round(inter / lb, 6) AS containment_b
FROM scored
WHERE round(inter / least(la, lb), 6) >= {threshold}
"""


def simhash_sql(bits: int = 32, table: str = "documents") -> str:
    h = _H.format(s="s")
    terms = []
    for b in range(bits):
        pw = 1 << b
        terms.append(
            f"CASE WHEN list_sum(list_transform(h, x -> CASE WHEN (x // {pw}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
            f"THEN {pw} ELSE 0 END"
        )
    total = " + ".join(terms)
    return f"""
WITH norm AS (SELECT doc_id, {_NORM} AS t FROM {table}),
wrd AS (SELECT doc_id, list_distinct(string_split(t, ' ')) AS w FROM norm),
hsh AS (SELECT doc_id, list_transform(w, s -> {h}) AS h FROM wrd)
SELECT doc_id, CAST({total} AS BIGINT) AS simhash FROM hsh
"""


_DOT = "list_sum([{a}[i] * {b}[i] FOR i IN range(1, 65)])"


def _cos(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = f"sqrt(list_sum([x * x FOR x IN {a}]))"
    nb = f"sqrt(list_sum([x * x FOR x IN {b}]))"
    return f"({dot} / ({na} * {nb}))"


def embedding_pairs_sql(threshold: float = 0.9, table: str = "embeddings") -> str:
    plane_sig_parts = []
    for plane in HYPERPLANES:
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        dot = _DOT.format(a="v", b=lit)
        plane_sig_parts.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    sig = " || ".join(plane_sig_parts)
    cos = _cos("l.v", "r.v")
    return f"""
WITH base AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM {table}
),
sigs AS (SELECT id, v, {sig} AS sig FROM base)
SELECT l.id AS id_a, r.id AS id_b, round({cos}, 6) AS cosine
FROM sigs l JOIN sigs r ON l.sig = r.sig AND l.id < r.id
WHERE round({cos}, 6) >= {threshold}
"""


def embedding_cross_sql(
    threshold: float = 0.9, mod: int = 5, n_planes: int | None = None,
    table: str = "embeddings", cap: int = 100,
) -> str:
    """Cross-corpus hyperplane-LSH pairs: the asymmetric (new vs old)
    form of embedding_pairs_sql, split by ``id % mod``. Mirrors the
    Spark side's max_bucket_size cap EXACTLY (the capped bucket keeps
    the ``cap`` smallest old ids per signature — slice(array_sort(...))
    there, a row_number qualify here), so parity holds even on corpora
    dense enough for the cap to bind — the sf1 replica's 10x-denser
    buckets proved the earlier "cap never binds at oracle scale"
    assumption wrong. ``n_planes`` prefixes HYPERPLANES — the driver
    query uses 8 so the mod-5 split still collides (16 planes yield
    zero cross pairs on the fixtures)."""
    plane_sig_parts = []
    for plane in HYPERPLANES[: n_planes or len(HYPERPLANES)]:
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        dot = _DOT.format(a="v", b=lit)
        plane_sig_parts.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    sig = " || ".join(plane_sig_parts)
    cos = _cos("n.v", "o.v")
    return f"""
WITH base AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM {table}
),
sigs AS (SELECT id, v, {sig} AS sig FROM base),
n AS (SELECT * FROM sigs WHERE id % {mod} = 0),
o AS (SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY sig ORDER BY id) AS rn
        FROM sigs WHERE id % {mod} <> 0) WHERE rn <= {int(cap)})
SELECT n.id AS id_new, o.id AS id_old, round({cos}, 6) AS cosine
FROM n JOIN o ON n.sig = o.sig
WHERE round({cos}, 6) >= {threshold}
"""


def cosine_topk_sql(k: int = 10, n_queries: int = 5, table: str = "embeddings") -> str:
    cos = _cos("q.qv", "c.v")
    return f"""
WITH c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM {table}),
q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, c.vec_id, round({cos}, 6) AS cosine
  FROM c CROSS JOIN q WHERE c.vec_id != q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= {k}
"""


_SW_LIST = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"
_WORDS = f"string_split({_NORM}, ' ')"
_SW_RATIO = (
    f"round(len(list_filter({_WORDS}, w -> list_contains({_SW_LIST}, w)))::DOUBLE"
    f" / greatest(len({_WORDS}), 1)::DOUBLE, 6)"
)


def langid_sql(table: str = "documents") -> str:
    return (
        f"SELECT doc_id, text, lang, source, n_chars, "
        f"CASE WHEN {_SW_RATIO} >= 0.05 THEN 'en' ELSE 'unknown' END AS lang_pred FROM {table}"
    )


def quality_sql(table: str = "documents") -> str:
    """Mirror of text.quality_score's micro-unit integer formulation (see
    its docstring: weighted sums of rounded doubles flip 1-ULP across
    engines; integer arithmetic cannot)."""
    n_chars = "length(text)::DOUBLE"
    n_words = f"greatest(len({_WORDS}), 1)::DOUBLE"
    n_sw = f"len(list_filter({_WORDS}, w -> list_contains({_SW_LIST}, w)))::DOUBLE"
    micro = lambda x: f"CAST(round(({x}) * 1000000, 0) AS BIGINT)"  # noqa: E731
    ls = micro(f"least({n_chars} / 500.0, 1.0)")
    ss = micro(f"least({n_sw} * 5.0 / {n_words}, 1.0)")
    al = micro(
        f"length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / greatest({n_chars}, 1.0)"
    )
    wl = (
        f"CASE WHEN ({n_chars} / {n_words}) >= 3.0 AND ({n_chars} / {n_words}) <= 10.0 "
        f"THEN 1000000 ELSE 500000 END"
    )
    score = f"(({ls} * 3 + {ss} * 3 + {al} * 2 + {wl} * 2) // 10)::DOUBLE / 1000000.0"
    return f"SELECT doc_id, text, lang, source, n_chars, {score} AS quality FROM {table}"


def token_count_sql(table: str = "documents") -> str:
    return (
        f"SELECT doc_id, text, lang, source, n_chars, "
        f"len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tokens_ws, "
        f"len(regexp_extract_all(text, '{TOKEN_RE}'))::BIGINT AS n_tokens FROM {table}"
    )


def fingerprint_sql(table: str = "documents") -> str:
    return (
        f"SELECT doc_id, text, lang, source, n_chars, "
        f"md5(array_to_string(list_sort(list_distinct({_WORDS})), ' ')) AS fingerprint FROM {table}"
    )


_LINES = "string_split(text, chr(10))"


def repetition_stats_sql(table: str = "documents") -> str:
    """Mirror of text.repetition_stats (Gopher A1.1 repetition ratios)."""
    def ratio(num, den):
        return f"round(({num})::DOUBLE / greatest({den}, 1)::DOUBLE, 6)"

    def chars(arr):
        return f"list_sum(list_transform({arr}, x -> length(x)))"

    paras = r"regexp_split_to_array(text, '\n{2,}')"
    dup_line = f"round(1.0 - {ratio(f'len(list_distinct({_LINES}))', f'len({_LINES})')}, 6)"
    dup_line_char = (
        f"round(1.0 - {ratio(chars(f'list_distinct({_LINES})'), chars(_LINES))}, 6)"
    )
    dup_para = f"round(1.0 - {ratio(f'len(list_distinct({paras}))', f'len({paras})')}, 6)"
    dup_para_char = (
        f"round(1.0 - {ratio(chars(f'list_distinct({paras})'), chars(paras))}, 6)"
    )
    dup_word = f"round(1.0 - {ratio(f'len(list_distinct({_WORDS}))', f'len({_WORDS})')}, 6)"
    return (
        f"SELECT doc_id, text, lang, source, n_chars, "
        f"{dup_line} AS dup_line_ratio, {dup_line_char} AS dup_line_char_ratio, "
        f"{dup_para} AS dup_para_ratio, {dup_para_char} AS dup_para_char_ratio, "
        f"{dup_word} AS dup_word_ratio FROM {table}"
    )


_GOPHER_SW = "['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']"


def gopher_quality_sql(table: str = "documents") -> str:
    """Mirror of text.gopher_quality (Gopher/MassiveText quality rules)."""
    def ratio(num, den):
        return f"round(({num})::DOUBLE / greatest({den}, 1)::DOUBLE, 6)"

    n_words = f"len({_WORDS})"
    n_lines = f"len({_LINES})"
    mean_wlen = ratio(f"list_sum(list_transform({_WORDS}, x -> length(x)))", n_words)
    n_symbols = (
        "(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.'))"
        " + len(regexp_extract_all(text, '…')))"
    )
    symbol_ratio = ratio(n_symbols, n_words)
    bullet = ratio(
        f"len(list_filter({_LINES}, x -> regexp_matches(ltrim(x), '^[-*•]')))", n_lines
    )
    ellipsis = ratio(
        f"len(list_filter({_LINES}, x -> regexp_matches(rtrim(x), '(\\.\\.\\.|…)$')))", n_lines
    )
    alpha = ratio(f"len(list_filter({_WORDS}, w -> regexp_matches(w, '[a-z]')))", n_words)
    n_stop = f"len(list_filter({_WORDS}, w -> list_contains({_GOPHER_SW}, w)))"
    flags = {
        "g_word_count": f"({n_words} >= 50 AND {n_words} <= 100000)",
        "g_mean_word_len": f"({mean_wlen} >= 3.0 AND {mean_wlen} <= 10.0)",
        "g_symbol_ratio": f"({symbol_ratio} <= 0.1)",
        "g_bullet_ratio": f"({bullet} <= 0.9)",
        "g_ellipsis_ratio": f"({ellipsis} <= 0.3)",
        "g_alpha_ratio": f"({alpha} >= 0.8)",
        "g_stopwords": f"({n_stop} >= 2)",
    }
    cols = ", ".join(f"{v} AS {k}" for k, v in flags.items())
    overall = " AND ".join(flags.values())
    return (
        f"SELECT doc_id, text, lang, source, n_chars, {cols}, "
        f"({overall}) AS gopher_pass FROM {table}"
    )


# --- curation oracles (patterns imported so Spark and DuckDB evaluate the
# exact same Java∩RE2 regexes) ---

from wrangler_spark.datapipe.curation import PII_PATTERNS, _HOST_RE  # noqa: E402


def pii_redact_sql(table: str = "documents") -> str:
    red = "text"
    for _, pat, tok in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{tok}', 'g')"
    counts = {
        f"n_pii_{tag}": f"len(regexp_extract_all(text, '{pat}'))::BIGINT"
        for tag, pat, _ in PII_PATTERNS
    }
    cols = ", ".join(f"{v} AS {k}" for k, v in counts.items())
    total = " + ".join(counts.values())
    return (
        f"SELECT doc_id, {red} AS text, lang, source, n_chars, {cols}, "
        f"({total})::BIGINT AS n_pii FROM {table}"
    )


def pii_redact_luhn_sql(table: str = "documents") -> str:
    """Mirror of curation.pii_redact(luhn_check=True): cc-shaped
    candidates pass through the Luhn mod-10 fold; only checksum-valid
    runs are counted and replaced (distinct, longest-first literal
    replace fold — same order contract as the Spark side)."""
    cc_pat = next(p for t, p, _ in PII_PATTERNS if t == "cc")

    def luhn(x: str) -> str:
        ds = f"list_transform(regexp_extract_all(reverse({x}), '[0-9]'), y -> CAST(y AS INT))"
        return (
            f"(len({ds}) BETWEEN 13 AND 19 AND "
            f"list_sum(list_transform(list_zip({ds}, range(0, len({ds}))), "
            f"z -> CASE WHEN z[2] % 2 = 1 THEN CASE WHEN z[1]*2 > 9 "
            f"THEN z[1]*2 - 9 ELSE z[1]*2 END ELSE z[1] END)) % 10 = 0)"
        )

    vc = (
        f"list_filter(list_distinct(regexp_extract_all(text, '{cc_pat}')), x -> {luhn('x')})"
    )
    vc_sorted = (
        f"list_transform(list_sort(list_transform({vc}, "
        "x -> {'nl': -len(x), 'c': x})), st -> st.c)"
    )
    red = "text"
    for tag, pat, tok in PII_PATTERNS:
        if tag == "cc":
            red = f"list_reduce(list_prepend({red}, {vc_sorted}), (a, x) -> replace(a, x, '{tok}'))"
        else:
            red = f"regexp_replace({red}, '{pat}', '{tok}', 'g')"
    counts = {
        f"n_pii_{tag}": (
            f"len(list_filter(regexp_extract_all(text, '{pat}'), x -> {luhn('x')}))::BIGINT"
            if tag == "cc"
            else f"len(regexp_extract_all(text, '{pat}'))::BIGINT"
        )
        for tag, pat, _ in PII_PATTERNS
    }
    cols = ", ".join(f"{v} AS {k}" for k, v in counts.items())
    total = " + ".join(counts.values())
    return (
        f"SELECT doc_id, {red} AS text, lang, source, n_chars, {cols}, "
        f"({total})::BIGINT AS n_pii FROM {table}"
    )


def paragraph_dedup_sql(table: str = "documents") -> str:
    norm_p = r"md5(regexp_replace(lower(trim(para)), '\s+', ' ', 'g'))"
    return f"""
WITH p AS (SELECT doc_id, string_split(text, chr(10)) AS paras FROM {table}),
e AS (
  SELECT doc_id, unnest([{{'pos': i, 'para': paras[i]}} FOR i IN range(1, len(paras) + 1)],
                        recursive := true)
  FROM p
),
r AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY {norm_p} ORDER BY doc_id, pos) AS rn
  FROM e
)
SELECT doc_id,
  coalesce(string_agg(CASE WHEN rn = 1 THEN para END, chr(10) ORDER BY pos), '') AS text,
  count(*)::BIGINT AS n_paras,
  sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dropped
FROM r GROUP BY doc_id
"""


def vocab_coverage_sql(coverage: float = 0.999, table: str = "documents") -> str:
    """Mirror of text.vocab_coverage: the cutoff count is the frequency
    class whose cumulative (count-desc) token mass first reaches
    ``coverage``; all words at or above it are kept."""
    return f"""
WITH w AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS word FROM {table}
),
wc AS (SELECT word, count(*) AS count FROM w WHERE word <> '' GROUP BY word),
hist AS (SELECT count, count(*) AS n_words FROM wc GROUP BY count),
tot AS (SELECT sum(count * n_words) AS total FROM hist),
cum AS (
  SELECT count,
         sum(count * n_words) OVER (ORDER BY count DESC
                                    ROWS UNBOUNDED PRECEDING) AS c
  FROM hist
),
thr AS (SELECT max(count) AS t FROM cum, tot WHERE c >= total * {float(coverage)})
SELECT wc.word, wc.count,
       round(wc.count::DOUBLE / (SELECT total FROM tot)::DOUBLE, 6) AS share
FROM wc, thr WHERE wc.count >= thr.t
"""


def strip_boilerplate_sql(min_docs: int = 2, table: str = "documents", doc_cte: str | None = None) -> str:
    """Mirror of curation.strip_boilerplate_lines. ``doc_cte`` optionally
    replaces the raw table with a synthesized (doc_id, text) SELECT —
    the fixture documents are single-line, so the driver query appends
    a shared footer + per-doc line on both engines."""
    src = f"({doc_cte})" if doc_cte else table
    nrm = r"regexp_replace(lower(trim(line)), '\s+', ' ', 'g')"
    return f"""
WITH p AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM {src}),
e AS (
  SELECT doc_id, unnest([{{'pos': i, 'line': ls[i]}} FOR i IN range(1, len(ls) + 1)],
                        recursive := true)
  FROM p
),
k AS (SELECT doc_id, pos, line, {nrm} AS nrm FROM e),
bad AS (
  SELECT md5(nrm) AS key FROM k WHERE nrm <> ''
  GROUP BY md5(nrm) HAVING count(DISTINCT doc_id) >= {int(min_docs)}
),
m AS (
  SELECT doc_id, pos, line, (bad.key IS NOT NULL) AS dropped
  FROM k LEFT JOIN bad ON md5(k.nrm) = bad.key
)
SELECT doc_id,
  coalesce(string_agg(CASE WHEN NOT dropped THEN line END, chr(10) ORDER BY pos), '') AS text,
  count(*)::BIGINT AS n_lines,
  sum(CASE WHEN dropped THEN 1 ELSE 0 END)::BIGINT AS n_dropped
FROM m GROUP BY doc_id
"""


def _grams_cte(n: int, table: str) -> str:
    return f"""
norm AS (SELECT doc_id AS id, {_WORDS} AS w FROM {table}),
g AS (
  SELECT id,
    CASE WHEN len(w) >= {n}
      THEN list_distinct([array_to_string(w[i:i+{n - 1}], ' ') FOR i IN range(1, len(w) - {n - 1} + 1)])
      ELSE [array_to_string(w, ' ')] END AS grams
  FROM norm
)"""


def decontaminate_sql(
    n: int = 8, threshold: float = 0.1, bench_pred: str = "id % 17 = 3", table: str = "documents"
) -> str:
    ratio = "round(coalesce(n_matched, 0)::DOUBLE / greatest(len(grams), 1)::DOUBLE, 6)"
    return f"""
WITH {_grams_cte(n, table)},
bg AS (SELECT DISTINCT unnest(grams) AS gm FROM g WHERE {bench_pred}),
dg AS (SELECT id, unnest(grams) AS gm FROM g),
m AS (SELECT id, count(*) AS n_matched FROM dg JOIN bg USING (gm) GROUP BY id)
SELECT g.id AS doc_id, len(grams)::BIGINT AS n_grams,
  coalesce(n_matched, 0)::BIGINT AS n_matched,
  {ratio} AS contamination_ratio,
  ({ratio} >= {threshold}) AS contaminated
FROM g LEFT JOIN m ON g.id = m.id
"""


def source_filter_sql(blocked: list[str], table: str = "documents") -> str:
    inlist = ", ".join(f"'{b}'" for b in blocked)
    return f"""
SELECT * FROM (
  SELECT doc_id, text, lang, source, n_chars,
    CASE WHEN regexp_extract(source, '{_HOST_RE}', 1) <> ''
         THEN regexp_extract(source, '{_HOST_RE}', 1) ELSE source END AS host
  FROM {table}
) WHERE host NOT IN ({inlist})
"""


def _hash_keep(rate: float, salt: str, key: str = "doc_id") -> str:
    if rate >= 1.0:
        return "TRUE"
    thr = format(max(int(round(rate * 65536)), 0), "04x")
    return f"substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 4) < '{thr}'"


def sample_by_quality_sql(
    rates: dict[str, float], hi: float, mid: float, salt: str = "", table: str = "documents"
) -> str:
    keep = " OR ".join(
        f"(bucket = '{b}' AND {_hash_keep(r, salt)})" for b, r in rates.items()
    )
    return f"""
WITH q AS ({quality_sql(table)}),
b AS (SELECT *, CASE WHEN quality >= {hi} THEN 'high'
                     WHEN quality >= {mid} THEN 'mid'
                     ELSE 'low' END AS bucket FROM q)
SELECT * FROM b WHERE {keep}
"""


def minhash_dedup_sql(threshold: float = 0.5, table: str = "documents") -> str:
    """Mirror of dedup.minhash_dedup: wrap the pair query and flag every
    id that appears as id_b of a verified pair."""
    return f"""
WITH pairs AS ({minhash_lsh_sql(threshold, table)}),
dropped AS (SELECT DISTINCT id_b FROM pairs)
SELECT t.doc_id, (d.id_b IS NOT NULL) AS is_dup
FROM {table} t LEFT JOIN dropped d ON t.doc_id = d.id_b
"""


def unigram_logprob_sql(vocab_size: int = 50_000, table: str = "documents") -> str:
    """Mirror of text.unigram_logprob: N and V are scalar subqueries —
    exact integers, so they equal the Spark path's driver-side literals;
    per-token surprisal is micro-unit-integerized before the per-doc sum
    (identical determinism contract)."""
    return f"""
WITH w AS (SELECT doc_id, unnest({_WORDS}) AS token FROM {table}),
tk AS (SELECT doc_id, token FROM w WHERE token <> ''),
counts AS (SELECT token, count(*)::BIGINT AS c FROM tk GROUP BY token),
vocab AS (SELECT token, c FROM counts ORDER BY c DESC, token ASC LIMIT {vocab_size}),
nv AS (SELECT (SELECT sum(c) FROM counts) AS n, (SELECT count(*) FROM vocab) AS v),
surp AS (
  SELECT tk.doc_id,
         CAST(round(-log2(CAST(coalesce(vocab.c, 0) + 1 AS DOUBLE)
                          / CAST(nv.n + nv.v + 1 AS DOUBLE)) * 1000000.0) AS BIGINT) AS s
  FROM tk LEFT JOIN vocab ON tk.token = vocab.token CROSS JOIN nv
),
agg AS (SELECT doc_id, sum(s) AS ssum, count(*) AS nt FROM surp GROUP BY doc_id)
SELECT d.*, round(CAST(a.ssum AS DOUBLE) / (CAST(a.nt AS DOUBLE) * 1000000.0), 6) AS doc_lp
FROM {table} d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


def vocabulary_sql(k: int = 1000, table: str = "documents") -> str:
    """Mirror of text.vocabulary: top-k tokens by tf, ties lexical."""
    return f"""
WITH w AS (SELECT doc_id, unnest({_WORDS}) AS token FROM {table}),
t AS (SELECT token, count(*)::BIGINT AS tf FROM w WHERE token <> '' GROUP BY token),
d AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df FROM w WHERE token <> '' GROUP BY token)
SELECT token, tf, df, CAST(rank AS INT) AS rank FROM (
  SELECT t.token, t.tf, d.df,
         row_number() OVER (ORDER BY t.tf DESC, t.token ASC) AS rank
  FROM t JOIN d ON t.token = d.token)
WHERE rank <= {k}
"""


def minhash_components_sql(threshold: float = 0.5, table: str = "documents") -> str:
    """Mirror of dedup.minhash_components: transitive closure of the
    verified near-dup pairs via a recursive CTE (min reachable id =
    component representative), then every corpus row joined back. The
    Spark side computes the same closure with alternating large-star /
    small-star rounds — algorithmically different, same fixpoint."""
    return f"""
WITH RECURSIVE pairs AS ({minhash_lsh_sql(threshold, table)}),
und AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM und
  UNION
  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u WHERE e.v <> r.u
),
comp AS (SELECT u, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u)
SELECT t.doc_id,
       COALESCE(c.component, t.doc_id) AS component,
       (COALESCE(c.component, t.doc_id) <> t.doc_id) AS is_dup
FROM {table} t LEFT JOIN comp c ON t.doc_id = c.u
"""


def cluster_weights_sql(threshold: float = 0.5, table: str = "documents") -> str:
    """Mirror of dedup.cluster_weights over minhash_components: weight =
    1/cluster_size rounded 6dp, every doc kept."""
    return f"""
WITH comp AS (SELECT doc_id, component FROM ({minhash_components_sql(threshold, table)})),
sizes AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
SELECT comp.doc_id AS id, comp.component,
       CAST(sizes.cluster_size AS BIGINT) AS cluster_size,
       round(CAST(1.0 AS DOUBLE) / CAST(sizes.cluster_size AS DOUBLE), 6) AS weight
FROM comp JOIN sizes USING (component)
"""


def sample_soft_dedup_sql(
    threshold: float = 0.5, rate: float = 0.9, salt: str = "",
    table: str = "documents",
) -> str:
    """Mirror of curation.sample_weighted over cluster_weights: the
    per-row 16-bit md5 coin vs floor(min(1, rate·weight)·65536) as a
    4-hex threshold."""
    n = f"CAST(floor(least(1.0, {rate} * weight) * 65536) AS BIGINT)"
    coin = f"substring(md5('{salt}' || CAST(id AS VARCHAR)), 1, 4)"
    return f"""
WITH cw AS ({cluster_weights_sql(threshold, table)})
SELECT id AS doc_id, weight FROM cw
WHERE {n} >= 65536 OR {coin} < printf('%04x', {n})
"""


def substring_dup_sql(
    window: int = 20, table: str = "documents", keep_first: bool = False
) -> str:
    """Mirror of curation.substring_dup_spans: rolling token windows,
    md5 per window, count > 1 anywhere in the corpus = duplicated span,
    covered tokens dropped from text_deduped. keep_first=True mirrors the
    Lee et al. survivor contract: the (min doc_id, min pos) occurrence of
    each duplicated window stays uncovered."""
    w = int(window)
    if keep_first:
        occ_cte = (
            "dup AS (SELECT wh, min(struct_pack(fd := doc_id, fp := pos)) AS fo\n"
            "        FROM wins GROUP BY wh HAVING count(*) > 1),\n"
            "occ AS (SELECT wins.doc_id, wins.pos FROM wins JOIN dup USING (wh)\n"
            "        WHERE NOT (wins.doc_id = dup.fo.fd AND wins.pos = dup.fo.fp))"
        )
    else:
        occ_cte = (
            "dup AS (SELECT wh FROM wins GROUP BY wh HAVING count(*) > 1),\n"
            "occ AS (SELECT doc_id, pos FROM wins JOIN dup USING (wh))"
        )
    return f"""
WITH tk AS (SELECT doc_id, {_WORDS} AS t FROM {table}),
wins AS (
  SELECT doc_id, s.pos AS pos, s.wh AS wh FROM (
    SELECT doc_id,
           unnest([struct_pack(pos := i,
                               wh := md5(array_to_string(list_slice(t, i, i + {w - 1}), ' ')))
                   FOR i IN range(1, len(t) - {w} + 2)]) AS s
    FROM tk WHERE len(t) >= {w})
),
{occ_cte},
cov AS (
  SELECT doc_id, list_distinct(flatten(list(range(pos, pos + {w})))) AS cp
  FROM occ GROUP BY doc_id
)
SELECT tk.doc_id,
       len(tk.t)::BIGINT AS n_tokens,
       coalesce(len(c.cp), 0)::BIGINT AS n_covered,
       round(coalesce(len(c.cp), 0)::DOUBLE / greatest(len(tk.t), 1)::DOUBLE, 6) AS dup_ratio,
       coalesce(array_to_string([tk.t[i] FOR i IN range(1, len(tk.t) + 1)
                                 IF NOT list_contains(coalesce(c.cp, CAST([] AS BIGINT[])), i)],
                                ' '), '') AS text_deduped
FROM tk LEFT JOIN cov c USING (doc_id)
"""


def substring_against_sql(
    window: int = 20, bench_pred: str = "doc_id % 17 = 3", table: str = "documents"
) -> str:
    """Mirror of curation.substring_spans_against with bench = the
    ``bench_pred`` subset of the same table (the decontaminate demo's
    deterministic benchmark split)."""
    w = int(window)
    return f"""
WITH tk AS (SELECT doc_id, {_WORDS} AS t FROM {table}),
wins AS (
  SELECT doc_id, s.pos AS pos, s.wh AS wh FROM (
    SELECT doc_id,
           unnest([struct_pack(pos := i,
                               wh := md5(array_to_string(list_slice(t, i, i + {w - 1}), ' ')))
                   FOR i IN range(1, len(t) - {w} + 2)]) AS s
    FROM tk WHERE len(t) >= {w})
),
bh AS (SELECT DISTINCT wh FROM wins WHERE {bench_pred}),
occ AS (SELECT doc_id, pos FROM wins JOIN bh USING (wh)),
cov AS (
  SELECT doc_id, list_distinct(flatten(list(range(pos, pos + {w})))) AS cp
  FROM occ GROUP BY doc_id
)
SELECT tk.doc_id,
       len(tk.t)::BIGINT AS n_tokens,
       coalesce(len(c.cp), 0)::BIGINT AS n_covered,
       round(coalesce(len(c.cp), 0)::DOUBLE / greatest(len(tk.t), 1)::DOUBLE, 6) AS contam_ratio,
       coalesce(array_to_string([tk.t[i] FOR i IN range(1, len(tk.t) + 1)
                                 IF NOT list_contains(coalesce(c.cp, CAST([] AS BIGINT[])), i)],
                                ' '), '') AS text_clean
FROM tk LEFT JOIN cov c USING (doc_id)
"""


def dsir_sql(buckets: int = 4096, table: str = "documents") -> str:
    """Mirror of curation.dsir_logratio with target = the doc_id % 7 == 0
    subset of the same table (the demo query's deterministic 'target
    corpus'). N_raw/N_tgt are scalar subqueries — exact integers equal to
    the Spark path's driver literals; per-feature weights integerized to
    micro-units before the per-doc sum."""
    B = int(buckets)
    h = _H.format(s="f")
    return f"""
WITH rw AS (SELECT doc_id, {_WORDS} AS t FROM {table}),
feats AS (
  SELECT doc_id, unnest(list_concat(
      list_filter(t, w -> w <> ''),
      [t[i] || ' ' || t[i + 1] FOR i IN range(1, len(t))])) AS f
  FROM rw
),
bf AS (SELECT doc_id, ({h}) % {B} AS b FROM feats),
cr AS (SELECT b, count(*)::BIGINT AS cr FROM bf GROUP BY b),
ct AS (SELECT b, count(*)::BIGINT AS ct FROM bf WHERE doc_id % 7 = 0 GROUP BY b),
nn AS (SELECT (SELECT coalesce(sum(cr), 0) FROM cr) AS nr,
              (SELECT coalesce(sum(ct), 0) FROM ct) AS nt),
wtab AS (
  SELECT cr.b,
         CAST(round((ln((coalesce(ct.ct, 0) + 1)::DOUBLE / (nn.nt + {B})::DOUBLE)
                   - ln((cr.cr + 1)::DOUBLE / (nn.nr + {B})::DOUBLE)) * 1e6) AS BIGINT) AS w
  FROM cr LEFT JOIN ct USING (b) CROSS JOIN nn
),
agg AS (SELECT bf.doc_id, sum(w)::BIGINT AS s, count(*)::BIGINT AS n_feat
        FROM bf JOIN wtab USING (b) GROUP BY bf.doc_id)
SELECT d.*, round(a.s::DOUBLE / 1e6, 6) AS dsir_lr, a.n_feat
FROM {table} d LEFT JOIN agg a USING (doc_id)
"""


def pack_sequences_sql(seq_len: int = 2048, table: str = "documents") -> str:
    """Mirror of curation.pack_sequences: exclusive prefix sum of TOKEN_RE
    token counts in doc_id order, chunked into seq_len sequences. The
    oracle uses a single global window (fine for DuckDB's single node);
    the Spark side computes the same prefix sum with the two-phase
    distributed scan."""
    L = int(seq_len)
    return f"""
WITH tc AS (
  SELECT doc_id, len(regexp_extract_all(text, '{TOKEN_RE}'))::BIGINT AS n_tokens FROM {table}
),
pre AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_pos
  FROM tc
)
SELECT doc_id, n_tokens, start_pos,
       (start_pos // {L})::BIGINT AS seq_id,
       (start_pos % {L})::BIGINT AS seq_offset,
       CASE WHEN n_tokens = 0 THEN 0
            ELSE ((start_pos + n_tokens - 1) // {L}) - (start_pos // {L}) + 1 END::BIGINT AS n_seqs
FROM pre
"""


def sample_token_budget_sql(
    budget: int, by: str | None = None, seed: str = "",
    table: str = "documents", id_col: str = "doc_id",
) -> str:
    """Mirror of curation.sample_token_budget (graded projection: id
    [, by], n_tokens): exclusive prefix sum of TOKEN_RE token counts in
    seeded-md5 order (per group with ``by``), keep while the prefix is
    under the budget. DuckDB's single global/per-group window stands in
    for the Spark side's distributed two-phase scan."""
    part = f"PARTITION BY {by} " if by else ""
    by_sel = f", {by}" if by else ""
    return f"""
WITH t AS (
  SELECT {id_col}{by_sel},
         len(regexp_extract_all(text, '{TOKEN_RE}'))::BIGINT AS n_tokens,
         md5('{seed}:' || CAST({id_col} AS STRING)) AS k
  FROM {table}
),
p AS (
  SELECT *, coalesce(sum(n_tokens) OVER ({part}ORDER BY k
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
  FROM t
)
SELECT {id_col}{by_sel}, n_tokens FROM p WHERE pre < {int(budget)}
"""


def bm25_sql(
    queries: list[tuple[int, str]],
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """Mirror of text.bm25_scores for a literal query list: same
    normalization/tokenization (_WORDS), Lucene-style idf, micro-unit
    integerized per-term contributions summed per (query, doc)."""
    qvals = ", ".join(f"({qid}, '{qt}')" for qid, qt in queries)
    return f"""
WITH dw AS (SELECT doc_id AS id, {_WORDS} AS w FROM {table}),
dls AS (SELECT id, len(w)::BIGINT AS dl FROM dw),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dls),
qraw (qid, qtext) AS (VALUES {qvals}),
qn AS (SELECT qid, string_split(regexp_replace(lower(trim(qtext)), '\\s+', ' ', 'g'), ' ') AS qw FROM qraw),
terms AS (SELECT DISTINCT qid, unnest(qw) AS term FROM qn WHERE len(qw) > 0),
terms_f AS (SELECT qid, term FROM terms WHERE term <> ''),
tset AS (SELECT DISTINCT term FROM terms_f),
tok AS (SELECT id, unnest(w) AS term FROM dw),
tf AS (
  SELECT tok.id, tok.term, count(*)::BIGINT AS tf
  FROM tok JOIN tset USING (term) WHERE tok.term <> '' GROUP BY tok.id, tok.term
),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.id, tf.term,
         CAST(round(
           ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * {float(k1) + 1.0})
           / (tf.tf + {float(k1)} * ({1.0 - float(b)} + {float(b)} * dls.dl / stats.avgdl))
           * 1e6) AS BIGINT) AS c
  FROM tf JOIN dfreq USING (term) JOIN dls ON tf.id = dls.id CROSS JOIN stats
)
SELECT t.qid AS query_id, c.id AS doc_id, round(sum(c.c)::DOUBLE / 1e6, 6) AS bm25
FROM contrib c JOIN terms_f t USING (term)
GROUP BY t.qid, c.id
"""


def embedding_components_sql(threshold: float = 0.9, table: str = "embeddings") -> str:
    """Mirror of dedup.embedding_components: recursive-CTE closure of the
    hyperplane-LSH verified pairs (same shape as minhash_components_sql)."""
    return f"""
WITH RECURSIVE pairs AS ({embedding_pairs_sql(threshold, table)}),
und AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM und
  UNION
  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u WHERE e.v <> r.u
),
comp AS (SELECT u, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u)
SELECT t.vec_id,
       COALESCE(c.component, t.vec_id) AS component,
       (COALESCE(c.component, t.vec_id) <> t.vec_id) AS is_dup
FROM {table} t LEFT JOIN comp c ON t.vec_id = c.u
"""


def langid_multi_sql(
    min_ratio: float = 0.05, cjk_ratio: float = 0.3, table: str = "documents"
) -> str:
    """Mirror of text.langid_multi: per-language stopword densities,
    struct-sort argmax ((-density, code) ascending), threshold to
    'unknown', with the CJK script branch (≥ cjk_ratio CJK chars → 'zh'
    scored by the CJK fraction). Same LANG_STOPWORDS / SCRIPT_RANGES
    constants."""
    from wrangler_spark.datapipe.constants import LANG_STOPWORDS, SCRIPT_RANGES

    items = []
    for lang in sorted(LANG_STOPWORDS):
        lst = "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]"
        r = (
            f"round(len(list_filter(w, x -> list_contains({lst}, x)))::DOUBLE"
            f" / greatest(len(w), 1)::DOUBLE, 6)"
        )
        items.append(f"struct_pack(nr := -{r}, l := '{lang}')")
    arr = "[" + ", ".join(items) + "]"
    denom = "greatest(length(regexp_replace(text, '\\s', '', 'g')), 1)::DOUBLE"
    fracs, pred_cases, score_cases = [], [], []
    for script, code in (("cjk", "zh"), ("arabic", "ar"), ("cyrillic", "ru"), ("greek", "el")):
        cls = "[" + "".join(
            f"\\x{{{lo:04X}}}-\\x{{{hi:04X}}}" for lo, hi in SCRIPT_RANGES[script]
        ) + "]"
        fr = f"round(len(regexp_extract_all(text, '{cls}'))::DOUBLE / {denom}, 6)"
        fracs.append(f"{fr} AS f_{script}")
        pred_cases.append(f"WHEN f_{script} >= {float(cjk_ratio)} THEN '{code}'")
        score_cases.append(f"WHEN f_{script} >= {float(cjk_ratio)} THEN f_{script}")
    return f"""
WITH wrd AS (SELECT *, {_WORDS} AS w FROM {table}),
scored AS (SELECT *, list_sort({arr})[1] AS best, {', '.join(fracs)} FROM wrd)
SELECT doc_id, text, lang, source, n_chars,
       CASE {' '.join(pred_cases)}
            WHEN -best.nr >= {float(min_ratio)} THEN best.l
            ELSE 'unknown' END AS lang_pred,
       CASE {' '.join(score_cases)}
            ELSE round(-best.nr, 6) END AS lang_score
FROM scored
"""


def url_canonicalize_sql(table: str = "documents") -> str:
    """Mirror of curation.url_canonicalize over the demo query's
    synthesized URLs (deterministic from doc_id so both engines build
    byte-identical inputs: a rotating mix of https/:443/www/tracking
    params, http/:80, no-query, and a bare non-URL label)."""
    from wrangler_spark.datapipe.curation import TRACKING_PARAM_RE

    url = (
        "CASE doc_id % 6 "
        "WHEN 0 THEN 'https://WWW.Site' || (doc_id % 7) || '.com:443/p' || (doc_id % 3) || '/?b=2&utm_source=x&a=1#f' "
        "WHEN 1 THEN 'http://Example' || (doc_id % 5) || '.org:80/a/b?z=9&fbclid=abc&y=8' "
        "WHEN 2 THEN 'https://cdn.host' || (doc_id % 2) || '.net/static/img.png' "
        "WHEN 3 THEN 'https://odd.port' || (doc_id % 3) || '.io:80/x?fbclid&a=1' "
        "WHEN 4 THEN 'http://alt' || (doc_id % 4) || '.example:8080/q/?utm_campaign' "
        "ELSE 'src' || (doc_id % 20) END"
    )
    pat = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]+)([^?#]*)(\?([^#]*))?"
    return f"""
WITH u AS (SELECT doc_id, {url} AS url FROM {table}),
p AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '{pat}', 1)) AS scheme,
         lower(regexp_extract(url, '{pat}', 2)) AS host0,
         regexp_replace(regexp_extract(url, '{pat}', 3), '/+$', '') AS path,
         regexp_extract(url, '{pat}', 5) AS query
  FROM u
),
n AS (
  SELECT *, CASE WHEN scheme = 'http' THEN regexp_replace(regexp_replace(host0, '^www\\.', ''), ':80$', '')
                 WHEN scheme = 'https' THEN regexp_replace(regexp_replace(host0, '^www\\.', ''), ':443$', '')
                 ELSE regexp_replace(host0, '^www\\.', '') END AS host,
         array_to_string(list_sort(list_filter(string_split(query, '&'),
             w -> w <> '' AND NOT regexp_matches(w, '{TRACKING_PARAM_RE}'))), '&') AS kept
  FROM p
)
SELECT doc_id, url,
       CASE WHEN host0 <> '' THEN scheme || '://' || host || path ||
            (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END)
            ELSE url END AS url_canonical,
       CASE WHEN host0 <> '' THEN host END AS url_host
FROM n
"""


def script_ratios_sql(table: str = "documents") -> str:
    """Mirror of text.script_ratios with RE2 \\x{..} codepoint classes."""
    from wrangler_spark.datapipe.constants import SCRIPT_RANGES

    denom = "greatest(length(regexp_replace(text, '\\s', '', 'g')), 1)::DOUBLE"
    cols, total = [], []
    for name in sorted(SCRIPT_RANGES):
        cls = "[" + "".join(
            f"\\x{{{lo:04X}}}-\\x{{{hi:04X}}}" for lo, hi in SCRIPT_RANGES[name]
        ) + "]"
        n = f"len(regexp_extract_all(text, '{cls}'))"
        cols.append(f"round({n}::DOUBLE / {denom}, 6) AS script_{name}")
        total.append(n)
    other = (
        f"round((length(regexp_replace(text, '\\s', '', 'g')) - ({' + '.join(total)}))::DOUBLE"
        f" / {denom}, 6) AS script_other"
    )
    return f"SELECT doc_id, text, lang, source, n_chars, {', '.join(cols)}, {other} FROM {table}"


def c4_quality_sql(
    min_words_per_line: int = 5, min_sentences: int = 3, table: str = "documents"
) -> str:
    """Mirror of text.c4_quality: the C4 line rule (terminal punctuation,
    min words, no 'javascript') + doc flags (lorem ipsum, brace, min
    sentences)."""
    term = """[.!?"'']$"""  # doubled quote inside the SQL string literal
    return f"""
WITH l AS (
  SELECT *, string_split(text, chr(10)) AS lines FROM {table}
),
k AS (
  SELECT *, list_filter(lines, x ->
           regexp_matches(rtrim(x), '{term}')
           AND len(regexp_extract_all(x, '\\S+')) >= {int(min_words_per_line)}
           AND NOT contains(lower(x), 'javascript')) AS kept
  FROM l
),
t AS (
  SELECT *, coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         contains(text, '{{') AS has_brace
  FROM k
)
SELECT doc_id, text, lang, source, n_chars, text_clean,
       len(lines)::BIGINT AS n_lines,
       len(kept)::BIGINT AS n_kept_lines,
       has_lorem, has_brace,
       len(regexp_extract_all(text_clean, '[.!?]'))::BIGINT AS n_sentences,
       (NOT has_lorem AND NOT has_brace
        AND len(regexp_extract_all(text_clean, '[.!?]')) >= {int(min_sentences)}) AS c4_pass
FROM t
"""


def perplexity_buckets_sql(
    vocab_size: int = 2000,
    by_col: str = "lang",
    fractions: tuple[float, float] = (1 / 3, 2 / 3),
    table: str = "documents",
) -> str:
    """Mirror of text.perplexity_buckets over unigram_logprob: per-group
    type-7 tertiles (quantile_cont == Spark's exact `percentile`
    interpolation), 6dp-rounded boundaries, head/middle/tail."""
    f1, f2 = float(fractions[0]), float(fractions[1])
    lp = unigram_logprob_sql(vocab_size, table)
    return f"""
WITH lpq AS ({lp}),
b AS (
  SELECT {by_col} AS byk,
         round(quantile_cont(doc_lp, {f1!r}), 6) AS b1,
         round(quantile_cont(doc_lp, {f2!r}), 6) AS b2
  FROM lpq GROUP BY {by_col}
)
SELECT lpq.*, CASE WHEN doc_lp IS NULL THEN NULL
                   WHEN doc_lp <= b.b1 THEN 'head'
                   WHEN doc_lp <= b.b2 THEN 'middle'
                   ELSE 'tail' END AS lp_bucket
FROM lpq LEFT JOIN b ON lpq.{by_col} IS NOT DISTINCT FROM b.byk
"""


def mixture_sample_sql(
    temperature: float = 0.5,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    table: str = "documents",
) -> str:
    """Mirror of curation.mixture_sample: per-domain counts, rate =
    round((n/n_min)^(τ−1), 6), floor-16-bit md5 hash gate."""
    tau = float(temperature)
    return f"""
WITH c AS (SELECT {domain_col} AS d, count(*)::BIGINT AS n_domain FROM {table} GROUP BY {domain_col}),
m AS (SELECT min(n_domain) AS nmin FROM c),
r AS (SELECT d, n_domain,
             round(pow(n_domain::DOUBLE / nmin::DOUBLE, {tau!r} - 1.0), 6) AS sample_rate
      FROM c CROSS JOIN m)
SELECT t.*, r.n_domain, r.sample_rate
FROM {table} t JOIN r ON t.{domain_col} IS NOT DISTINCT FROM r.d
WHERE r.sample_rate >= 1.0
   OR substr(md5('{salt}' || CAST(t.{id_col} AS VARCHAR)), 1, 4)
      < lpad(lower(hex(CAST(floor(r.sample_rate * 65536) AS INT))), 4, '0')
"""


def quality_classifier_sql(
    buckets: int = 512, iters: int = 3, lr: float = 1.0, table: str = "documents"
) -> str:
    """Mirror of train_quality_classifier + quality_classifier_score with
    pos = doc_id % 7 == 0 (the demo query's label): full-batch logistic
    regression unrolled to ``iters`` CTE pairs, the same integer
    micro-unit contract (6dp sigmoid -> integer error -> integer
    per-bucket gradient -> one rounded update)."""
    B = int(buckets)
    h = _H.format(s="f")
    ctes = [
        f"rw AS (SELECT doc_id, {_WORDS} AS t FROM {table})",
        "feats0 AS (SELECT doc_id, unnest(list_concat("
        "list_filter(t, w -> w <> ''), "
        "[t[i] || ' ' || t[i + 1] FOR i IN range(1, len(t))])) AS f FROM rw)",
        f"bf AS (SELECT DISTINCT doc_id, ({h}) % {B} AS b FROM feats0)",
        "fz AS (SELECT doc_id, b FROM bf UNION ALL SELECT DISTINCT doc_id, -1 AS b FROM bf)",
        "lab AS (SELECT DISTINCT doc_id, CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS y FROM bf)",
        "nn AS (SELECT count(*) AS nd FROM lab)",
        "w0 AS (SELECT DISTINCT b, CAST(0 AS BIGINT) AS w FROM fz)",
    ]
    for i in range(int(iters)):
        ctes.append(
            f"m{i} AS (SELECT f.doc_id, l.y, sum(w.w) AS m "
            f"FROM fz f JOIN w{i} w USING (b) JOIN lab l USING (doc_id) "
            f"GROUP BY f.doc_id, l.y)"
        )
        ctes.append(
            f"e{i} AS (SELECT doc_id, CAST(round((round(1.0 / (1.0 + exp(-(m::DOUBLE) / 1e6)), 6) - y) * 1e6) AS BIGINT) AS e "
            f"FROM m{i})"
        )
        ctes.append(
            f"g{i} AS (SELECT f.b, sum(e.e) AS g FROM fz f JOIN e{i} e USING (doc_id) GROUP BY f.b)"
        )
        ctes.append(
            f"w{i + 1} AS (SELECT w.b, w.w - CAST(round({float(lr)!r} * coalesce(g.g, 0)::DOUBLE / nn.nd) AS BIGINT) AS w "
            f"FROM w{i} w LEFT JOIN g{i} g USING (b) CROSS JOIN nn)"
        )
    K = int(iters)
    ctes.append(
        f"sf AS (SELECT DISTINCT doc_id, ({h}) % {B} AS b FROM feats0 "
        f"UNION ALL SELECT doc_id, -1 AS b FROM {table})"
    )
    ctes.append(
        f"sm AS (SELECT f.doc_id, sum(w.w) AS m FROM sf f JOIN w{K} w USING (b) GROUP BY f.doc_id)"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT d.doc_id, round(1.0 / (1.0 + exp(-(sm.m::DOUBLE) / 1e6)), 6) AS clf_score "
        f"FROM {table} d LEFT JOIN sm USING (doc_id)"
    )


def bigram_logprob_sql(
    vocab_size: int = 2000, lam: float = 0.7, table: str = "documents"
) -> str:
    """Mirror of text.bigram_logprob: interpolated bigram surprisal with
    the unigram add-one top-V floor, micro-unit integer per-doc sums;
    N/V scalar subqueries; interpolation constants rendered from the
    same Python doubles Spark uses."""
    V = int(vocab_size)
    L, M = float(lam), 1.0 - float(lam)
    punif = "(coalesce(v.cv, 0) + 1)::DOUBLE / (nv.n + nv.v + 1)::DOUBLE"
    return f"""
WITH rw AS (SELECT doc_id, list_filter({_WORDS}, x -> x <> '') AS wl FROM {table}),
toks AS (
  SELECT doc_id, unnest([struct_pack(
      prev := CASE WHEN i > 1 THEN wl[i - 1] END, cur := wl[i])
    FOR i IN range(1, len(wl) + 1)]) AS p
  FROM rw
),
t AS (SELECT doc_id, p.prev AS prev, p.cur AS cur FROM toks WHERE p.cur IS NOT NULL),
uni AS (SELECT cur, count(*)::BIGINT AS c FROM t GROUP BY cur),
vocab AS (SELECT cur, c AS cv FROM uni ORDER BY c DESC, cur ASC LIMIT {V}),
nv AS (SELECT (SELECT sum(c) FROM uni) AS n, (SELECT count(*) FROM vocab) AS v),
bi AS (SELECT prev, cur, count(*)::BIGINT AS c12 FROM t WHERE prev IS NOT NULL GROUP BY prev, cur),
bi2 AS (SELECT bi.prev, bi.cur, bi.c12, u.c AS c1 FROM bi JOIN uni u ON bi.prev = u.cur),
sc AS (
  SELECT t.doc_id,
         CAST(round(-log2(CASE WHEN t.prev IS NULL THEN {punif}
             ELSE {L!r} * coalesce(b.c12::DOUBLE / b.c1::DOUBLE, 0.0) + {M!r} * ({punif}) END
         ) * 1e6) AS BIGINT) AS s
  FROM t LEFT JOIN vocab v ON t.cur = v.cur
         LEFT JOIN bi2 b ON t.prev = b.prev AND t.cur = b.cur
         CROSS JOIN nv
),
agg AS (SELECT doc_id, sum(s) AS ssum, count(*) AS nt FROM sc GROUP BY doc_id)
SELECT d.*, round(a.ssum::DOUBLE / (a.nt::DOUBLE * 1e6), 6) AS doc_lp2
FROM {table} d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


def chunk_documents_sql(
    chunk_words: int = 256, overlap: int = 32, table: str = "documents"
) -> str:
    """Mirror of curation.chunk_documents: same start grid (1, 1+step, …
    capped so the tail window is generated exactly once)."""
    W, O = int(chunk_words), int(overlap)
    step = W - O
    return f"""
WITH b AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
  FROM {table}
),
s AS (
  SELECT doc_id, w,
         CASE WHEN len(w) >= 1
           THEN [x FOR x IN range(1, greatest(len(w) - {W - 1}, 1) + {step - 1} + 1, {step}) IF x <= len(w)]
           ELSE CAST([] AS BIGINT[]) END AS starts
  FROM b
),
e AS (SELECT doc_id, w, unnest(starts) AS cs, unnest(range(0, len(starts))) AS cid FROM s)
SELECT doc_id,
       CAST(cid AS BIGINT) AS chunk_id,
       CAST(cs AS BIGINT) AS chunk_start,
       array_to_string(list_slice(w, cs, cs + {W - 1}), ' ') AS chunk_text,
       least(len(w) - cs + 1, {W})::BIGINT AS n_chunk_words
FROM e
"""


def sample_to_budget_sql(
    weights: dict[str, float],
    budget: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    table: str = "documents",
) -> str:
    """Mirror of curation.sample_to_budget over token_count's n_tokens:
    renormalized target shares, want = round(share*budget),
    rate = round(min(1, want/avail), 6), floor-16-bit md5 gate."""
    total = sum(float(v) for v in weights.values())
    shares = {k: float(v) / total for k, v in weights.items()}
    share_case = " ".join(
        f"WHEN '{k}' THEN {v!r}" for k, v in shares.items()
    )
    return f"""
WITH tk AS (SELECT *, len(regexp_extract_all(text, '{TOKEN_RE}'))::BIGINT AS n_tokens FROM {table}),
agg AS (SELECT {domain_col} AS domain, count(*)::BIGINT AS n_docs,
               sum(n_tokens)::BIGINT AS avail_tokens
        FROM tk GROUP BY {domain_col}),
plan AS (
  SELECT domain, n_docs, avail_tokens,
         round(CASE domain {share_case} ELSE 0.0 END, 6) AS target_share,
         CAST(round((CASE domain {share_case} ELSE 0.0 END) * {float(int(budget))!r}) AS BIGINT) AS want_tokens
  FROM agg
),
plan2 AS (
  SELECT *, round(least(1.0, want_tokens::DOUBLE / greatest(avail_tokens, 1)::DOUBLE), 6) AS sample_rate
  FROM plan
)
SELECT tk.*, p.n_docs, p.avail_tokens, p.target_share, p.want_tokens, p.sample_rate
FROM tk JOIN plan2 p ON tk.{domain_col} IS NOT DISTINCT FROM p.domain
WHERE p.sample_rate >= 1.0
   OR substr(md5('{salt}' || CAST(tk.{id_col} AS VARCHAR)), 1, 4)
      < lpad(lower(hex(CAST(floor(p.sample_rate * 65536) AS INT))), 4, '0')
"""


def embedding_quantize_sql(table: str = "embeddings") -> str:
    """Mirror of similarity.embedding_quantize, graded as the hashable
    posexplode projection (vec_id, q_scale, pos, qv)."""
    return f"""
WITH b AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM {table}
),
m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM b),
q AS (
  SELECT vec_id,
         CASE WHEN ma > 0 THEN round(ma / 127.0, 6) END AS q_scale,
         CASE WHEN ma > 0 THEN list_transform(v, x -> CAST(round(x * 127.0 / ma) AS INT)) END AS qv
  FROM m
)
SELECT vec_id, q_scale,
       CAST(unnest(range(0, len(qv))) AS INT) AS pos,
       unnest(qv) AS qv
FROM q
"""


def cluster_survivors_sql(threshold: float = 0.5, table: str = "documents") -> str:
    """Mirror of dedup.cluster_survivors over minhash_components with
    n_chars as the quality column: one survivor per duplicate cluster =
    the longest member, ties to the smaller id. The oracle uses a rank
    window (fine for DuckDB at oracle scale); the Spark side is a
    pruned argmax aggregate — same fixpoint."""
    return f"""
WITH comp AS ({minhash_components_sql(threshold, table)}),
q AS (SELECT c.doc_id, c.component, t.n_chars
      FROM comp c JOIN {table} t USING (doc_id)),
w AS (SELECT doc_id, component,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM q)
SELECT doc_id, component, (rn = 1) AS keep FROM w
"""


def pair_eval_sql(
    minhash_threshold: float = 0.5, n: int = 3, jaccard_threshold: float = 0.5,
    table: str = "documents",
) -> str:
    """Mirror of dedup.pair_eval(minhash_lsh_pairs, ngram_jaccard_pairs):
    precision/recall of the LSH pair generator against exact word-gram
    Jaccard at the same threshold."""
    return f"""
WITH a AS (
  SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
  FROM ({minhash_lsh_sql(minhash_threshold, table)})
),
e AS (
  SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
  FROM ({ngram_jaccard_sql(n, jaccard_threshold, table=table, unit="word")})
),
j AS (
  SELECT (a.u IS NOT NULL) AS ia, (e.u IS NOT NULL) AS ie
  FROM a FULL JOIN e ON a.u = e.u AND a.v = e.v
)
SELECT count(CASE WHEN ia THEN 1 END) AS approx_pairs,
       count(CASE WHEN ie THEN 1 END) AS exact_pairs,
       count(CASE WHEN ia AND ie THEN 1 END) AS hits,
       round(count(CASE WHEN ia AND ie THEN 1 END)
             / greatest(count(CASE WHEN ia THEN 1 END), 1), 6) AS precision,
       round(count(CASE WHEN ia AND ie THEN 1 END)
             / greatest(count(CASE WHEN ie THEN 1 END), 1), 6) AS recall
FROM j
"""


def embedding_project_sql(
    dim_in: int = 64, dim_out: int = 16, seed: int = 1337, table: str = "embeddings"
) -> str:
    """Mirror of similarity.embedding_project, graded as the hashable
    (vec_id, pos, y) explode. Inlines the SAME seeded LCG sign matrix the
    Spark op uses (constants.jl_signs), so both engines multiply
    identical literals."""
    from .constants import jl_signs

    signs = jl_signs(dim_out, dim_in, seed)
    comps = []
    for row in signs:
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in row) + "]"
        dot = _DOT.format(a="v", b=lit)
        comps.append(f"round({dot} / sqrt({float(dim_out)}), 6)")
    arr = "[" + ", ".join(comps) + "]"
    return f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM {table}
),
proj AS (SELECT vec_id, {arr} AS y FROM base WHERE v IS NOT NULL)
SELECT vec_id,
       CAST(unnest(range(0, {dim_out})) AS INT) AS pos,
       unnest(y) AS y
FROM proj
"""


def exact_dedup_against_sql(split_mod: int = 3, table: str = "documents") -> str:
    """Mirror of dedup.exact_dedup_against with the graded split: OLD =
    doc_id % split_mod == 0, NEW = the rest."""
    return f"""
WITH nw AS (SELECT doc_id, md5({_NORM}) AS k FROM {table} WHERE doc_id % {split_mod} <> 0),
od AS (SELECT DISTINCT md5({_NORM}) AS k FROM {table} WHERE doc_id % {split_mod} = 0)
SELECT nw.doc_id, (od.k IS NOT NULL) AS is_dup
FROM nw LEFT JOIN od USING (k)
"""


def minhash_cross_sql(
    threshold: float = 0.5, split_mod: int = 3, table: str = "documents",
    cap: int = 100,
) -> str:
    """Mirror of dedup.minhash_pairs_against on the same split: bands are
    computed once over the whole table, then the candidate join pairs NEW
    ids (doc_id % split_mod != 0) with OLD ids only. The old side's
    per-(band, key) bucket cap is mirrored exactly (smallest ``cap``
    ids — slice(array_sort) there, a row_number qualify here), so
    parity holds even on near-dup-dense corpora where the cap binds
    (the embedding_cross_sql lesson from the sf1 replica)."""
    h = _H.format(s="s")
    sig_exprs = ", ".join(
        f"list_min(list_transform(h, x -> ({a} * x + {b}) % {MINHASH_P})) AS mh{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_selects = " UNION ALL ".join(
        "SELECT id, shingles, {b} AS band, ".format(b=b)
        + " || '-' || ".join(f"CAST(mh{b * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS))
        + " AS key FROM sig"
        for b in range(LSH_BANDS)
    )
    return f"""
WITH {_shingles_cte(table)},
hsh AS (SELECT id, shingles, list_transform(shingles, s -> {h}) AS h FROM sh),
sig AS (SELECT id, shingles, {sig_exprs} FROM hsh),
bands AS ({band_selects}),
old_b AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY band, key ORDER BY id) AS rn
    FROM bands WHERE id % {split_mod} = 0) WHERE rn <= {int(cap)}
),
cand AS (
  SELECT DISTINCT l.id AS id_new, r.id AS id_old, l.shingles AS sa, r.shingles AS sb
  FROM bands l JOIN old_b r
    ON l.band = r.band AND l.key = r.key
   AND l.id % {split_mod} <> 0
)
SELECT id_new, id_old,
  round(len(list_intersect(sa, sb))::DOUBLE / len(list_distinct(list_concat(sa, sb)))::DOUBLE, 6) AS jaccard
FROM cand
WHERE round(len(list_intersect(sa, sb))::DOUBLE / len(list_distinct(list_concat(sa, sb)))::DOUBLE, 6) >= {threshold}
"""


def cap_per_group_sql(n: int = 20, table: str = "documents") -> str:
    """Mirror of curation.cap_per_group(documents, source, doc_id, n,
    order_col='n_chars'): keep the n longest docs per source domain."""
    return f"""
WITH r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id ASC) AS rn
  FROM {table}
)
SELECT source, doc_id FROM r WHERE rn <= {int(n)}
"""


def winnow_sql(k: int = 3, w: int = 4, table: str = "documents") -> str:
    """Mirror of text.winnow_fingerprints: k-word gram hashes, window of
    w, rightmost minimum per window (list_position over the reversed
    window finds the LAST occurrence), selections exploded then
    SELECT DISTINCT (DuckDB's list_distinct can't hash struct lists)."""
    h = _H.format(s="array_to_string(wd[i:i+{km1}], ' ')").format(km1=k - 1)
    return f"""
WITH tk AS (SELECT doc_id, {_WORDS} AS wd FROM {table}),
gh AS (
  SELECT doc_id,
         [{h} FOR i IN range(1, len(wd) - {k} + 2)] AS hs
  FROM tk WHERE len(wd) >= {k}
),
sel AS (
  SELECT doc_id,
         [
           struct_pack(
             p := i + ({w} - list_position(list_reverse(hs[i:i+{w - 1}]), list_min(hs[i:i+{w - 1}]))),
             v := list_min(hs[i:i+{w - 1}])
           )
           FOR i IN range(1, len(hs) - {w} + 2)
         ] AS sels
  FROM gh WHERE len(hs) >= {w}
)
SELECT DISTINCT doc_id, s.p AS pos, s.v AS fp
FROM (SELECT doc_id, unnest(sels) AS s FROM sel)
"""


def winnow_overlap_sql(
    k: int = 3, w: int = 4, min_shared: int = 2, max_fp_df: int = 1000,
    table: str = "documents",
) -> str:
    """Mirror of text.winnow_overlap composed over winnow_sql."""
    return f"""
WITH fp0 AS (SELECT DISTINCT doc_id AS id, fp FROM ({winnow_sql(k, w, table)})),
hot AS (SELECT fp FROM fp0 GROUP BY fp HAVING count(DISTINCT id) <= {int(max_fp_df)}),
fps AS (SELECT fp0.id, fp0.fp FROM fp0 JOIN hot USING (fp))
SELECT l.id AS id_a, r.id AS id_b, count(*) AS shared_fps
FROM fps l JOIN fps r ON l.fp = r.fp AND l.id < r.id
GROUP BY l.id, r.id
HAVING count(*) >= {int(min_shared)}
"""


def winnow_overlap_budget_sql(
    k: int = 3, w: int = 4, min_shared: int = 2, max_fp_df: int = 1000,
    fp_sample_mod: int = 2, table: str = "documents",
) -> str:
    """Mirror of text.winnow_overlap with the fp_sample_mod budget:
    candidates on the ``fp % mod = 0`` subset at the scaled threshold,
    exact shared-count verification of survivors only."""
    thr = max(1, int(min_shared) // int(fp_sample_mod))
    return f"""
WITH fp0 AS (SELECT DISTINCT doc_id AS id, fp FROM ({winnow_sql(k, w, table)})),
hot AS (SELECT fp FROM fp0 GROUP BY fp HAVING count(DISTINCT id) <= {int(max_fp_df)}),
fps AS (SELECT fp0.id, fp0.fp FROM fp0 JOIN hot USING (fp)),
sub AS (SELECT * FROM fps WHERE fp % {int(fp_sample_mod)} = 0),
cand AS (
  SELECT l.id AS id_a, r.id AS id_b
  FROM sub l JOIN sub r ON l.fp = r.fp AND l.id < r.id
  GROUP BY l.id, r.id
  HAVING count(*) >= {thr})
SELECT c.id_a, c.id_b, count(*) AS shared_fps
FROM cand c
JOIN fps fa ON fa.id = c.id_a
JOIN fps fb ON fb.id = c.id_b AND fb.fp = fa.fp
GROUP BY c.id_a, c.id_b
HAVING count(*) >= {int(min_shared)}
"""


def corpus_diff_sql(table: str = "documents") -> str:
    """Mirror of curation.corpus_diff on the graded synthetic split:
    OLD = docs with doc_id % 11 != 0; NEW = docs with doc_id % 7 != 0,
    text suffixed ' v2' when doc_id % 5 == 0 — exercises all four
    statuses on one table."""
    return f"""
WITH a AS (
  SELECT doc_id AS ia, md5({_NORM}) AS ka FROM {table} WHERE doc_id % 11 <> 0
),
b0 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM {table} WHERE doc_id % 7 <> 0
),
b AS (SELECT doc_id AS ib, md5({_NORM}) AS kb FROM b0)
SELECT coalesce(ib, ia) AS doc_id,
       CASE WHEN ia IS NULL THEN 'added'
            WHEN ib IS NULL THEN 'removed'
            WHEN ka <> kb THEN 'changed'
            ELSE 'unchanged' END AS status
FROM a FULL JOIN b ON ia = ib
"""


def keyword_tag_sql(keywords: list[str], table: str = "documents") -> str:
    """Mirror of curation.keyword_tag for a literal keyword list (1- and
    2-word phrases; longer phrases would add a gN CTE per length)."""
    ones = [k for k in keywords if len(k.split()) == 1]
    twos = [k for k in keywords if len(k.split()) == 2]
    assert len(ones) + len(twos) == len(keywords), "oracle supports 1-2 word phrases"
    kw_vals = ", ".join(f"('{k}')" for k in keywords)
    return f"""
WITH kws AS (SELECT * FROM (VALUES {kw_vals}) AS t(kw)),
tk AS (SELECT doc_id, {_WORDS} AS w FROM {table}),
g1 AS (SELECT doc_id, unnest(w) AS g FROM tk),
g2 AS (SELECT doc_id, unnest([array_to_string(w[i:i+1], ' ')
                              FOR i IN range(1, len(w))]) AS g
       FROM tk WHERE len(w) >= 2),
hits AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
SELECT h.doc_id, k.kw AS keyword, count(*) AS n_hits
FROM hits h JOIN kws k ON h.g = k.kw
GROUP BY h.doc_id, k.kw
"""


def shuffle_shards_sql(n_shards: int = 8, seed: str = "", table: str = "documents") -> str:
    """Mirror of curation.shuffle_shards (projection: id, shard, sort_key)."""
    h = _H.format(s=f"'{seed}:' || CAST(doc_id AS STRING)")
    return f"""
SELECT doc_id,
       CAST({h} % {int(n_shards)} AS INT) AS shard,
       md5('{seed}:' || CAST(doc_id AS STRING)) AS sort_key
FROM {table}
"""


def corpus_report_sql(table: str = "documents") -> str:
    """Mirror of curation.corpus_report with lang_col='lang'."""
    return f"""
SELECT count(*) AS n_docs,
       count(CASE WHEN text IS NULL THEN 1 END) AS n_null_text,
       CAST(coalesce(sum(len(text)), 0) AS BIGINT) AS n_chars,
       CAST(coalesce(sum(len({_WORDS})), 0) AS BIGINT) AS n_words,
       count(text) - count(DISTINCT md5({_NORM})) AS n_exact_dup_docs,
       count(DISTINCT lang) AS distinct_langs,
       round((count(text) - count(DISTINCT md5({_NORM})))::DOUBLE
             / greatest(count(*), 1)::DOUBLE, 6) AS pct_dup
FROM {table}
"""


def split_by_cluster_sql(
    threshold: float = 0.5, test_frac: float = 0.1, salt: str = "",
    table: str = "documents",
) -> str:
    """Mirror of curation.split_by_cluster over minhash_components."""
    thr = int(float(test_frac) * 65536)
    return f"""
WITH comp AS ({minhash_components_sql(threshold, table)})
SELECT doc_id, component, is_dup,
       CASE WHEN substr(md5('{salt}:' || CAST(component AS VARCHAR)), 1, 4)
                 < lpad(lower(hex({thr})), 4, '0')
            THEN 'test' ELSE 'train' END AS split
FROM comp
"""


def corpus_report_by_sql(group_col: str = "source", table: str = "documents") -> str:
    """Mirror of curation.corpus_report_by."""
    return f"""
SELECT {group_col},
       count(*) AS n_docs,
       count(CASE WHEN text IS NULL THEN 1 END) AS n_null_text,
       CAST(coalesce(sum(len(text)), 0) AS BIGINT) AS n_chars,
       CAST(coalesce(sum(len({_WORDS})), 0) AS BIGINT) AS n_words,
       count(text) - count(DISTINCT md5({_NORM})) AS n_exact_dup_docs,
       round((count(text) - count(DISTINCT md5({_NORM})))::DOUBLE
             / greatest(count(*), 1)::DOUBLE, 6) AS pct_dup
FROM {table}
GROUP BY {group_col}
"""


def bm25_topk_sql(
    queries: list[tuple[int, str]], k: int = 10,
    k1: float = 1.2, b: float = 0.75, table: str = "documents",
) -> str:
    """Mirror of text.bm25_topk: bm25_sql ranked per query (score desc,
    ties → smaller doc id), top k."""
    return f"""
WITH s AS ({bm25_sql(queries, k1, b, table)}),
r AS (SELECT query_id, doc_id AS vec_id, bm25,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY bm25 DESC, doc_id) AS INT) AS rank
      FROM s)
SELECT query_id, vec_id, bm25, rank FROM r WHERE rank <= {int(k)}
"""


def entity_match_sql(
    max_dist: int = 2, table: str = "customer", cap: int = 1000,
) -> str:
    """Mirror of dedup.entity_match_pairs on the graded parameters:
    block on (c_nationkey, c_mktsegment), verify c_name levenshtein.
    The block-membership cap (smallest ``cap`` ids per block) is
    mirrored with a row_number qualify on BOTH sides — same lesson as
    embedding_cross_sql: never assume a capacity governor won't bind."""
    return f"""
WITH c0 AS (SELECT c_custkey, c_nationkey, c_mktsegment, c_name FROM {table}),
c AS (SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY c_nationkey, c_mktsegment
                                     ORDER BY c_custkey) AS rn
        FROM c0) WHERE rn <= {int(cap)})
SELECT l.c_custkey AS id_a, r.c_custkey AS id_b,
       levenshtein(l.c_name, r.c_name) AS c_name_dist
FROM c l JOIN c r
  ON l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment
 AND l.c_custkey < r.c_custkey
WHERE levenshtein(l.c_name, r.c_name) <= {int(max_dist)}
"""


def entity_match_against_sql(
    max_dist: int = 2, table: str = "customer", cap: int = 1000,
) -> str:
    """Mirror of dedup.entity_match_against on the graded parameters:
    new = c_custkey % 3 = 0, old = the rest; block on (c_nationkey,
    c_mktsegment), verify c_name levenshtein. Asymmetric new-old pairs
    only — strict join equality, so NULL keys match nothing. The OLD
    side's per-block cap is mirrored exactly (smallest ``cap`` ids)."""
    return f"""
WITH n AS (SELECT c_custkey, c_nationkey, c_mktsegment, c_name FROM {table}
           WHERE c_custkey % 3 = 0),
o AS (SELECT * FROM (
        SELECT c_custkey, c_nationkey, c_mktsegment, c_name,
               row_number() OVER (PARTITION BY c_nationkey, c_mktsegment
                                  ORDER BY c_custkey) AS rn
        FROM {table} WHERE c_custkey % 3 <> 0) WHERE rn <= {int(cap)})
SELECT n.c_custkey AS id_new, o.c_custkey AS id_old,
       levenshtein(n.c_name, o.c_name) AS c_name_dist
FROM n JOIN o
  ON n.c_nationkey = o.c_nationkey AND n.c_mktsegment = o.c_mktsegment
WHERE levenshtein(n.c_name, o.c_name) <= {int(max_dist)}
"""


def template_dedup_sql(table: str = "documents") -> str:
    """Mirror of dedup.template_dedup (urls + numbers masked)."""
    masked = (
        f"regexp_replace(regexp_replace({_NORM}, "
        f"'[a-z][a-z0-9+.-]*://[^ ]+', '<url>', 'g'), '[0-9]+', '#', 'g')"
    )
    return f"""
SELECT min(doc_id) AS doc_id, count(*) AS n_dups, k AS template_key
FROM (SELECT doc_id, md5({masked}) AS k FROM {table})
GROUP BY k
"""


def cluster_histogram_sql(threshold: float = 0.5, table: str = "documents") -> str:
    """Mirror of dedup.cluster_histogram over minhash_components."""
    return f"""
WITH comp AS ({minhash_components_sql(threshold, table)}),
sizes AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
SELECT cluster_size, count(*) AS n_clusters,
       cluster_size * count(*) AS n_docs
FROM sizes GROUP BY cluster_size
"""


def flag_outliers_sql(
    col: str = "c_acctbal", method: str = "zscore", k: float = 3.0,
    table: str = "customer", id_col: str = "c_custkey",
) -> str:
    """Mirror of numeric.flag_outliers (graded projection: id, flag)."""
    if method == "zscore":
        return f"""
WITH s AS (SELECT avg({col}) AS m, coalesce(stddev_pop({col}), 0) AS sd FROM {table})
SELECT {id_col}, ({col} IS NOT NULL AND sd > 0 AND abs({col} - m) > {float(k)} * sd)
       AS {col}_outlier
FROM {table} CROSS JOIN s
"""
    if method == "mad":
        return f"""
WITH m AS (SELECT quantile_cont({col}, 0.5) AS med FROM {table}),
s AS (SELECT min(med) AS med, quantile_cont(abs({col} - med), 0.5) AS mad
      FROM {table} CROSS JOIN m)
SELECT {id_col}, ({col} IS NOT NULL AND mad > 0
       AND abs({col} - med) > {float(k)} * 1.4826 * mad) AS {col}_outlier
FROM {table} CROSS JOIN s
"""
    return f"""
WITH s AS (SELECT quantile_cont({col}, 0.25) AS q1, quantile_cont({col}, 0.75) AS q3 FROM {table})
SELECT {id_col}, ({col} IS NOT NULL AND
       ({col} < q1 - {float(k)} * (q3 - q1) OR {col} > q3 + {float(k)} * (q3 - q1)))
       AS {col}_outlier
FROM {table} CROSS JOIN s
"""


def flag_outliers_by_sql(
    col: str = "c_acctbal", method: str = "mad", k: float = 3.5,
    by: str = "c_mktsegment", table: str = "customer", id_col: str = "c_custkey",
) -> str:
    """Mirror of numeric.flag_outliers(by=[...]) — per-group fences
    joined back null-safely (IS NOT DISTINCT FROM == eqNullSafe).
    Graded projection: (id, group, flag)."""
    if method == "zscore":
        return f"""
WITH s AS (SELECT {by} AS g, avg({col}) AS m, coalesce(stddev_pop({col}), 0) AS sd
           FROM {table} GROUP BY {by})
SELECT t.{id_col}, t.{by}, (t.{col} IS NOT NULL AND s.sd > 0
       AND abs(t.{col} - s.m) > {float(k)} * s.sd) AS {col}_outlier
FROM {table} t JOIN s ON t.{by} IS NOT DISTINCT FROM s.g
"""
    if method == "mad":
        return f"""
WITH m AS (SELECT {by} AS g, quantile_cont({col}, 0.5) AS med
           FROM {table} GROUP BY {by}),
s AS (SELECT m.g, m.med, quantile_cont(abs(t.{col} - m.med), 0.5) AS mad
      FROM {table} t JOIN m ON t.{by} IS NOT DISTINCT FROM m.g
      GROUP BY m.g, m.med)
SELECT t.{id_col}, t.{by}, (t.{col} IS NOT NULL AND s.mad > 0
       AND abs(t.{col} - s.med) > {float(k)} * 1.4826 * s.mad) AS {col}_outlier
FROM {table} t JOIN s ON t.{by} IS NOT DISTINCT FROM s.g
"""
    return f"""
WITH s AS (SELECT {by} AS g, quantile_cont({col}, 0.25) AS q1,
                  quantile_cont({col}, 0.75) AS q3 FROM {table} GROUP BY {by})
SELECT t.{id_col}, t.{by}, (t.{col} IS NOT NULL AND
       (t.{col} < s.q1 - {float(k)} * (s.q3 - s.q1)
        OR t.{col} > s.q3 + {float(k)} * (s.q3 - s.q1))) AS {col}_outlier
FROM {table} t JOIN s ON t.{by} IS NOT DISTINCT FROM s.g
"""


def keep_top_frac_by_sql(
    frac: float, score_col: str = "c_acctbal", by: str = "c_mktsegment",
    table: str = "customer", id_col: str = "c_custkey",
) -> str:
    """Mirror of curation.keep_top_frac(by=[...]) — per-group threshold,
    boundary ties all kept. Graded projection: (id, group, score)."""
    return f"""
WITH s AS (SELECT {by} AS g, quantile_cont({score_col}, {1.0 - float(frac)}) AS thr
           FROM {table} GROUP BY {by})
SELECT t.{id_col}, t.{by}, t.{score_col}
FROM {table} t JOIN s ON t.{by} IS NOT DISTINCT FROM s.g
WHERE CAST(t.{score_col} AS DOUBLE) >= s.thr
"""


def scale_column_sql(
    col: str = "c_acctbal", method: str = "minmax",
    table: str = "customer", id_col: str = "c_custkey",
) -> str:
    """Mirror of numeric.scale_column (graded projection: id, scaled)."""
    if method == "minmax":
        return f"""
WITH s AS (SELECT min({col}) AS lo, max({col}) AS hi FROM {table})
SELECT {id_col},
       CASE WHEN hi - lo > 0 THEN round(({col} - lo) / (hi - lo), 6)
            WHEN {col} IS NOT NULL THEN 0.0 END AS {col}_scaled
FROM {table} CROSS JOIN s
"""
    return f"""
WITH s AS (SELECT avg({col}) AS m, coalesce(stddev_pop({col}), 0) AS sd FROM {table})
SELECT {id_col},
       CASE WHEN sd > 0 THEN round(({col} - m) / sd, 6)
            WHEN {col} IS NOT NULL THEN 0.0 END AS {col}_scaled
FROM {table} CROSS JOIN s
"""


def scale_by_sql(
    col: str = "c_acctbal", method: str = "zscore", by: str = "c_mktsegment",
    table: str = "customer", id_col: str = "c_custkey",
) -> str:
    """Mirror of numeric.scale_column(by=[...]) — per-group stats joined
    back null-safely (DuckDB's IS NOT DISTINCT FROM == eqNullSafe)."""
    if method == "minmax":
        stats = f"SELECT {by}, min({col}) AS lo, max({col}) AS hi FROM {table} GROUP BY {by}"
        scaled = (
            f"CASE WHEN s.hi - s.lo > 0 THEN round((t.{col} - s.lo) / (s.hi - s.lo), 6) "
            f"WHEN t.{col} IS NOT NULL THEN 0.0 END"
        )
    else:
        stats = (
            f"SELECT {by}, avg({col}) AS m, coalesce(stddev_pop({col}), 0) AS sd "
            f"FROM {table} GROUP BY {by}"
        )
        scaled = (
            f"CASE WHEN s.sd > 0 THEN round((t.{col} - s.m) / s.sd, 6) "
            f"WHEN t.{col} IS NOT NULL THEN 0.0 END"
        )
    return f"""
WITH s AS ({stats})
SELECT t.{id_col}, t.{by}, {scaled} AS {col}_scaled
FROM {table} t JOIN s ON t.{by} IS NOT DISTINCT FROM s.{by}
"""


def keep_top_frac_sql(
    frac: float, score_col: str = "c_acctbal",
    table: str = "customer", id_col: str = "c_custkey",
) -> str:
    """Mirror of curation.keep_top_frac (graded projection: id, score)."""
    return f"""
WITH s AS (SELECT quantile_cont({score_col}, {1.0 - float(frac)}) AS thr FROM {table})
SELECT {id_col}, {score_col} FROM {table} CROSS JOIN s
WHERE CAST({score_col} AS DOUBLE) >= thr
"""


def winsorize_sql(
    col: str = "c_acctbal", lo: float = 0.01, hi: float = 0.99,
    table: str = "customer", id_col: str = "c_custkey",
) -> str:
    """Mirror of numeric.winsorize_column (graded: id, clipped)."""
    return f"""
WITH s AS (SELECT quantile_cont({col}, {float(lo)}) AS plo,
                  quantile_cont({col}, {float(hi)}) AS phi FROM {table})
SELECT {id_col},
       CASE WHEN {col} IS NOT NULL
            THEN round(least(greatest(CAST({col} AS DOUBLE), plo), phi), 6) END
       AS {col}_wins
FROM {table} CROSS JOIN s
"""


def quantile_bins_sql(
    col: str = "c_acctbal", n_bins: int = 10,
    table: str = "customer", id_col: str = "c_custkey",
) -> str:
    """Mirror of numeric.quantile_bins (graded: id, bin). Boundaries as
    n-1 quantile_cont scalars; bin = 1 + #{boundaries strictly < x}."""
    n = int(n_bins)
    bounds = ", ".join(
        f"quantile_cont({col}, {i / n}) AS b{i}" for i in range(1, n)
    )
    hits = " + ".join(
        f"(CASE WHEN b{i} < {col} THEN 1 ELSE 0 END)" for i in range(1, n)
    )
    return f"""
WITH s AS (SELECT {bounds} FROM {table})
SELECT {id_col},
       CASE WHEN {col} IS NOT NULL THEN CAST(1 + {hits} AS INT) END AS {col}_bin
FROM {table} CROSS JOIN s
"""


def ngram_repetition_sql(
    top_ns: tuple[int, ...] = (2, 3, 4), dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    table: str = "documents", id_col: str = "doc_id",
) -> str:
    """Mirror of text.ngram_repetition_stats (graded projection: id +
    the fraction columns). Same contract: occurrence-sum char coverage
    over the normalized text length, dup capped at 1.0, <n words -> 0."""
    ns = sorted(set((*top_ns, *dup_ns)))
    n_list = ", ".join(str(n) for n in ns)
    tops = ",\n       ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN round(least(top_chars / greatest(nc, 1), 1.0), 6) END), 0.0)"
        f" AS top_{n}gram_char_frac" for n in top_ns
    )
    # top_chars counts only grams occurring >= 2 times (a singleton is
    # not repetition — the shared contract with the Spark side)
    dups = ",\n       ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN round(least(dup_chars / greatest(nc, 1), 1.0), 6) END), 0.0)"
        f" AS dup_{n}gram_char_frac" for n in dup_ns
    )
    return f"""
WITH base AS (
  SELECT {id_col}, list_filter(string_split({_NORM}, ' '), x -> x <> '') AS w
  FROM {table}
),
b2 AS (SELECT {id_col}, w, length(array_to_string(w, ' ')) AS nc FROM base),
g AS (
  SELECT {id_col}, nc, n,
         unnest(list_transform(range(1, greatest(len(w) - n + 1, 0) + 1),
                i -> array_to_string(w[i:i + n - 1], ' '))) AS gram
  FROM b2 CROSS JOIN (SELECT unnest([{n_list}]) AS n) ns
),
c AS (SELECT {id_col}, nc, n, gram, count(*) AS cnt FROM g GROUP BY ALL),
agg AS (
  SELECT {id_col}, n, min(nc) AS nc,
         coalesce(max(CASE WHEN cnt >= 2 THEN cnt * length(gram) END), 0) AS top_chars,
         coalesce(sum(CASE WHEN cnt >= 2 THEN cnt * length(gram) END), 0) AS dup_chars
  FROM c GROUP BY {id_col}, n
),
p AS (
  SELECT {id_col},
       {tops},
       {dups}
  FROM agg GROUP BY {id_col}
)
SELECT t.{id_col},
       {", ".join(f"coalesce(p.top_{n}gram_char_frac, 0.0) AS top_{n}gram_char_frac" for n in top_ns)},
       {", ".join(f"coalesce(p.dup_{n}gram_char_frac, 0.0) AS dup_{n}gram_char_frac" for n in dup_ns)}
FROM {table} t LEFT JOIN p ON t.{id_col} = p.{id_col}
"""


def repetition_filter_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """Mirror of text.repetition_filter: the Gopher A1.1 caps applied to
    the line AND paragraph ratios + n-gram char fractions (graded: id,
    pass). Null signals coalesce to 0 on both engines (null text
    passes)."""
    caps = {2: 0.20, 3: 0.18, 4: 0.16, 5: 0.15, 6: 0.14, 7: 0.13,
            8: 0.12, 9: 0.11, 10: 0.10}
    n_list = ", ".join(str(n) for n in caps)

    def ratio(num, den):
        return f"round(({num})::DOUBLE / greatest({den}, 1)::DOUBLE, 6)"

    def chars(arr):
        return f"list_sum(list_transform({arr}, x -> length(x)))"

    paras = r"regexp_split_to_array(text, '\n{2,}')"
    dup_line = f"round(1.0 - {ratio(f'len(list_distinct({_LINES}))', f'len({_LINES})')}, 6)"
    dup_line_char = (
        f"round(1.0 - {ratio(chars(f'list_distinct({_LINES})'), chars(_LINES))}, 6)"
    )
    dup_para = f"round(1.0 - {ratio(f'len(list_distinct({paras}))', f'len({paras})')}, 6)"
    dup_para_char = (
        f"round(1.0 - {ratio(chars(f'list_distinct({paras})'), chars(paras))}, 6)"
    )
    # top/dup char sums computed in the agg CTE, caps applied in the pivot
    tops = " AND ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN round(least(top_chars / greatest(nc, 1), 1.0), 6) END), 0.0) <= {caps[n]}"
        for n in (2, 3, 4)
    )
    dups = " AND ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN round(least(dup_chars / greatest(nc, 1), 1.0), 6) END), 0.0) <= {caps[n]}"
        for n in (5, 6, 7, 8, 9, 10)
    )
    return f"""
WITH base AS (
  SELECT {id_col}, list_filter(string_split({_NORM}, ' '), x -> x <> '') AS w
  FROM {table}
),
b2 AS (SELECT {id_col}, w, length(array_to_string(w, ' ')) AS nc FROM base),
g AS (
  SELECT {id_col}, nc, n,
         unnest(list_transform(range(1, greatest(len(w) - n + 1, 0) + 1),
                i -> array_to_string(w[i:i + n - 1], ' '))) AS gram
  FROM b2 CROSS JOIN (SELECT unnest([{n_list}]) AS n) ns
),
c AS (SELECT {id_col}, nc, n, gram, count(*) AS cnt FROM g GROUP BY ALL),
agg AS (
  SELECT {id_col}, n, min(nc) AS nc,
         coalesce(max(CASE WHEN cnt >= 2 THEN cnt * length(gram) END), 0) AS top_chars,
         coalesce(sum(CASE WHEN cnt >= 2 THEN cnt * length(gram) END), 0) AS dup_chars
  FROM c GROUP BY {id_col}, n
),
p AS (SELECT {id_col}, ({tops} AND {dups}) AS gram_ok FROM agg GROUP BY {id_col}),
l AS (
  SELECT {id_col},
         coalesce({dup_line}, 0.0) <= 0.30
         AND coalesce({dup_line_char}, 0.0) <= 0.20
         AND coalesce({dup_para}, 0.0) <= 0.30
         AND coalesce({dup_para_char}, 0.0) <= 0.20 AS line_ok
  FROM {table}
)
SELECT t.{id_col},
       (t.text IS NULL OR length(trim(t.text)) = 0
        OR (coalesce(p.gram_ok, TRUE) AND l.line_ok)) AS repetition_pass
FROM {table} t LEFT JOIN p ON t.{id_col} = p.{id_col}
JOIN l ON t.{id_col} = l.{id_col}
"""


def oov_rate_sql(
    coverage: float = 0.9, table: str = "documents", id_col: str = "doc_id",
) -> str:
    """Mirror of text.oov_rate against text.vocab_coverage's vocabulary
    at ``coverage`` (graded projection: id, oov_rate; zero-token docs
    NULL)."""
    return f"""
WITH w AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS word FROM {table}
),
wc AS (SELECT word, count(*) AS count FROM w WHERE word <> '' GROUP BY word),
hist AS (SELECT count, count(*) AS n_words FROM wc GROUP BY count),
tot AS (SELECT sum(count * n_words) AS total FROM hist),
cum AS (
  SELECT count,
         sum(count * n_words) OVER (ORDER BY count DESC
                                    ROWS UNBOUNDED PRECEDING) AS c
  FROM hist
),
thr AS (SELECT max(count) AS t FROM cum, tot WHERE c >= total * {float(coverage)}),
vocab AS (SELECT wc.word FROM wc, thr WHERE wc.count >= thr.t),
toks AS (
  SELECT {id_col}, unnest(string_split({_NORM}, ' ')) AS word FROM {table}
),
rates AS (
  SELECT t.{id_col},
         round(count(CASE WHEN v.word IS NULL THEN 1 END)::DOUBLE / count(*)::DOUBLE, 6)
         AS oov_rate
  FROM toks t LEFT JOIN vocab v ON t.word = v.word
  WHERE t.word <> '' GROUP BY t.{id_col}
)
SELECT d.{id_col}, r.oov_rate
FROM {table} d LEFT JOIN rates r ON d.{id_col} = r.{id_col}
"""


def winsorize_by_sql(
    col: str = "c_acctbal", lo: float = 0.05, hi: float = 0.95,
    by: str = "c_mktsegment", table: str = "customer", id_col: str = "c_custkey",
) -> str:
    """Mirror of numeric.winsorize_column(by=[...]) — per-group clip
    bounds joined back null-safely. Graded: (id, group, clipped)."""
    return f"""
WITH s AS (SELECT {by} AS g, quantile_cont({col}, {float(lo)}) AS plo,
                  quantile_cont({col}, {float(hi)}) AS phi
           FROM {table} GROUP BY {by})
SELECT t.{id_col}, t.{by},
       CASE WHEN t.{col} IS NOT NULL
            THEN round(least(greatest(CAST(t.{col} AS DOUBLE), s.plo), s.phi), 6) END
       AS {col}_wins
FROM {table} t JOIN s ON t.{by} IS NOT DISTINCT FROM s.g
"""


def quantile_bins_by_sql(
    col: str = "c_acctbal", n_bins: int = 10, by: str = "c_mktsegment",
    table: str = "customer", id_col: str = "c_custkey",
) -> str:
    """Mirror of numeric.quantile_bins(by=[...]) — per-group boundary
    scalars, bin = 1 + #{group boundaries strictly < x}. Graded:
    (id, group, bin)."""
    n = int(n_bins)
    bounds = ", ".join(
        f"quantile_cont({col}, {i / n}) AS b{i}" for i in range(1, n)
    )
    hits = " + ".join(
        f"(CASE WHEN s.b{i} < t.{col} THEN 1 ELSE 0 END)" for i in range(1, n)
    )
    return f"""
WITH s AS (SELECT {by} AS g, {bounds} FROM {table} GROUP BY {by})
SELECT t.{id_col}, t.{by},
       CASE WHEN t.{col} IS NOT NULL THEN CAST(1 + {hits} AS INT) END AS {col}_bin
FROM {table} t JOIN s ON t.{by} IS NOT DISTINCT FROM s.g
"""


def group_top_terms_sql(
    by: str = "source", k: int = 10, table: str = "documents",
) -> str:
    """Mirror of text.group_top_terms (graded: group, term, tf, rank).
    DuckDB may rank with a window — the parity contract is values, not
    plans; the Spark side uses the two-phase no-window slice."""
    return f"""
WITH t AS (
  SELECT {by} AS g, unnest(string_split({_NORM}, ' ')) AS term FROM {table}
),
c AS (SELECT g, term, count(*) AS tf FROM t WHERE term <> '' GROUP BY g, term),
r AS (
  SELECT g, term, tf,
         row_number() OVER (PARTITION BY g ORDER BY tf DESC, term ASC) AS rank
  FROM c
)
SELECT g AS {by}, term, CAST(tf AS BIGINT) AS tf, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {int(k)}
"""


def group_top_terms_weighted_sql(
    by: str = "source", k: int = 10, prior_strength: float = 100.0,
    table: str = "documents",
) -> str:
    """Mirror of text.group_top_terms(weight='logodds'): Monroe et al.
    2008 log-odds ratio vs rest-of-corpus with an informative Dirichlet
    prior (alpha_w = prior_strength x corpus share), z-scored (graded:
    group, term, tf, score, rank). Ties score-then-term, like the Spark
    side's (-score, term) struct sort."""
    a0 = float(prior_strength)
    return f"""
WITH t AS (
  SELECT {by} AS g, unnest(string_split({_NORM}, ' ')) AS term FROM {table}
),
c AS (SELECT g, term, count(*) AS tf FROM t WHERE term <> '' GROUP BY g, term),
tm AS (SELECT term, sum(tf) AS yw FROM c GROUP BY term),
gm AS (SELECT g, sum(tf) AS ng FROM c GROUP BY g),
tot AS (SELECT sum(tf) AS n FROM c),
s AS (
  SELECT c.g, c.term, c.tf,
         round(
           (ln((c.tf + {a0} * tm.yw / tot.n)
               / (gm.ng + {a0} - c.tf - {a0} * tm.yw / tot.n))
            - ln((tm.yw - c.tf + {a0} * tm.yw / tot.n)
                 / (tot.n - gm.ng + {a0} - (tm.yw - c.tf) - {a0} * tm.yw / tot.n)))
           / sqrt(1.0 / (c.tf + {a0} * tm.yw / tot.n)
                  + 1.0 / (tm.yw - c.tf + {a0} * tm.yw / tot.n)),
           6) AS score
  FROM c JOIN tm USING (term) JOIN gm USING (g) CROSS JOIN tot
),
r AS (
  SELECT g, term, tf, score,
         row_number() OVER (PARTITION BY g ORDER BY score DESC, term ASC) AS rank
  FROM s
)
SELECT g AS {by}, term, CAST(tf AS BIGINT) AS tf, score, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {int(k)}
"""


def char_entropy_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """Mirror of text.char_entropy: per-character count terms integerized
    to micro-units before the per-doc sum (the shared determinism
    contract), entropy = log2(N) - S/(N*1e6); charless docs → NULL."""
    return f"""
WITH ch AS (
  SELECT t.{id_col} AS id, u.ch
  FROM {table} t, unnest(string_split(t.text, '')) AS u(ch)
  WHERE length(u.ch) > 0
),
cnt AS (SELECT id, ch, count(*) AS c FROM ch GROUP BY id, ch),
e AS (SELECT id, sum(c) AS n,
             sum(CAST(round(c * log2(c) * 1e6) AS BIGINT)) AS s
      FROM cnt GROUP BY id)
SELECT t.{id_col}, round(log2(e.n) - e.s / (e.n * 1e6), 6) AS char_entropy
FROM {table} t LEFT JOIN e ON t.{id_col} = e.id
"""


def top_ngrams_sql(n: int = 3, k: int = 20, table: str = "documents") -> str:
    """Mirror of text.top_ngrams: shared normalization, n-gram unnest,
    count + doc-frequency, deterministic (count desc, gram asc) top-k."""
    nn = int(n)
    return f"""
WITH norm AS (SELECT doc_id AS id, {_NORM} AS t FROM {table}),
wrd AS (SELECT id, string_split(t, ' ') AS w FROM norm),
g AS (
  SELECT id,
         unnest([array_to_string(w[i:i+{nn - 1}], ' ')
                 FOR i IN range(1, len(w) - {nn - 2})]) AS ngram
  FROM wrd WHERE len(w) >= {nn}
)
SELECT ngram, count(*) AS n_occurrences, count(DISTINCT id) AS n_docs
FROM g WHERE ngram <> '' GROUP BY ngram
ORDER BY n_occurrences DESC, ngram ASC LIMIT {int(k)}
"""


def distribution_drift_sql(
    col: str = "c_acctbal", n_bins: int = 10,
    table: str = "customer", id_col: str = "c_custkey",
) -> str:
    """Mirror of curation.distribution_drift on the graded split (ref =
    id % 3 <> 0, cur = id % 3 = 0): reference-quantile bins, per-bin
    occupancy, 6dp-rounded fractions feeding the smoothed PSI term."""
    n = int(n_bins)
    bounds = ", ".join(f"quantile_cont(v, {i / n}) AS b{i}" for i in range(1, n))
    hits = " + ".join(f"(CASE WHEN b{i} < v THEN 1 ELSE 0 END)" for i in range(1, n))
    return f"""
WITH ref AS (SELECT CAST({col} AS DOUBLE) AS v FROM {table}
             WHERE {id_col} % 3 <> 0 AND {col} IS NOT NULL),
cur AS (SELECT CAST({col} AS DOUBLE) AS v FROM {table}
        WHERE {id_col} % 3 = 0 AND {col} IS NOT NULL),
s AS (SELECT {bounds} FROM ref),
rb AS (SELECT CAST(1 + {hits} AS INT) AS bin, count(*) AS ref_count
       FROM ref CROSS JOIN s GROUP BY 1),
cb AS (SELECT CAST(1 + {hits} AS INT) AS bin, count(*) AS cur_count
       FROM cur CROSS JOIN s GROUP BY 1),
j AS (SELECT coalesce(rb.bin, cb.bin) AS bin,
             coalesce(ref_count, 0) AS ref_count,
             coalesce(cur_count, 0) AS cur_count
      FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin),
t AS (SELECT sum(ref_count) AS rt, sum(cur_count) AS ct FROM j),
f AS (SELECT bin, ref_count, cur_count,
             round(ref_count / greatest(rt, 1), 6) AS ref_frac,
             round(cur_count / greatest(ct, 1), 6) AS cur_frac
      FROM j CROSS JOIN t)
SELECT bin, ref_count, cur_count, ref_frac, cur_frac,
       round((ref_frac - cur_frac)
             * ln(greatest(ref_frac, 1e-6) / greatest(cur_frac, 1e-6)), 6) AS psi_term
FROM f
"""


def readability_sql(table: str = "documents") -> str:
    """Mirror of text.readability (graded projection: doc_id, counts +
    both scores)."""
    sent = "greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::DOUBLE"
    words = f"list_filter({_WORDS}, w -> len(w) > 0)"
    nw = f"greatest(len({words}), 1)::DOUBLE"
    syl = (
        f"coalesce(list_sum(list_transform({words},"
        f" w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))), 0)"
    )
    return f"""
SELECT doc_id,
       CAST({sent} AS BIGINT) AS n_sentences,
       CAST({nw} AS BIGINT) AS n_words_fk,
       CAST({syl} AS BIGINT) AS n_syllables,
       CASE WHEN text IS NOT NULL THEN
         round(206.835 - 1.015 * ({nw} / {sent}) - 84.6 * ({syl}::DOUBLE / {nw}), 6)
       END AS flesch_ease,
       CASE WHEN text IS NOT NULL THEN
         round(0.39 * ({nw} / {sent}) + 11.8 * ({syl}::DOUBLE / {nw}) - 15.59, 6)
       END AS fk_grade
FROM {table}
"""


def sentence_split_sql(table: str = "documents") -> str:
    """Mirror of curation.sentence_split."""
    return f"""
WITH parts AS (
  SELECT doc_id,
         list_filter(list_transform(string_split_regex(text, '[.!?]+'),
                                    s -> trim(s)),
                     s -> len(s) > 0) AS ps
  FROM {table}
)
SELECT doc_id,
       CAST(unnest(range(1, len(ps) + 1)) AS INT) AS sent_idx,
       unnest(ps) AS sentence
FROM parts
"""


def sentence_dedup_sql(table: str = "documents") -> str:
    """Mirror of curation.sentence_dedup: [.!?]+ sentence split (trimmed,
    empties dropped), first occurrence by (doc_id, pos) per normalized
    sentence, rejoined with '. '."""
    norm_s = r"md5(regexp_replace(lower(sent), '\s+', ' ', 'g'))"
    return f"""
WITH p AS (
  SELECT doc_id,
         list_filter(list_transform(string_split_regex(text, '[.!?]+'),
                                    s -> trim(s)), s -> len(s) > 0) AS sents
  FROM {table}
),
e AS (
  SELECT doc_id, unnest([{{'pos': i, 'sent': sents[i]}} FOR i IN range(1, len(sents) + 1)],
                        recursive := true)
  FROM p
),
r AS (
  SELECT doc_id, pos, sent,
         row_number() OVER (PARTITION BY {norm_s} ORDER BY doc_id, pos) AS rn
  FROM e
)
SELECT p.doc_id,
  coalesce(agg.text, '') AS text,
  coalesce(agg.n_sentences, 0) AS n_sentences,
  coalesce(agg.n_dropped, 0) AS n_dropped
FROM p LEFT JOIN (
  SELECT doc_id,
    coalesce(string_agg(CASE WHEN rn = 1 THEN sent END, '. ' ORDER BY pos), '') AS text,
    count(*)::BIGINT AS n_sentences,
    sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dropped
  FROM r GROUP BY doc_id
) agg USING (doc_id)
"""


def corpus_overlap_sql(table: str = "documents") -> str:
    """Mirror of curation.corpus_overlap (exact) on the graded split:
    A = doc_id % 3 != 0, B = doc_id % 2 = 0, distinct normalized-md5
    keys, intersection by inclusion-exclusion."""
    return f"""
WITH a AS (SELECT DISTINCT md5({_NORM}) AS k FROM {table} WHERE doc_id % 3 <> 0),
b AS (SELECT DISTINCT md5({_NORM}) AS k FROM {table} WHERE doc_id % 2 = 0),
s AS (SELECT (SELECT count(*) FROM a) AS na,
             (SELECT count(*) FROM b) AS nb,
             (SELECT count(*) FROM (SELECT k FROM a UNION SELECT k FROM b)) AS nu)
SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, nu::BIGINT AS n_union,
       greatest(na + nb - nu, 0)::BIGINT AS n_intersect,
       CASE WHEN nu = 0 THEN 0.0
            ELSE round(greatest(na + nb - nu, 0)::DOUBLE / nu::DOUBLE, 6) END AS jaccard
FROM s
"""


def funnel_steps_sql(
    steps: list[str], within_seconds: int | None = None, table: str = "events",
) -> str:
    """Mirror of events.funnel_steps: greedy earliest-anchor CTE chain —
    s1 = min step-1 ts per user; s_i = min step-i ts after s_{i-1}
    (optionally bounded to the anchor t1 + within)."""
    ctes = [
        f"ev AS (SELECT user_id, ts, event_type FROM {table} "
        "WHERE user_id IS NOT NULL AND ts IS NOT NULL)",
        f"s1 AS (SELECT user_id, min(ts) AS t1, min(ts) AS tprev FROM ev "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)",
    ]
    for i, st in enumerate(steps[1:], start=2):
        bound = (
            f" AND e.ts <= s{i-1}.t1 + INTERVAL {within_seconds} SECOND"
            if within_seconds is not None
            else ""
        )
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(s{i-1}.t1) AS t1, min(e.ts) AS tprev "
            f"FROM ev e JOIN s{i-1} ON e.user_id = s{i-1}.user_id "
            f"WHERE e.event_type = '{st}' AND e.ts > s{i-1}.tprev{bound} "
            "GROUP BY e.user_id)"
        )
    unions = " UNION ALL ".join(
        f"SELECT {i + 1} AS step, '{st}' AS event_type, "
        f"(SELECT count(*) FROM s{i + 1}) AS users"
        for i, st in enumerate(steps)
    )
    ctes.append(f"c AS ({unions})")
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT CAST(step AS BIGINT) AS step, event_type, "
        "CAST(users AS BIGINT) AS users, "
        "CASE WHEN (SELECT users FROM c WHERE step = 1) > 0 "
        "THEN round(CAST(users AS DOUBLE) / (SELECT users FROM c WHERE step = 1), 6) "
        "ELSE 0.0 END AS conversion FROM c"
    )


def funnel_latency_sql(
    steps: list[str], within_seconds: int | None = None, table: str = "events",
) -> str:
    """Mirror of events.funnel_latencies (exact path): the greedy
    funnel chain (funnel_steps_sql's CTEs), then per step i >= 2 the
    user-joined completion-time deltas in seconds (micros diff / 1e6 —
    the Spark op's exact arithmetic), avg + interpolated median
    (quantile_cont == Spark's percentile), 6dp."""
    ctes = [
        f"ev AS (SELECT user_id, ts, event_type FROM {table} "
        "WHERE user_id IS NOT NULL AND ts IS NOT NULL)",
        f"s1 AS (SELECT user_id, min(ts) AS t1, min(ts) AS tprev FROM ev "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)",
    ]
    for i, st in enumerate(steps[1:], start=2):
        bound = (
            f" AND e.ts <= s{i-1}.t1 + INTERVAL {within_seconds} SECOND"
            if within_seconds is not None
            else ""
        )
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(s{i-1}.t1) AS t1, min(e.ts) AS tprev "
            f"FROM ev e JOIN s{i-1} ON e.user_id = s{i-1}.user_id "
            f"WHERE e.event_type = '{st}' AND e.ts > s{i-1}.tprev{bound} "
            "GROUP BY e.user_id)"
        )
    selects = []
    for i, st in enumerate(steps[1:], start=2):
        ctes.append(
            f"l{i} AS (SELECT CAST(epoch_us(s{i}.tprev) - epoch_us(s{i-1}.tprev) "
            f"AS DOUBLE) / 1000000.0 AS lat "
            f"FROM s{i} JOIN s{i-1} ON s{i}.user_id = s{i-1}.user_id)"
        )
        selects.append(
            f"SELECT CAST({i} AS BIGINT) AS step, '{st}' AS event_type, "
            f"CAST(count(*) AS BIGINT) AS users, round(avg(lat), 6) AS avg_sec, "
            f"round(quantile_cont(lat, 0.5), 6) AS p50_sec FROM l{i}"
        )
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


def retention_cohorts_sql(
    period_days: int = 7, max_periods: int = 8, table: str = "events",
) -> str:
    """Mirror of events.retention_cohorts: epoch-day integer buckets
    (engine-convention-free), first bucket per user = cohort, per-cohort
    denominator = offset-0 count."""
    return f"""
WITH b AS (SELECT DISTINCT user_id AS u,
                  CAST(floor(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                             / {period_days}.0) AS BIGINT) AS bk
           FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL),
f AS (SELECT u, min(bk) AS cb FROM b GROUP BY u),
a AS (SELECT cb, bk - cb AS off, count(*) AS n FROM b JOIN f USING(u)
      WHERE bk - cb < {max_periods} GROUP BY cb, bk - cb),
s AS (SELECT cb, n AS sz FROM a WHERE off = 0)
SELECT CAST(DATE '1970-01-01' + CAST(a.cb * {period_days} AS INT) AS VARCHAR) AS cohort_start,
       CAST(a.off AS BIGINT) AS period_offset, CAST(a.n AS BIGINT) AS active_users,
       round(CAST(a.n AS DOUBLE) / s.sz, 6) AS retention
FROM a JOIN s ON a.cb = s.cb
"""


def active_users_sql(
    windows: tuple[int, ...] = (1, 7, 30), table: str = "events",
) -> str:
    """Mirror of events.active_users: dense day grid, per-window rolling
    distinct users via a range join on the collapsed (user, day) pairs."""
    ws = sorted(set(int(w) for w in windows))
    ctes = ",\n".join(
        f"w{w} AS (SELECT g.t, count(DISTINCT p.u) AS au FROM g JOIN p "
        f"ON p.d BETWEEN g.t - {w - 1} AND g.t GROUP BY g.t)" for w in ws
    )
    cols = ", ".join(
        f"CAST(coalesce(w{w}.au, 0) AS BIGINT) AS au_{w}d" for w in ws
    )
    joins = " ".join(f"LEFT JOIN w{w} ON g.t = w{w}.t" for w in ws)
    return f"""
WITH p AS (SELECT DISTINCT user_id AS u,
                  datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
           FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL),
b AS (SELECT min(d) AS lo, max(d) AS hi FROM p),
g AS (SELECT unnest(range(lo, hi + 1)) AS t FROM b),
{ctes}
SELECT CAST(DATE '1970-01-01' + CAST(g.t AS INT) AS VARCHAR) AS day, {cols}
FROM g {joins}
"""


def event_transitions_sql(tie: str | None = "event_id", table: str = "events") -> str:
    """Mirror of events.event_transitions: lead() over (user ORDER BY
    ts[, tie]), pair counts, row-normalized by from-type totals."""
    order = "ts" + (f", {tie}" if tie else "")
    return f"""
WITH p AS (SELECT event_type AS f,
                  lead(event_type) OVER (PARTITION BY user_id ORDER BY {order}) AS t
           FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL),
c AS (SELECT f, t, count(*) AS n FROM p WHERE t IS NOT NULL GROUP BY f, t),
tot AS (SELECT f, sum(n) AS tt FROM c GROUP BY f)
SELECT c.f AS from_type, c.t AS to_type, CAST(c.n AS BIGINT) AS n,
       round(CAST(c.n AS DOUBLE) / tot.tt, 6) AS prob
FROM c JOIN tot ON c.f = tot.f
"""


def key_skew_sql(col: str = "user_id", table: str = "events", k: int = 20) -> str:
    """Mirror of curation.key_skew: per-key counts, top-k by
    (n DESC, key ASC), share = n/total rounded 6dp."""
    return f"""
WITH c AS (SELECT CAST({col} AS VARCHAR) AS key, count(*) AS n
           FROM {table} GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c)
SELECT key, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / (SELECT tot FROM t), 6) AS share
FROM c ORDER BY n DESC, key ASC LIMIT {int(k)}
"""


def key_skew_summary_sql(col: str = "user_id", table: str = "events") -> str:
    """Mirror of curation.key_skew_summary: one-row scorecard
    (n_rows, n_keys, max_share, skew_ratio, hhi), 6dp."""
    return f"""
WITH c AS (SELECT CAST({col} AS VARCHAR) AS key, count(*) AS n
           FROM {table} GROUP BY 1)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       round(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) AS max_share,
       round(CAST(max(n) AS DOUBLE) / (CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6) AS skew_ratio,
       round(sum(CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             / (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)), 6) AS hhi
FROM c
"""


def quantiles_sketch_sql(
    col: str = "l_extendedprice", table: str = "lineitem",
    probs=(0.5, 0.9, 0.99), rel_err: float = 0.05,
) -> str:
    """Mirror of numeric.quantiles_sketched: log-bin histogram (9dp
    pre-rounded ratio against the PRECOMPUTED ln(base) constant — both
    engines divide by the identical double, so only ln(x) itself is
    engine math), nearest-rank bin selection, geometric-midpoint value
    rounded 6dp."""
    import math

    base = (1.0 + float(rel_err)) ** 2
    lnbase = math.log(base)
    zero = -(1 << 31)
    probs_vals = ", ".join(f"(CAST({q} AS DOUBLE))" for q in probs)
    return f"""
WITH v AS (SELECT CAST({col} AS DOUBLE) AS x FROM {table} WHERE {col} IS NOT NULL),
h AS (SELECT CASE WHEN x = 0 THEN CAST({zero} AS BIGINT)
                  ELSE CAST(floor(round(ln(x) / {lnbase!r}, 9)) AS BIGINT) END AS bin,
             count(*) AS n
      FROM v GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM h),
c AS (SELECT bin, sum(n) OVER (ORDER BY bin) AS cum FROM h),
p AS (SELECT * FROM (VALUES {probs_vals}) AS p(q)),
sel AS (SELECT p.q, min(c.bin) AS b
        FROM p JOIN c ON CAST(c.cum AS DOUBLE) >= ceil(p.q * (SELECT tot FROM t))
        GROUP BY p.q)
SELECT q AS prob,
       round(CASE WHEN b = {zero} THEN 0.0 ELSE power({base!r}, b + 0.5) END, 6) AS value
FROM sel
"""


def collocations_sql(
    k: int = 50, min_count: int = 5, table: str = "documents",
) -> str:
    """Mirror of text.collocations: adjacent-pair PMI over the
    normalized token stream, min_count floor, top-k by (rounded pmi
    DESC, w1, w2)."""
    return f"""
WITH fil AS (SELECT list_filter(string_split({_NORM}, ' '), x -> x <> '') AS wl
             FROM {table}),
uni AS (SELECT unnest(wl) AS w FROM fil),
uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
tt AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM uc),
pr AS (SELECT unnest([{{'w1': wl[i], 'w2': wl[i + 1]}} FOR i IN range(1, len(wl))],
                     recursive := true)
       FROM fil),
bt AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM pr),
bc AS (SELECT w1, w2, count(*) AS n FROM pr GROUP BY w1, w2
       HAVING count(*) >= {int(min_count)})
SELECT bc.w1, bc.w2, CAST(bc.n AS BIGINT) AS n,
       round(log2((CAST(bc.n AS DOUBLE) / (SELECT b FROM bt))
                  / ((CAST(u1.c AS DOUBLE) / (SELECT t FROM tt))
                     * (CAST(u2.c AS DOUBLE) / (SELECT t FROM tt)))), 6) AS pmi
FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w
ORDER BY pmi DESC, bc.w1 ASC, bc.w2 ASC LIMIT {int(k)}
"""


def quantiles_sketch_by_sql(
    col: str = "l_extendedprice", by: str = "l_returnflag",
    table: str = "lineitem", probs=(0.5, 0.9, 0.99), rel_err: float = 0.05,
) -> str:
    """Mirror of numeric.quantiles_sketched_by: the grouped form —
    per-group log-bin histogram + nearest-rank selection."""
    import math

    base = (1.0 + float(rel_err)) ** 2
    lnbase = math.log(base)
    zero = -(1 << 31)
    probs_vals = ", ".join(f"(CAST({q} AS DOUBLE))" for q in probs)
    return f"""
WITH v AS (SELECT {by} AS g, CAST({col} AS DOUBLE) AS x FROM {table}
           WHERE {col} IS NOT NULL AND {by} IS NOT NULL),
h AS (SELECT g,
             CASE WHEN x = 0 THEN CAST({zero} AS BIGINT)
                  ELSE CAST(floor(round(ln(x) / {lnbase!r}, 9)) AS BIGINT) END AS bin,
             count(*) AS n
      FROM v GROUP BY 1, 2),
t AS (SELECT g, CAST(sum(n) AS DOUBLE) AS tot FROM h GROUP BY g),
c AS (SELECT g, bin, sum(n) OVER (PARTITION BY g ORDER BY bin) AS cum FROM h),
p AS (SELECT * FROM (VALUES {probs_vals}) AS p(q)),
sel AS (SELECT c.g, p.q, min(c.bin) AS b
        FROM p JOIN c ON TRUE JOIN t ON c.g = t.g
        WHERE CAST(c.cum AS DOUBLE) >= ceil(p.q * t.tot)
        GROUP BY c.g, p.q)
SELECT g AS {by}, q AS prob,
       round(CASE WHEN b = {zero} THEN 0.0 ELSE power({base!r}, b + 0.5) END, 6) AS value
FROM sel
"""


def pagerank_over_sql(
    edges_cte: str, damping: float = 0.85, iters: int = 5,
    seeds: list | None = None,
) -> str:
    """graph.graph_pagerank unrolled to ``iters`` CTE rounds over ANY
    edge source: ``edges_cte`` must be CTE bodies ending in a ``c``
    relation of (s VARCHAR, d VARCHAR, w DOUBLE) positive-weight edges.
    Mirrors the Spark op's teleport-VECTOR formulation exactly (t =
    uniform 1/N, or 1/|seeds∩nodes| on the seed set for the
    personalized form): r0 = t; each round = (1-d)·t + d·(contrib +
    dangling·t) — the same IEEE operation order, so 6dp-boundary values
    can't flip between engines. Terminal round(6)."""
    if seeds is not None:
        lits = ", ".join("'" + str(s).replace("'", "''") + "'" for s in seeds)
        tv = f"""
ns AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes WHERE n IN ({lits})),
tv AS MATERIALIZED (SELECT n, CASE WHEN n IN ({lits}) THEN 1.0 / (SELECT cnt FROM ns)
                      ELSE 0.0 END AS t FROM nodes)"""
    else:
        tv = """
nn AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes),
tv AS MATERIALIZED (SELECT n, 1.0 / (SELECT cnt FROM nn) AS t FROM nodes)"""
    # multiply-referenced CTEs are MATERIALIZED: DuckDB's default
    # inlining re-evaluates the whole upstream chain per reference,
    # which compounds per unrolled round — measured 64.7 s -> ~1 s on
    # the sf0.01 events graph for the 5-round form (same results; this
    # is purely an evaluation-strategy hint)
    head = f"""
WITH {edges_cte},
outw AS MATERIALIZED (SELECT s, sum(w) AS ow FROM c GROUP BY s),
e AS MATERIALIZED (SELECT c.s, c.d, c.w / outw.ow AS pr FROM c JOIN outw USING (s)),
nodes AS MATERIALIZED (
  SELECT DISTINCT n FROM (SELECT s AS n FROM c UNION ALL SELECT d FROM c)),{tv},
r0 AS (SELECT n, t AS r FROM tv)"""
    rounds = []
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        rounds.append(f""",
g{i} AS (SELECT COALESCE(sum(r), 0) AS dm FROM {prev}
         WHERE n NOT IN (SELECT s FROM outw)),
a{i} AS (SELECT e.d AS n, sum({prev}.r * e.pr) AS contrib
         FROM {prev} JOIN e ON {prev}.n = e.s GROUP BY e.d),
r{i} AS MATERIALIZED (SELECT tv.n,
                (1 - {damping}) * tv.t
                + {damping} * (COALESCE(a{i}.contrib, 0)
                               + (SELECT dm FROM g{i}) * tv.t) AS r
         FROM tv LEFT JOIN a{i} ON tv.n = a{i}.n)""")
    return head + "".join(rounds) + f"""
SELECT n AS node, round(r, 6) AS pagerank FROM r{iters}
"""


def events_pagerank_sql(
    damping: float = 0.85, iters: int = 5,
    tie: str | None = "event_id", table: str = "events",
    seeds: list | None = None,
) -> str:
    """Mirror of graph.graph_pagerank over the event_transitions edge
    list (see :func:`pagerank_over_sql` for the power iteration)."""
    order = "ts" + (f", {tie}" if tie else "")
    edges = f"""p AS (SELECT event_type AS f,
                  lead(event_type) OVER (PARTITION BY user_id ORDER BY {order}) AS t
           FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL),
c AS (SELECT f AS s, t AS d, CAST(count(*) AS DOUBLE) AS w
      FROM p WHERE t IS NOT NULL GROUP BY f, t)"""
    return pagerank_over_sql(edges, damping, iters, seeds=seeds)


def dedup_pagerank_sql(
    threshold: float = 0.5, damping: float = 0.85, iters: int = 5,
    table: str = "documents",
) -> str:
    """Mirror of graph.graph_pagerank over the SYMMETRIZED minhash
    near-dup pair graph (weights = jaccard): centrality-based canonical
    selection — the highest-ranked member of each near-dup cluster is
    its most-connected representative. Node ids are stringified doc
    ids (the Spark op casts node keys to string)."""
    edges = f"""pairs AS ({minhash_lsh_sql(threshold, table)}),
c AS (SELECT CAST(id_a AS VARCHAR) AS s, CAST(id_b AS VARCHAR) AS d,
             CAST(jaccard AS DOUBLE) AS w FROM pairs
      UNION ALL
      SELECT CAST(id_b AS VARCHAR), CAST(id_a AS VARCHAR),
             CAST(jaccard AS DOUBLE) FROM pairs)"""
    return pagerank_over_sql(edges, damping, iters)


def code_signals_sql(table: str = "documents") -> str:
    """Mirror of text.code_signals (doc_id + the five signals): same
    line split, same regexes (RE2 and Java agree on these ASCII
    classes and \\b), same greatest-1 ratio guard, round(6)."""
    return f"""
WITH l AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines
           FROM {table}),
s AS (SELECT doc_id, text, lines,
             len(lines) AS nl, length(text) AS nc FROM l),
sig AS (SELECT doc_id,
  round(CAST(len(list_filter(lines, x -> regexp_matches(x, '^( {{2,}}|\t)')))
             AS DOUBLE) / CAST(greatest(nl, 1) AS DOUBLE), 6) AS indent_frac,
  round(CAST(len(list_filter(lines, x -> regexp_matches(rtrim(x), '[;{{}}]$')))
             AS DOUBLE) / CAST(greatest(nl, 1) AS DOUBLE), 6) AS eol_code_frac,
  CAST(len(regexp_extract_all(text, '\\b({CODE_KEYWORDS})\\b')) AS BIGINT) AS kw_hits,
  round(CAST(len(regexp_extract_all(text, '[{{}}()\\[\\];=<>]')) AS DOUBLE)
        / CAST(greatest(nc, 1) AS DOUBLE), 6) AS sym_density
  FROM s)
SELECT doc_id, indent_frac, eol_code_frac, kw_hits, sym_density,
       (indent_frac >= 0.3 OR eol_code_frac >= 0.2
        OR (kw_hits >= 3 AND sym_density >= 0.01)) AS is_code
FROM sig
"""


def calibration_over_sql(scored_cte: str, bins: int = 10) -> str:
    """numeric.calibration_bins mirrored over ANY scored source:
    ``scored_cte`` must be CTE bodies ending in a ``lab`` relation of
    (score DOUBLE, y INTEGER). Same equal-width binning with the last
    bin closed, micro-unit HUGEINT score sums, identical division
    order before round(6)."""
    return f"""
WITH {scored_cte},
b AS (SELECT least(CAST(floor(score * {bins}) AS INTEGER), {bins - 1}) AS bin,
             CAST(round(score * 1000000, 0) AS HUGEINT) AS sm, y
      FROM lab WHERE score IS NOT NULL AND y IS NOT NULL)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(sm) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS mean_score,
       round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS frac_pos
FROM b GROUP BY bin
"""


def _clf_scored_cte(
    buckets: int = 512, iters: int = 3, table: str = "documents",
) -> str:
    """(score, y) for the demo classifier: clf_score vs the training
    label doc_id % 7 == 0 — the in-sample calibration readout."""
    return f"""scored AS ({quality_classifier_sql(buckets, iters, table=table)}),
lab AS (SELECT s.clf_score AS score,
               CASE WHEN d.doc_id % 7 = 0 THEN 1 ELSE 0 END AS y
        FROM scored s JOIN {table} d ON s.doc_id = d.doc_id)"""


def clf_calibration_sql(
    buckets: int = 512, iters: int = 3, bins: int = 10,
    table: str = "documents",
) -> str:
    """Mirror of numeric.calibration_bins over the demo classifier's
    scores (the text_clf_score pipeline) against its training label."""
    return calibration_over_sql(_clf_scored_cte(buckets, iters, table), bins)


def clf_calibration_summary_sql(
    buckets: int = 512, iters: int = 3, bins: int = 10,
    table: str = "documents",
) -> str:
    """Mirror of numeric.calibration_summary: ECE folds the per-bin
    |Δ|·n micro-units into a BIGINT sum over the bins grid; Brier
    accumulates (score_micro − y·1e6)² in HUGEINT — both with one
    terminal float division, matching the Spark operation order."""
    return f"""
WITH {_clf_scored_cte(buckets, iters, table)},
b AS (SELECT least(CAST(floor(score * {bins}) AS INTEGER), {bins - 1}) AS bin,
             CAST(round(score * 1000000, 0) AS HUGEINT) AS sm, y
      FROM lab WHERE score IS NOT NULL AND y IS NOT NULL),
grid AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                round(CAST(sum(sm) AS DOUBLE)
                      / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS mean_score,
                round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS frac_pos
         FROM b GROUP BY bin),
e AS (SELECT sum(CAST(round(abs(frac_pos - mean_score)
                            * CAST(n AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS e,
             sum(n) AS gn FROM grid),
br AS (SELECT CAST(count(*) AS BIGINT) AS n,
              sum((sm - CAST(y AS HUGEINT) * 1000000)
                  * (sm - CAST(y AS HUGEINT) * 1000000)) AS sq
       FROM b)
SELECT br.n,
       round(CAST(e.e AS DOUBLE) / (CAST(e.gn AS DOUBLE) * 1000000.0), 6) AS ece,
       round(CAST(br.sq AS DOUBLE)
             / (CAST(br.n AS DOUBLE) * 1000000000000.0), 6) AS brier
FROM br, e
"""


def triangles_over_sql(edges_cte: str) -> str:
    """graph.graph_triangles mirrored over ANY edge source: ``edges_cte``
    must be CTE bodies ending in a ``c`` relation of (s, d) edges.
    Same degree-ordered orientation (row-value comparison on
    (degree, node) = the Spark struct comparison), same wedge + closure
    joins, same 2·T/(deg·(deg−1)) operation order before round(6)."""
    return f"""
WITH {edges_cte},
ce AS (SELECT DISTINCT least(CAST(s AS VARCHAR), CAST(d AS VARCHAR)) AS a,
                       greatest(CAST(s AS VARCHAR), CAST(d AS VARCHAR)) AS b
       FROM c WHERE s IS NOT NULL AND d IS NOT NULL
         AND CAST(s AS VARCHAR) <> CAST(d AS VARCHAR)),
deg AS (SELECT n, count(*) AS degree
        FROM (SELECT a AS n FROM ce UNION ALL SELECT b FROM ce) GROUP BY n),
o AS (SELECT CASE WHEN (da.degree, ce.a) < (db.degree, ce.b)
                  THEN ce.a ELSE ce.b END AS u,
             CASE WHEN (da.degree, ce.a) < (db.degree, ce.b)
                  THEN ce.b ELSE ce.a END AS v
      FROM ce JOIN deg da ON ce.a = da.n JOIN deg db ON ce.b = db.n),
tri AS (SELECT o1.u, o1.v, o2.v AS w
        FROM o o1 JOIN o o2 ON o1.v = o2.u
        WHERE EXISTS (SELECT 1 FROM o o3 WHERE o3.u = o1.u AND o3.v = o2.v)),
tn AS (SELECT n, count(*) AS t
       FROM (SELECT u AS n FROM tri UNION ALL SELECT v FROM tri
             UNION ALL SELECT w FROM tri) GROUP BY n)
SELECT deg.n AS node, CAST(degree AS BIGINT) AS degree,
       CAST(COALESCE(tn.t, 0) AS BIGINT) AS triangles,
       CASE WHEN degree >= 2
            THEN round((2.0 * COALESCE(tn.t, 0)) / (degree * (degree - 1.0)), 6)
       END AS clustering
FROM deg LEFT JOIN tn ON deg.n = tn.n
"""


def khop_over_sql(
    edges_cte: str, seeds: list, k: int, directed: bool = False,
) -> str:
    """graph.graph_khop unrolled to ``k`` CTE rounds over ANY edge
    source (``edges_cte`` ends in a ``c`` relation of (s, d)): hop 0 =
    the seed set (absent seeds included — a node reaches itself), each
    round extends the reached set with min-hop semantics."""
    lits = ", ".join(
        "('" + str(s).replace("'", "''") + "')"
        for s in sorted({str(s) for s in seeds})
    )
    sym = "" if directed else (
        " UNION ALL SELECT CAST(d AS VARCHAR), CAST(s AS VARCHAR) FROM c"
    )
    head = f"""
WITH {edges_cte},
e AS (SELECT DISTINCT s, d FROM
        (SELECT CAST(s AS VARCHAR) AS s, CAST(d AS VARCHAR) AS d FROM c{sym})
      WHERE s IS NOT NULL AND d IS NOT NULL),
h0 AS (SELECT n, 0 AS hop FROM (VALUES {lits}) AS t(n))"""
    rounds = []
    for i in range(1, k + 1):
        prev = f"h{i - 1}"
        rounds.append(f""",
n{i} AS (SELECT DISTINCT e.d AS n FROM {prev} JOIN e ON {prev}.n = e.s),
h{i} AS (SELECT n, min(hop) AS hop FROM
           (SELECT n, hop FROM {prev} UNION ALL SELECT n, {i} FROM n{i})
         GROUP BY n)""")
    return head + "".join(rounds) + f"""
SELECT n AS node, CAST(hop AS INTEGER) AS hop FROM h{k}
"""


def dedup_triangles_sql(
    threshold: float = 0.5, table: str = "documents",
) -> str:
    """Mirror of graph.graph_triangles over the minhash near-dup pair
    graph: per-doc degree / triangle count / clustering — the
    cluster-density probe (near-clique = replicated doc, low-clustering
    hub = boilerplate template chaining unlike docs)."""
    edges = f"""pairs AS ({minhash_lsh_sql(threshold, table)}),
c AS (SELECT CAST(id_a AS VARCHAR) AS s, CAST(id_b AS VARCHAR) AS d FROM pairs)"""
    return triangles_over_sql(edges)


def dedup_khop_sql(
    seeds: list, k: int = 2, threshold: float = 0.5,
    table: str = "documents",
) -> str:
    """Mirror of graph.graph_khop (undirected) over the minhash
    near-dup pair graph: the contamination quarantine list — everything
    within ``k`` near-dup hops of the seed documents."""
    edges = f"""pairs AS ({minhash_lsh_sql(threshold, table)}),
c AS (SELECT CAST(id_a AS VARCHAR) AS s, CAST(id_b AS VARCHAR) AS d FROM pairs)"""
    return khop_over_sql(edges, seeds, k, directed=False)


def events_khop_sql(
    seeds: list, k: int = 2, tie: str | None = "event_id",
    table: str = "events",
) -> str:
    """Mirror of graph.graph_khop (directed) over the event_transitions
    edge list: event types reachable within ``k`` observed transitions
    of the seed types."""
    order = "ts" + (f", {tie}" if tie else "")
    edges = f"""p AS (SELECT event_type AS f,
                  lead(event_type) OVER (PARTITION BY user_id ORDER BY {order}) AS t
           FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL),
c AS (SELECT f AS s, t AS d FROM p WHERE t IS NOT NULL GROUP BY f, t)"""
    return khop_over_sql(edges, seeds, k, directed=True)


def hits_over_sql(edges_cte: str, iters: int = 5) -> str:
    """graph.graph_hits unrolled to ``iters`` CTE rounds over ANY edge
    source (``edges_cte`` ends in a ``c`` relation of (s, d, w)
    positive-weight edges): authority = L1-normalized incoming hub
    sum, hub = L1-normalized outgoing new-authority sum, same
    coalesce-then-divide order as the Spark op."""
    # every per-round CTE is MATERIALIZED: each is referenced 2-3 times
    # downstream and DuckDB's default inlining re-evaluates the whole
    # chain per reference — measured ~8 s for ONE round (and growing
    # multiplicatively) vs 1.7 s for all five rounds materialized
    head = f"""
WITH {edges_cte},
e AS MATERIALIZED (SELECT s, d, sum(w) AS w FROM c GROUP BY s, d),
nodes AS MATERIALIZED (
  SELECT DISTINCT n FROM (SELECT s AS n FROM e UNION ALL SELECT d FROM e)),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes),
h0 AS (SELECT n, 1.0 / (SELECT cnt FROM nn) AS h FROM nodes)"""
    rounds = []
    for i in range(1, iters + 1):
        prev = f"h{i - 1}"
        rounds.append(f""",
ar{i} AS MATERIALIZED (SELECT e.d AS n, sum({prev}.h * e.w) AS ar
          FROM {prev} JOIN e ON {prev}.n = e.s GROUP BY e.d),
at{i} AS (SELECT sum(ar) AS t FROM ar{i}),
a{i} AS MATERIALIZED (SELECT nodes.n, COALESCE(ar{i}.ar, 0) / (SELECT t FROM at{i}) AS a
         FROM nodes LEFT JOIN ar{i} ON nodes.n = ar{i}.n),
hr{i} AS MATERIALIZED (SELECT e.s AS n, sum(a{i}.a * e.w) AS hr
          FROM a{i} JOIN e ON a{i}.n = e.d GROUP BY e.s),
ht{i} AS (SELECT sum(hr) AS t FROM hr{i}),
h{i} AS MATERIALIZED (SELECT nodes.n, COALESCE(hr{i}.hr, 0) / (SELECT t FROM ht{i}) AS h
         FROM nodes LEFT JOIN hr{i} ON nodes.n = hr{i}.n)""")
    return head + "".join(rounds) + f"""
SELECT h.n AS node, round(h.h, 6) AS hub, round(a.a, 6) AS authority
FROM h{iters} h JOIN a{iters} a ON h.n = a.n
"""


def events_hits_sql(
    iters: int = 5, tie: str | None = "event_id", table: str = "events",
) -> str:
    """Mirror of graph.graph_hits over the event_transitions edge list
    (weights = transition counts)."""
    order = "ts" + (f", {tie}" if tie else "")
    edges = f"""p AS (SELECT event_type AS f,
                  lead(event_type) OVER (PARTITION BY user_id ORDER BY {order}) AS t
           FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL),
c AS (SELECT f AS s, t AS d, CAST(count(*) AS DOUBLE) AS w
      FROM p WHERE t IS NOT NULL GROUP BY f, t)"""
    return hits_over_sql(edges, iters)


def graph_summary_over_sql(edges_cte: str) -> str:
    """graph.graph_summary mirrored over ANY edge source (``edges_cte``
    ends in a ``c`` relation with s/d columns): distinct directed
    simple graph, self-loops split out, same division order, 6dp."""
    return f"""
WITH {edges_cte},
e AS MATERIALIZED (SELECT DISTINCT CAST(s AS VARCHAR) AS s, CAST(d AS VARCHAR) AS d
       FROM c WHERE s IS NOT NULL AND d IS NOT NULL),
simple AS MATERIALIZED (SELECT * FROM e WHERE s <> d),
agg AS (SELECT
  (SELECT count(*) FROM (SELECT DISTINCT n FROM
     (SELECT s AS n FROM e UNION ALL SELECT d FROM e))) AS nn,
  (SELECT count(*) FROM simple) AS ne,
  (SELECT count(*) FROM e WHERE s = d) AS nl,
  (SELECT count(*) FROM simple a WHERE EXISTS
     (SELECT 1 FROM simple b WHERE b.s = a.d AND b.d = a.s)) AS nr,
  (SELECT COALESCE(max(cnt), 0) FROM
     (SELECT count(*) AS cnt FROM simple GROUP BY s)) AS mo)
SELECT CAST(nn AS BIGINT) AS n_nodes, CAST(ne AS BIGINT) AS n_edges,
       CAST(nl AS BIGINT) AS self_loops,
       CASE WHEN nn > 0
            THEN round(CAST(ne AS DOUBLE) / CAST(nn AS DOUBLE), 6)
       END AS avg_out_degree,
       CAST(mo AS BIGINT) AS max_out_degree,
       CASE WHEN nn > 1
            THEN round(CAST(ne AS DOUBLE) / CAST(nn * (nn - 1) AS DOUBLE), 6)
       END AS density,
       CASE WHEN ne > 0
            THEN round(CAST(nr AS DOUBLE) / CAST(ne AS DOUBLE), 6)
       END AS reciprocity
FROM agg
"""


def events_graph_summary_sql(
    tie: str | None = "event_id", table: str = "events",
) -> str:
    """Mirror of graph.graph_summary over the event_transitions edges."""
    order = "ts" + (f", {tie}" if tie else "")
    edges = f"""p AS (SELECT event_type AS f,
                  lead(event_type) OVER (PARTITION BY user_id ORDER BY {order}) AS t
           FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL),
c AS (SELECT f AS s, t AS d FROM p WHERE t IS NOT NULL GROUP BY f, t)"""
    return graph_summary_over_sql(edges)


def events_communities_sql(
    iters: int = 5, tie: str | None = "event_id", table: str = "events",
) -> str:
    """Mirror of graph.graph_label_propagation (undirected) over the
    event_transitions edge list: synchronous LPA unrolled to ``iters``
    CTE rounds; per-node winner = (max vote weight, min label) via a
    row_number tie-break."""
    order = "ts" + (f", {tie}" if tie else "")
    head = f"""
WITH p AS (SELECT event_type AS f,
                  lead(event_type) OVER (PARTITION BY user_id ORDER BY {order}) AS t
           FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL),
c AS (SELECT f AS s, t AS d, CAST(count(*) AS DOUBLE) AS w
      FROM p WHERE t IS NOT NULL GROUP BY f, t),
e AS MATERIALIZED (SELECT s, d, sum(w) AS w FROM
        (SELECT s, d, w FROM c UNION ALL SELECT d AS s, s AS d, w FROM c)
      GROUP BY s, d),
nodes AS MATERIALIZED (
  SELECT DISTINCT n FROM (SELECT s AS n FROM e UNION ALL SELECT d FROM e)),
l0 AS (SELECT n, n AS l FROM nodes)"""
    # l{i} is referenced twice per following round (votes + carry-over)
    # — MATERIALIZED stops DuckDB's inliner re-evaluating the chain per
    # reference (compounds per unrolled round; measured 17.7 s -> ~1 s)
    rounds = []
    for i in range(1, iters + 1):
        prev = f"l{i - 1}"
        rounds.append(f""",
v{i} AS (SELECT e.d AS n, {prev}.l, sum(e.w) AS vw
         FROM {prev} JOIN e ON {prev}.n = e.s GROUP BY e.d, {prev}.l),
w{i} AS (SELECT n, l FROM (SELECT n, l,
                row_number() OVER (PARTITION BY n ORDER BY vw DESC, l ASC) AS rn
              FROM v{i}) WHERE rn = 1),
l{i} AS MATERIALIZED (SELECT nodes.n, COALESCE(w{i}.l, {prev}.l) AS l
         FROM nodes LEFT JOIN w{i} ON nodes.n = w{i}.n
         JOIN {prev} ON nodes.n = {prev}.n)""")
    return head + "".join(rounds) + f"""
SELECT n AS node, l AS community FROM l{iters}
"""


def event_paths_sql(
    k: int = 10, max_len: int = 5, tie: str | None = "event_id",
    sep: str = ">", table: str = "events",
) -> str:
    """Mirror of events.event_paths_topk: row_number trim to max_len,
    ordered string_agg per user, count, top-k with (n desc, path asc)
    tie-break."""
    order = "ts" + (f", {tie}" if tie else "")
    return f"""
WITH r AS (SELECT user_id, event_type, ts{', ' + tie if tie else ''},
                  row_number() OVER (PARTITION BY user_id ORDER BY {order}) AS rn
           FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL),
p AS (SELECT user_id, string_agg(event_type, '{sep}' ORDER BY rn) AS path
      FROM r WHERE rn <= {max_len} GROUP BY user_id),
c AS (SELECT path, count(*) AS n_users FROM p GROUP BY path)
SELECT path, CAST(n_users AS BIGINT) AS n_users
FROM c ORDER BY n_users DESC, path ASC LIMIT {k}
"""


def cap_pairs_sql(inner: str, k: int, score_col: str) -> str:
    """Mirror of dedup.cap_pairs_per_doc over an inner pair query: two
    SEQUENTIAL per-side top-k stages (id_a pass, then id_b pass over
    the survivors — the same side order as the Spark op), ordered
    (score DESC, md5(id_a || '|' || id_b)) — the engine-portable hash
    tiebreak both engines compute identically."""
    h = "md5(id_a::VARCHAR || '|' || id_b::VARCHAR)"
    return f"""
WITH __pairs AS ({inner}),
__capa AS (
  SELECT * FROM __pairs
  QUALIFY row_number() OVER (PARTITION BY id_a ORDER BY {score_col} DESC, {h}) <= {int(k)}
)
SELECT * FROM __capa
QUALIFY row_number() OVER (PARTITION BY id_b ORDER BY {score_col} DESC, {h}) <= {int(k)}
"""


def check_constraints_sql(table: str = "orders") -> str:
    """Mirror of curation.check_constraints over the graded rule set:
    one conditional-count aggregate + a UNION ALL report row per rule
    (fractions integer/integer rounded 6dp; unique counts the NULL
    group's first row like GROUP BY)."""
    return f"""
WITH a AS (
  SELECT count(*) AS n,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_clerk,
         count(DISTINCT o_orderkey)
           + max(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS dist_key,
         sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 600000
                  THEN 1 ELSE 0 END) AS oob_price,
         sum(CASE WHEN o_orderpriority IS NOT NULL AND NOT
                  regexp_full_match(CAST(o_orderpriority AS VARCHAR), '[1-5]-[A-Z ]+')
                  THEN 1 ELSE 0 END) AS bad_prio,
         sum(CASE WHEN o_orderstatus IS NOT NULL AND
                  CAST(o_orderstatus AS VARCHAR) NOT IN ('O', 'F', 'P')
                  THEN 1 ELSE 0 END) AS oos_status
  FROM {table})
SELECT 'not_null' AS rule, 'o_custkey' AS "column", 'null_frac' AS metric,
       round(CAST(null_clerk AS DOUBLE) / n, 6) AS value,
       CAST(0.0 AS DOUBLE) AS threshold,
       round(CAST(null_clerk AS DOUBLE) / n, 6) <= 0.0 AS passed
FROM a
UNION ALL
SELECT 'unique', 'o_orderkey', 'dup_frac',
       round(CAST(n - dist_key AS DOUBLE) / n, 6), CAST(0.0 AS DOUBLE),
       round(CAST(n - dist_key AS DOUBLE) / n, 6) <= 0.0
FROM a
UNION ALL
SELECT 'range', 'o_totalprice', 'oob_frac',
       round(CAST(oob_price AS DOUBLE) / n, 6), CAST(0.0 AS DOUBLE),
       round(CAST(oob_price AS DOUBLE) / n, 6) <= 0.0
FROM a
UNION ALL
SELECT 'matches', 'o_orderpriority', 'mismatch_frac',
       round(CAST(bad_prio AS DOUBLE) / n, 6), CAST(0.0 AS DOUBLE),
       round(CAST(bad_prio AS DOUBLE) / n, 6) <= 0.0
FROM a
UNION ALL
SELECT 'in_set', 'o_orderstatus', 'oos_frac',
       round(CAST(oos_status AS DOUBLE) / n, 6), CAST(0.0 AS DOUBLE),
       round(CAST(oos_status AS DOUBLE) / n, 6) <= 0.0
FROM a
UNION ALL
SELECT 'min_rows', NULL, 'n_rows',
       CAST(n AS DOUBLE), CAST(1000.0 AS DOUBLE), n >= 1000
FROM a
"""


def cms_counts_sql(
    col: str = "user_id", table: str = "events",
    depth: int = 4, width: int = 512, n_probe: int = 20,
) -> str:
    """Mirror of curation.cms_sketch + cms_estimate: the same md5-prefix
    slot hashing (Spark conv(substring(md5,1,7),16,10) == DuckDB
    ('0x'||substr(md5,1,7))::BIGINT), depth x width grid counts, probe
    keys '0'..'{n_probe-1}' plus a never-seen 'ghost', est = min over
    the depth rows."""
    return f"""
WITH ks AS (SELECT CAST({col} AS VARCHAR) AS k FROM {table}),
ds AS (SELECT unnest(range({int(depth)})) AS d),
cells AS (
  SELECT ds.d,
         ('0x' || substr(md5(CAST(ds.d AS VARCHAR) || ':' || ks.k), 1, 7))::BIGINT
           % {int(width)} AS slot,
         count(*) AS cnt
  FROM ks CROSS JOIN ds GROUP BY 1, 2),
probes AS (SELECT CAST(i AS VARCHAR) AS key FROM range({int(n_probe)}) t(i)
           UNION ALL SELECT 'ghost'),
pc AS (SELECT p.key, ds.d,
              ('0x' || substr(md5(CAST(ds.d AS VARCHAR) || ':' || p.key), 1, 7))::BIGINT
                % {int(width)} AS slot
       FROM probes p CROSS JOIN ds)
SELECT pc.key, CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS est
FROM pc LEFT JOIN cells ON pc.d = cells.d AND pc.slot = cells.slot
GROUP BY pc.key
"""


def resample_sql(
    key: str = "event_type", ts: str = "ts", value: str = "value",
    table: str = "events", every_minutes: int = 60,
) -> str:
    """Mirror of events.resample(agg='sum', fill='zero'): integer epoch
    bucketing floor(epoch/step), micro-unit sums rounded 6dp, per-key
    dense range(min_b, max_b) grid, gaps coalesce to 0.0."""
    step = int(every_minutes) * 60
    return f"""
WITH e AS (SELECT {key} AS k,
                  CAST(floor(epoch({ts}) / {step}) AS BIGINT) AS b,
                  CAST(round(CAST({value} AS DOUBLE) * 1000000, 0) AS BIGINT) AS mv
           FROM {table}
           WHERE {key} IS NOT NULL AND {ts} IS NOT NULL AND {value} IS NOT NULL),
a AS (SELECT k, b, round(CAST(sum(mv) AS DOUBLE) / 1000000.0, 6) AS v
      FROM e GROUP BY 1, 2),
r AS (SELECT k, min(b) AS b0, max(b) AS b1 FROM a GROUP BY k),
g AS (SELECT k, unnest(range(b0, b1 + 1)) AS b FROM r)
SELECT g.k AS {key}, CAST(g.b AS BIGINT) AS bucket,
       coalesce(a.v, 0.0) AS value
FROM g LEFT JOIN a ON g.k = a.k AND g.b = a.b
"""


def rolling_stats_sql(window: int = 24, every_minutes: int = 60) -> str:
    """Mirror of events.rolling_stats over the events_resample grid:
    trailing-window micro-unit sums (exact integers; micro-squared in
    HUGEINT like Spark's decimal(38,0)), then the IDENTICAL double
    operation order — var = CAST(n*SS - S*S AS DOUBLE) / (n*n) / 1e12,
    mean = S / (n*1e6) — rounded 6dp."""
    grid = resample_sql("event_type", "ts", "value", "events", every_minutes)
    p = int(window) - 1
    return f"""
WITH m AS (SELECT event_type AS k, bucket AS b, value AS v,
                  CAST(round(value * 1000000, 0) AS BIGINT) AS mv
           FROM ({grid}) grid),
w AS (SELECT k, b, v,
             count(*) OVER tw AS n,
             sum(mv) OVER tw AS s,
             sum(CAST(mv AS HUGEINT) * mv) OVER tw AS ss
      FROM m
      WINDOW tw AS (PARTITION BY k ORDER BY b
                    ROWS BETWEEN {p} PRECEDING AND CURRENT ROW))
SELECT k AS event_type, CAST(b AS BIGINT) AS bucket, v AS value,
       round(CAST(s AS DOUBLE) / (n * 1000000.0), 6) AS roll_mean,
       round(sqrt(greatest(
         CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
           / CAST(n * n AS DOUBLE) / 1000000000000.0, 0.0)), 6) AS roll_std,
       CASE WHEN round(sqrt(greatest(
              CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
                / CAST(n * n AS DOUBLE) / 1000000000000.0, 0.0)), 6) > 0
            THEN round((v - round(CAST(s AS DOUBLE) / (n * 1000000.0), 6))
                       / round(sqrt(greatest(
                           CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
                             / CAST(n * n AS DOUBLE) / 1000000000000.0, 0.0)), 6), 6)
       END AS zscore
FROM w
"""


def resample_interp_sql(
    key: str = "event_type", ts: str = "ts", value: str = "value",
    table: str = "events", every_minutes: int = 60,
) -> str:
    """Mirror of events.resample(agg='avg', fill='interp'): micro-unit
    averages, dense per-key grid, gaps linearly interpolated between
    the surrounding real cells with the IDENTICAL operation order
    pv + (nv - pv) * ((b - pb) / (nb - pb)), rounded 6dp."""
    step = int(every_minutes) * 60
    return f"""
WITH e AS (SELECT {key} AS k,
                  CAST(floor(epoch({ts}) / {step}) AS BIGINT) AS b,
                  CAST(round(CAST({value} AS DOUBLE) * 1000000, 0) AS BIGINT) AS mv
           FROM {table}
           WHERE {key} IS NOT NULL AND {ts} IS NOT NULL AND {value} IS NOT NULL),
a AS (SELECT k, b,
             round((CAST(sum(mv) AS DOUBLE) / count(*)) / 1000000.0, 6) AS v
      FROM e GROUP BY 1, 2),
r AS (SELECT k, min(b) AS b0, max(b) AS b1 FROM a GROUP BY k),
g AS (SELECT k, unnest(range(b0, b1 + 1)) AS b FROM r),
j AS (SELECT g.k, g.b, a.v FROM g LEFT JOIN a ON g.k = a.k AND g.b = a.b),
w AS (SELECT k, b, v,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY k ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER
          (PARTITION BY k ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY k ORDER BY b
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER
          (PARTITION BY k ORDER BY b
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM j)
SELECT k AS {key}, CAST(b AS BIGINT) AS bucket,
       CASE WHEN v IS NOT NULL THEN v
            ELSE round(pv + (nv - pv)
                       * (CAST(b - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE)), 6)
       END AS value
FROM w
"""


def check_constraints_state_sql(table: str = "orders") -> str:
    """Mirror of constraints_from_state over 3 batch folds of the
    graded rule set (minus unique — per-batch only): the merged report
    re-derives fractions from summed (viol, n) integers, which equals
    the one-shot report over the union, so the oracle is just
    check_constraints_sql's non-unique rows with the raw counts."""
    return f"""
WITH a AS (
  SELECT count(*) AS n,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_c,
         sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 600000
                  THEN 1 ELSE 0 END) AS oob_p,
         sum(CASE WHEN o_orderstatus IS NOT NULL AND
                  CAST(o_orderstatus AS VARCHAR) NOT IN ('O', 'F', 'P')
                  THEN 1 ELSE 0 END) AS oos_s
  FROM {table})
SELECT 'not_null' AS rule, 'o_custkey' AS "column", 'null_frac' AS metric,
       round(CAST(null_c AS DOUBLE) / n, 6) AS value,
       CAST(0.0 AS DOUBLE) AS threshold,
       round(CAST(null_c AS DOUBLE) / n, 6) <= 0.0 AS passed,
       CAST(null_c AS BIGINT) AS viol, CAST(n AS BIGINT) AS n
FROM a
UNION ALL
SELECT 'range', 'o_totalprice', 'oob_frac',
       round(CAST(oob_p AS DOUBLE) / n, 6), CAST(0.0 AS DOUBLE),
       round(CAST(oob_p AS DOUBLE) / n, 6) <= 0.0,
       CAST(oob_p AS BIGINT), CAST(n AS BIGINT)
FROM a
UNION ALL
SELECT 'in_set', 'o_orderstatus', 'oos_frac',
       round(CAST(oos_s AS DOUBLE) / n, 6), CAST(0.0 AS DOUBLE),
       round(CAST(oos_s AS DOUBLE) / n, 6) <= 0.0,
       CAST(oos_s AS BIGINT), CAST(n AS BIGINT)
FROM a
UNION ALL
SELECT 'min_rows', NULL, 'n_rows',
       CAST(n AS DOUBLE), CAST(1000.0 AS DOUBLE), n >= 1000,
       NULL, CAST(n AS BIGINT)
FROM a
"""


def ks_drift_sql(
    col: str = "l_extendedprice", table: str = "lineitem",
    rel_err: float = 0.05,
) -> str:
    """Mirror of numeric.ks_drift between the even/odd l_orderkey
    halves: shared log-bin space, full-outer bin join, cumulative
    integer counts, sup |CDF_a - CDF_b| rounded 6dp, Smirnov
    alpha=0.05 critical bound."""
    import math

    base = (1.0 + float(rel_err)) ** 2
    lnbase = math.log(base)
    zero = -(1 << 31)
    binexpr = (
        f"CASE WHEN x = 0 THEN CAST({zero} AS BIGINT) "
        f"ELSE CAST(floor(round(ln(x) / {lnbase!r}, 9)) AS BIGINT) END"
    )
    return f"""
WITH va AS (SELECT CAST({col} AS DOUBLE) AS x FROM {table}
            WHERE l_orderkey % 2 = 0 AND {col} IS NOT NULL),
vb AS (SELECT CAST({col} AS DOUBLE) AS x FROM {table}
       WHERE l_orderkey % 2 = 1 AND {col} IS NOT NULL),
ha AS (SELECT {binexpr} AS bin, count(*) AS ca FROM va GROUP BY 1),
hb AS (SELECT {binexpr} AS bin, count(*) AS cb FROM vb GROUP BY 1),
m AS (SELECT coalesce(ha.bin, hb.bin) AS bin,
             coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
      FROM ha FULL JOIN hb ON ha.bin = hb.bin),
t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
      FROM m),
c AS (SELECT bin, sum(ca) OVER (ORDER BY bin) AS cca,
             sum(cb) OVER (ORDER BY bin) AS ccb
      FROM m)
SELECT round(max(abs(CAST(cca AS DOUBLE) / t.na
                     - CAST(ccb AS DOUBLE) / t.nb)), 6) AS ks,
       t.na AS n_a, t.nb AS n_b,
       round(1.358 * sqrt((t.na + t.nb) / (CAST(t.na AS DOUBLE) * t.nb)), 6)
         AS ks_critical,
       round(max(abs(CAST(cca AS DOUBLE) / t.na
                     - CAST(ccb AS DOUBLE) / t.nb)), 6)
         > round(1.358 * sqrt((t.na + t.nb)
                              / (CAST(t.na AS DOUBLE) * t.nb)), 6) AS drifted
FROM c CROSS JOIN t GROUP BY t.na, t.nb
"""


def profile_sql(table: str = "orders") -> str:
    """Mirror of curation.profile_table(exact=True) over the orders
    table: one conditional-count aggregate, a UNION ALL row per column
    (dtype literals = Spark's simpleString names; min/max cast to
    VARCHAR; the NULL group counts as one distinct value)."""
    cols = [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ]
    parts = []
    for c, t in cols:
        parts.append(f"""
SELECT '{c}' AS "column", '{t}' AS dtype,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       round(CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS null_frac,
       CAST(count(DISTINCT {c})
            + max(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min, CAST(max({c}) AS VARCHAR) AS max
FROM {table}""")
    return "\nUNION ALL\n".join(parts)


def dq_suggest_sql(table: str = "orders") -> str:
    """Mirror of the CLOSED Deequ loop profile_table(exact=True) ->
    suggest_constraints -> check_constraints over orders: the rule list
    is re-derived from the same profile IN SQL (not_null where nothing
    is missing, unique where the exact distinct count equals the row
    count, range on numeric columns with the observed [min, max], plus
    a table-level min_rows at half the observed count). Every rule is
    fitted to its own data, so the report is all-pass with zero
    violation fractions BY CONSTRUCTION — what the oracle checks is
    WHICH rows exist (data-dependent: a column with one duplicate at
    this SF emits no unique row) and the min_rows arithmetic."""
    cols = [("o_orderkey", "num"), ("o_custkey", "num"),
            ("o_orderstatus", "str"), ("o_totalprice", "num"),
            ("o_orderdate", "other"), ("o_orderpriority", "str")]
    p_aggs = ["count(*) AS n"]
    for i, (c, _) in enumerate(cols):
        p_aggs.append(
            f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nl{i}")
        p_aggs.append(
            f"count(DISTINCT {c}) "
            f"+ max(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS d{i}")
    parts = []
    for i, (c, kind) in enumerate(cols):
        parts.append(
            f"SELECT 'not_null' AS rule, '{c}' AS \"column\", "
            "'null_frac' AS metric, 0.0 AS value, 0.0 AS threshold, "
            f"TRUE AS passed FROM p WHERE n > 0 AND nl{i} = 0")
        parts.append(
            f"SELECT 'unique', '{c}', 'dup_frac', 0.0, 0.0, TRUE "
            f"FROM p WHERE n > 0 AND d{i} = n")
        if kind == "num":
            # range is suggested when the profile min exists (some
            # non-null value) and always passes on its own data
            parts.append(
                f"SELECT 'range', '{c}', 'oob_frac', 0.0, 0.0, TRUE "
                f"FROM p WHERE n > 0 AND nl{i} < n")
        if kind == "str":
            # in_set for low-cardinality string columns (the observed
            # value set passes on its own data; n_distinct counts the
            # NULL group like the Spark profile)
            parts.append(
                f"SELECT 'in_set', '{c}', 'oos_frac', 0.0, 0.0, TRUE "
                f"FROM p WHERE n > 0 AND d{i} > 1 AND d{i} <= 20")
    parts.append(
        "SELECT 'min_rows', NULL, 'n_rows', CAST(n AS DOUBLE), "
        "CAST(greatest(1, n // 2) AS DOUBLE), n >= greatest(1, n // 2) "
        "FROM p")
    return (f"WITH p AS (SELECT {', '.join(p_aggs)} FROM {table})\n"
            + "\nUNION ALL\n".join(parts))


def dq_suggest_shapes_sql(table: str = "customer") -> str:
    """Mirror of the closed Deequ loop over customer INCLUDING the
    matches-SHAPE suggestion: for each string column the first
    canonical shape (uuid/email/integer/decimal/entity_id/json_object,
    most-specific-first) that every non-null value fully matches emits
    a matches rule — on this table c_name's ``Customer#000000042``
    values land on entity_id; c_mktsegment matches no shape and lands
    on in_set instead. All rules fit their own data (all-pass report
    by construction); the oracle checks WHICH rows exist."""
    from wrangler_spark.datapipe.curation import _SHAPE_PATTERNS

    cols = [("c_custkey", "num"), ("c_name", "str"),
            ("c_nationkey", "num"), ("c_acctbal", "num"),
            ("c_mktsegment", "str")]
    p_aggs = ["count(*) AS n"]
    for i, (c, kind) in enumerate(cols):
        p_aggs.append(
            f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nl{i}")
        p_aggs.append(
            f"count(DISTINCT {c}) "
            f"+ max(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS d{i}")
        if kind == "str":
            for j, (_, pat) in enumerate(_SHAPE_PATTERNS):
                p_aggs.append(
                    f"sum(CASE WHEN {c} IS NOT NULL AND NOT "
                    f"regexp_matches({c}, '^(?:{pat})$') THEN 1 ELSE 0 END)"
                    f" AS sh{i}_{j}")
    parts = []
    for i, (c, kind) in enumerate(cols):
        parts.append(
            f"SELECT 'not_null' AS rule, '{c}' AS \"column\", "
            "'null_frac' AS metric, 0.0 AS value, 0.0 AS threshold, "
            f"TRUE AS passed FROM p WHERE n > 0 AND nl{i} = 0")
        parts.append(
            f"SELECT 'unique', '{c}', 'dup_frac', 0.0, 0.0, TRUE "
            f"FROM p WHERE n > 0 AND d{i} = n")
        if kind == "num":
            parts.append(
                f"SELECT 'range', '{c}', 'oob_frac', 0.0, 0.0, TRUE "
                f"FROM p WHERE n > 0 AND nl{i} < n")
        if kind == "str":
            parts.append(
                f"SELECT 'in_set', '{c}', 'oos_frac', 0.0, 0.0, TRUE "
                f"FROM p WHERE n > 0 AND d{i} > 1 AND d{i} <= 20")
            # first zero-mismatch shape wins (all earlier shapes must
            # have at least one mismatching value)
            for j in range(len(_SHAPE_PATTERNS)):
                prior = " AND ".join(
                    [f"sh{i}_{k} > 0" for k in range(j)]) or "TRUE"
                parts.append(
                    f"SELECT 'matches', '{c}', 'mismatch_frac', 0.0, "
                    f"0.0, TRUE FROM p WHERE n > 0 AND nl{i} < n "
                    f"AND sh{i}_{j} = 0 AND {prior}")
    parts.append(
        "SELECT 'min_rows', NULL, 'n_rows', CAST(n AS DOUBLE), "
        "CAST(greatest(1, n // 2) AS DOUBLE), n >= greatest(1, n // 2) "
        "FROM p")
    return (f"WITH p AS (SELECT {', '.join(p_aggs)} FROM {table})\n"
            + "\nUNION ALL\n".join(parts))


def impute_sql(table: str = "events") -> str:
    """Mirror of numeric.impute_column(strategy='mean', by=[type]) over
    events with value nulled on event_id % 7 == 0: per-group micro-unit
    mean joined back, NULLs coalesced; all-NULL groups stay NULL."""
    return f"""
WITH e AS (SELECT event_id, event_type,
                  CASE WHEN event_id % 7 = 0 THEN NULL
                       ELSE CAST(value AS DOUBLE) END AS v
           FROM {table}),
s AS (SELECT event_type,
             round(CAST(sum(CAST(round(v * 1000000, 0) AS BIGINT)) AS DOUBLE)
                   / (count(v) * 1000000.0), 6) AS fill
      FROM e WHERE v IS NOT NULL GROUP BY event_type)
SELECT e.event_id, e.event_type, coalesce(e.v, s.fill) AS v
FROM e LEFT JOIN s USING (event_type)
"""


def js_divergence_sql(buckets: int = 65536, table: str = "documents") -> str:
    """Mirror of text.js_divergence between the even/odd doc_id halves:
    md5-prefix bucket hashing mod ``buckets``, identical double
    operation order per term, nano-unit integer sum."""
    tok = (f"SELECT unnest(list_filter(string_split({_NORM}, ' '), "
           "x -> x <> '')) AS token FROM {t}")
    hsh = f"('0x' || substr(md5(token), 1, 7))::BIGINT % {int(buckets)}"
    return f"""
WITH ta AS ({tok.format(t=f"(SELECT * FROM {table} WHERE doc_id % 2 = 0)")}),
tb AS ({tok.format(t=f"(SELECT * FROM {table} WHERE doc_id % 2 = 1)")}),
ha AS (SELECT {hsh} AS bucket, count(*) AS ca FROM ta GROUP BY 1),
hb AS (SELECT {hsh} AS bucket, count(*) AS cb FROM tb GROUP BY 1),
m AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
      FROM ha FULL JOIN hb ON ha.bucket = hb.bucket),
t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
      FROM m),
terms AS (
  SELECT CAST(round((
           CASE WHEN ca > 0
                THEN 0.5 * (ca / t.na)
                     * log2(2 * (ca / t.na) / ((ca / t.na) + (cb / t.nb)))
                ELSE 0.0 END
           + CASE WHEN cb > 0
                  THEN 0.5 * (cb / t.nb)
                       * log2(2 * (cb / t.nb) / ((ca / t.na) + (cb / t.nb)))
                  ELSE 0.0 END) * 1000000000, 0) AS BIGINT) AS nano,
         t.na, t.nb
  FROM m CROSS JOIN t)
SELECT round(CAST(sum(nano) AS DOUBLE) / 1000000000.0, 6) AS js,
       na AS n_a, nb AS n_b
FROM terms GROUP BY na, nb
"""


def seasonality_sql(
    key: str = "event_type", ts: str = "ts", table: str = "events",
) -> str:
    """Mirror of events.seasonality: epoch-day ISO weekday arithmetic
    (day 0 = Thursday), UTC hour, per-key share rounded 6dp."""
    return f"""
WITH c AS (
  SELECT {key} AS k,
         CAST((CAST(floor(epoch({ts}) / 86400) AS BIGINT) + 3) % 7 + 1 AS INT) AS dow,
         CAST(floor((epoch({ts}) % 86400) / 3600) AS INT) AS hour,
         count(*) AS n
  FROM {table} WHERE {key} IS NOT NULL AND {ts} IS NOT NULL
  GROUP BY 1, 2, 3),
t AS (SELECT k, sum(n) AS tot FROM c GROUP BY k)
SELECT c.k AS {key}, c.dow, c.hour, CAST(c.n AS BIGINT) AS n,
       round(CAST(c.n AS DOUBLE) / t.tot, 6) AS share
FROM c JOIN t ON c.k = t.k
"""


def cusum_sql(
    k: float = 0.5, h: float = 5.0, every_minutes: int = 60,
    table: str = "events",
) -> str:
    """Mirror of events.cusum over the hourly count grid (resample
    agg='count', fill='zero'): per-key micro-unit mean/std, then the
    Page recursions via a recursive CTE in the IDENTICAL double
    operation order; constant keys (sd = 0) emit NULL cusums."""
    step = int(every_minutes) * 60
    kk, hh = float(k), float(h)
    return f"""
WITH RECURSIVE
e AS (SELECT event_type AS gk,
             CAST(floor(epoch(ts) / {step}) AS BIGINT) AS b
      FROM {table} WHERE event_type IS NOT NULL AND ts IS NOT NULL),
a AS (SELECT gk, b, CAST(count(*) AS DOUBLE) AS v FROM e GROUP BY 1, 2),
r0 AS (SELECT gk, min(b) AS b0, max(b) AS b1 FROM a GROUP BY gk),
g AS (SELECT gk, unnest(range(b0, b1 + 1)) AS b FROM r0),
m AS (SELECT g.gk, g.b, coalesce(a.v, 0.0) AS v
      FROM g LEFT JOIN a ON g.gk = a.gk AND g.b = a.b),
st AS (SELECT gk, count(*) AS n,
              sum(CAST(round(v * 1000000, 0) AS BIGINT)) AS s,
              sum(CAST(CAST(round(v * 1000000, 0) AS BIGINT) AS HUGEINT)
                  * CAST(round(v * 1000000, 0) AS BIGINT)) AS ss
       FROM m GROUP BY gk),
stats AS (SELECT gk,
                 round(CAST(s AS DOUBLE) / (n * 1000000.0), 6) AS mu,
                 round(sqrt(greatest(
                   CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
                     / CAST(n * n AS DOUBLE) / 1000000000000.0, 0.0)), 6) AS sd
          FROM st),
idx AS (SELECT m.gk, m.b, m.v, stats.mu, stats.sd,
               row_number() OVER (PARTITION BY m.gk ORDER BY m.b) AS i
        FROM m JOIN stats ON m.gk = stats.gk WHERE stats.sd > 0),
rec AS (
  SELECT gk, i, b, v, mu, sd,
         greatest(0.0, 0.0 + (v - mu) / sd - {kk!r}) AS sp,
         greatest(0.0, 0.0 - (v - mu) / sd - {kk!r}) AS sn
  FROM idx WHERE i = 1
  UNION ALL
  SELECT c.gk, c.i, c.b, c.v, c.mu, c.sd,
         greatest(0.0, rec.sp + (c.v - c.mu) / c.sd - {kk!r}),
         greatest(0.0, rec.sn - (c.v - c.mu) / c.sd - {kk!r})
  FROM idx c JOIN rec ON c.gk = rec.gk AND c.i = rec.i + 1)
SELECT gk AS event_type, CAST(b AS BIGINT) AS bucket, v AS value,
       round(sp, 6) AS cusum_pos, round(sn, 6) AS cusum_neg,
       (sp > {hh!r} OR sn > {hh!r}) AS alarm
FROM rec
UNION ALL
SELECT m.gk, CAST(m.b AS BIGINT), m.v, NULL, NULL, NULL
FROM m JOIN stats ON m.gk = stats.gk WHERE stats.sd = 0
"""


def ewma_sql(
    alpha: float = 0.3, L: float = 3.0, every_minutes: int = 60,
    table: str = "events",
) -> str:
    """Mirror of events.ewma over the hourly count grid (resample
    agg='count', fill='zero'): per-key micro-unit mean/std, then the
    Roberts recursion e_t = α·x_t + (1−α)·e_{t−1} (e_0 = μ) via a
    recursive CTE in the IDENTICAL double operation order, and the
    time-varying band μ ± L·σ·sqrt(α/(2−α)·(1−(1−α)^{2t}))."""
    step = int(every_minutes) * 60
    aa, ll = float(alpha), float(L)
    ca, fa = aa / (2.0 - aa), 1.0 - aa
    return f"""
WITH RECURSIVE
e AS (SELECT event_type AS gk,
             CAST(floor(epoch(ts) / {step}) AS BIGINT) AS b
      FROM {table} WHERE event_type IS NOT NULL AND ts IS NOT NULL),
a AS (SELECT gk, b, CAST(count(*) AS DOUBLE) AS v FROM e GROUP BY 1, 2),
r0 AS (SELECT gk, min(b) AS b0, max(b) AS b1 FROM a GROUP BY gk),
g AS (SELECT gk, unnest(range(b0, b1 + 1)) AS b FROM r0),
m AS (SELECT g.gk, g.b, coalesce(a.v, 0.0) AS v
      FROM g LEFT JOIN a ON g.gk = a.gk AND g.b = a.b),
st AS (SELECT gk, count(*) AS n,
              sum(CAST(round(v * 1000000, 0) AS BIGINT)) AS s,
              sum(CAST(CAST(round(v * 1000000, 0) AS BIGINT) AS HUGEINT)
                  * CAST(round(v * 1000000, 0) AS BIGINT)) AS ss
       FROM m GROUP BY gk),
stats AS (SELECT gk,
                 round(CAST(s AS DOUBLE) / (n * 1000000.0), 6) AS mu,
                 round(sqrt(greatest(
                   CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
                     / CAST(n * n AS DOUBLE) / 1000000000000.0, 0.0)), 6) AS sd
          FROM st),
idx AS (SELECT m.gk, m.b, m.v, stats.mu, stats.sd,
               row_number() OVER (PARTITION BY m.gk ORDER BY m.b) AS i
        FROM m JOIN stats ON m.gk = stats.gk),
rec AS (
  SELECT gk, i, b, v, mu, sd, {aa!r} * v + {fa!r} * mu AS ew
  FROM idx WHERE i = 1
  UNION ALL
  SELECT c.gk, c.i, c.b, c.v, c.mu, c.sd,
         {aa!r} * c.v + {fa!r} * rec.ew
  FROM idx c JOIN rec ON c.gk = rec.gk AND c.i = rec.i + 1),
lim AS (SELECT gk, i, b, v, mu, sd, ew,
               {ll!r} * sd * sqrt({ca!r} * (1.0 - power({fa!r}, i * 2))) AS lm
        FROM rec)
SELECT gk AS event_type, CAST(b AS BIGINT) AS bucket, v AS value,
       round(ew, 6) AS ewma, round(mu - lm, 6) AS lo, round(mu + lm, 6) AS hi,
       (ew < mu - lm OR ew > mu + lm) AS anomaly
FROM lim
"""


def survival_sql(
    period_days: int = 7, horizon_periods: int = 1, table: str = "events",
) -> str:
    """Mirror of events.survival: per-user lifetime buckets, right-
    censoring inside the horizon of the observation end, and the
    Kaplan-Meier product via a recursive CTE in the same sequential
    order as Spark's fold."""
    step = int(period_days) * 86400
    hz = int(horizon_periods) * step
    return f"""
WITH RECURSIVE
sp AS (SELECT user_id AS u,
              CAST(min(epoch(ts)) AS BIGINT) AS f,
              CAST(max(epoch(ts)) AS BIGINT) AS l
       FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL
       GROUP BY 1),
en AS (SELECT max(l) AS endt FROM sp),
m AS (SELECT CAST(floor((l - f) / {step}) AS BIGINT) AS period,
             (l >= (SELECT endt FROM en) - {hz}) AS cen
      FROM sp),
b AS (SELECT period,
             CAST(sum(CASE WHEN cen THEN 0 ELSE 1 END) AS BIGINT) AS churned,
             CAST(sum(CASE WHEN cen THEN 1 ELSE 0 END) AS BIGINT) AS censored
      FROM m GROUP BY period),
tot AS (SELECT CAST(sum(churned + censored) AS BIGINT) AS n0 FROM b),
idx AS (SELECT b.*, row_number() OVER (ORDER BY period) AS i FROM b),
rec AS (
  SELECT i, period, (SELECT n0 FROM tot) AS at_risk, churned, censored,
         1.0 * (1 - churned / (SELECT n0 FROM tot)) AS s,
         (SELECT n0 FROM tot) - churned - censored AS n_next
  FROM idx WHERE i = 1
  UNION ALL
  SELECT c.i, c.period, rec.n_next, c.churned, c.censored,
         rec.s * (1 - c.churned / rec.n_next),
         rec.n_next - c.churned - c.censored
  FROM idx c JOIN rec ON c.i = rec.i + 1)
SELECT period, at_risk, churned, censored, round(s, 6) AS survival
FROM rec
"""


def survival_by_sql(
    by: str = "event_type", period_days: int = 7, horizon_periods: int = 1,
    table: str = "events",
) -> str:
    """Mirror of events.survival_by: group = the user's first-event
    value (min over the (epoch, group) struct — Spark's min(struct)
    lexicographic order), corpus-wide censoring clock, per-group KM
    recursion."""
    step = int(period_days) * 86400
    hz = int(horizon_periods) * step
    return f"""
WITH RECURSIVE
sp AS (SELECT user_id AS u,
              CAST(min(epoch(ts)) AS BIGINT) AS f,
              CAST(max(epoch(ts)) AS BIGINT) AS l,
              (min({{'t': CAST(epoch(ts) AS BIGINT),
                    'g': CAST({by} AS VARCHAR)}})).g AS g
       FROM {table}
       WHERE user_id IS NOT NULL AND ts IS NOT NULL AND {by} IS NOT NULL
       GROUP BY 1),
en AS (SELECT max(l) AS endt FROM sp),
m AS (SELECT g, CAST(floor((l - f) / {step}) AS BIGINT) AS period,
             (l >= (SELECT endt FROM en) - {hz}) AS cen
      FROM sp),
b AS (SELECT g, period,
             CAST(sum(CASE WHEN cen THEN 0 ELSE 1 END) AS BIGINT) AS churned,
             CAST(sum(CASE WHEN cen THEN 1 ELSE 0 END) AS BIGINT) AS censored
      FROM m GROUP BY g, period),
tot AS (SELECT g, CAST(sum(churned + censored) AS BIGINT) AS n0
        FROM b GROUP BY g),
idx AS (SELECT b.*, row_number() OVER (PARTITION BY b.g ORDER BY period) AS i
        FROM b),
rec AS (
  SELECT idx.g, i, period, tot.n0 AS at_risk, churned, censored,
         1.0 * (1 - churned / tot.n0) AS s,
         tot.n0 - churned - censored AS n_next
  FROM idx JOIN tot ON idx.g = tot.g WHERE i = 1
  UNION ALL
  SELECT c.g, c.i, c.period, rec.n_next, c.churned, c.censored,
         rec.s * (1 - c.churned / rec.n_next),
         rec.n_next - c.churned - c.censored
  FROM idx c JOIN rec ON c.g = rec.g AND c.i = rec.i + 1)
SELECT g AS {by}, period, at_risk, churned, censored,
       round(s, 6) AS survival
FROM rec
"""


def corr_matrix_sql(
    cols=("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    table: str = "lineitem",
) -> str:
    """Mirror of numeric.corr_matrix: micro-unit HUGEINT moments with
    pairwise deletion, corr from exact integers with the identical
    double operation order, 6dp."""
    cols = list(cols)
    parts = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            both = f"({a} IS NOT NULL AND {b} IS NOT NULL)"
            ma = f"CASE WHEN {both} THEN CAST(round(CAST({a} AS DOUBLE) * 1000000, 0) AS BIGINT) END"
            mb = f"CASE WHEN {both} THEN CAST(round(CAST({b} AS DOUBLE) * 1000000, 0) AS BIGINT) END"
            parts.append(f"""
SELECT '{a}' AS col_a, '{b}' AS col_b,
       CASE WHEN (CAST(count(CASE WHEN {both} THEN 1 END) AS HUGEINT)
                    * sum(CAST({ma} AS HUGEINT) * ({ma}))
                  - sum(CAST({ma} AS HUGEINT)) * sum(CAST({ma} AS HUGEINT))) > 0
             AND (CAST(count(CASE WHEN {both} THEN 1 END) AS HUGEINT)
                    * sum(CAST({mb} AS HUGEINT) * ({mb}))
                  - sum(CAST({mb} AS HUGEINT)) * sum(CAST({mb} AS HUGEINT))) > 0
            THEN round(
              CAST(CAST(count(CASE WHEN {both} THEN 1 END) AS HUGEINT)
                     * sum(CAST({ma} AS HUGEINT) * ({mb}))
                   - sum(CAST({ma} AS HUGEINT)) * sum(CAST({mb} AS HUGEINT))
                   AS DOUBLE)
              / sqrt(
                  CAST(CAST(count(CASE WHEN {both} THEN 1 END) AS HUGEINT)
                         * sum(CAST({ma} AS HUGEINT) * ({ma}))
                       - sum(CAST({ma} AS HUGEINT)) * sum(CAST({ma} AS HUGEINT))
                       AS DOUBLE)
                  * CAST(CAST(count(CASE WHEN {both} THEN 1 END) AS HUGEINT)
                           * sum(CAST({mb} AS HUGEINT) * ({mb}))
                         - sum(CAST({mb} AS HUGEINT)) * sum(CAST({mb} AS HUGEINT))
                         AS DOUBLE)), 6)
       END AS corr,
       CAST(count(CASE WHEN {both} THEN 1 END) AS BIGINT) AS n
FROM {table}""")
    return "\nUNION ALL\n".join(parts)


def funnel_steps_by_sql(
    steps: list[str], within_seconds: int | None = None,
    table: str = "events",
) -> str:
    """Mirror of events.funnel_steps_by over arm = user_id % 2: the
    greedy CTE chain of funnel_steps_sql plus anchor-event group
    attribution (min (epoch, value) struct over step-1 events) and
    per-group conversion."""
    ctes = [
        f"ev AS (SELECT user_id, ts, CAST(user_id % 2 AS VARCHAR) AS arm, "
        f"event_type FROM {table} "
        "WHERE user_id IS NOT NULL AND ts IS NOT NULL)",
        f"s1 AS (SELECT user_id, min(ts) AS t1, min(ts) AS tprev FROM ev "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)",
        f"attr AS (SELECT user_id, "
        "(min({'t': epoch_us(ts), 'g': arm})).g AS g FROM ev "
        f"WHERE event_type = '{steps[0]}' AND arm IS NOT NULL "
        "GROUP BY user_id)",
    ]
    for i, st in enumerate(steps[1:], start=2):
        bound = (
            f" AND e.ts <= s{i-1}.t1 + INTERVAL {within_seconds} SECOND"
            if within_seconds is not None
            else ""
        )
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(s{i-1}.t1) AS t1, min(e.ts) AS tprev "
            f"FROM ev e JOIN s{i-1} ON e.user_id = s{i-1}.user_id "
            f"WHERE e.event_type = '{st}' AND e.ts > s{i-1}.tprev{bound} "
            "GROUP BY e.user_id)"
        )
    unions = " UNION ALL ".join(
        f"SELECT attr.g, {i + 1} AS step, '{st}' AS event_type, "
        f"count(*) AS users FROM s{i + 1} JOIN attr USING (user_id) "
        "GROUP BY attr.g"
        for i, st in enumerate(steps)
    )
    ctes.append(f"c AS ({unions})")
    ctes.append("f AS (SELECT g, users AS n1 FROM c WHERE step = 1)")
    # full (group x step) grid with users=0 rows, mirroring the Spark
    # side: a group that converted nobody at step i still reports
    steplist = " UNION ALL ".join(
        f"SELECT {i + 1} AS step, '{st}' AS event_type"
        for i, st in enumerate(steps)
    )
    ctes.append(f"sl AS ({steplist})")
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT f.g AS arm, CAST(sl.step AS BIGINT) AS step, "
        "sl.event_type, "
        "CAST(coalesce(c.users, 0) AS BIGINT) AS users, "
        "CASE WHEN f.n1 > 0 "
        "THEN round(CAST(coalesce(c.users, 0) AS DOUBLE) / f.n1, 6) "
        "ELSE 0.0 END AS conversion "
        "FROM f CROSS JOIN sl "
        "LEFT JOIN c ON c.g = f.g AND c.step = sl.step"
    )


def funnel_ab_sql(
    steps: list[str], within_seconds: int | None = None,
    table: str = "events",
) -> str:
    """Mirror of events.funnel_ab_test over the user-parity arms '0'
    vs '1': the grouped funnel as a subquery, then the two-proportion
    z per step in the identical double order."""
    gfun = funnel_steps_by_sql(steps, within_seconds, table)
    return f"""
WITH j AS (
  SELECT a.step, a.event_type, a.users AS ua, b.users AS ub
  FROM ({gfun}) a JOIN ({gfun}) b ON a.step = b.step
  WHERE a.arm = '0' AND b.arm = '1'),
n1 AS (SELECT ua AS na, ub AS nb FROM j WHERE step = 1),
{_ab_tail_sql(["step", "event_type"], "j.step > 1")}
"""


def _ab_tail_sql(labels: list[str], where: str) -> str:
    """The shared A/B readout tail over a CTE ``j`` carrying
    (labels..., ua, ub) and a 1-row ``n1`` (na, nb) — Wilson interval
    pieces in the IDENTICAL double operation order as the Spark side
    (_two_proportion_cols): center = p + z²/(2n), half = z·sqrt(
    p(1-p)/n + z²/(4n·n)), bound = (center ∓ half)/(1 + z²/n);
    Newcombe hybrid for the difference."""
    jlab = ", ".join(f"j.{c}" for c in labels)
    lab = ", ".join(labels)
    return f"""p AS (
  SELECT {jlab}, ua, ub, na, nb,
         CAST(ua AS DOUBLE) / na AS pa,
         CAST(ub AS DOUBLE) / nb AS pb,
         sqrt(((ua + ub) / CAST(na + nb AS DOUBLE))
              * (1.0 - (ua + ub) / CAST(na + nb AS DOUBLE))
              * (1.0 / na + 1.0 / nb)) AS se
  FROM j CROSS JOIN n1 WHERE {where}),
wls AS (
  SELECT *,
         (pa + 1.96*1.96/(2.0*na)
            - 1.96*sqrt(pa*(1.0-pa)/na + 1.96*1.96/(4.0*na*na)))
           / (1.0 + 1.96*1.96/na) AS la,
         (pa + 1.96*1.96/(2.0*na)
            + 1.96*sqrt(pa*(1.0-pa)/na + 1.96*1.96/(4.0*na*na)))
           / (1.0 + 1.96*1.96/na) AS ha,
         (pb + 1.96*1.96/(2.0*nb)
            - 1.96*sqrt(pb*(1.0-pb)/nb + 1.96*1.96/(4.0*nb*nb)))
           / (1.0 + 1.96*1.96/nb) AS lb,
         (pb + 1.96*1.96/(2.0*nb)
            + 1.96*sqrt(pb*(1.0-pb)/nb + 1.96*1.96/(4.0*nb*nb)))
           / (1.0 + 1.96*1.96/nb) AS hb
  FROM p)
SELECT {lab},
       CAST(ua AS BIGINT) AS users_a, CAST(ub AS BIGINT) AS users_b,
       round(pa, 6) AS conv_a, round(pb, 6) AS conv_b,
       round(la, 6) AS conv_a_lo, round(ha, 6) AS conv_a_hi,
       round(lb, 6) AS conv_b_lo, round(hb, 6) AS conv_b_hi,
       round(pa - pb, 6) AS diff,
       round(pa - pb - sqrt((pa-la)*(pa-la) + (hb-pb)*(hb-pb)), 6) AS diff_lo,
       round(pa - pb + sqrt((ha-pa)*(ha-pa) + (pb-lb)*(pb-lb)), 6) AS diff_hi,
       CASE WHEN se > 0 THEN round((pa - pb) / se, 6) END AS z,
       CASE WHEN se > 0
            THEN abs(round((pa - pb) / se, 6)) > 1.96 END AS significant
FROM wls"""


def retention_ab_sql(
    period_days: int = 7, max_periods: int = 8, table: str = "events",
) -> str:
    """Mirror of events.retention_ab_test over the user-parity arms
    '0' vs '1': the grouped retention grid as a subquery, cohorts
    pooled per (arm, offset), a FULL OUTER offset join with absent
    counts as 0, then the shared two-proportion/Wilson tail."""
    grid = retention_cohorts_by_sql(period_days, max_periods, table)
    return f"""
WITH grid AS ({grid}),
agg AS (SELECT arm, period_offset, CAST(sum(active_users) AS BIGINT) AS users
        FROM grid GROUP BY arm, period_offset),
aa AS (SELECT period_offset, users AS ua FROM agg WHERE arm = '0'),
bb AS (SELECT period_offset AS ob, users AS ub FROM agg WHERE arm = '1'),
j AS (SELECT coalesce(aa.period_offset, bb.ob) AS period_offset,
             coalesce(ua, 0) AS ua, coalesce(ub, 0) AS ub
      FROM aa FULL OUTER JOIN bb ON aa.period_offset = bb.ob),
n1 AS (SELECT ua AS na, ub AS nb FROM j WHERE period_offset = 0),
{_ab_tail_sql(["period_offset"], "j.period_offset > 0")}
"""


def doc_keywords_sql(k: int = 5, table: str = "documents") -> str:
    """Mirror of text.group_top_terms(by=doc_id, weight='tfidf') at
    per-document cardinality — classic TF-IDF keyword extraction:
    score = tf * ln(n_docs / df), rank per doc by (rounded score desc,
    term asc)."""
    return f"""
WITH toks AS (SELECT doc_id AS g,
                     unnest(list_filter(string_split({_NORM}, ' '),
                            x -> x <> '')) AS t
              FROM {table}),
c AS (SELECT g, t, count(*) AS tf FROM toks GROUP BY g, t),
tm AS (SELECT t, count(*) AS df FROM c GROUP BY t),
ng AS (SELECT count(DISTINCT g) AS n FROM c),
s AS (SELECT c.g, c.t, c.tf,
             round(c.tf * ln(CAST((SELECT n FROM ng) AS DOUBLE)
                             / CAST(tm.df AS DOUBLE)), 6) AS score
      FROM c JOIN tm USING (t)),
r AS (SELECT g, t, tf, score,
             row_number() OVER (PARTITION BY g
                                ORDER BY score DESC, t ASC) AS rank
      FROM s)
SELECT g AS doc_id, t AS term, CAST(tf AS BIGINT) AS tf, score,
       CAST(rank AS INT) AS rank
FROM r WHERE rank <= {int(k)}
"""


def retention_cohorts_by_sql(
    period_days: int = 7, max_periods: int = 8, table: str = "events",
) -> str:
    """Mirror of events.retention_cohorts_by over arm = user_id % 2:
    retention_cohorts_sql plus first-event struct-min attribution and
    per-(arm, cohort) denominators."""
    return f"""
WITH ev AS (SELECT user_id AS u, ts, CAST(user_id % 2 AS VARCHAR) AS arm
            FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL),
b AS (SELECT DISTINCT u,
             CAST(floor(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                        / {period_days}.0) AS BIGINT) AS bk
      FROM ev),
attr AS (SELECT u, (min({{'t': epoch_us(ts), 'g': arm}})).g AS g
         FROM ev WHERE arm IS NOT NULL GROUP BY u),
f AS (SELECT u, min(bk) AS cb FROM b GROUP BY u),
a AS (SELECT attr.g, f.cb, b.bk - f.cb AS off, count(*) AS n
      FROM b JOIN f USING (u) JOIN attr USING (u)
      WHERE b.bk - f.cb < {max_periods} GROUP BY attr.g, f.cb, b.bk - f.cb),
s AS (SELECT g, cb, n AS sz FROM a WHERE off = 0)
SELECT a.g AS arm,
       CAST(DATE '1970-01-01' + CAST(a.cb * {period_days} AS INT) AS VARCHAR)
         AS cohort_start,
       CAST(a.off AS BIGINT) AS period_offset,
       CAST(a.n AS BIGINT) AS active_users,
       round(CAST(a.n AS DOUBLE) / s.sz, 6) AS retention
FROM a JOIN s ON a.g = s.g AND a.cb = s.cb
"""


def attribution_sql(
    conversion: str = "purchase",
    touches: tuple = ("view", "click"),
    ch_mod: int = 5,
    table: str = "events",
) -> str:
    """Mirror of events.attribution with channel = 'ch' || (props.k %
    ch_mod) and event_id tiebreaks: one per-user running window
    (IGNORE NULLS first/last + conditional running count), conversions
    filtered at the end."""
    tl = ", ".join(f"'{t}'" for t in touches)
    return f"""
WITH tagged AS (
  SELECT user_id AS "user", ts, event_type AS ty, event_id,
         CASE WHEN event_type IN ({tl}) THEN
           'ch' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                        % {int(ch_mod)} AS VARCHAR) END AS ch
  FROM {table}
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IN ({tl}, '{conversion}')),
r AS (
  SELECT "user", ts, ty,
         first_value(ch IGNORE NULLS) OVER w AS first_touch,
         last_value(ch IGNORE NULLS) OVER w AS last_touch,
         CAST(sum(CASE WHEN ch IS NOT NULL THEN 1 ELSE 0 END) OVER w
              AS BIGINT) AS n_touches
  FROM tagged
  WINDOW w AS (PARTITION BY "user" ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT "user", ts, first_touch, last_touch, n_touches
FROM r WHERE ty = '{conversion}'
"""


def rank_transform_sql(
    value_col: str = "l_quantity",
    keep: tuple = ("l_orderkey", "l_linenumber"),
    table: str = "lineitem",
) -> str:
    """Mirror of numeric.rank_transform: doubled midranks via a cumsum
    window over the micro-integer value histogram, halved once at the
    end, joined back to the rows."""
    kl = ", ".join(f"l.{c}" for c in keep)
    return f"""
WITH h AS (
  SELECT CAST(round({value_col} * 1000000, 0) AS BIGINT) AS v,
         count(*) AS t
  FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1),
r AS (
  SELECT v,
         CAST(2 * coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN
           UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS DOUBLE)
           / 2.0 AS rnk
  FROM h)
SELECT {kl}, l.{value_col}, r.rnk AS {value_col}_rank
FROM {table} l
JOIN r ON CAST(round(l.{value_col} * 1000000, 0) AS BIGINT) = r.v
"""


def srm_sql(
    ratios: dict[str, float],
    crit: float,
    arm_mod: int = 3,
    table: str = "events",
) -> str:
    """Mirror of events.srm_check with arm = user_id % arm_mod cast to
    string: distinct units per arm, expected = n * (w / sum_w), per-arm
    chi-2 components folded in arm order (list_reduce — the same fixed
    IEEE accumulation order as Spark's sorted-array fold), graded
    against the SAME embedded critical value."""
    sw = float(sum(ratios.values()))
    dof = len(ratios) - 1
    vals = " UNION ALL ".join(
        f"SELECT '{a}' AS arm, CAST({float(w)!r} AS DOUBLE) AS w"
        for a, w in sorted(ratios.items()))
    return f"""
WITH cnt AS (
  SELECT CAST(user_id % {arm_mod} AS VARCHAR) AS arm,
         count(DISTINCT user_id) AS users
  FROM {table} WHERE user_id IS NOT NULL GROUP BY 1),
exp AS ({vals}),
tot AS (SELECT sum(users) AS n FROM cnt),
obs AS (
  SELECT exp.arm, exp.w, coalesce(cnt.users, 0) AS users
  FROM exp LEFT JOIN cnt USING (arm)),
staged AS (
  SELECT obs.arm, obs.users, tot.n,
         round(CAST(tot.n AS DOUBLE) * (obs.w / {sw!r}), 6)
           AS expected_users,
         round(CAST(obs.users AS DOUBLE) / tot.n, 6) AS ratio,
         round(obs.w / {sw!r}, 6) AS expected_ratio,
         (obs.users - CAST(tot.n AS DOUBLE) * (obs.w / {sw!r}))
           * (obs.users - CAST(tot.n AS DOUBLE) * (obs.w / {sw!r}))
           / (CAST(tot.n AS DOUBLE) * (obs.w / {sw!r})) AS comp
  FROM obs CROSS JOIN tot),
chi AS (SELECT round(list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                              list(comp ORDER BY arm)),
                 (a, b) -> a + b), 6) AS chi2
        FROM staged)
SELECT staged.arm, CAST(staged.users AS BIGINT) AS users,
       staged.expected_users, staged.ratio, staged.expected_ratio,
       chi.chi2, CAST({dof} AS INT) AS df,
       (chi.chi2 > {crit!r}) AS srm
FROM staged CROSS JOIN chi
"""


def cuped_ab_sql(
    split_ts: str,
    arm_mod: int = 2,
    table: str = "events",
) -> str:
    """Mirror of events.user_period_metrics -> events.cuped_ab_test
    with arm = user_id % arm_mod (arms '0' vs '1'): per-user pre/post
    micro-integer sums rounded back to 6dp doubles, re-micronized,
    HUGEINT moment sums per arm in ONE pass, then the identical fixed
    double order for theta / adjusted means / variances / z."""
    return f"""
WITH m AS (
  SELECT user_id,
         round(sum(CASE WHEN ts < TIMESTAMP '{split_ts}'
                   THEN CAST(round(value * 1000000, 0) AS BIGINT)
                   ELSE 0 END) / 1000000.0, 6) AS pre,
         round(sum(CASE WHEN ts >= TIMESTAMP '{split_ts}'
                   THEN CAST(round(value * 1000000, 0) AS BIGINT)
                   ELSE 0 END) / 1000000.0, 6) AS post
  FROM {table}
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY user_id),
u AS (
  SELECT CAST(user_id % {arm_mod} AS VARCHAR) AS arm,
         CAST(round(post * 1000000, 0) AS BIGINT) AS y,
         CAST(round(pre * 1000000, 0) AS BIGINT) AS x
  FROM m WHERE CAST(user_id % {arm_mod} AS VARCHAR) IN ('0', '1')),
mo AS (
  SELECT
    count(CASE WHEN arm = '0' THEN 1 END) AS n_a,
    sum(CASE WHEN arm = '0' THEN CAST(y AS HUGEINT) END) AS sy_a,
    sum(CASE WHEN arm = '0' THEN CAST(x AS HUGEINT) END) AS sx_a,
    sum(CASE WHEN arm = '0' THEN CAST(x AS HUGEINT) * y END) AS sxy_a,
    sum(CASE WHEN arm = '0' THEN CAST(x AS HUGEINT) * x END) AS sxx_a,
    sum(CASE WHEN arm = '0' THEN CAST(y AS HUGEINT) * y END) AS syy_a,
    count(CASE WHEN arm = '1' THEN 1 END) AS n_b,
    sum(CASE WHEN arm = '1' THEN CAST(y AS HUGEINT) END) AS sy_b,
    sum(CASE WHEN arm = '1' THEN CAST(x AS HUGEINT) END) AS sx_b,
    sum(CASE WHEN arm = '1' THEN CAST(x AS HUGEINT) * y END) AS sxy_b,
    sum(CASE WHEN arm = '1' THEN CAST(x AS HUGEINT) * x END) AS sxx_b,
    sum(CASE WHEN arm = '1' THEN CAST(y AS HUGEINT) * y END) AS syy_b
  FROM u),
c AS (
  SELECT *,
    n_a + n_b AS n,
    sy_a + sy_b AS sy, sx_a + sx_b AS sx,
    sxy_a + sxy_b AS sxy, sxx_a + sxx_b AS sxx
  FROM mo),
th AS (
  SELECT *,
    CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
         THEN CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE) END AS theta,
    CAST(sx AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS mean_x
  FROM c),
st AS (
  SELECT *,
    CAST(sy_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 1000000.0) AS mya,
    CAST(sx_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 1000000.0) AS mxa,
    CAST(n_a * syy_a - sy_a * sy_a AS DOUBLE)
      / (CASE WHEN n_a > 1
              THEN CAST(n_a * (n_a - 1) AS DOUBLE) * 1e12 END) AS vya,
    CAST(n_a * sxx_a - sx_a * sx_a AS DOUBLE)
      / (CASE WHEN n_a > 1
              THEN CAST(n_a * (n_a - 1) AS DOUBLE) * 1e12 END) AS vxa,
    CAST(n_a * sxy_a - sx_a * sy_a AS DOUBLE)
      / (CASE WHEN n_a > 1
              THEN CAST(n_a * (n_a - 1) AS DOUBLE) * 1e12 END) AS cva,
    CAST(sy_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 1000000.0) AS myb,
    CAST(sx_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 1000000.0) AS mxb,
    CAST(n_b * syy_b - sy_b * sy_b AS DOUBLE)
      / (CASE WHEN n_b > 1
              THEN CAST(n_b * (n_b - 1) AS DOUBLE) * 1e12 END) AS vyb,
    CAST(n_b * sxx_b - sx_b * sx_b AS DOUBLE)
      / (CASE WHEN n_b > 1
              THEN CAST(n_b * (n_b - 1) AS DOUBLE) * 1e12 END) AS vxb,
    CAST(n_b * sxy_b - sx_b * sy_b AS DOUBLE)
      / (CASE WHEN n_b > 1
              THEN CAST(n_b * (n_b - 1) AS DOUBLE) * 1e12 END) AS cvb
  FROM th),
adj AS (
  SELECT *,
    CASE WHEN theta IS NOT NULL
         THEN mya - theta * (mxa - mean_x) ELSE mya END AS maa,
    CASE WHEN theta IS NOT NULL
         THEN myb - theta * (mxb - mean_x) ELSE myb END AS mab,
    CASE WHEN theta IS NOT NULL
         THEN vya - 2.0 * theta * cva + theta * theta * vxa
         ELSE vya END AS vaa,
    CASE WHEN theta IS NOT NULL
         THEN vyb - 2.0 * theta * cvb + theta * theta * vxb
         ELSE vyb END AS vab
  FROM st),
fin AS (
  SELECT *,
    sqrt(vya / n_a + vyb / n_b) AS se,
    sqrt(greatest(vaa, 0.0) / n_a + greatest(vab, 0.0) / n_b) AS se_adj
  FROM adj)
SELECT
  CAST(n_a AS BIGINT) AS users_a, CAST(n_b AS BIGINT) AS users_b,
  round(theta, 6) AS theta,
  round(mya, 6) AS mean_a, round(myb, 6) AS mean_b,
  round(maa, 6) AS mean_a_adj, round(mab, 6) AS mean_b_adj,
  round(mya - myb, 6) AS diff, round(maa - mab, 6) AS diff_adj,
  round(se, 6) AS se, round(se_adj, 6) AS se_adj,
  CASE WHEN se > 0 THEN round((mya - myb) / se, 6) END AS z,
  CASE WHEN se_adj > 0 THEN round((maa - mab) / se_adj, 6) END AS z_adj,
  CASE WHEN vya > 0 THEN round(1.0 - vaa / vya, 6) END
    AS var_reduction_a,
  CASE WHEN vyb > 0 THEN round(1.0 - vab / vyb, 6) END
    AS var_reduction_b,
  CASE WHEN se_adj > 0
       THEN abs(round((maa - mab) / se_adj, 6)) > 1.96 END AS significant
FROM fin
"""


def chi2_indep_sql(
    col_a: str = "o_orderstatus",
    col_b: str = "o_orderpriority",
    table: str = "orders",
) -> str:
    """Mirror of numeric.chi_square_independence: observed-cells-only
    closed form chi2 = n * sum(o^2/(ra*cb)) - n with the per-cell terms
    folded in (a, b) order (list_reduce — the same fixed IEEE order as
    Spark's sorted-array fold), HUGEINT products, Cramér's V off the
    unrounded statistic."""
    return f"""
WITH cells AS (
  SELECT coalesce(CAST({col_a} AS VARCHAR), '∅') AS a,
         coalesce(CAST({col_b} AS VARCHAR), '∅') AS b,
         count(*) AS o
  FROM {table} GROUP BY 1, 2),
ra AS (SELECT a, sum(o) AS ra FROM cells GROUP BY a),
cb AS (SELECT b, sum(o) AS cb FROM cells GROUP BY b),
tot AS (SELECT sum(o) AS n,
               count(DISTINCT a) AS la, count(DISTINCT b) AS lb
        FROM cells),
j AS (SELECT cells.a, cells.b,
             CAST(CAST(cells.o AS HUGEINT) * cells.o AS DOUBLE)
               / CAST(CAST(ra.ra AS HUGEINT) * cb.cb AS DOUBLE) AS t
      FROM cells JOIN ra USING (a) JOIN cb USING (b)),
s AS (SELECT list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(t ORDER BY a, b)),
               (x, y) -> x + y) AS s
      FROM j)
SELECT CAST(tot.n AS BIGINT) AS n,
       CAST(tot.la AS INT) AS levels_a, CAST(tot.lb AS INT) AS levels_b,
       CAST((tot.la - 1) * (tot.lb - 1) AS INT) AS dof,
       round(tot.n * s.s - tot.n, 6) AS chi2,
       CASE WHEN least(tot.la - 1, tot.lb - 1) > 0 THEN
         round(sqrt(greatest(
           (tot.n * s.s - tot.n)
             / (tot.n * least(tot.la - 1, tot.lb - 1)), 0.0)), 6)
       END AS cramers_v
FROM tot CROSS JOIN s
"""


def kappa_langid_sql(table: str = "documents") -> str:
    """Mirror of text.langid -> numeric.cohens_kappa(lang, lang_pred):
    the labeling-QA readout 'does the heuristic language classifier
    agree with gold beyond chance'. Integer diagonal + HUGEINT marginal
    products; Landis-Koch band off the rounded kappa."""
    return f"""
WITH base AS (
  SELECT lang AS la,
         CASE WHEN {_SW_RATIO} >= 0.05 THEN 'en' ELSE 'unknown' END AS lb
  FROM {table}),
cells AS (
  SELECT coalesce(CAST(la AS VARCHAR), '∅') AS a,
         coalesce(CAST(lb AS VARCHAR), '∅') AS b, count(*) AS o
  FROM base GROUP BY 1, 2),
diag AS (SELECT sum(CASE WHEN a = b THEN o ELSE 0 END) AS d,
                sum(o) AS n
         FROM cells),
ra AS (SELECT a AS c, sum(o) AS ra FROM cells GROUP BY 1),
cb AS (SELECT b AS c, sum(o) AS cb FROM cells GROUP BY 1),
marg AS (SELECT sum(CAST(coalesce(ra, 0) AS HUGEINT)
                    * coalesce(cb, 0)) AS pp
         FROM ra FULL OUTER JOIN cb USING (c)),
k AS (SELECT CAST(diag.n AS BIGINT) AS n,
             CAST(diag.d AS DOUBLE) / diag.n AS po_raw,
             CAST(marg.pp AS DOUBLE)
               / (CAST(diag.n AS DOUBLE) * CAST(diag.n AS DOUBLE))
               AS pe_raw
      FROM diag CROSS JOIN marg),
kk AS (SELECT n, po_raw, pe_raw,
              CASE WHEN pe_raw < 1.0
                   THEN round((po_raw - pe_raw) / (1.0 - pe_raw), 6)
              END AS kappa
       FROM k)
SELECT n, round(po_raw, 6) AS po, round(pe_raw, 6) AS pe, kappa,
       CASE WHEN kappa IS NULL THEN NULL
            WHEN kappa < 0 THEN 'poor'
            WHEN kappa >= 0.8 THEN 'almost_perfect'
            WHEN kappa >= 0.6 THEN 'substantial'
            WHEN kappa >= 0.4 THEN 'moderate'
            WHEN kappa >= 0.2 THEN 'fair'
            ELSE 'slight' END AS agreement
FROM kk
"""


def acf_sql(
    max_lag: int = 24, every_minutes: int = 60, table: str = "events",
) -> str:
    """Mirror of events.acf over the hourly count grid (resample
    agg='count', fill='zero'): every per-lag sum is an exact integer
    (HUGEINT cross-products), so a plain lagged self-join reproduces
    Spark's fold regardless of accumulation order; the double
    arithmetic after is the identical fixed order."""
    step = int(every_minutes) * 60
    return f"""
WITH e AS (SELECT event_type AS gk,
                  CAST(floor(epoch(ts) / {step}) AS BIGINT) AS b
           FROM {table}
           WHERE event_type IS NOT NULL AND ts IS NOT NULL),
a AS (SELECT gk, b, CAST(count(*) AS DOUBLE) AS v FROM e GROUP BY 1, 2),
r0 AS (SELECT gk, min(b) AS b0, max(b) AS b1 FROM a GROUP BY gk),
g AS (SELECT gk, unnest(range(b0, b1 + 1)) AS b FROM r0),
grid AS MATERIALIZED (
  SELECT g.gk, g.b,
         CAST(round(coalesce(a.v, 0.0) * 1000000, 0) AS BIGINT) AS m
  FROM g LEFT JOIN a ON g.gk = a.gk AND g.b = a.b),
lags AS (SELECT CAST(unnest(range(1, {int(max_lag)} + 1)) AS BIGINT)
           AS lag),
p AS (SELECT g1.gk, lags.lag,
             sum(CAST(g1.m AS HUGEINT) * g2.m) AS s2,
             sum(g1.m) AS aa, sum(g2.m) AS bb, count(*) AS np
      FROM grid g1 CROSS JOIN lags
      JOIN grid g2 ON g2.gk = g1.gk AND g2.b = g1.b + lags.lag
      GROUP BY 1, 2),
st AS (SELECT gk, count(*) AS n, sum(m) AS s,
              sum(CAST(m AS HUGEINT) * m) AS ss
       FROM grid GROUP BY gk),
f AS (SELECT p.gk, p.lag, p.np,
             CAST(st.s AS DOUBLE) / (CAST(st.n AS DOUBLE) * 1000000.0)
               AS mu,
             CAST(st.ss AS DOUBLE) / 1000000000000.0 AS ssd,
             CAST(st.n AS DOUBLE) AS nd,
             CAST(p.s2 AS DOUBLE) / 1000000000000.0 AS s2d,
             CAST(p.aa + p.bb AS DOUBLE) / 1000000.0 AS abd,
             CAST(p.np AS DOUBLE) AS npd
      FROM p JOIN st ON p.gk = st.gk)
SELECT gk AS event_type, CAST(lag AS INT) AS lag,
       CAST(np AS BIGINT) AS n_pairs,
       CASE WHEN ssd - nd * mu * mu > 0 THEN
         round((s2d - mu * abd + npd * mu * mu)
               / (ssd - nd * mu * mu), 6)
       END + 0.0 AS acf
FROM f
"""


def holt_sql(
    alpha: float = 0.3, beta: float = 0.1, horizon: int = 6,
    every_minutes: int = 60, table: str = "events",
) -> str:
    """Mirror of events.holt_forecast over the hourly count grid:
    Holt's level/trend recursion via a recursive CTE in the IDENTICAL
    double operation order (l' = a*v + (1-a)*(l + tr); tr' =
    b*(l' - l) + (1-b)*tr), plus the h-step future rows off the final
    state."""
    step = int(every_minutes) * 60
    aa, fa = float(alpha), 1.0 - float(alpha)
    bb, fb = float(beta), 1.0 - float(beta)
    return f"""
WITH RECURSIVE
e AS (SELECT event_type AS gk,
             CAST(floor(epoch(ts) / {step}) AS BIGINT) AS b
      FROM {table} WHERE event_type IS NOT NULL AND ts IS NOT NULL),
a AS (SELECT gk, b, CAST(count(*) AS DOUBLE) AS v FROM e GROUP BY 1, 2),
r0 AS (SELECT gk, min(b) AS b0, max(b) AS b1 FROM a GROUP BY gk),
g AS (SELECT gk, unnest(range(b0, b1 + 1)) AS b FROM r0),
m AS (SELECT g.gk, g.b, coalesce(a.v, 0.0) AS v
      FROM g LEFT JOIN a ON g.gk = a.gk AND g.b = a.b),
idx AS MATERIALIZED (
  SELECT gk, b, v, row_number() OVER (PARTITION BY gk ORDER BY b) AS i
  FROM m),
nn AS MATERIALIZED (SELECT gk, count(*) AS n FROM idx GROUP BY gk),
b1 AS MATERIALIZED (
  SELECT i1.gk,
         CASE WHEN i2.v IS NULL THEN 0.0 ELSE i2.v - i1.v END AS b1
  FROM idx i1 LEFT JOIN idx i2 ON i1.gk = i2.gk AND i2.i = 2
  WHERE i1.i = 1),
rec AS (
  SELECT idx.gk, idx.i, idx.b, idx.v,
         idx.v AS l, b1.b1 AS tr, CAST(NULL AS DOUBLE) AS fc
  FROM idx JOIN b1 ON idx.gk = b1.gk WHERE idx.i = 1
  UNION ALL
  SELECT c.gk, c.i, c.b, c.v,
         {aa!r} * c.v + {fa!r} * (rec.l + rec.tr) AS l,
         {bb!r} * (({aa!r} * c.v + {fa!r} * (rec.l + rec.tr)) - rec.l)
           + {fb!r} * rec.tr AS tr,
         rec.l + rec.tr AS fc
  FROM idx c JOIN rec ON c.gk = rec.gk AND c.i = rec.i + 1),
fin AS (SELECT rec.* FROM rec JOIN nn ON rec.gk = nn.gk
        WHERE rec.i = nn.n),
fut AS (SELECT fin.gk, fin.b + h.h AS b, CAST(NULL AS DOUBLE) AS v,
               CAST(NULL AS DOUBLE) AS l, CAST(NULL AS DOUBLE) AS tr,
               fin.l + CAST(h.h AS DOUBLE) * fin.tr AS fc
        FROM fin CROSS JOIN
          (SELECT CAST(unnest(range(1, {int(horizon)} + 1)) AS BIGINT)
             AS h) h)
SELECT gk AS event_type, CAST(b AS BIGINT) AS bucket, v AS value,
       round(l, 6) + 0.0 AS level, round(tr, 6) + 0.0 AS trend,
       round(fc, 6) + 0.0 AS forecast
FROM (SELECT gk, b, v, l, tr, fc FROM rec
      UNION ALL
      SELECT gk, b, v, l, tr, fc FROM fut) u
"""


def mann_whitney_sql(
    value_col: str = "l_quantity",
    group_col: str = "l_returnflag",
    a: str = "A",
    b: str = "N",
    table: str = "lineitem",
) -> str:
    """Mirror of numeric.mann_whitney_u: micro-integer value histogram,
    window cumsums reproduce the ascending fold (every accumulator is
    an exact integer, so order is irrelevant), HUGEINT tie sums, then
    the identical fixed double order for mu/sigma/z/rank-biserial."""
    return f"""
WITH hist AS (
  SELECT CAST(round({value_col} * 1000000, 0) AS BIGINT) AS v,
         sum(CASE WHEN {group_col} = '{a}' THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN {group_col} = '{b}' THEN 1 ELSE 0 END) AS nb
  FROM {table}
  WHERE {group_col} IN ('{a}', '{b}') AND {value_col} IS NOT NULL
  GROUP BY 1),
cum AS (
  SELECT v, na, nb,
         coalesce(sum(nb) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM hist),
agg AS (
  SELECT sum(na) AS n_a, sum(nb) AS n_b,
         sum(CAST(2 AS HUGEINT) * na * cb + CAST(na AS HUGEINT) * nb)
           AS u2,
         sum(CAST(na + nb AS HUGEINT) * (na + nb) * (na + nb)
             - (na + nb)) AS t
  FROM cum),
d AS (
  SELECT n_a, n_b, u2,
         CAST(u2 AS DOUBLE) / 2.0 AS u,
         CAST(CAST(n_a AS HUGEINT) * n_b AS DOUBLE) AS nanb,
         CAST(CAST(n_a AS HUGEINT) * n_b AS DOUBLE) / 2.0 AS mu,
         CAST(t AS DOUBLE)
           / CAST(CAST(n_a + n_b AS HUGEINT) * (n_a + n_b - 1) AS DOUBLE)
           AS tieterm,
         CAST(n_a + n_b + 1 AS DOUBLE) AS np1
  FROM agg),
f AS (
  SELECT *, sqrt(greatest(nanb / 12.0 * (np1 - tieterm), 0.0)) AS sigma
  FROM d)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(u, 6) AS u, round(mu, 6) AS mu_u,
       round(sigma, 6) AS sigma_u,
       CASE WHEN sigma > 0 THEN round((u - mu) / sigma, 6) END AS z,
       round(1.0 - CAST(u2 AS DOUBLE) / nanb, 6) + 0.0
         AS rank_biserial,
       CASE WHEN sigma > 0
            THEN abs(round((u - mu) / sigma, 6)) > 1.96 END
         AS significant
FROM f
"""


def benford_sql(
    col: str = "l_extendedprice", table: str = "lineitem",
) -> str:
    """Mirror of numeric.benford_deviation: leading digit off the
    micro-integer's string form (integer rendering is engine-stable,
    double formatting is not), log10 expectations embedded as the
    same Python floats, chi2/MAD folded in digit order via
    list_reduce, Nigrini bands off the unrounded MAD."""
    import math

    exp_rows = " UNION ALL ".join(
        f"SELECT {d} AS digit, CAST({math.log10(1.0 + 1.0 / d)!r} "
        "AS DOUBLE) AS p"
        for d in range(1, 10))
    return f"""
WITH m AS (
  SELECT abs(CAST(round({col} * 1000000, 0) AS BIGINT)) AS mv
  FROM {table} WHERE {col} IS NOT NULL),
obs AS (
  SELECT CAST(substring(CAST(mv AS VARCHAR), 1, 1) AS INT) AS digit,
         count(*) AS observed
  FROM m WHERE mv > 0 GROUP BY 1),
exp AS ({exp_rows}),
full_g AS (
  SELECT exp.digit, exp.p, coalesce(obs.observed, 0) AS observed
  FROM exp LEFT JOIN obs ON exp.digit = obs.digit),
tot AS (SELECT sum(observed) AS n FROM full_g),
staged AS (
  SELECT g.digit, g.observed, tot.n, g.p,
         CAST(g.observed AS DOUBLE) / tot.n AS op,
         (g.observed - tot.n * g.p) * (g.observed - tot.n * g.p)
           / (tot.n * g.p) AS chi
  FROM full_g g CROSS JOIN tot),
folds AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(chi ORDER BY digit)),
                     (x, y) -> x + y) AS chi2_raw,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(abs(op - p) ORDER BY digit)),
                     (x, y) -> x + y) AS mad_raw
  FROM staged)
SELECT staged.digit, CAST(staged.observed AS BIGINT) AS observed,
       CAST(staged.n AS BIGINT) AS n,
       round(staged.op, 6) AS observed_p, round(staged.p, 6)
         AS expected_p,
       round(folds.chi2_raw, 6) AS chi2,
       round(folds.mad_raw / 9.0, 6) AS mad,
       CASE WHEN folds.mad_raw / 9.0 <= 0.006 THEN 'close'
            WHEN folds.mad_raw / 9.0 <= 0.012 THEN 'acceptable'
            WHEN folds.mad_raw / 9.0 <= 0.015 THEN 'marginal'
            ELSE 'nonconforming' END AS conformity
FROM staged CROSS JOIN folds
"""


def sssp_over_sql(
    edges_cte: str, seeds: list, rounds: int, directed: bool = True,
) -> str:
    """graph.graph_sssp unrolled to ``rounds`` min-relaxation CTEs over
    ANY edge source (``edges_cte`` ends in a ``c`` relation of
    (s, d, wm) micro-integer weights): distances are exact BIGINT
    micro sums, so every round's min is unambiguous; seeds start at 0.
    Every round is MATERIALIZED (the hits_over_sql lesson — each round
    is referenced twice downstream)."""
    lits = ", ".join(
        "('" + str(s).replace("'", "''") + "')"
        for s in sorted({str(s) for s in seeds})
    )
    sym = "" if directed else (
        " UNION ALL SELECT CAST(d AS VARCHAR), CAST(s AS VARCHAR), wm"
        " FROM c"
    )
    head = f"""
WITH {edges_cte},
e AS MATERIALIZED (
  SELECT s, d, min(wm) AS wm FROM
    (SELECT CAST(s AS VARCHAR) AS s, CAST(d AS VARCHAR) AS d, wm
     FROM c{sym})
  WHERE s IS NOT NULL AND d IS NOT NULL AND wm IS NOT NULL
  GROUP BY s, d),
d0 AS (SELECT n, CAST(0 AS BIGINT) AS dm FROM (VALUES {lits}) AS t(n))"""
    parts = []
    for i in range(1, rounds + 1):
        prev = f"d{i - 1}"
        parts.append(f""",
d{i} AS MATERIALIZED (
  SELECT n, min(dm) AS dm FROM
    (SELECT n, dm FROM {prev}
     UNION ALL
     SELECT e.d AS n, {prev}.dm + e.wm AS dm
     FROM {prev} JOIN e ON {prev}.n = e.s)
  GROUP BY n)""")
    return head + "".join(parts) + f"""
SELECT n AS node, round(dm / 1000000.0, 6) AS dist FROM d{rounds}
"""


def events_sssp_sql(
    seeds: list, rounds: int = 6, tie: str | None = "event_id",
    table: str = "events",
) -> str:
    """Mirror of graph.graph_sssp over the event-transition graph with
    cost = 1/n per edge (frequent transitions are cheap): the cheapest
    observed route from the seed event types to every other type."""
    order = "ts" + (f", {tie}" if tie else "")
    edges = f"""p AS (SELECT event_type AS f,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY {order})
             AS t
      FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL),
g AS (SELECT f, t, count(*) AS n FROM p WHERE t IS NOT NULL
      GROUP BY f, t),
c AS (SELECT f AS s, t AS d,
             CAST(round((1.0 / n) * 1000000.0, 0) AS BIGINT) AS wm
      FROM g)"""
    return sssp_over_sql(edges, seeds, rounds, directed=True)


def welch_sql(
    value_col: str = "l_extendedprice",
    group_col: str = "l_returnflag",
    a: str = "A",
    b: str = "N",
    table: str = "lineitem",
) -> str:
    """Mirror of numeric.welch_t_test: one conditional-aggregation pass
    of HUGEINT micro moments, then the identical fixed double order for
    means/variances/se/t/Welch-Satterthwaite df/Cohen's d."""
    return f"""
WITH m AS (
  SELECT
    count(CASE WHEN {group_col} = '{a}' THEN 1 END) AS n_a,
    sum(CASE WHEN {group_col} = '{a}' THEN
        CAST(round({value_col} * 1000000, 0) AS BIGINT) END)::HUGEINT
      AS s_a,
    sum(CASE WHEN {group_col} = '{a}' THEN
        CAST(CAST(round({value_col} * 1000000, 0) AS BIGINT) AS HUGEINT)
        * CAST(round({value_col} * 1000000, 0) AS BIGINT) END) AS ss_a,
    count(CASE WHEN {group_col} = '{b}' THEN 1 END) AS n_b,
    sum(CASE WHEN {group_col} = '{b}' THEN
        CAST(round({value_col} * 1000000, 0) AS BIGINT) END)::HUGEINT
      AS s_b,
    sum(CASE WHEN {group_col} = '{b}' THEN
        CAST(CAST(round({value_col} * 1000000, 0) AS BIGINT) AS HUGEINT)
        * CAST(round({value_col} * 1000000, 0) AS BIGINT) END) AS ss_b
  FROM {table}
  WHERE {group_col} IN ('{a}', '{b}') AND {value_col} IS NOT NULL),
st AS (
  SELECT n_a, n_b,
    CAST(s_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 1000000.0) AS ma,
    CAST(n_a * ss_a - s_a * s_a AS DOUBLE)
      / (CASE WHEN n_a > 1
              THEN CAST(n_a * (n_a - 1) AS DOUBLE) * 1e12 END) AS va,
    CAST(s_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 1000000.0) AS mb,
    CAST(n_b * ss_b - s_b * s_b AS DOUBLE)
      / (CASE WHEN n_b > 1
              THEN CAST(n_b * (n_b - 1) AS DOUBLE) * 1e12 END) AS vb
  FROM m),
q AS (
  SELECT *, va / CAST(n_a AS DOUBLE) AS qa, vb / CAST(n_b AS DOUBLE)
    AS qb,
    ((n_a - 1) * va + (n_b - 1) * vb) / CAST(n_a + n_b - 2 AS DOUBLE)
      AS pooled
  FROM st),
f AS (SELECT *, sqrt(qa + qb) AS se FROM q)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
  round(va, 6) AS var_a, round(vb, 6) AS var_b,
  round(ma - mb, 6) AS diff, round(se, 6) AS se,
  CASE WHEN se > 0 THEN round((ma - mb) / se, 6) END AS t,
  CASE WHEN se > 0 THEN
    round((qa + qb) * (qa + qb)
          / (qa * qa / CAST(n_a - 1 AS DOUBLE)
             + qb * qb / CAST(n_b - 1 AS DOUBLE)), 6) END AS df,
  CASE WHEN pooled > 0
       THEN round((ma - mb) / sqrt(pooled), 6) END + 0.0 AS cohens_d,
  CASE WHEN se > 0 THEN abs(round((ma - mb) / se, 6)) > 1.96 END
    AS significant
FROM f
"""


def embedding_drift_sql(
    dim: int = 64, table: str = "embeddings",
) -> str:
    """Mirror of similarity.embedding_drift between the vec_id-parity
    halves of the embedding table: per-dimension micro-integer HUGEINT
    sums (cosine of centroids == cosine of sum vectors), left-to-right
    per-vector norm folds, one fixed double order at the end."""
    def side(tag: str, parity: int) -> str:
        sums = ",\n    ".join(
            f"sum(CAST(round(CAST(embedding[{i + 1}] AS DOUBLE)"
            f" * 1000000, 0) AS BIGINT))::HUGEINT AS s{tag}{i}"
            for i in range(dim))
        return f"""{tag} AS (
  SELECT count(*) AS n_{tag},
    sum(CAST(round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(embedding, x -> CAST(x AS DOUBLE))),
          (acc, x) -> acc + x * x)) * 1000000, 0) AS BIGINT))::HUGEINT
      AS nm_{tag},
    {sums}
  FROM {table}
  WHERE vec_id % 2 = {parity} AND embedding IS NOT NULL
    AND len(embedding) = {dim})"""

    dot = " + ".join(f"sa{i} * sb{i}" for i in range(dim))
    na2 = " + ".join(f"sa{i} * sa{i}" for i in range(dim))
    nb2 = " + ".join(f"sb{i} * sb{i}" for i in range(dim))
    return f"""
WITH {side('a', 0)},
{side('b', 1)},
j AS (SELECT * FROM a CROSS JOIN b),
c AS (SELECT n_a, n_b, nm_a, nm_b,
             CAST({dot} AS HUGEINT) AS dot,
             CAST({na2} AS HUGEINT) AS na2,
             CAST({nb2} AS HUGEINT) AS nb2
      FROM j),
f AS (SELECT *, sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))
        AS denom FROM c)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  CAST({dim} AS INT) AS dim,
  CASE WHEN denom > 0 THEN round(CAST(dot AS DOUBLE) / denom, 6) END
    AS centroid_cosine,
  CASE WHEN denom > 0 THEN
    round(1.0 - round(CAST(dot AS DOUBLE) / denom, 6), 6) END
    AS centroid_shift,
  round(CAST(nm_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 1000000.0), 6)
    AS mean_norm_a,
  round(CAST(nm_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 1000000.0), 6)
    AS mean_norm_b
FROM f
"""


def kruskal_sql(
    groups: list,
    crit: float,
    value_col: str = "l_quantity",
    group_col: str = "l_returnflag",
    table: str = "lineitem",
) -> str:
    """Mirror of numeric.kruskal_wallis: midrank-exact doubled rank
    sums via window cumsums over the micro-integer value histogram
    (every accumulator an exact integer), HUGEINT tie sums, then the
    identical generated double order (groups in list order) and the
    SAME embedded chi-square critical value."""
    k = len(groups)
    conds = "\n         ".join(
        f"sum(CASE WHEN {group_col} = '{g}' THEN 1 ELSE 0 END)"
        f" AS n{i}," for i, g in enumerate(groups))
    tsum = " + ".join(f"n{i}" for i in range(k))
    rsums = "\n         ".join(
        f"sum(CAST(n{i} AS HUGEINT) * (2 * cb + t + 1)) AS r{i},"
        for i in range(k))
    nsums = "\n         ".join(
        f"sum(n{i}) AS nn{i}," for i in range(k))
    s_expr = " + ".join(
        f"(CASE WHEN nn{i} > 0 THEN"
        f" CAST(r{i} AS DOUBLE) * CAST(r{i} AS DOUBLE)"
        f" / (4.0 * CAST(nn{i} AS DOUBLE)) END)"
        for i in range(k))
    ntot = " + ".join(f"nn{i}" for i in range(k))
    return f"""
WITH hist AS (
  SELECT CAST(round({value_col} * 1000000, 0) AS BIGINT) AS v,
         {conds}
         count(*) AS cnt
  FROM {table}
  WHERE {group_col} IN ({", ".join(f"'{g}'" for g in groups)})
    AND {value_col} IS NOT NULL
  GROUP BY 1),
cum AS (
  SELECT *, {tsum} AS t,
         coalesce(sum({tsum}) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM hist),
r AS (
  SELECT {nsums}
         {rsums}
         sum(CAST(t AS HUGEINT) * t * t - t) AS tie_sum
  FROM cum),
d AS (
  SELECT *, CAST({ntot} AS BIGINT) AS n,
         CAST({ntot} AS DOUBLE) AS nd,
         {s_expr} AS s
  FROM r),
hh AS (
  SELECT *,
         12.0 / (nd * (nd + 1.0)) * s - 3.0 * (nd + 1.0) AS h,
         1.0 - CAST(tie_sum AS DOUBLE)
           / CAST(CAST(n AS HUGEINT) * n * n - n AS DOUBLE) AS tie
  FROM d),
f AS (SELECT *, CASE WHEN tie > 0 THEN h / tie END AS hc FROM hh)
SELECT n, CAST({k} AS INT) AS k, CAST({k - 1} AS INT) AS df,
  round(h, 6) AS h, round(hc, 6) AS h_corrected,
  CASE WHEN n > {k} AND hc IS NOT NULL THEN
    round((hc - CAST({k} AS DOUBLE) + 1.0)
          / (nd - CAST({k} AS DOUBLE)), 6) END + 0.0 AS epsilon_sq,
  CASE WHEN hc IS NOT NULL THEN round(hc, 6) > {crit!r} END
    AS significant
FROM f
"""


def profile_diff_sql(
    where_a: str = "o_orderkey % 2 = 0",
    where_b: str = "o_orderkey % 2 = 1",
    table: str = "orders",
) -> str:
    """Mirror of curation.profile_diff(exact=True) between two filters
    of the same table: two profile_sql passes tagged by side, union +
    re-aggregate (max-when picks), the same delta/changed expressions."""
    pa = profile_sql(f"(SELECT * FROM {table} WHERE {where_a}) ta")
    pb = profile_sql(f"(SELECT * FROM {table} WHERE {where_b}) tb")
    picks = ",\n    ".join(
        f"max(CASE WHEN side = '{s}' THEN {c} END) AS {c}_{s}"
        for c in ("dtype", "n_rows", "n_null", "null_frac",
                  "n_distinct", "min", "max")
        for s in ("a", "b"))
    return f"""
WITH pa AS ({pa}),
pb AS ({pb}),
u AS (SELECT *, 'a' AS side FROM pa
      UNION ALL SELECT *, 'b' AS side FROM pb),
g AS (
  SELECT "column",
    {picks}
  FROM u GROUP BY "column")
SELECT "column",
  CASE WHEN dtype_a IS NOT NULL AND dtype_b IS NOT NULL THEN 'common'
       WHEN dtype_a IS NOT NULL THEN 'dropped' ELSE 'added' END
    AS status,
  dtype_a, dtype_b,
  CASE WHEN dtype_a IS NOT NULL AND dtype_b IS NOT NULL
       THEN dtype_a <> dtype_b END AS dtype_changed,
  n_rows_a, n_rows_b, null_frac_a, null_frac_b,
  CASE WHEN dtype_a IS NOT NULL AND dtype_b IS NOT NULL
       THEN round(null_frac_b - null_frac_a, 6) + 0.0 END
    AS null_frac_delta,
  n_distinct_a, n_distinct_b,
  CASE WHEN dtype_a IS NOT NULL AND dtype_b IS NOT NULL
       THEN CAST(n_distinct_b - n_distinct_a AS BIGINT) END
    AS n_distinct_delta,
  CASE WHEN dtype_a IS NOT NULL AND dtype_b IS NOT NULL
       THEN (min_a IS DISTINCT FROM min_b)
            OR (max_a IS DISTINCT FROM max_b) END AS range_changed
FROM g
"""


def ratio_ab_sql(arm_mod: int = 2, table: str = "events") -> str:
    """Mirror of the per-user (value-sum / event-count) frame ->
    events.ratio_ab_test with arm = user_id % arm_mod: HUGEINT micro
    moments of (x, y) per arm in one pass, then the delta-method
    variance (vx + R^2 vy - 2 R cov)/(n my^2) in the identical double
    order."""
    return f"""
WITH u AS (
  SELECT user_id,
         CAST(user_id % {arm_mod} AS VARCHAR) AS arm,
         round(sum(CAST(round(value * 1000000, 0) AS BIGINT))
               / 1000000.0, 6) AS xr,
         CAST(count(*) AS DOUBLE) AS yr
  FROM {table}
  WHERE user_id IS NOT NULL AND value IS NOT NULL
  GROUP BY user_id),
mi AS (
  SELECT arm,
         CAST(round(xr * 1000000, 0) AS BIGINT) AS x,
         CAST(round(yr * 1000000, 0) AS BIGINT) AS y
  FROM u WHERE arm IN ('0', '1')),
m AS (
  SELECT
    count(CASE WHEN arm = '0' THEN 1 END) AS n_a,
    sum(CASE WHEN arm = '0' THEN CAST(x AS HUGEINT) END) AS sx_a,
    sum(CASE WHEN arm = '0' THEN CAST(y AS HUGEINT) END) AS sy_a,
    sum(CASE WHEN arm = '0' THEN CAST(x AS HUGEINT) * x END) AS sxx_a,
    sum(CASE WHEN arm = '0' THEN CAST(y AS HUGEINT) * y END) AS syy_a,
    sum(CASE WHEN arm = '0' THEN CAST(x AS HUGEINT) * y END) AS sxy_a,
    count(CASE WHEN arm = '1' THEN 1 END) AS n_b,
    sum(CASE WHEN arm = '1' THEN CAST(x AS HUGEINT) END) AS sx_b,
    sum(CASE WHEN arm = '1' THEN CAST(y AS HUGEINT) END) AS sy_b,
    sum(CASE WHEN arm = '1' THEN CAST(x AS HUGEINT) * x END) AS sxx_b,
    sum(CASE WHEN arm = '1' THEN CAST(y AS HUGEINT) * y END) AS syy_b,
    sum(CASE WHEN arm = '1' THEN CAST(x AS HUGEINT) * y END) AS sxy_b
  FROM mi),
st AS (
  SELECT n_a, n_b,
    CASE WHEN CAST(sy_a AS DOUBLE) <> 0
         THEN CAST(sx_a AS DOUBLE) / CAST(sy_a AS DOUBLE) END AS ra,
    CAST(sy_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 1000000.0) AS mya,
    CAST(n_a * sxx_a - sx_a * sx_a AS DOUBLE)
      / (CASE WHEN n_a > 1
              THEN CAST(n_a * (n_a - 1) AS DOUBLE) * 1e12 END) AS vxa,
    CAST(n_a * syy_a - sy_a * sy_a AS DOUBLE)
      / (CASE WHEN n_a > 1
              THEN CAST(n_a * (n_a - 1) AS DOUBLE) * 1e12 END) AS vya,
    CAST(n_a * sxy_a - sx_a * sy_a AS DOUBLE)
      / (CASE WHEN n_a > 1
              THEN CAST(n_a * (n_a - 1) AS DOUBLE) * 1e12 END) AS cva,
    CASE WHEN CAST(sy_b AS DOUBLE) <> 0
         THEN CAST(sx_b AS DOUBLE) / CAST(sy_b AS DOUBLE) END AS rb,
    CAST(sy_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 1000000.0) AS myb,
    CAST(n_b * sxx_b - sx_b * sx_b AS DOUBLE)
      / (CASE WHEN n_b > 1
              THEN CAST(n_b * (n_b - 1) AS DOUBLE) * 1e12 END) AS vxb,
    CAST(n_b * syy_b - sy_b * sy_b AS DOUBLE)
      / (CASE WHEN n_b > 1
              THEN CAST(n_b * (n_b - 1) AS DOUBLE) * 1e12 END) AS vyb,
    CAST(n_b * sxy_b - sx_b * sy_b AS DOUBLE)
      / (CASE WHEN n_b > 1
              THEN CAST(n_b * (n_b - 1) AS DOUBLE) * 1e12 END) AS cvb
  FROM m),
vr AS (
  SELECT *,
    CASE WHEN ra IS NOT NULL AND mya <> 0 THEN
      (vxa + ra * ra * vya - 2.0 * ra * cva)
        / (CAST(n_a AS DOUBLE) * mya * mya) END AS va,
    CASE WHEN rb IS NOT NULL AND myb <> 0 THEN
      (vxb + rb * rb * vyb - 2.0 * rb * cvb)
        / (CAST(n_b AS DOUBLE) * myb * myb) END AS vb
  FROM st),
f AS (
  SELECT *,
    CASE WHEN va IS NOT NULL AND vb IS NOT NULL
         THEN sqrt(greatest(va + vb, 0.0)) END AS se
  FROM vr)
SELECT CAST(n_a AS BIGINT) AS users_a, CAST(n_b AS BIGINT) AS users_b,
  round(ra, 6) AS ratio_a, round(rb, 6) AS ratio_b,
  round(ra - rb, 6) AS diff, round(se, 6) AS se,
  CASE WHEN se > 0 THEN round((ra - rb) / se, 6) END AS z,
  CASE WHEN se > 0 THEN abs(round((ra - rb) / se, 6)) > 1.96 END
    AS significant
FROM f
"""


def msprt_sql(
    tau: float = 1000.0,
    alpha: float = 0.05,
    value_col: str = "l_extendedprice",
    group_col: str = "l_returnflag",
    a: str = "A",
    b: str = "N",
    table: str = "lineitem",
) -> str:
    """Mirror of events.msprt_ab_test: the welch_sql moments, then the
    normal-mixture log likelihood ratio and always-valid p in the
    identical double order."""
    t2 = float(tau) * float(tau)
    return f"""
WITH m AS (
  SELECT
    count(CASE WHEN {group_col} = '{a}' THEN 1 END) AS n_a,
    sum(CASE WHEN {group_col} = '{a}' THEN
        CAST(round({value_col} * 1000000, 0) AS BIGINT) END)::HUGEINT
      AS s_a,
    sum(CASE WHEN {group_col} = '{a}' THEN
        CAST(CAST(round({value_col} * 1000000, 0) AS BIGINT) AS HUGEINT)
        * CAST(round({value_col} * 1000000, 0) AS BIGINT) END) AS ss_a,
    count(CASE WHEN {group_col} = '{b}' THEN 1 END) AS n_b,
    sum(CASE WHEN {group_col} = '{b}' THEN
        CAST(round({value_col} * 1000000, 0) AS BIGINT) END)::HUGEINT
      AS s_b,
    sum(CASE WHEN {group_col} = '{b}' THEN
        CAST(CAST(round({value_col} * 1000000, 0) AS BIGINT) AS HUGEINT)
        * CAST(round({value_col} * 1000000, 0) AS BIGINT) END) AS ss_b
  FROM {table}
  WHERE {group_col} IN ('{a}', '{b}') AND {value_col} IS NOT NULL),
st AS (
  SELECT n_a, n_b,
    CAST(s_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 1000000.0) AS ma,
    CAST(n_a * ss_a - s_a * s_a AS DOUBLE)
      / (CASE WHEN n_a > 1
              THEN CAST(n_a * (n_a - 1) AS DOUBLE) * 1e12 END) AS va,
    CAST(s_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 1000000.0) AS mb,
    CAST(n_b * ss_b - s_b * s_b AS DOUBLE)
      / (CASE WHEN n_b > 1
              THEN CAST(n_b * (n_b - 1) AS DOUBLE) * 1e12 END) AS vb
  FROM m),
vv AS (
  SELECT *, va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) AS v,
         ma - mb AS d
  FROM st),
ll AS (
  SELECT *,
    CASE WHEN v > 0 THEN
      0.5 * ln(v / (v + {t2!r}))
      + d * d * {t2!r} / (2.0 * v * (v + {t2!r})) END AS log_lam
  FROM vv),
pp AS (
  SELECT *, CASE WHEN log_lam IS NOT NULL
                 THEN least(1.0, exp(-log_lam)) END AS p
  FROM ll)
SELECT CAST(n_a AS BIGINT) AS users_a, CAST(n_b AS BIGINT) AS users_b,
  round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
  round(d, 6) AS diff, round(v, 6) AS v,
  round(log_lam, 6) AS log_lambda, round(p, 6) AS p_always_valid,
  CASE WHEN p IS NOT NULL THEN p < {float(alpha)!r} END AS significant
FROM pp
"""


def textrank_sql(
    k: int = 20, min_count: int = 5, min_word_len: int = 2,
    damping: float = 0.85, iters: int = 5, table: str = "documents",
) -> str:
    """Mirror of text.textrank_keywords: the SAME filtered-adjacency
    pair stream (stopwords/empties/short words removed FIRST),
    UNDIRECTED canonicalization (least/greatest, self-pairs dropped)
    BEFORE the min_count floor, then symmetrization, composed with
    the pagerank_over_sql mirror, top-k on (pagerank DESC, word
    ASC)."""
    edges = f"""tok AS (
  SELECT list_filter({_WORDS},
           w -> w <> '' AND NOT list_contains({_SW_LIST}, w)
                AND length(w) >= {int(min_word_len)}) AS wl
  FROM {table}),
base AS (SELECT wl FROM tok WHERE len(wl) >= 2),
pr AS (SELECT least(wl[i], wl[i + 1]) AS w1,
              greatest(wl[i], wl[i + 1]) AS w2
       FROM base, unnest(range(1, len(wl))) AS t(i)
       WHERE wl[i] <> wl[i + 1]),
cnt AS (SELECT w1, w2, count(*) AS n FROM pr GROUP BY 1, 2
        HAVING count(*) >= {int(min_count)}),
c AS (SELECT w1 AS s, w2 AS d, CAST(n AS DOUBLE) AS w FROM cnt
      UNION ALL
      SELECT w2 AS s, w1 AS d, CAST(n AS DOUBLE) AS w FROM cnt)"""
    inner = pagerank_over_sql(edges, damping=damping, iters=iters)
    return f"""
SELECT node AS word, pagerank FROM ({inner}) r
ORDER BY pagerank DESC, word ASC LIMIT {int(k)}
"""


def spearman_sql(
    col_a: str = "l_quantity",
    col_b: str = "l_extendedprice",
    table: str = "lineitem",
) -> str:
    """Mirror of numeric.spearman_corr: doubled midranks via window
    cumsums over each micro-integer value histogram (every rank an
    exact integer), rank maps joined back, HUGEINT Pearson moments,
    the identical fixed double order."""
    def rmap(col: str, tag: str) -> str:
        return f"""h{tag} AS (
  SELECT CAST(round({col} * 1000000, 0) AS BIGINT) AS v,
         count(*) AS t
  FROM base GROUP BY 1),
r{tag} AS (
  SELECT v,
         2 * coalesce(sum(t) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + t + 1 AS r2
  FROM h{tag})"""

    return f"""
WITH base AS (
  SELECT * FROM {table}
  WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL),
{rmap(col_a, 'a')},
{rmap(col_b, 'b')},
j AS (
  SELECT ra.r2 AS x, rb.r2 AS y
  FROM base
  JOIN ra ON CAST(round({col_a} * 1000000, 0) AS BIGINT) = ra.v
  JOIN rb ON CAST(round({col_b} * 1000000, 0) AS BIGINT) = rb.v),
m AS (
  SELECT count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM j),
d AS (
  SELECT n,
         CAST(n * sxy - sx * sy AS DOUBLE) AS cov,
         CAST(n * sxx - sx * sx AS DOUBLE) AS va,
         CAST(n * syy - sy * sy AS DOUBLE) AS vb
  FROM m)
SELECT CAST(n AS BIGINT) AS n,
       CASE WHEN va > 0 AND vb > 0
            THEN round(cov / (sqrt(va) * sqrt(vb)), 6) END + 0.0 AS rho
FROM d
"""
