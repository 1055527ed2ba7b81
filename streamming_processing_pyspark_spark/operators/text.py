"""Text-analysis queries over the ``documents`` table.

The training-data-pipeline text surface: word counts (generalizing the
reference's word count, ``Client.py:22-24``), token statistics, quality
scoring, language ID, and document fingerprinting. All Catalyst-only — at
100 TB these are one scan each with pushdown-friendly projections.

Each query has a DuckDB oracle; the only systematic difference is Spark's
0-based vs DuckDB's 1-based array lambda index, handled per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tables import local_df

from ..functions.text import (
    FINGERPRINT_MOD,
    LANG_STOPWORDS,
    alpha_ratio,
    fingerprint,
    lang_pick_expr,
    lang_scores,
    raw_tokens,
    stopword_hits,
    token_count,
    words,
)

Tables = dict[str, DataFrame]


def word_counts(t: Tables) -> DataFrame:
    """Global word count — the reference's word count as a batch op.

    Split on single space with empties kept (reference Client.py:22
    semantics); explode → groupBy → count is one shuffle with map-side
    partial aggregation.
    """
    return (
        t["documents"]
        .select(F.explode(raw_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def token_stats(t: Tables) -> DataFrame:
    """Per-document token statistics."""
    return t["documents"].select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").alias("text_len"),
        F.round(F.length("text") / token_count("text"), 4).alias("avg_token_len"),
    )


def quality_scores(t: Tables) -> DataFrame:
    """Heuristic quality scoring: alphabetic ratio × log token count."""
    d = t["documents"]
    return d.select(
        "doc_id",
        alpha_ratio("text").alias("alpha_ratio"),
        token_count("text").alias("n_tokens"),
        F.round(
            alpha_ratio("text") * F.log(1 + token_count("text")), 4
        ).alias("quality"),
    )


def lang_id(t: Tables) -> DataFrame:
    """Stopword-hit language ID with deterministic tie-breaking."""
    d = t["documents"].select("doc_id", "text", *lang_scores("text"))
    return d.select(
        "doc_id",
        *[F.col(f"hits_{lang}") for lang in LANG_STOPWORDS],
        lang_pick_expr().alias("lang_guess"),
    )


def langid_confusion_matrix(t: Tables) -> DataFrame:
    """Declared-language vs language-ID confusion matrix — the quality
    gate every corpus-metadata audit runs before trusting either the
    upstream ``lang`` tags or the classifier: one row per (declared,
    predicted) cell with the doc count and the within-declared share
    (basis points).

    Scale: classification is the same codegen'd stopword-hit argmax as
    :func:`lang_id` (map-only); the rollup keys on |langs|² ≤ tiny
    cells, and the share window partitions by the bounded declared-lang
    key."""
    from pyspark.sql import Window

    d = t["documents"].select("lang", *lang_scores("text"))
    pred = d.select("lang", lang_pick_expr().alias("lang_guess"))
    cells = pred.groupBy("lang", "lang_guess").agg(
        F.count("*").alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "lang_guess",
        "n_docs",
        F.expr("10000 * n_docs").alias("_num"),
        F.sum("n_docs").over(w).alias("_den"),
    ).select(
        "lang",
        "lang_guess",
        "n_docs",
        F.expr("_num DIV _den").alias("share_bp"),
    )


SENTIMENT_POS = ("fast", "small", "merge")
SENTIMENT_NEG = ("slow", "big", "batch")


def sentiment_scores(t: Tables) -> DataFrame:
    """Lexicon-based sentiment (SURVEY.md §7 Phase 4): normalized
    positive-minus-negative hit score with a three-way label.

    The lexicon is a stand-in wired to the synthetic vocabulary; swap in
    AFINN/VADER word lists for real corpora. Higher-order ``filter`` counts
    hits JVM-side — map-only, zero shuffle, same shape as ``lang_id``.
    """
    pos = stopword_hits("text", SENTIMENT_POS)
    neg = stopword_hits("text", SENTIMENT_NEG)
    score = F.round((pos - neg) / token_count("text"), 4)
    return t["documents"].select(
        "doc_id",
        pos.alias("pos_hits"),
        neg.alias("neg_hits"),
        score.alias("sentiment"),
        F.when(score > 0, "positive")
        .when(score < 0, "negative")
        .otherwise("neutral")
        .alias("sentiment_label"),
    )


def doc_fingerprints(t: Tables) -> DataFrame:
    """Position-weighted polynomial fingerprint per document."""
    return t["documents"].select(
        "doc_id", fingerprint("text").alias("fingerprint")
    )


def array_functions_showcase(t: Tables) -> DataFrame:
    """Array function library parity: size/distinct/element_at/min/slice/
    join/contains over the tokenized documents."""
    ws = F.split(F.trim("text"), r"\s+")
    d = t["documents"].select("doc_id", ws.alias("ws"))
    return d.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.size(F.array_distinct("ws")).alias("n_distinct_words"),
        F.element_at("ws", 1).alias("first_word"),
        F.element_at("ws", -1).alias("last_word"),
        F.array_min("ws").alias("min_word"),
        F.array_join(F.slice("ws", 1, 3), " ").alias("first3"),
        F.array_contains("ws", "the").alias("has_the"),
    )


def tfidf_top_terms(t: Tables) -> DataFrame:
    """Top-3 TF-IDF terms per document.

    ``score = (cnt · N) / (n_tokens · df)`` — raw-ratio idf instead of the
    usual ``ln(N/df)`` so both engines compute the identical IEEE double
    (one division of exact integer products; ``ln`` differs in the last ulp
    across libms and would make rank order engine-dependent). Plan shape:
    per-(doc, term) counts (one shuffle), document-frequency vocabulary
    (second aggregate — vocabulary-sized, broadcast back), per-doc top-k via
    rank window partitioned by doc_id — each stage partial-aggregates
    map-side, and the vocab join never shuffles the corpus side again.
    """
    from pyspark.sql.window import Window

    docs = t["documents"]
    n_docs = docs.count()  # scalar; at 100 TB read from table stats instead
    tok = docs.select("doc_id", F.explode(words("text")).alias("term"))
    per_doc = tok.groupBy("doc_id", "term").agg(F.count("*").alias("cnt"))
    doc_len = per_doc.groupBy("doc_id").agg(F.sum("cnt").alias("n_tokens"))
    df_tbl = per_doc.groupBy("term").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    score = (F.col("cnt") * F.lit(n_docs)) / (F.col("n_tokens") * F.col("doc_freq"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        per_doc.join(doc_len, "doc_id")
        .join(F.broadcast(df_tbl), "term")
        .withColumn("tfidf", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOP_N)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf_r"), "rank")
    )


def source_quality_rollup(t: Tables) -> DataFrame:
    """Per-source corpus health rollup (the "drop bad domains" input).

    One groupBy over per-document scalars — every metric is computed
    inline (no joins), so the only shuffle carries one row per document.
    """
    d = t["documents"]
    n_tok = F.size(words("text"))
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg(n_tok), 2).alias("avg_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.round(
                F.avg((F.length("text") / n_tok)), 4
            ).alias("avg_token_len"),
        )
    )


def _stopword_hits_duck(lang: str) -> str:
    in_list = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        "CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), "
        f"w -> w IN ({in_list}))) AS INTEGER) AS hits_{lang}"
    )


def _lang_case_duck() -> str:
    langs = list(LANG_STOPWORDS)
    clauses = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"hits_{lang} >= hits_{other}" for other in langs[i + 1 :]
        )
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return f"CASE {' '.join(clauses)} ELSE '{langs[-1]}' END"


_NTOK_DUCK = "CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER)"

TFIDF_TOP_N = 3
_ALPHA_DUCK = (
    "round(length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text), 4)"
)

#: BM25 retrieval parameters (fixed 2-term query; standard k1/b)
BM25_TERMS = ("spark", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def _bm25_scores(t: Tables) -> DataFrame:
    """Exact BM25 scores for a fixed 2-term query — one scan, NO wide
    shuffle: per-document term frequencies come from higher-order
    ``size(filter(ws, ...))`` in the scan projection, the corpus stats
    (N, avg doc length, per-term document frequencies) reduce to ONE
    broadcast row, scoring is map-side arithmetic, and the top-k is a
    TakeOrderedAndProject. The same plan at 100 TB is a scan + 1-row
    broadcast + per-partition heaps — the batch-retrieval shape under a
    RAG pipeline (per-query serving would use the inverted index
    instead; tfidf_top_terms holds the index-building side).

    Cross-engine exactness: each term's contribution
    ``idf · tf / (tf + k1·(1 − b + b·len/avgdl))`` is computed with an
    identical operation order in both engines, scaled to 1e-4 units and
    rounded to int64 BEFORE summation, so the final score is an exact
    integer sum (float summation order can never flip it). Residual risk
    is a contribution landing exactly on a .5e-4 rounding boundary —
    the accepted ~1e-12 class documented for udtf._geomean.
    """
    d = t["documents"].select(
        "doc_id",
        words("text").alias("ws"),
    ).select(
        "doc_id",
        F.size("ws").alias("dl"),
        *[
            F.expr(f"size(filter(ws, x -> x = '{term}'))").alias(f"tf{i}")
            for i, term in enumerate(BM25_TERMS)
        ],
    )
    stats = d.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    scored = d.crossJoin(F.broadcast(stats))

    def contrib(i: int):
        idf = F.log(
            (
                (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5))
                / (F.col(f"df{i}") + F.lit(0.5))
            )
            + F.lit(1.0)
        )
        tf = F.col(f"tf{i}").cast("double")
        norm = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B)
            * (
                F.col("dl").cast("double")
                * F.col("n_docs").cast("double")
                / F.col("sum_dl").cast("double")
            )
        )
        return F.round(idf * tf / norm * 10000, 0).cast("long")

    total = contrib(0)
    for i in range(1, len(BM25_TERMS)):
        total = total + contrib(i)
    return scored.select("doc_id", total.alias("score_e4")).where(
        F.col("score_e4") > 0
    )


def bm25_search(t: Tables) -> DataFrame:
    """Top-k of :func:`_bm25_scores` (see its docstring for the plan)."""
    return (
        _bm25_scores(t)
        .orderBy(F.desc("score_e4"), "doc_id")
        .limit(BM25_TOPK)
    )


#: hybrid-retrieval fusion parameters (RRF, Cormack et al.)
HYBRID_POOL = 50
RRF_K = 60
HYBRID_TOPK = 10


def hybrid_search_rrf(t: Tables) -> DataFrame:
    """Hybrid retrieval: BM25 (lexical) and cosine-to-query (vector)
    candidate pools fused by Reciprocal Rank Fusion — the standard RAG
    serving pattern (two independent rankers, rank-based fusion is robust
    to their incomparable score scales).

    Scale shape: each ranker contributes only its bounded top-POOL list
    (TakeOrderedAndProject on its own plan); ranking and fusion then run
    on <= 2·POOL rows — the single-partition rank windows are over the
    POOLED frame, never the corpus. RRF terms are integer
    (``1e6 DIV (k + rank)``), so fusion is exact and the DuckDB oracle
    hash-matches; ranks carry through for inspection (NULL = doc absent
    from that ranker's pool).
    """
    from .similarity import QUERY_VEC_ID, _with_cosine_to_query

    bm = (
        _bm25_scores(t)
        .orderBy(F.desc("score_e4"), "doc_id")
        .limit(HYBRID_POOL)
    )
    w_lex = Window.orderBy(F.desc("score_e4"), "doc_id")
    bm_r = bm.select(
        "doc_id", F.row_number().over(w_lex).cast("int").alias("r_lex")
    )
    cos = (
        _with_cosine_to_query(t)
        .where(F.col("vec_id") != QUERY_VEC_ID)
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(HYBRID_POOL)
    )
    w_vec = Window.orderBy(F.desc("cos_sim"), "vec_id")
    cos_r = cos.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(w_vec).cast("int").alias("r_vec"),
    )
    fused = bm_r.join(cos_r, ["doc_id"], "full_outer").select(
        "doc_id",
        (
            F.coalesce(
                F.expr(f"CAST(1000000 DIV ({RRF_K} + r_lex) AS BIGINT)"),
                F.lit(0).cast("long"),
            )
            + F.coalesce(
                F.expr(f"CAST(1000000 DIV ({RRF_K} + r_vec) AS BIGINT)"),
                F.lit(0).cast("long"),
            )
        ).alias("rrf_e6"),
        "r_lex",
        "r_vec",
    )
    return fused.orderBy(F.desc("rrf_e6"), "doc_id").limit(HYBRID_TOPK)


#: vocabulary sizes the coverage curve reports
VOCAB_SIZES = (8, 16, 32, 64)


def vocab_coverage(t: Tables) -> DataFrame:
    """Tokenizer-vocabulary coverage curve: for each candidate vocab size
    V, the fraction (basis points) of all corpus token OCCURRENCES covered
    by the V most frequent terms — the measurement that sizes a
    tokenizer's vocabulary / OOV budget before training one.

    Scale shape: the only input-sized stage is the term-count aggregation
    (map-side combinable, one shuffle); ranking and the cumulative sum run
    over the VOCAB-sized histogram (the same corpus≫vocab justification as
    tfidf_top_terms), and the V-grid is a broadcast range join over that
    tiny cumulative frame. Integer arithmetic end-to-end (basis points =
    cum·10000 div total), so the oracle hash-matches.
    """
    terms = (
        t["documents"]
        .select(F.explode(raw_tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), "term")
    w_all = Window.partitionBy()
    ranked = terms.select(
        F.row_number().over(w).alias("rk"),
        "cnt",
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    sizes = local_df(
        ranked.sparkSession,
        [(v,) for v in VOCAB_SIZES], "vocab_size int"
    )
    per_v = ranked.join(
        F.broadcast(sizes), F.col("rk") <= F.col("vocab_size")
    ).groupBy("vocab_size").agg(
        F.max(F.expr("cum * 10000 DIV total")).alias("covered_bp"),
        F.max(F.when(F.col("rk") == F.col("vocab_size"), F.col("cnt"))).alias(
            "marginal_term_cnt"
        ),
    )
    return per_v.select("vocab_size", "covered_bp", "marginal_term_cnt")


#: rank-frequency points the Zipf fit uses (vocab-bounded)
ZIPF_TOP_N = 200


def zipf_alpha(t: Tables) -> DataFrame:
    """Zipf exponent of the corpus token distribution: OLS slope of
    ln(freq) on ln(rank) over the top-``ZIPF_TOP_N`` words, reported as
    ``alpha_micro = floor(1e6 · (−slope))``.

    Natural text sits near α ≈ 1; a corpus drifting toward α ≫ 1
    (template/boilerplate domination) or α ≪ 1 (shredded/random tokens)
    is THE one-number distribution-health check curation dashboards
    track next to the vocab_coverage curve.

    Scale: word frequencies are the usual map-combined corpus shuffle;
    the rank window and the fit run on the vocabulary-capped top-N frame
    (≤ ZIPF_TOP_N rows — the unpartitioned window is bounded by
    construction). Determinism: each point contributes ln(rank)/ln(freq)
    — exact-integer logs of the accepted ≤1-ulp libm class — and all four
    OLS sums fold in rank order on both engines before the micro floor.

    Output (1 row): ``n_points``, ``alpha_micro``.
    """
    wf = (
        t["documents"]
        .select(F.explode(words("text")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    ranked = (
        wf.withColumn(
            "r",
            F.row_number().over(Window.orderBy(F.col("freq").desc(), "w")),
        )
        .where(F.col("r") <= ZIPF_TOP_N)
        .select(
            "r",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("freq").cast("double")).alias("y"),
        )
    )
    acc = ranked.agg(
        F.count("*").alias("n"),
        F.array_sort(F.collect_list(F.struct("r", "x", "y"))).alias("ps"),
    )
    def fold(expr):
        return F.expr(
            f"aggregate(ps, CAST(0.0 AS DOUBLE), (a, p) -> a + {expr})"
        )
    return acc.select(
        F.col("n").cast("long").alias("n_points"),
        F.floor(
            1000000
            * -(
                (F.col("n") * fold("p.y * p.x") - fold("p.x") * fold("p.y"))
                / (F.col("n") * fold("p.x * p.x") - fold("p.x") * fold("p.x"))
            )
        )
        .cast("long")
        .alias("alpha_micro"),
    )


ORACLES: dict[str, str] = {
    "zipf_alpha": rf"""
        WITH wf AS (
          SELECT w, count(*) AS freq FROM (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents
          ) WHERE length(w) > 0 GROUP BY w
        ),
        ranked AS (
          SELECT r, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
          FROM (
            SELECT freq,
                   row_number() OVER (ORDER BY freq DESC, w) AS r
            FROM wf
          ) WHERE r <= {ZIPF_TOP_N}
        ),
        s AS (
          SELECT count(*) AS n,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                             list(y * x ORDER BY r)), (a, b) -> a + b) AS sxy,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                             list(x ORDER BY r)), (a, b) -> a + b) AS sx,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                             list(y ORDER BY r)), (a, b) -> a + b) AS sy,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                             list(x * x ORDER BY r)), (a, b) -> a + b) AS sxx
          FROM ranked
        )
        SELECT CAST(n AS BIGINT) AS n_points,
               CAST(floor(1000000 * -((n * sxy - sx * sy)
                                      / (n * sxx - sx * sx)))
                    AS BIGINT) AS alpha_micro
        FROM s
    """,
    "bm25_search": """
        WITH f AS (
          SELECT doc_id,
                 len(string_split_regex(trim(text), '\\s+')) AS dl,
                 len(list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x = 'spark')) AS tf0,
                 len(list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x = 'stream')) AS tf1
          FROM documents
        ),
        s AS (
          SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
                 sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                 sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1
          FROM f
        ),
        sc AS (
          SELECT f.doc_id,
                 CAST(round(ln((CAST(s.n_docs - s.df0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (CAST(s.df0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) * CAST(f.tf0 AS DOUBLE) / (CAST(f.tf0 AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (CAST(f.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE) / CAST(s.sum_dl AS DOUBLE)))) * 10000, 0) AS BIGINT) + CAST(round(ln((CAST(s.n_docs - s.df1 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (CAST(s.df1 AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) * CAST(f.tf1 AS DOUBLE) / (CAST(f.tf1 AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (CAST(f.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE) / CAST(s.sum_dl AS DOUBLE)))) * 10000, 0) AS BIGINT) AS score_e4
          FROM f CROSS JOIN s
        )
        SELECT doc_id, score_e4 FROM sc
        WHERE score_e4 > 0
        ORDER BY score_e4 DESC, doc_id LIMIT 10
    """,
    "hybrid_search_rrf": """
        WITH f AS (
          SELECT doc_id,
                 len(string_split_regex(trim(text), '\\s+')) AS dl,
                 len(list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x = 'spark')) AS tf0,
                 len(list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x = 'stream')) AS tf1
          FROM documents
        ),
        s AS (
          SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
                 sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                 sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1
          FROM f
        ),
        sc AS (
          SELECT f.doc_id,
                 CAST(round(ln((CAST(s.n_docs - s.df0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (CAST(s.df0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) * CAST(f.tf0 AS DOUBLE) / (CAST(f.tf0 AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (CAST(f.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE) / CAST(s.sum_dl AS DOUBLE)))) * 10000, 0) AS BIGINT) + CAST(round(ln((CAST(s.n_docs - s.df1 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (CAST(s.df1 AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) * CAST(f.tf1 AS DOUBLE) / (CAST(f.tf1 AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (CAST(f.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE) / CAST(s.sum_dl AS DOUBLE)))) * 10000, 0) AS BIGINT) AS score_e4
          FROM f CROSS JOIN s
        ),
        bm AS (
          SELECT doc_id, score_e4 FROM sc WHERE score_e4 > 0
          ORDER BY score_e4 DESC, doc_id LIMIT 50
        ),
        bmr AS (
          SELECT doc_id, CAST(row_number() OVER (
            ORDER BY score_e4 DESC, doc_id) AS INTEGER) AS r_lex
          FROM bm
        ),
        cos AS (
          SELECT a.vec_id AS doc_id, round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))), 6) AS cos_sim
          FROM embeddings a,
               (SELECT embedding FROM embeddings WHERE vec_id = 0) q
          WHERE a.vec_id != 0
          ORDER BY cos_sim DESC, a.vec_id LIMIT 50
        ),
        cosr AS (
          SELECT doc_id, CAST(row_number() OVER (
            ORDER BY cos_sim DESC, doc_id) AS INTEGER) AS r_vec
          FROM cos
        ),
        fused AS (
          SELECT coalesce(bmr.doc_id, cosr.doc_id) AS doc_id,
                 coalesce(CAST(1000000 // (60 + r_lex) AS BIGINT), 0)
                 + coalesce(CAST(1000000 // (60 + r_vec) AS BIGINT), 0)
                   AS rrf_e6,
                 r_lex, r_vec
          FROM bmr FULL OUTER JOIN cosr ON bmr.doc_id = cosr.doc_id
        )
        SELECT doc_id, rrf_e6, r_lex, r_vec FROM fused
        ORDER BY rrf_e6 DESC, doc_id LIMIT 10
    """,
    "tfidf_top_terms": f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
          FROM documents
        ),
        pd AS (SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, sum(cnt) AS n_tokens FROM pd GROUP BY 1),
        dfq AS (SELECT term, count(DISTINCT doc_id) AS doc_freq FROM pd GROUP BY 1),
        nd AS (SELECT count(*) AS n_docs FROM documents),
        sc AS (
          SELECT pd.doc_id, pd.term,
                 (pd.cnt * nd.n_docs) / (dl.n_tokens * dfq.doc_freq) AS tfidf
          FROM pd JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN nd
        )
        SELECT doc_id, term, round(tfidf, 6) AS tfidf_r,
               CAST(row_number() OVER (
                 PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
               ) AS INTEGER) AS rank
        FROM sc QUALIFY rank <= {TFIDF_TOP_N}
    """,
    "source_quality_rollup": f"""
        SELECT source, count(*) AS n_docs,
               round(avg(n_chars), 2) AS avg_chars,
               round(avg({_NTOK_DUCK}), 2) AS avg_tokens,
               count(DISTINCT lang) AS n_langs,
               round(avg(length(text) * 1.0 / {_NTOK_DUCK}), 4) AS avg_token_len
        FROM documents GROUP BY source
    """,
    "word_counts": """
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word
    """,
    "vocab_coverage": """
        WITH terms AS (
          SELECT term, count(*) AS cnt
          FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
          GROUP BY term
        ),
        ranked AS (
          SELECT row_number() OVER (ORDER BY cnt DESC, term) AS rk, cnt,
                 sum(cnt) OVER (ORDER BY cnt DESC, term
                                ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(cnt) OVER () AS total
          FROM terms
        ),
        sizes AS (SELECT unnest([8, 16, 32, 64]) AS vocab_size)
        SELECT CAST(s.vocab_size AS INTEGER) AS vocab_size,
               CAST(max(r.cum * 10000 // r.total) AS BIGINT) AS covered_bp,
               max(CASE WHEN r.rk = s.vocab_size THEN r.cnt END)
                 AS marginal_term_cnt
        FROM ranked r JOIN sizes s ON r.rk <= s.vocab_size
        GROUP BY s.vocab_size
    """,
    "token_stats": f"""
        SELECT doc_id,
               {_NTOK_DUCK} AS n_tokens,
               CAST(length(text) AS INTEGER) AS text_len,
               round(length(text) * 1.0 / {_NTOK_DUCK}, 4) AS avg_token_len
        FROM documents
    """,
    "quality_scores": f"""
        SELECT doc_id,
               {_ALPHA_DUCK} AS alpha_ratio,
               {_NTOK_DUCK} AS n_tokens,
               round({_ALPHA_DUCK} * ln(1 + {_NTOK_DUCK}), 4) AS quality
        FROM documents
    """,
    "lang_id": f"""
        SELECT doc_id, {', '.join(f'hits_{lang}' for lang in LANG_STOPWORDS)},
               {_lang_case_duck()} AS lang_guess
        FROM (SELECT doc_id,
              {', '.join(_stopword_hits_duck(lang) for lang in LANG_STOPWORDS)}
              FROM documents)
    """,
    "langid_confusion_matrix": f"""
        WITH h AS (SELECT lang,
              {', '.join(_stopword_hits_duck(lang) for lang in LANG_STOPWORDS)}
              FROM documents),
        g AS (SELECT lang, {_lang_case_duck()} AS lang_guess FROM h)
        SELECT lang, lang_guess, count(*) AS n_docs,
               CAST(10000 * count(*) //
                    sum(count(*)) OVER (PARTITION BY lang) AS BIGINT)
                 AS share_bp
        FROM g GROUP BY lang, lang_guess
    """,
    "sentiment_scores": """
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w IN ('fast', 'small', 'merge'))) AS INTEGER) AS pos_hits,
               CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w IN ('slow', 'big', 'batch'))) AS INTEGER) AS neg_hits,
               round((CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w IN ('fast', 'small', 'merge'))) AS INTEGER) - CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w IN ('slow', 'big', 'batch'))) AS INTEGER)) * 1.0 / CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER), 4) AS sentiment,
               CASE WHEN round((CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w IN ('fast', 'small', 'merge'))) AS INTEGER) - CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w IN ('slow', 'big', 'batch'))) AS INTEGER)) * 1.0 / CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER), 4) > 0 THEN 'positive'
                    WHEN round((CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w IN ('fast', 'small', 'merge'))) AS INTEGER) - CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w IN ('slow', 'big', 'batch'))) AS INTEGER)) * 1.0 / CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER), 4) < 0 THEN 'negative'
                    ELSE 'neutral' END AS sentiment_label
        FROM documents
    """,
    "array_functions_showcase": """
        WITH w AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
          FROM documents
        )
        SELECT doc_id,
               CAST(len(ws) AS INTEGER) AS n_words,
               CAST(len(list_distinct(ws)) AS INTEGER) AS n_distinct_words,
               ws[1] AS first_word,
               ws[-1] AS last_word,
               list_aggregate(ws, 'min') AS min_word,
               array_to_string(ws[1:3], ' ') AS first3,
               list_contains(ws, 'the') AS has_the
        FROM w
    """,
    "doc_fingerprints": f"""
        SELECT doc_id,
               CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                 (w, i) -> CAST(i AS BIGINT) *
                   (31 * length(w) + coalesce(ascii(substring(w, 1, 1)), 0))))
               % {FINGERPRINT_MOD} AS BIGINT) AS fingerprint
        FROM documents
    """,
}

QUERIES = {
    "zipf_alpha": zipf_alpha,
    "word_counts": word_counts,
    "token_stats": token_stats,
    "quality_scores": quality_scores,
    "tfidf_top_terms": tfidf_top_terms,
    "source_quality_rollup": source_quality_rollup,
    "lang_id": lang_id,
    "langid_confusion_matrix": langid_confusion_matrix,
    "doc_fingerprints": doc_fingerprints,
    "sentiment_scores": sentiment_scores,
    "array_functions_showcase": array_functions_showcase,
    "bm25_search": bm25_search,
    "hybrid_search_rrf": hybrid_search_rrf,
    "vocab_coverage": vocab_coverage,
}
