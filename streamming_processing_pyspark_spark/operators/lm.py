"""Corpus-trained language-model statistics: bigram-LM document scoring
and BPE merge-candidate extraction.

- :func:`lm_bigram_nll` — CCNet-style perplexity filtering with a model
  actually TRAINED on the corpus (vs :func:`curation.perplexity_buckets`,
  which scores against fixed proxy weights): add-one-smoothed bigram LM
  ``P(w2|w1) = (c12 + 1) / (c1 + V)`` fit on the whole corpus in one
  aggregation pass, then every document scored by its mean bigram
  negative log-likelihood. High-NLL docs are the out-of-distribution /
  noisy tail a curation pipeline drops or down-weights; the statistic is
  self-calibrating (no external model artifact to ship).
- :func:`bpe_merge_candidates` — the first step of BPE tokenizer
  training: frequency of every adjacent character pair inside words,
  weighted by word frequency, top-K. Iterating this (merge the winner,
  re-count) is exactly the Sennrich et al. BPE loop; the expensive part
  at corpus scale is this counting step, and it is the step that needs a
  distributed engine — the iteration loop operates on the (tiny)
  vocabulary table.

Scale notes (100 TB): ``lm_bigram_nll`` is two corpus scans (train
counts + vocab size) and two shuffle joins of per-document DISTINCT
bigrams against the bigram/context count tables — all shuffles carry
fixed-width keys and are map-side combined; nothing is driver-side and
no state exceeds the bigram-vocabulary size. ``bpe_merge_candidates``
shuffles the corpus once (word → frequency, map-combined); every later
stage runs on the distinct-vocabulary table, which is orders of
magnitude smaller than the corpus — the reason BPE training is feasible
on a 100 TB crawl at all. The top-K is a ``TakeOrderedAndProject``
(per-partition heaps), never a global sort.

Determinism contract (same class as ``mixing.dsir_resample``): each NLL
term is ONE ``ln`` of an exact integer rational and the per-document
terms fold in first-occurrence position order on both engines
(collect_list → array_sort → aggregate in Spark; ``list(term ORDER BY
p)`` → list_reduce in DuckDB), so the only cross-engine divergence is
the accepted ≤1-ulp libm ``ln`` class; the emitted score is floored to
micro-nats to keep that class away from the value hash.
``bpe_merge_candidates`` is all-integer — bit-exact.

Reference scope note: the reference project (``/root/reference``,
Task2-4/Client.py) has no language-model surface; these extend the
engine for the training-data use case per SURVEY.md §7 phase 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words

Tables = dict[str, DataFrame]

#: how many merge candidates the BPE step reports
BPE_TOP_K = 20


def lm_bigram_nll(t: Tables) -> DataFrame:
    """Per-document mean bigram NLL under the corpus-trained add-one LM.

    Output: ``doc_id``, ``n_bigrams``, ``nll_micro`` =
    ``floor(1e6 · Σ -ln P(w2|w1) / n_bigrams)`` — higher means the
    document reads less like the corpus. Documents with fewer than two
    tokens have no bigram and are excluded (their NLL is undefined).
    """
    d = (
        t["documents"]
        .select("doc_id", words("text").alias("ws"))
        .where(F.size("ws") >= 2)
    )
    # one row per bigram occurrence, then collapsed to per-document
    # DISTINCT bigrams (multiplicity m, first position p) BEFORE the count
    # joins — the join input is per-doc-distinct, not per-occurrence
    occ = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, size(ws) - 2),"
                " i -> named_struct('w1', ws[i],"
                " 'bg', concat(ws[i], ' ', ws[i + 1])))"
            )
        ).alias("pos", "o"),
    ).select("doc_id", "pos", F.col("o.w1").alias("w1"), F.col("o.bg").alias("bg"))
    g = occ.groupBy("doc_id", "bg", "w1").agg(
        F.count("*").alias("m"), F.min("pos").alias("p")
    )
    c12 = g.groupBy("bg").agg(F.sum("m").alias("c12"))
    c1 = g.groupBy("w1").agg(F.sum("m").alias("c1"))
    # |vocab| for the smoothing denominator: distinct tokens across the
    # whole corpus (including final-position and one-word-doc tokens the
    # context counts never see) — one extra map-combined distinct scan,
    # 1-row result broadcast by the crossJoin
    vocab = (
        t["documents"]
        .select(F.explode(words("text")).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    terms = (
        g.join(c12, "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "p",
            "m",
            (-F.col("m") * F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v")))).alias(
                "term"
            ),
        )
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.array_sort(F.collect_list(F.struct("p", "term"))).alias("parts"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.floor(
                1000000
                * F.expr("aggregate(parts, CAST(0.0 AS DOUBLE), (a, x) -> a + x.term)")
                / F.col("n_bigrams")
            )
            .cast("long")
            .alias("nll_micro"),
        )
    )


def bpe_merge_candidates(t: Tables) -> DataFrame:
    """Top-``BPE_TOP_K`` adjacent character pairs by corpus frequency.

    Pair frequency = Σ over words containing the pair of
    (occurrences-in-word × word frequency) — the statistic the BPE merge
    rule maximizes. Deterministic order: frequency descending, then pair
    ascending. All stages after the word-frequency aggregate run on the
    distinct-vocabulary table.
    """
    wf = (
        t["documents"]
        .select(F.explode(words("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n_w"))
    )
    pairs = wf.where(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "n_w",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n_w").alias("freq"))
        .orderBy(F.col("freq").desc(), "pair")
        .limit(BPE_TOP_K)
    )


ORACLES: dict[str, str] = {
    "lm_bigram_nll": r"""
        WITH d AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
          FROM documents
        ),
        occ AS (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, len(ws) - 1),
                   i -> {'pos': i - 1, 'w1': ws[i],
                         'bg': ws[i] || ' ' || ws[i + 1]}
                 )) AS o
          FROM d WHERE len(ws) >= 2
        ),
        o2 AS (SELECT doc_id, o.pos AS pos, o.w1 AS w1, o.bg AS bg FROM occ),
        g AS (SELECT doc_id, bg, w1, count(*) AS m, min(pos) AS p
              FROM o2 GROUP BY 1, 2, 3),
        c12 AS (SELECT bg, sum(m) AS c12 FROM g GROUP BY bg),
        c1 AS (SELECT w1, sum(m) AS c1 FROM g GROUP BY w1),
        v AS (
          SELECT count(DISTINCT w) AS v FROM (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents
          )
        ),
        terms AS (
          SELECT doc_id, p, m,
                 -m * ln((c12.c12 + 1.0) / (c1.c1 + v.v)) AS term
          FROM g JOIN c12 USING (bg) JOIN c1 USING (w1) CROSS JOIN v
        )
        SELECT doc_id,
               CAST(sum(m) AS BIGINT) AS n_bigrams,
               CAST(floor(1000000 * list_reduce(
                      list_prepend(CAST(0.0 AS DOUBLE),
                                   list(term ORDER BY p)),
                      (a, b) -> a + b) / sum(m)) AS BIGINT) AS nll_micro
        FROM terms GROUP BY doc_id
    """,
    "bpe_merge_candidates": rf"""
        WITH wf AS (
          SELECT w, count(*) AS n_w FROM (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents
          ) GROUP BY w
        ),
        p AS (
          SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                       i -> substring(w, i, 2))) AS pair,
                 n_w
          FROM wf WHERE len(w) >= 2
        )
        SELECT pair, CAST(sum(n_w) AS BIGINT) AS freq
        FROM p GROUP BY pair
        ORDER BY freq DESC, pair
        LIMIT {BPE_TOP_K}
    """,
}

QUERIES = {
    "lm_bigram_nll": lm_bigram_nll,
    "bpe_merge_candidates": bpe_merge_candidates,
}
