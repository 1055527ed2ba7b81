"""Count-min sketch over bigram frequencies — oracle-REPRODUCIBLE, not
just oracle-checked.

``events_analytics`` already carries the HLL / bitmap sketch family with
claim-style contracts (exact value + within-tolerance flag). This module
adds the frequency sketch with a stronger property: the hash rows use the
repo's SQL-portable affine fold (``pipeline._group_hash``, seeded per
depth) instead of xxhash64, so DuckDB replays the ENTIRE sketch —
cells, estimates, and the CMS guarantee — and the driver hash-matches
every number, not just a boolean.

Reference scope note: the reference (/root/reference) has no sketch
surface; this is 100 TB training-pipeline breadth per SURVEY.md §7
phase 4 (heavy_hitter_bigrams' docstring names the CMS as its scale
alternative — this registers it).

Scale shape: occurrences fold STRAIGHT into (depth, cell) counts — the
map-side partial aggregation compresses every task's output to at most
DEPTH x WIDTH rows, so the shuffle is sketch-sized (4 x 1024 cells)
regardless of corpus size; that is the whole point of the CMS at 100 TB
(the exact top-k pass here exists only to state the >=-guarantee as
driver-checkable data — production queries the cells directly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import words

Tables = dict[str, DataFrame]

#: sketch geometry: depth = independent hash rows, width = cells per row
CMS_DEPTH = 4
CMS_WIDTH = 1024
#: heavy hitters whose estimates the check emits
CMS_TOPK = 20
_HASH_MOD = 1_000_000_007


def _seeded_hash(col_sql: str, seed: int) -> Column:
    """Per-depth variant of the portable affine fold: same recurrence as
    ``pipeline._group_hash`` with a seed-shifted accumulator start, so
    DuckDB mirrors each row with ``list_reduce`` over ascii codes."""
    return F.expr(
        f"aggregate(split({col_sql}, ''), CAST({7 + seed} AS BIGINT),"
        f" (acc, c) -> (acc * 31 + ascii(c)) % {_HASH_MOD})"
    )


_BIGRAM = (
    "zip_with(slice(ws, 1, size(ws)-1), slice(ws, 2, size(ws)-1),"
    " (a, b) -> concat(a, ' ', b))"
)


def _bigrams_of(docs: DataFrame) -> DataFrame:
    return (
        docs.select(words("text").alias("ws"))
        .where(F.size("ws") >= 2)
        .select(F.explode(F.expr(_BIGRAM)).alias("bigram"))
    )


def _bigrams(t: Tables) -> DataFrame:
    return _bigrams_of(t["documents"])


def _cell_structs() -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("d"),
                (_seeded_hash("bigram", d) % CMS_WIDTH).alias("cell"),
            )
            for d in range(CMS_DEPTH)
        ]
    )


def cms_cells_from(docs: DataFrame) -> DataFrame:
    """The sketch itself: (depth, cell) → count, from a documents-shaped
    frame. Works unchanged on a STREAMING frame (the groupBy is a
    standard stateful aggregation whose state is bounded at
    DEPTH x WIDTH rows — a sketch is exactly the kind of aggregate
    that streams forever without state growth)."""
    return (
        _bigrams_of(docs)
        .select(F.explode(_cell_structs()).alias("dc"))
        .groupBy(F.col("dc.d").alias("d"), F.col("dc.cell").alias("cell"))
        .agg(F.count("*").alias("cell_cnt"))
    )


def cms_bigram_check(t: Tables) -> DataFrame:
    """CMS estimates vs exact counts for the top-``CMS_TOPK`` bigrams.

    One row per heavy hitter: exact count, the sketch's min-over-rows
    estimate, and the CMS guarantee ``est >= true`` as a flag — every
    column recomputed identically by the DuckDB oracle (portable hashes),
    so estimate VALUES are hash-matched, not just claimed.

    Batch plan note: the interpreted portable hash is the expensive
    expression here, so this check hashes each DISTINCT bigram once and
    SUMS counts into cells (identical cell totals by associativity —
    4x|vocab| hash evaluations instead of 4x|occurrences|, measured
    4.3 s → sub-second at sf0.1). :func:`cms_cells_from` keeps the
    single-phase per-occurrence fold because a streaming query allows
    only one stateful aggregation — and production CMS ingestion hashes
    per occurrence by definition. The per-bigram count frame is
    persisted once and feeds both the cells and the top-k.
    """
    from ..tables import persist_replacing

    cell_structs = _cell_structs()
    cnt = persist_replacing(
        _bigrams(t).groupBy("bigram").agg(F.count("*").alias("true_cnt")),
        "cms_bigram_counts",
    )
    cells = (
        cnt.select("true_cnt", F.explode(cell_structs).alias("dc"))
        .groupBy(F.col("dc.d").alias("d"), F.col("dc.cell").alias("cell"))
        .agg(F.sum("true_cnt").alias("cell_cnt"))
    )
    top = cnt.orderBy(F.col("true_cnt").desc(), "bigram").limit(CMS_TOPK)
    topx = top.select(
        "bigram", "true_cnt", F.explode(cell_structs).alias("dc")
    ).select("bigram", "true_cnt", F.col("dc.d").alias("d"), F.col("dc.cell").alias("cell"))
    return (
        cells.join(F.broadcast(topx), ["d", "cell"])
        .groupBy("bigram", "true_cnt")
        .agg(F.min("cell_cnt").alias("est_cnt"))
        .select(
            "bigram",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") >= F.col("true_cnt")).alias("ge_ok"),
        )
    )


def _hash_duck(expr: str, seed_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(7 + {seed_expr} AS BIGINT),"
        f" list_transform(string_split_regex({expr}, ''),"
        " c -> CAST(ascii(c) AS BIGINT))),"
        f" (a, b) -> (a * 31 + b) % {_HASH_MOD})"
    )


#: standalone cells oracle — shared by the streaming twin
#: (``registry.streaming_cms_cells``), which drains the same aggregation
#: as a Structured Streaming query
CELLS_ORACLE = f"""
    WITH wl AS (
      SELECT string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(
               generate_series(1, len(ws) - 1),
               i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM wl WHERE len(ws) >= 2
    ),
    depths AS (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS d)
    SELECT d, {_hash_duck("bigram", "d")} % {CMS_WIDTH} AS cell,
           CAST(count(*) AS BIGINT) AS cell_cnt
    FROM bg, depths GROUP BY 1, 2
"""

ORACLES: dict[str, str] = {
    "cms_bigram_check": f"""
        WITH wl AS (
          SELECT string_split_regex(trim(text), '\\s+') AS ws FROM documents
        ),
        bg AS (
          SELECT unnest(list_transform(
                   generate_series(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i + 1])) AS bigram
          FROM wl WHERE len(ws) >= 2
        ),
        depths AS (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS d),
        cells AS (
          SELECT d, {_hash_duck("bigram", "d")} % {CMS_WIDTH} AS cell,
                 CAST(count(*) AS BIGINT) AS cell_cnt
          FROM bg, depths GROUP BY 1, 2
        ),
        top AS (
          SELECT bigram, CAST(count(*) AS BIGINT) AS true_cnt
          FROM bg GROUP BY 1
          ORDER BY true_cnt DESC, bigram LIMIT {CMS_TOPK}
        )
        SELECT t.bigram, t.true_cnt,
               CAST(min(c.cell_cnt) AS BIGINT) AS est_cnt,
               min(c.cell_cnt) >= t.true_cnt AS ge_ok
        FROM top t
        JOIN cells c
          ON c.cell = {_hash_duck("t.bigram", "c.d")} % {CMS_WIDTH}
        GROUP BY 1, 2
    """,
}

QUERIES = {
    "cms_bigram_check": cms_bigram_check,
}
