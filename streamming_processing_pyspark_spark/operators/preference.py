"""Pairwise-preference aggregation: Bradley–Terry strength fitting over
event outcomes — the statistical core of RLHF / RLAIF reward-data
pipelines (aggregate millions of pairwise comparisons into per-item
strengths) applied to the events stream.

Comparison extraction: within each user's timeline (ordered by
``ts, event_id`` — the engine-portable total order every path/transition
query here uses), each CONSECUTIVE pair of events with different types
and different values is one pairwise trial; the type with the higher
``value`` wins. That is the classic implicit-feedback reading of an
interaction log, and it is deliberately window-based (one ``lag`` per
partition) rather than a within-user self-join: the pair stream is
O(events), not O(events²).

Fitting: Bradley–Terry by Hunter's (2004) MM algorithm —

    s_i ← W_i / Σ_{j≠i} (n_ij + n_ji) / (s_i + s_j)

iterated ``BT_ITERS`` times from s=1 with per-round sum-normalization.
The comparison-count matrix is E×E for E distinct event types; like
``lm.bpe_learn_merges`` (capped vocabulary) and
``mixing.doremi_mixture_weights`` (S domains), the fixpoint loop runs on
that tiny table on the driver — iterating an E-row fixpoint as K Spark
jobs would be the wrong plan at any scale.

Scale (100 TB): ONE shuffle of events by user_id (the window sort), a
map-side-combined groupBy on (winner, loser) — E² bounded output — and
the driver loop. Nothing corpus-sized leaves the executors.

Determinism: counts are integers; the MM loop uses only +, ·, / (no
libm), with every fold order pinned (denominator terms by opponent type,
normalization by type), so Spark-Python and the unrolled DuckDB oracle
are BIT-IDENTICAL, not merely close — ``bt_micro`` hash-matches exactly.

Zero-win types (appear only as losers) are kept: their strength
converges to 0 and the MM division stays well-defined because any
recorded pair has at least one winner (n_ij > 0 ⇒ W_i > 0, so
s_i + s_j > 0 for every counted pair).

Reference scope note: the reference project (``/root/reference``,
Task2-4/Client.py) has no preference-learning surface; this extends the
engine for the training-data use case per SURVEY.md §7 phase 4.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tables import local_df

Tables = dict[str, DataFrame]

#: MM iterations; the oracle unrolls the same number — keep in lockstep
BT_ITERS = 10


def bradley_terry_event_prefs(t: Tables) -> DataFrame:
    """Per-event-type Bradley–Terry strength from implicit pairwise trials.

    Output: ``event_type``, ``wins``, ``losses``, ``bt_micro`` =
    ``floor(1e6 · s)`` with strengths normalized to sum 1. Higher means
    the type systematically carries the larger ``value`` when it meets
    other types back-to-back in a user timeline.
    """
    spark = t["events"].sparkSession
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = t["events"].select(
        "event_type",
        "value",
        F.lag("event_type").over(w).alias("pt"),
        F.lag("value").over(w).alias("pv"),
    )
    trials = p.where(
        F.col("pt").isNotNull()
        & (F.col("pt") != F.col("event_type"))
        & (F.col("pv") != F.col("value"))
    ).select(
        F.when(F.col("value") > F.col("pv"), F.col("event_type"))
        .otherwise(F.col("pt"))
        .alias("winner"),
        F.when(F.col("value") > F.col("pv"), F.col("pt"))
        .otherwise(F.col("event_type"))
        .alias("loser"),
    )
    ct = {
        (r["winner"], r["loser"]): r["n"]
        for r in trials.groupBy("winner", "loser")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    types = sorted({i for i, _ in ct} | {j for _, j in ct})
    wins = {i: sum(n for (a, _), n in ct.items() if a == i) for i in types}
    losses = {j: sum(n for (_, b), n in ct.items() if b == j) for j in types}
    sym = {}
    for (i, j), n in ct.items():
        sym[(i, j)] = sym.get((i, j), 0) + n
        sym[(j, i)] = sym.get((j, i), 0) + n
    s = {i: 1.0 for i in types}
    for _ in range(BT_ITERS):
        new = {}
        for i in types:
            denom = 0.0
            for j in types:  # opponent order pinned: types is sorted
                if (i, j) in sym:
                    denom = denom + sym[(i, j)] / (s[i] + s[j])
            new[i] = wins[i] / denom
        z = 0.0
        for i in types:
            z = z + new[i]
        s = {i: new[i] / z for i in types}
    return local_df(
        spark,
        [
            (i, wins[i], losses[i], math.floor(1000000 * s[i]))
            for i in types
        ],
        "event_type string, wins long, losses long, bt_micro long",
    )


def _bt_oracle_sql(n_iters: int) -> str:
    """DuckDB twin: identical trial extraction, then ``n_iters`` unrolled
    MM rounds with denominator terms folded in opponent order and the
    normalization folded in type order (both via ``list_reduce`` — the
    same left-fold the Python loop performs)."""
    parts = [
        """
        WITH p AS (
          SELECT event_type, value,
                 lag(event_type) OVER w AS pt,
                 lag(value) OVER w AS pv
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        ct AS MATERIALIZED (
          SELECT CASE WHEN value > pv THEN event_type ELSE pt END AS winner,
                 CASE WHEN value > pv THEN pt ELSE event_type END AS loser,
                 count(*) AS n
          FROM p
          WHERE pt IS NOT NULL AND pt != event_type AND pv != value
          GROUP BY 1, 2
        ),
        types AS MATERIALIZED (
          SELECT winner AS tpe FROM ct UNION SELECT loser FROM ct
        ),
        wl AS MATERIALIZED (
          SELECT t.tpe,
                 coalesce((SELECT sum(n) FROM ct WHERE winner = t.tpe), 0)
                   AS wins,
                 coalesce((SELECT sum(n) FROM ct WHERE loser = t.tpe), 0)
                   AS losses
          FROM types t
        ),
        sym AS MATERIALIZED (
          SELECT i, j, sum(n) AS n FROM (
            SELECT winner AS i, loser AS j, n FROM ct
            UNION ALL SELECT loser, winner, n FROM ct
          ) GROUP BY i, j
        ),
        s0 AS (SELECT tpe, CAST(1.0 AS DOUBLE) AS s FROM types)"""
    ]
    for k in range(1, n_iters + 1):
        parts.append(
            f"""
        , r{k} AS MATERIALIZED (
          SELECT p.i AS tpe,
                 any_value(w.wins) / list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list(p.n / (si.s + sj.s) ORDER BY p.j)),
                   (a, b) -> a + b) AS s
          FROM sym p
          JOIN s{k - 1} si ON si.tpe = p.i
          JOIN s{k - 1} sj ON sj.tpe = p.j
          JOIN wl w ON w.tpe = p.i
          GROUP BY p.i
        ),
        z{k} AS (
          SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                          list(s ORDER BY tpe)),
                             (a, b) -> a + b) AS z
          FROM r{k}
        ),
        s{k} AS MATERIALIZED (
          SELECT tpe, s / (SELECT z FROM z{k}) AS s FROM r{k}
        )"""
        )
    parts.append(
        f"""
        SELECT w.tpe AS event_type,
               CAST(w.wins AS BIGINT) AS wins,
               CAST(w.losses AS BIGINT) AS losses,
               CAST(floor(1000000 * s.s) AS BIGINT) AS bt_micro
        FROM wl w JOIN s{n_iters} s USING (tpe)"""
    )
    return "".join(parts)


QUERIES = {
    "bradley_terry_event_prefs": bradley_terry_event_prefs,
}

ORACLES: dict[str, str] = {
    "bradley_terry_event_prefs": _bt_oracle_sql(BT_ITERS),
}
