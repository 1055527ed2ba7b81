"""Markov removal-effect attribution over user journeys — the
absorbing-chain credit-assignment model (Anderl et al. 2014 "Mapping the
Customer Journey"): how much does each channel (event type) contribute
to conversion, measured by how much the conversion probability drops
when that channel is removed from the journey graph?

Journey model: per user, events ordered by ``(ts, event_id)`` and
truncated at the FIRST ``purchase`` (the conversion). Edges:
``START → first type``, consecutive ``type → type``, and a terminal
``purchase → CONV`` (converted) or ``last type → NULL`` (abandoned).
First-order transition probabilities come from the edge counts;
conversion probability is the absorbing-chain fixpoint
``p(s) = Σ_t P(s→t)·p(t)`` with ``p(CONV)=1, p(NULL)=0``, iterated a
fixed ``ATTR_ITERS`` rounds. Removal effect of channel ``c``: redirect
every edge INTO ``c`` to NULL, drop ``c``'s outgoing edges, re-solve;
``RE_c = 1 − p_removed(START)/p(START)``.

Determinism: the WHOLE solve is integer fixed-point — edge probabilities
quantized to ``n·SCALE DIV out``, per-round updates ``Σ q·p DIV SCALE``
(integer sums commute, so no fold-order pinning is even needed), and the
removal ratio one final integer division — Spark-driver Python and the
DuckDB unrolled oracle agree bit-for-bit, same contract class as
``pagerank_event_types``.

Scale shape: ONE corpus-sized stage — the per-user window + edge count
aggregation (the same single sort-shuffle as ``event_transitions``).
The fixpoint runs on the ≤(|types|+3)² edge matrix on the driver
(baseline + one scenario per channel), exactly the tiny-fixpoint
placement of the BPE/DoReMi/Bradley–Terry loops: iterating a ~7-state
chain as Spark jobs would serialize scenarios × rounds driver
round-trips over a frame thousands of times smaller than one task.

Reference scope note: the reference project (``/root/reference``,
Task2-4/Client.py) has no attribution surface; this extends the engine
for the training-data / analytics use case per SURVEY.md §7 phase 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tables import local_df

Tables = dict[str, DataFrame]

#: the conversion event
ATTR_CONV_TYPE = "purchase"

#: fixpoint rounds (geometric convergence; integer truncation makes the
#: iterate stationary well before this on small graphs)
ATTR_ITERS = 12

#: probability fixed-point scale
ATTR_SCALE = 1_000_000


def _journey_edges(t: Tables) -> DataFrame:
    """(from_state, to_state) → count over truncated user journeys."""
    ev = t["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("pos"),
    )
    firstp = pos.where(F.col("event_type") == ATTR_CONV_TYPE).groupBy(
        "user_id"
    ).agg(F.min("pos").alias("conv_pos"))
    kept = pos.join(firstp, "user_id", "left").where(
        F.col("conv_pos").isNull() | (F.col("pos") <= F.col("conv_pos"))
    )
    w2 = Window.partitionBy("user_id").orderBy("pos")
    steps = kept.select(
        "user_id",
        "pos",
        F.coalesce(F.lag("event_type").over(w2), F.lit("START")).alias(
            "from_state"
        ),
        F.col("event_type").alias("to_state"),
        F.max("pos").over(Window.partitionBy("user_id")).alias("last_pos"),
    )
    terminals = steps.where(F.col("pos") == F.col("last_pos")).select(
        F.col("to_state").alias("from_state"),
        F.when(
            F.col("to_state") == ATTR_CONV_TYPE, F.lit("CONV")
        ).otherwise(F.lit("NULL")).alias("to_state"),
    )
    return (
        steps.select("from_state", "to_state")
        .unionByName(terminals)
        .groupBy("from_state", "to_state")
        .agg(F.count("*").alias("n"))
    )


def _absorb_start(q: dict, states: list[str]) -> int:
    """Integer fixpoint: p(START) in ATTR_SCALE units after ATTR_ITERS."""
    p = {s: 0 for s in states}
    p["CONV"] = ATTR_SCALE
    p["NULL"] = 0
    for _ in range(ATTR_ITERS):
        new = dict(p)
        for s in states:
            if s in ("CONV", "NULL"):
                continue
            tot = 0
            for (f, to), qv in q.items():
                if f == s:
                    tot += qv * p.get(to, 0)
            new[s] = tot // ATTR_SCALE
        p = new
    return p.get("START", 0)


def markov_attribution(t: Tables) -> DataFrame:
    """Per-channel removal effect, integer fixed-point, bit-exact oracle.

    Output: one row per non-conversion channel — ``channel``,
    ``p_base_micro`` (baseline conversion probability from START),
    ``p_removed_micro`` (with the channel removed), ``removal_micro`` =
    ``1e6 − p_removed·1e6 DIV p_base`` (0 when the baseline is 0).
    """
    spark = t["events"].sparkSession
    edges = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in _journey_edges(t).collect()
    }
    out = {}
    for (f, _), n in edges.items():
        out[f] = out.get(f, 0) + n
    q = {ft: n * ATTR_SCALE // out[ft[0]] for ft, n in edges.items()}
    states = sorted(
        {f for f, _ in edges} | {to for _, to in edges} | {"CONV", "NULL"}
    )
    p_base = _absorb_start(q, states)
    channels = sorted(
        s
        for s in states
        if s not in ("START", "CONV", "NULL", ATTR_CONV_TYPE)
    )
    rows = []
    for c in channels:
        qc = {}
        for (f, to), qv in q.items():
            if f == c:
                continue
            qc[(f, "NULL" if to == c else to)] = (
                qc.get((f, "NULL" if to == c else to), 0) + qv
            )
        p_rem = _absorb_start(qc, states)
        removal = (
            ATTR_SCALE - (p_rem * ATTR_SCALE) // p_base if p_base > 0 else 0
        )
        rows.append((c, p_base, p_rem, removal))
    return local_df(
        spark,
        rows,
        "channel string, p_base_micro long, p_removed_micro long,"
        " removal_micro long",
    )


def _attr_rounds(scenario: str, q_cte: str) -> str:
    """Unrolled fixpoint CTEs for one scenario over edge table ``q_cte``
    (cols from_state, to_state, q)."""
    parts = [
        f"""
        , p_{scenario}_0 AS (
          SELECT s AS state,
                 CASE WHEN s = 'CONV' THEN {ATTR_SCALE} ELSE 0 END AS p
          FROM states
        )"""
    ]
    for i in range(1, ATTR_ITERS + 1):
        parts.append(
            f"""
        , p_{scenario}_{i} AS MATERIALIZED (
          SELECT st.s AS state,
                 CASE
                   WHEN st.s = 'CONV' THEN {ATTR_SCALE}
                   WHEN st.s = 'NULL' THEN 0
                   ELSE CAST(coalesce(sum(e.q * pp.p), 0)
                             // {ATTR_SCALE} AS BIGINT)
                 END AS p
          FROM states st
          LEFT JOIN {q_cte} e ON e.from_state = st.s
          LEFT JOIN p_{scenario}_{i - 1} pp ON pp.state = e.to_state
          GROUP BY st.s
        )"""
        )
    return "".join(parts)


def _attr_oracle_sql() -> str:
    """DuckDB twin: identical journey-edge construction, quantized edge
    probabilities, then the baseline + per-channel-removal fixpoints
    unrolled. Channels are data-dependent, so the scenario join keys the
    removal edge tables by channel (one generic removal CTE
    parameterized by the channel column) — the per-channel chains are
    expressed by carrying ``channel`` through every round."""
    rounds_base = _attr_rounds("b", "q")
    rounds_rem = ""
    for i in range(1, ATTR_ITERS + 1):
        prev = f"pr_{i - 1}"
        rounds_rem += f"""
        , pr_{i} AS MATERIALIZED (
          SELECT cs.channel, cs.s AS state,
                 CASE
                   WHEN cs.s = 'CONV' THEN {ATTR_SCALE}
                   WHEN cs.s = 'NULL' THEN 0
                   ELSE CAST(coalesce(sum(e.q * pp.p), 0)
                             // {ATTR_SCALE} AS BIGINT)
                 END AS p
          FROM chan_states cs
          LEFT JOIN qr e
            ON e.channel = cs.channel AND e.from_state = cs.s
          LEFT JOIN {prev} pp
            ON pp.channel = cs.channel AND pp.state = e.to_state
          GROUP BY cs.channel, cs.s
        )"""
    return f"""
        WITH pos AS MATERIALIZED (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS pos
          FROM events
        ),
        firstp AS (
          SELECT user_id, min(pos) AS conv_pos FROM pos
          WHERE event_type = '{ATTR_CONV_TYPE}' GROUP BY user_id
        ),
        kept AS MATERIALIZED (
          SELECT p.user_id, p.event_type, p.pos
          FROM pos p LEFT JOIN firstp f USING (user_id)
          WHERE f.conv_pos IS NULL OR p.pos <= f.conv_pos
        ),
        steps AS MATERIALIZED (
          SELECT user_id, pos,
                 coalesce(lag(event_type) OVER (PARTITION BY user_id
                                                ORDER BY pos),
                          'START') AS from_state,
                 event_type AS to_state,
                 max(pos) OVER (PARTITION BY user_id) AS last_pos
          FROM kept
        ),
        edges AS MATERIALIZED (
          SELECT from_state, to_state, count(*) AS n FROM (
            SELECT from_state, to_state FROM steps
            UNION ALL
            SELECT to_state AS from_state,
                   CASE WHEN to_state = '{ATTR_CONV_TYPE}' THEN 'CONV'
                        ELSE 'NULL' END AS to_state
            FROM steps WHERE pos = last_pos
          ) GROUP BY 1, 2
        ),
        outw AS (SELECT from_state, sum(n) AS outn FROM edges GROUP BY 1),
        q AS MATERIALIZED (
          SELECT e.from_state, e.to_state,
                 (e.n * {ATTR_SCALE}) // o.outn AS q
          FROM edges e JOIN outw o USING (from_state)
        ),
        states AS MATERIALIZED (
          SELECT DISTINCT s FROM (
            SELECT from_state AS s FROM edges
            UNION SELECT to_state FROM edges
            UNION SELECT 'CONV' UNION SELECT 'NULL'
          )
        ),
        channels AS MATERIALIZED (
          SELECT s AS channel FROM states
          WHERE s NOT IN ('START', 'CONV', 'NULL', '{ATTR_CONV_TYPE}')
        ),
        qr AS MATERIALIZED (
          SELECT c.channel, qq.from_state,
                 CASE WHEN qq.to_state = c.channel THEN 'NULL'
                      ELSE qq.to_state END AS to_state,
                 sum(qq.q) AS q
          FROM channels c JOIN q qq ON qq.from_state != c.channel
          GROUP BY 1, 2, 3
        ),
        chan_states AS MATERIALIZED (
          SELECT c.channel, s.s FROM channels c CROSS JOIN states s
        ),
        pr_0 AS (
          SELECT cs.channel, cs.s AS state,
                 CASE WHEN cs.s = 'CONV' THEN {ATTR_SCALE} ELSE 0 END AS p
          FROM chan_states cs
        ){rounds_base}{rounds_rem}
        , base AS (
          SELECT p AS p_base FROM p_b_{ATTR_ITERS} WHERE state = 'START'
        ),
        rem AS (
          SELECT channel, p AS p_rem FROM pr_{ATTR_ITERS}
          WHERE state = 'START'
        )
        SELECT r.channel,
               CAST(b.p_base AS BIGINT) AS p_base_micro,
               CAST(r.p_rem AS BIGINT) AS p_removed_micro,
               CAST(CASE WHEN b.p_base > 0
                         THEN {ATTR_SCALE} - (r.p_rem * {ATTR_SCALE})
                              // b.p_base
                         ELSE 0 END AS BIGINT) AS removal_micro
        FROM rem r, base b
    """


QUERIES = {
    "markov_attribution": markov_attribution,
}

ORACLES: dict[str, str] = {
    "markov_attribution": _attr_oracle_sql(),
}
