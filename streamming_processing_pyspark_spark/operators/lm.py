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
- :func:`bpe_learn_merges` — the full Sennrich et al. (2016) training
  loop run to a fixed merge budget: ONE distributed word-frequency
  aggregation, then the strictly-sequential merge iterations on the
  ``BPE_VOCAB_CAP``-bounded frequency table (see its docstring for why
  per-merge Spark jobs would be the wrong plan at any scale).
- :func:`bpe_encode_stats` — the corpus-sized other half: apply the
  learned merge table back to every document (merge folds once per
  DISTINCT word, broadcast join to per-doc word counts) and account
  tokens/chars/words per document.
- :func:`tokenizer_fertility` — per-language tokens-per-word /
  chars-per-token under the trained tokenizer, THE standard
  multilingual tokenizer-quality diagnostic.

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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tables import local_df

from ..functions.text import words

Tables = dict[str, DataFrame]

#: how many merge candidates the BPE step reports
BPE_TOP_K = 20

#: how many merges :func:`bpe_learn_merges` learns (the oracle unrolls the
#: same number of iterations, so keep them in lockstep)
BPE_MERGES = 8

#: vocabulary cap for the merge loop: the word-frequency table is truncated
#: to the top ``BPE_VOCAB_CAP`` words by ``(n_w DESC, w)`` — fully
#: deterministic — before the merge iterations. Every production BPE
#: trainer bounds the word table this way (min-frequency / vocab
#: truncation); it is what makes the loop state corpus-size-independent.
#: 2**16 never binds at test scale (sf0.01 vocabulary: 31 words).
BPE_VOCAB_CAP = 65536

#: PMI collocations: minimum bigram occurrences and report size
PMI_MIN_COUNT = 5
PMI_TOPK = 20


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
    from ..tables import persist_replacing

    # g feeds THREE consumers (the c12/c1 count tables and the terms
    # join) — pinned, or each re-runs the corpus scan + bigram explode
    # (the executed plan showed 4 documents scans; with the pin, 2:
    # this one and the vocab distinct)
    g = persist_replacing(
        occ.groupBy("doc_id", "bg", "w1").agg(
            F.count("*").alias("m"), F.min("pos").alias("p")
        ),
        "lm_bigram_g",
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


def _apply_merge(syms, a: str, b: str):
    """Column: ``syms`` with every left-to-right non-overlapping ``(a, b)``
    adjacency merged into ``a || b`` — the BPE merge-application rule.

    Implemented as a single ``aggregate`` fold (one narrow projection, no
    shuffle): append each symbol unless the running list ends in ``a`` and
    the symbol is ``b``, in which case replace that tail with the merged
    token. The fold is equivalent to the greedy two-pointer scan: after a
    replacement the new tail is ``a || b`` which can never equal ``a``
    (``b`` is non-empty), so a just-merged token is never re-consumed —
    exactly the non-overlap rule. Literals go through ``F.lit``, never
    string-formatted SQL, so data-derived tokens can't break the
    expression.
    """
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn_merges(t: Tables) -> DataFrame:
    """The full BPE training loop: learn ``BPE_MERGES`` merges in order.

    Output: ``merge_rank``, ``pair_left``, ``pair_right``, ``freq`` — the
    Sennrich et al. (2016) byte-pair-encoding algorithm run to a fixed
    merge budget. Per iteration: count adjacent symbol pairs weighted by
    word frequency, pick the most frequent (ties: smaller left then right
    symbol — fully deterministic), merge it everywhere, repeat. Stops
    early if no pair remains.

    Scale: BPE training has ONE corpus-sized stage — the word-frequency
    aggregation (map-side combined shuffle, fixed-width keys) — and the
    merge loop itself is vocabulary-sized, so the two run on different
    substrates. The count runs distributed; the frequency table is then
    truncated to the top ``BPE_VOCAB_CAP`` words (``TakeOrdered``
    per-partition heaps, never a global sort) and the strictly-sequential
    merge loop runs over that bounded table on the driver. Running each
    merge as its own Spark job would be the WRONG plan at any scale: a
    real 30k-merge vocabulary would serialize 30k driver-synchronized
    jobs over a table that is orders of magnitude smaller than the
    corpus (measured here: 8 distributed rounds = 18 s vs 3 s total for
    the same result). The count/loop split plus the deterministic vocab
    cap is exactly how production BPE trainers are built, and is why BPE
    tokenizers can be trained on a 100 TB crawl at all. Applying the
    learned merges back to the corpus IS corpus-sized — that is
    :func:`bpe_encode_stats`, a distributed map-only pass.

    All counts are integers and the tie-breaks are total (argmax by
    ``freq DESC, l, r``; cap by ``n_w DESC, w``), so the result is
    bit-exact; the DuckDB oracle replays the identical iterations with a
    recursive-CTE merge application under the same cap.
    """
    spark = t["documents"].sparkSession
    wf = (
        t["documents"]
        .select(F.explode(words("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n_w"))
        .orderBy(F.col("n_w").desc(), "w")
        .limit(BPE_VOCAB_CAP)
        .collect()
    )
    return local_df(
        spark,
        _learn_from_wf([(r["w"], r["n_w"]) for r in wf]),
        "merge_rank int, pair_left string, pair_right string, freq long",
    )


def _learn_from_wf(
    wf: list[tuple[str, int]],
) -> list[tuple[int, str, str, int]]:
    """The sequential merge loop over a (word, frequency) table — the
    vocabulary-sized half of BPE training shared by
    :func:`bpe_learn_merges` and :func:`bpe_encode_stats`."""
    vocab: list[tuple[tuple[str, ...], int]] = [
        (tuple(w), n_w) for w, n_w in wf
    ]
    learned: list[tuple[int, str, str, int]] = []
    for rank in range(1, BPE_MERGES + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, n_w in vocab:
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + n_w
        if not counts:
            break
        (a, b), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        learned.append((rank, a, b, freq))
        vocab = [(_merge_word(syms, a, b), n_w) for syms, n_w in vocab]
    return learned


def bpe_encode_stats(t: Tables) -> DataFrame:
    """Apply the learned BPE merge table back to the corpus: per-document
    size accounting under the trained tokenizer.

    Output: ``doc_id``, ``n_chars`` (non-whitespace characters),
    ``n_tokens`` (BPE tokens after ``BPE_MERGES`` merges), ``n_words``
    (whitespace tokens). ``n_tokens / n_chars`` is the tokenizer's
    compression ratio — the number a data-mixing / context-packing stage
    actually budgets with (cf. :func:`pipeline.token_pack_bins`).

    Scale: this is the corpus-sized half of BPE (cf.
    :func:`bpe_learn_merges` for the split). The merge table itself is
    tiny and is baked into the plan as literals; the merge APPLICATION
    runs once per DISTINCT word — a vocabulary-sized narrow projection of
    chained :func:`_apply_merge` folds, never per occurrence — and the
    per-occurrence work is one broadcast hash join of the word→token-count
    table (vocabulary-sized, fits any executor) against the per-document
    word counts. The whole operator is ONE corpus scan: the learn-side
    word-frequency table is DERIVED from the persisted per-(doc, word)
    counts (``groupBy(w)`` over the already-reduced frame, byte-identical
    to :func:`bpe_learn_merges`'s own scan including empty-token cap
    slots), so training and application never re-read the corpus. All
    integers — bit-exact vs the oracle.
    """
    from ..tables import persist_replacing

    dw0 = persist_replacing(
        t["documents"]
        .select("doc_id", F.explode(words("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt")),
        "bpe_encode_dw",
    )
    wf = (
        dw0.groupBy("w")
        .agg(F.sum("cnt").alias("n_w"))
        .orderBy(F.col("n_w").desc(), "w")
        .limit(BPE_VOCAB_CAP)
        .collect()
    )
    merges = [
        (a, b) for _, a, b, _ in _learn_from_wf([(r["w"], r["n_w"]) for r in wf])
    ]
    dw = dw0.where(F.length("w") > 0)
    syms = F.expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
    )
    for a, b in merges:
        syms = _apply_merge(syms, a, b)
    wtok = dw.select("w").distinct().select("w", F.size(syms).alias("n_tok"))
    return (
        dw.join(F.broadcast(wtok), "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.length("w")).alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_tok")).alias("n_tokens"),
            F.sum("cnt").alias("n_words"),
        )
    )


def tokenizer_fertility(t: Tables) -> DataFrame:
    """Per-language fertility of the corpus-trained BPE tokenizer.

    Output: ``lang``, ``n_docs``, ``n_tokens``, ``n_words``,
    ``fertility_micro`` = ``floor(1e6 · tokens/word)`` and
    ``compression_micro`` = ``floor(1e6 · chars/token)``. Fertility —
    how many subword tokens the tokenizer spends per whitespace word —
    is THE standard per-language tokenizer-quality diagnostic: a
    tokenizer trained on an en-heavy mix shows inflated fertility on the
    under-represented languages, which directly multiplies their
    training/inference cost. Composes :func:`bpe_encode_stats` (corpus
    scan + vocabulary-sized merge application) with one broadcast-sized
    per-language rollup; docs with zero words carry no tokens and are
    excluded by construction. All-integer (micro ratios via ``DIV``) —
    bit-exact vs the oracle.
    """
    enc = bpe_encode_stats(t)
    return (
        enc.join(t["documents"].select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_chars").alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_words",
            F.expr("n_tokens * 1000000 DIV n_words").alias("fertility_micro"),
            F.expr("n_chars * 1000000 DIV n_tokens").alias(
                "compression_micro"
            ),
        )
    )


def _merge_word(
    syms: tuple[str, ...], a: str, b: str
) -> tuple[str, ...]:
    """Greedy left-to-right non-overlapping merge of ``(a, b)`` adjacencies
    — the same rule as the :func:`_apply_merge` Column fold and the
    oracle's recursive CTE."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _bpe_learn_ctes(n_merges: int) -> list[str]:
    """Shared CTE prefix for both BPE oracles: capped word frequencies,
    then per merge ``k`` a pair count → deterministic argmax (``b{k}``) →
    recursive-CTE greedy merge application (one row per (word, scan
    position), terminal state at ``i = len + 1``) yielding vocabulary
    state ``v{k}``. An empty argmax (corpus exhausted) leaves the
    vocabulary unchanged and contributes no output row — the same
    early-stop the Spark loop takes. The ``BPE_VOCAB_CAP`` truncation is
    mirrored with the same total ``(n_w DESC, w)`` order."""
    parts = [
        rf"""
        WITH RECURSIVE wf AS MATERIALIZED (
          SELECT w, count(*) AS n_w FROM (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents
          ) GROUP BY w
          ORDER BY n_w DESC, w LIMIT {BPE_VOCAB_CAP}
        ),
        v0 AS MATERIALIZED (
          SELECT n_w,
                 list_transform(generate_series(1, length(w)),
                                i -> substring(w, i, 1)) AS syms
          FROM wf
        )"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f"""
        , p{k} AS MATERIALIZED (
          SELECT unnest(list_transform(
                   generate_series(1, len(syms) - 1),
                   i -> {{'l': syms[i], 'r': syms[i + 1]}})) AS p,
                 n_w
          FROM v{k - 1} WHERE len(syms) >= 2
        ),
        b{k} AS MATERIALIZED (
          SELECT p.l AS l, p.r AS r, sum(n_w) AS freq
          FROM p{k} GROUP BY 1, 2
          ORDER BY freq DESC, l, r LIMIT 1
        ),
        s{k} AS (
          SELECT n_w, syms, 1 AS i, CAST([] AS VARCHAR[]) AS out
          FROM v{k - 1}
          UNION ALL
          SELECT n_w, syms,
                 CASE WHEN i < len(syms)
                           AND syms[i] = (SELECT l FROM b{k})
                           AND syms[i + 1] = (SELECT r FROM b{k})
                      THEN i + 2 ELSE i + 1 END,
                 CASE WHEN i < len(syms)
                           AND syms[i] = (SELECT l FROM b{k})
                           AND syms[i + 1] = (SELECT r FROM b{k})
                      THEN list_append(out, syms[i] || syms[i + 1])
                      ELSE list_append(out, syms[i]) END
          FROM s{k} WHERE i <= len(syms)
        ),
        v{k} AS MATERIALIZED (SELECT n_w, out AS syms FROM s{k} WHERE i = len(syms) + 1)"""
        )
    return parts


def _bpe_oracle_sql(n_merges: int) -> str:
    """DuckDB twin of :func:`bpe_learn_merges`: the learn-chain CTEs, then
    one output row per non-empty argmax ``b{k}``."""
    parts = _bpe_learn_ctes(n_merges)
    union = "\n          UNION ALL ".join(
        f"SELECT {k} AS merge_rank, l AS pair_left, r AS pair_right,"
        f" CAST(freq AS BIGINT) AS freq FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    parts.append(f"\n        {union}")
    return "".join(parts)


def _bpe_apply_ctes(n_merges: int) -> list[str]:
    """Learn-chain CTEs plus the merge application replayed over ALL
    distinct non-empty corpus words (``u0 → u{k}`` — the learn chain's
    ``v{k}`` only covers the capped vocabulary), keyed back to documents
    through the ``dw`` word-occurrence counts. An empty ``b{k}`` (corpus
    exhausted before ``n_merges``) makes round ``k`` a no-op — NULL never
    equals a symbol — matching the Spark loop's early stop."""
    parts = _bpe_learn_ctes(n_merges)
    parts.append(
        r"""
        , dw AS MATERIALIZED (
          SELECT doc_id, w, count(*) AS cnt FROM (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents
          ) WHERE length(w) > 0 GROUP BY doc_id, w
        ),
        u0 AS MATERIALIZED (
          SELECT w, list_transform(generate_series(1, length(w)),
                                   i -> substring(w, i, 1)) AS syms
          FROM (SELECT DISTINCT w FROM dw)
        )"""
    )
    for k in range(1, n_merges + 1):
        parts.append(
            f"""
        , a{k} AS (
          SELECT w, syms, 1 AS i, CAST([] AS VARCHAR[]) AS out
          FROM u{k - 1}
          UNION ALL
          SELECT w, syms,
                 CASE WHEN i < len(syms)
                           AND syms[i] = (SELECT l FROM b{k})
                           AND syms[i + 1] = (SELECT r FROM b{k})
                      THEN i + 2 ELSE i + 1 END,
                 CASE WHEN i < len(syms)
                           AND syms[i] = (SELECT l FROM b{k})
                           AND syms[i + 1] = (SELECT r FROM b{k})
                      THEN list_append(out, syms[i] || syms[i + 1])
                      ELSE list_append(out, syms[i]) END
          FROM a{k} WHERE i <= len(syms)
        ),
        u{k} AS MATERIALIZED (SELECT w, out AS syms FROM a{k} WHERE i = len(syms) + 1)"""
        )
    return parts


def _bpe_encode_oracle_sql(n_merges: int) -> str:
    """DuckDB twin of :func:`bpe_encode_stats`: the apply-chain CTEs and a
    per-document rollup through the word-occurrence counts."""
    parts = _bpe_apply_ctes(n_merges)
    parts.append(
        f"""
        SELECT dw.doc_id,
               CAST(sum(dw.cnt * length(dw.w)) AS BIGINT) AS n_chars,
               CAST(sum(dw.cnt * len(u.syms)) AS BIGINT) AS n_tokens,
               CAST(sum(dw.cnt) AS BIGINT) AS n_words
        FROM dw JOIN u{n_merges} u USING (w)
        GROUP BY dw.doc_id"""
    )
    return "".join(parts)


def _bpe_fertility_oracle_sql(n_merges: int) -> str:
    """DuckDB twin of :func:`tokenizer_fertility`: the apply-chain CTEs, a
    per-document rollup, then the per-language aggregate through
    ``documents.lang``."""
    parts = _bpe_apply_ctes(n_merges)
    parts.append(
        f"""
        , enc AS (
          SELECT dw.doc_id,
                 sum(dw.cnt * length(dw.w)) AS n_chars,
                 sum(dw.cnt * len(u.syms)) AS n_tokens,
                 sum(dw.cnt) AS n_words
          FROM dw JOIN u{n_merges} u USING (w)
          GROUP BY dw.doc_id
        )
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(enc.n_tokens) AS BIGINT) AS n_tokens,
               CAST(sum(enc.n_words) AS BIGINT) AS n_words,
               CAST(sum(enc.n_tokens) * 1000000
                    // sum(enc.n_words) AS BIGINT) AS fertility_micro,
               CAST(sum(enc.n_chars) * 1000000
                    // sum(enc.n_tokens) AS BIGINT) AS compression_micro
        FROM enc JOIN documents d USING (doc_id)
        GROUP BY d.lang"""
    )
    return "".join(parts)


ORACLES: dict[str, str] = {
    "bpe_learn_merges": _bpe_oracle_sql(BPE_MERGES),
    "bpe_encode_stats": _bpe_encode_oracle_sql(BPE_MERGES),
    "tokenizer_fertility": _bpe_fertility_oracle_sql(BPE_MERGES),
    "bigram_pmi_topk": rf"""
        WITH d AS MATERIALIZED (
          SELECT string_split_regex(trim(text), '\s+') AS ws
          FROM documents
        ),
        uni AS MATERIALIZED (
          SELECT w, count(*) AS c
          FROM (SELECT unnest(ws) AS w FROM d) GROUP BY w
        ),
        bi AS (
          SELECT o.w1 AS w1, o.w2 AS w2, count(*) AS c_xy
          FROM (
            SELECT unnest(list_transform(
              generate_series(1, len(ws) - 1),
              i -> {{'w1': ws[i], 'w2': ws[i + 1]}})) AS o
            FROM d WHERE len(ws) >= 2
          ) GROUP BY 1, 2
          HAVING count(*) >= {PMI_MIN_COUNT}
        ),
        nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uni),
        nb AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_bi FROM bi),
        scored AS (
          SELECT concat(b.w1, ' ', b.w2) AS bg,
                 b.c_xy,
                 CAST(floor(1000000.0 * ln(
                   (CAST(b.c_xy AS DOUBLE) * CAST(nu.n_uni AS DOUBLE)
                    * CAST(nu.n_uni AS DOUBLE))
                   / (CAST(nb.n_bi AS DOUBLE) * CAST(u1.c AS DOUBLE)
                      * CAST(u2.c AS DOUBLE))
                 )) AS BIGINT) AS pmi_micro
          FROM bi b
          JOIN uni u1 ON b.w1 = u1.w
          JOIN uni u2 ON b.w2 = u2.w
          CROSS JOIN nu CROSS JOIN nb
        )
        SELECT bg, c_xy, pmi_micro,
               CAST(row_number() OVER (ORDER BY pmi_micro DESC, bg)
                    AS INTEGER) AS rk
        FROM scored
        ORDER BY pmi_micro DESC, bg
        LIMIT {PMI_TOPK}
    """,
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

def bigram_pmi_topk(t: Tables) -> DataFrame:
    """Top collocations by pointwise mutual information —
    ``PMI(x,y) = ln(P(xy) / (P(x)·P(y)))`` over corpus bigram vs unigram
    occurrence frequencies, the classic phrase-mining / tokenizer-merge
    signal (complements ``bpe_merge_candidates``' raw counts: PMI finds
    pairs that co-occur MORE than their parts' popularity predicts).

    One corpus scan feeds both count tables (the token-array frame is
    pinned; unigram and bigram explodes both read it); the PMI term is
    the usual single quarantined ``ln`` of a ratio of exactly-repre-
    sented doubles, and — unlike a raw float ordering — the top-k is
    taken on the FLOORED ``pmi_micro`` with the bigram string as
    tie-break, so the ranking the driver hashes is a pure integer/string
    sort. ``c_xy ≥ PMI_MIN_COUNT`` applies the standard sparse-PMI
    guard.

    Output (``PMI_TOPK`` rows): ``bg``, ``c_xy``, ``pmi_micro``, ``rk``.
    """
    from ..tables import persist_replacing

    d = persist_replacing(
        t["documents"].select(words("text").alias("ws")), "pmi_ws"
    )
    uni = d.select(F.explode("ws").alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    uni = persist_replacing(uni, "pmi_uni")
    bi = (
        d.where(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 2),"
                    " i -> named_struct('w1', ws[i], 'w2', ws[i + 1]))"
                )
            ).alias("o")
        )
        .groupBy(F.col("o.w1").alias("w1"), F.col("o.w2").alias("w2"))
        .agg(F.count("*").alias("c_xy"))
        .where(F.col("c_xy") >= PMI_MIN_COUNT)
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_bi = bi.agg(F.sum("c_xy").alias("n_bi"))
    c1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    pmi = F.floor(
        F.lit(1000000.0)
        * F.log(
            (
                F.col("c_xy").cast("double")
                * F.col("n_uni").cast("double")
                * F.col("n_uni").cast("double")
            )
            / (
                F.col("n_bi").cast("double")
                * F.col("c_x").cast("double")
                * F.col("c_y").cast("double")
            )
        )
    ).cast("long")
    scored = (
        bi.join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bg"),
            "c_xy",
            pmi.alias("pmi_micro"),
        )
    )
    w_rk = Window.orderBy(F.col("pmi_micro").desc(), "bg")
    return (
        scored.orderBy(F.col("pmi_micro").desc(), "bg")
        .limit(PMI_TOPK)
        .select(
            "bg",
            "c_xy",
            "pmi_micro",
            F.row_number().over(w_rk).cast("int").alias("rk"),
        )
    )


QUERIES = {
    "lm_bigram_nll": lm_bigram_nll,
    "bigram_pmi_topk": bigram_pmi_topk,
    "bpe_merge_candidates": bpe_merge_candidates,
    "bpe_learn_merges": bpe_learn_merges,
    "bpe_encode_stats": bpe_encode_stats,
    "tokenizer_fertility": tokenizer_fertility,
}
