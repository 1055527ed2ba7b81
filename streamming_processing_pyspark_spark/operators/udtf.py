"""Python UDTF surface (Spark 4 arrow-optimized table functions).

The reference has no UDTF (SURVEY.md §2.8: "No UDAF, no UDTF"); this
closes that gap with a lateral-join bigram expander — one input row fans
out to (pos, bigram) rows. UDTFs run arrow-batched in the Python worker;
for pure string ops like this the built-in ``posexplode(transform(...))``
composition is faster (and is what the shingle code in
``operators/dedup.py`` uses) — the
UDTF exists to prove the extension point with oracle-checked semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

Tables = dict[str, DataFrame]


def _register_bigrams(spark) -> None:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class BigramUDTF:
        def eval(self, text: str):
            ws = text.strip().split()
            for i in range(len(ws) - 1):
                yield i + 1, f"{ws[i]} {ws[i + 1]}"

    spark.udtf.register("bigrams", BigramUDTF)


def bigrams_udtf(t: Tables) -> DataFrame:
    """Lateral join each document against the bigram UDTF."""
    spark = t["documents"].sparkSession
    _register_bigrams(spark)
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM documents d, LATERAL bigrams(d.text) b
        """
    )


ORACLES: dict[str, str] = {
    "bigrams_udtf": """
        WITH w AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
          FROM documents
        )
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ws) - 1),
                 i -> {'pos': CAST(i AS INTEGER),
                       'bigram': ws[i] || ' ' || ws[i + 1]}),
                 recursive := true)
        FROM w
    """,
}

QUERIES = {
    "bigrams_udtf": bigrams_udtf,
}
