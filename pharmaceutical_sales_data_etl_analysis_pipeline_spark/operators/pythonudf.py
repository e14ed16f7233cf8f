"""Python UDF surface (SURVEY.md §2.10): Arrow-batched scalar pandas_udf and
grouped-map applyInPandas, each with an exact SQL oracle — demonstrating
that the Python escape hatch preserves engine determinism when it avoids
float re-association (string ops and exact sorts only here).

Both operators choose work that built-ins could express — deliberately, so
the oracle can verify the Python path bit-for-bit. Real uses (custom
tokenizers, model scoring) swap the body, not the plumbing.

Worker pickling rule: every function shipped to executors is defined inside
its builder so cloudpickle serializes by value (workers don't have this
package on sys.path under the driver's vanilla session).

NOTE: no `from __future__ import annotations` here — deferred (string)
annotations break pandas_udf's signature inspection.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table

TOPK_PER_TYPE = 3


# ---------------------------------------------------------------------------
# Scalar pandas_udf: vectorized text normalization (lower, trim, collapse
# whitespace) — one Arrow batch in, one out.
# ---------------------------------------------------------------------------

def pandas_normalized_text(documents: DataFrame) -> DataFrame:
    def build_udf():
        import pandas as pd

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def norm(s: pd.Series) -> pd.Series:
            # strip(' ') not strip(): bare strip removes tabs/newlines too,
            # while the oracle's trim(text) removes only spaces
            return s.str.lower().str.strip(" ").str.replace(r"\s+", " ", regex=True)

        return norm

    norm = build_udf()
    return documents.select(
        "doc_id",
        norm(F.col("text")).alias("norm_text"),
        F.length(norm(F.col("text"))).cast("int").alias("norm_len"),
    )


def q_pandas_normalized_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pandas_normalized_text(load_table(spark, sf_dir, "documents"))


SQL_PANDAS_NORMALIZED_TEXT = """
SELECT doc_id,
       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm_text,
       CAST(length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS INT) AS norm_len
FROM documents
"""


# ---------------------------------------------------------------------------
# Grouped-map applyInPandas: per-event-type top-3 by (value desc, event_id
# asc) computed with a pandas sort inside each group. Exact tie-break order
# makes the result identical to the window-function oracle.
# ---------------------------------------------------------------------------

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("rnk", T.IntegerType()),
    ]
)


def grouped_pandas_topk(events: DataFrame, k: int = TOPK_PER_TYPE) -> DataFrame:
    def build_fn(k: int):
        def topk(pdf):
            import pandas as pd  # noqa: F401

            out = pdf.sort_values(
                ["value", "event_id"], ascending=[False, True]
            ).head(k)
            out = out.assign(rnk=range(1, len(out) + 1))
            return out[["event_type", "event_id", "value", "rnk"]]

        return topk

    return (
        events.select("event_type", "event_id", "value")
        .groupBy("event_type")
        .applyInPandas(build_fn(k), TOPK_SCHEMA)
    )


def q_grouped_pandas_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grouped_pandas_topk(load_table(spark, sf_dir, "events"))


SQL_GROUPED_PANDAS_TOPK = f"""
SELECT event_type, event_id, value, CAST(rnk AS INT) AS rnk
FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) AS rnk
  FROM events
) t
WHERE rnk <= {TOPK_PER_TYPE}
"""


QUERIES = {
    "pandas_normalized_text": q_pandas_normalized_text,
    "grouped_pandas_topk": q_grouped_pandas_topk,
}

ORACLES = {
    "pandas_normalized_text": SQL_PANDAS_NORMALIZED_TEXT,
    "grouped_pandas_topk": SQL_GROUPED_PANDAS_TOPK,
}
