"""CSV/JSONL boundary tests: explicit-schema round-trips are bit-identical
to the parquet path, and the malformed-row policy behaves as declared
(quarantine captures raw lines; FAILFAST raises)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import (
    PHARMA_SCHEMAS,
    load_table,
)
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.sources.delimited import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_csv_round_trip_matches_parquet_path(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    p = str(tmp_path / "nation_csv")
    write_csv(src, p)
    back = read_csv(spark, p, src.schema)
    cols = src.columns
    assert back.schema == src.schema
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)


def test_jsonl_round_trip_matches_parquet_path(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "customer")
    p = str(tmp_path / "customer_jsonl")
    write_jsonl(src, p)
    back = read_jsonl(spark, p, src.schema)
    cols = src.columns
    # JSON drops no types here: longs/doubles/strings survive the declared
    # schema read (this is why the schema is mandatory, not inferred)
    assert back.schema == src.schema
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)


def test_csv_quarantine_captures_malformed_rows(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text(
        "product_id,product_name\n"
        "1,Xinoprozen\n"
        "not_an_int,Borkedol\n"
        "2,Clobromizen\n"
    )
    df = read_csv(spark, str(p), PHARMA_SCHEMAS["products"], quarantine=True)
    rows = df.collect()
    good = [r for r in rows if r[CORRUPT_COL] is None]
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert {r["product_id"] for r in good} == {1, 2}
    assert len(bad) == 1 and "not_an_int" in bad[0][CORRUPT_COL]


def test_csv_failfast_raises_on_malformed(spark, tmp_path):
    p = tmp_path / "bad2.csv"
    p.write_text("product_id,product_name\nnope,Borkedol\n")
    with pytest.raises(Exception):
        read_csv(spark, str(p), PHARMA_SCHEMAS["products"]).collect()


def test_jsonl_quarantine_captures_malformed_lines(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"product_id": 1, "product_name": "Xinoprozen"}\n'
        "this is not json\n"
        '{"product_id": 2, "product_name": "Clobromizen"}\n'
    )
    df = read_jsonl(spark, str(p), PHARMA_SCHEMAS["products"], quarantine=True)
    rows = df.collect()
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(bad) == 1 and "not json" in bad[0][CORRUPT_COL]
    assert {r["product_id"] for r in rows if r[CORRUPT_COL] is None} == {1, 2}


def test_csv_preserves_money_sums_exactly(spark, sf_dir, tmp_path):
    """Numeric fidelity through the text boundary: the DECIMAL money sum
    over orders is bit-identical before and after a CSV round-trip (doubles
    survive the text format losslessly via Spark's shortest-roundtrip
    formatting + declared-schema parse)."""
    src = load_table(spark, sf_dir, "orders")
    p = str(tmp_path / "orders_csv")
    write_csv(src, p)
    back = read_csv(spark, p, src.schema)
    assert back.count() == src.count()
    agg = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
    ).collect()
    assert agg(back) == agg(src)


def test_orc_round_trip_matches_parquet_path(spark, sf_dir, tmp_path):
    """ORC round-trip (built into Spark, the columnar alternative to
    parquet): declared-schema read equals the parquet-path frame exactly."""
    src = load_table(spark, sf_dir, "orders")
    p = str(tmp_path / "orders_orc")
    src.write.orc(p)
    back = spark.read.schema(src.schema).orc(p)
    assert back.schema == src.schema
    cols = src.columns
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)


def test_python_datasource_synth_docs(spark):
    """Custom Python DataSource (Spark 4): partition-parallel deterministic
    generation — same options, identical table; dense ids across
    partitions; and the generated frame composes with the engine's
    document operators."""
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators.textops import (
        token_counts,
    )
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.sources.pysource import (
        read_synth_docs,
    )

    df = read_synth_docs(spark, n_rows=50, n_parts=3)
    assert df.rdd.getNumPartitions() == 3
    rows = sorted((r["doc_id"], r["text"]) for r in df.collect())
    assert [i for i, _ in rows] == list(range(50))      # dense across partitions
    again = sorted((r["doc_id"], r["text"]) for r in read_synth_docs(
        spark, n_rows=50, n_parts=5).collect())
    assert [(i, t) for i, t in rows] == again           # partitioning-invariant
    # composes with the document operator surface
    tc = token_counts(df)
    assert tc.count() == 50
    assert tc.filter(F.col("ws_tokens") != 8).count() == 0
    # degenerate options: empty table (not a crash), clamped partitions
    assert read_synth_docs(spark, n_rows=0, n_parts=3).count() == 0
    assert read_synth_docs(spark, n_rows=5, n_parts=0).count() == 5
