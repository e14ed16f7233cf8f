"""Delimited/text sources & sinks: CSV and JSON-lines with explicit
schemas (never inferSchema in a production path — one bad row silently
retypes a column and breaks every downstream cast).

The reference ingests only XML (LoadXML2DB.ChatterjeeP.R:10) and speaks
JDBC to databases; a user switching engines still needs the everyday file
boundaries. Both readers here take the same fixed StructTypes the rest of
the engine uses (catalog.SCHEMAS), so a CSV/JSON round-trip is
bit-identical to the parquet path.

Malformed-row policy is explicit, not defaulted: PERMISSIVE captures bad
lines in a `_corrupt` column for quarantine (the corpus-prep posture:
never drop data silently, route it to a review table), FAILFAST for
pipelines that prefer to die loudly. DROPMALFORMED is deliberately not
offered — silent row loss is how corpora drift.

Scale: both formats split by file and (CSV/JSONL being line-delimited)
by range within a file, so reads parallelize like parquet minus the
columnar pruning — these are *ingest* boundaries; data lands in parquet
(write side of ingest_csv/ingest_jsonl) before analytics run over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    quarantine: bool = False,
) -> DataFrame:
    """CSV scan with a declared schema. quarantine=True adds a `_corrupt`
    column holding each unparseable raw line (PERMISSIVE); otherwise any
    malformed row fails the job (FAILFAST)."""
    reader = (
        spark.read.schema(_with_corrupt(schema) if quarantine else schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE" if quarantine else "FAILFAST")
    )
    if quarantine:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    quarantine: bool = False,
) -> DataFrame:
    """JSON-lines scan with a declared schema (one object per line — the
    multiLine=false default keeps the file splittable)."""
    reader = spark.read.schema(
        _with_corrupt(schema) if quarantine else schema
    ).option("mode", "PERMISSIVE" if quarantine else "FAILFAST")
    if quarantine:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
