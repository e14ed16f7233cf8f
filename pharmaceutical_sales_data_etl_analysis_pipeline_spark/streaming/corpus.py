"""Streaming corpus-prep gate: continuous training-data ingestion.

The per-row corpus signals (token count, quality score, language ID) are
pure projections, so the exact batch expressions from operators/textops
stream unchanged — stateless, watermark-free. The exact-dedup stage is
streaming dropDuplicates on the content fingerprint: state holds one md5
per surviving document. The synthetic documents table carries no event
time; a production stream would add `.withWatermark(event_time, ttl)` (or
dropDuplicatesWithinWatermark) to bound that state — noted here because an
unbounded key space is the one thing that distinguishes this plan from its
batch twin (operators/corpusops.training_corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.corpusops import CORPUS_MIN_QUALITY, CORPUS_MIN_TOKENS
from ..operators.textops import predicted_lang_col, quality_score_col, ws_tokens_col


def corpus_gate_stream(doc_stream: DataFrame) -> DataFrame:
    """documents stream → quality-gated, exact-deduped training candidates
    (doc_id, ws_tokens, quality_score, fingerprint)."""
    t = F.col("text")
    fingerprint = F.md5(F.regexp_replace(F.lower(F.trim(t)), r"\s+", " "))
    return (
        doc_stream.select(
            "doc_id",
            ws_tokens_col(t).alias("ws_tokens"),
            quality_score_col(t).alias("quality_score"),
            predicted_lang_col(t).alias("predicted_lang"),
            fingerprint.alias("fingerprint"),
        )
        .filter(
            (F.col("predicted_lang") == "en")
            & (F.col("quality_score") >= CORPUS_MIN_QUALITY)
            & (F.col("ws_tokens") >= CORPUS_MIN_TOKENS)
        )
        .dropDuplicates(["fingerprint"])
        .select("doc_id", "ws_tokens", "quality_score", "fingerprint")
    )
