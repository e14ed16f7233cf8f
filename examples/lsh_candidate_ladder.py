"""r6 ladder instrumentation: candidate volume for the two corpus-derived
near-dup indexes, per rung (VERDICT ask #2's "Done" clause — candidate
counts recorded at sf0.1/sf1/sf10).

For each sf_dir argument, prints one JSON line per family with the
derived parameters, the DISTINCT candidate-pair count (the quantity that
must stay ~linear in n for the index to survive 100 TB — it is what the
verify stage pays for), and the confirmed output rows.

Usage: python examples/lsh_candidate_ladder.py DIR [DIR ...]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.catalog import load_table  # noqa: E402
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.operators import dedup, similarity  # noqa: E402


def simhash_row(spark: SparkSession, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    b = dedup.derive_sim_blocks(n)
    t0 = time.time()
    keys = dedup.simhash64_blocks(dedup.simhash64(docs), b)
    a, bb = keys.alias("a"), keys.alias("b")
    cands = (
        a.join(
            bb,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    out = dedup.simhash_near_dups(docs, n_override=n).count()
    return {
        "family": "simhash_near_dups",
        "sf_dir": sf_dir,
        "n_docs": n,
        "blocks": b,
        "tables": len(dedup.sim_key_tables(b)),
        "weakest_key_bits": dedup.sim_min_key_bits(b),
        "candidates": cands,
        "output_rows": out,
        "cand_per_doc": round(cands / n, 3),
        "sec": round(time.time() - t0, 1),
    }


def embedding_row(spark: SparkSession, sf_dir: str) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    planes, kbits, masks = similarity.derive_neardup_params(n)
    t0 = time.time()
    coded = emb.select(
        "vec_id", similarity.neardup_code_col(F.col("embedding"), planes).alias("code")
    )
    tables = F.array(
        *[
            F.struct(
                F.lit(l).cast("int").alias("tbl"),
                F.col("code").bitwiseAND(F.lit(m).cast("long")).alias("mkey"),
            )
            for l, m in enumerate(masks)
        ]
    )
    keys = coded.select("vec_id", F.explode(tables).alias("kv")).select(
        "vec_id", "kv.tbl", "kv.mkey"
    )
    a, b = keys.alias("a"), keys.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.mkey") == F.col("b.mkey"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )
    out = similarity.embedding_near_dups(emb, n_override=n).count()
    return {
        "family": "embedding_near_dups",
        "sf_dir": sf_dir,
        "n_vecs": n,
        "planes": planes,
        "kbits": kbits,
        "tables": len(masks),
        "candidates": cands,
        "output_rows": out,
        "cand_per_vec": round(cands / n, 3),
        "sec": round(time.time() - t0, 1),
    }


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("lsh_candidate_ladder")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        print(json.dumps(simhash_row(spark, d)))
        print(json.dumps(embedding_row(spark, d)))
    spark.stop()
