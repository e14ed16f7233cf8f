#!/usr/bin/env python3
"""Training-data pipeline demo: the LLM corpus-prep flow end-to-end over
the documents/embeddings tables — the north-star extension surface
(SURVEY.md §North-star) a 100 TB training pipeline runs daily:

  1. corpus hygiene: token counts, quality scores, language ID
  2. dedup: exact (content hash), MinHash-LSH candidates, near-dup
     components, survivor selection
  3. contamination: benchmark shingle overlap
  4. the final training_corpus composition + shard histogram

Usage:
  python examples/corpus_prep_demo.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.registry import all_queries
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-prep-demo")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    print("== 1. Hygiene: quality / language / tokens ==")
    q["text_quality"](spark, sf_dir).show(5)
    q["lang_id"](spark, sf_dir).groupBy("predicted_lang").count().show()

    print("== 2. Dedup: exact / LSH candidates / components / survivors ==")
    q["exact_dedup"](spark, sf_dir).show(5)
    q["minhash_lsh_candidates"](spark, sf_dir).show(5)
    q["dedup_survivors"](spark, sf_dir).filter("NOT keep").show(5)

    print("== 3. Contamination vs benchmark subset ==")
    q["contamination_check"](spark, sf_dir).orderBy("doc_id").show(5)

    print("== 4. Final corpus + shards ==")
    corpus = q["training_corpus"](spark, sf_dir)
    print(f"training corpus: {corpus.count()} docs")
    q["shard_histogram"](spark, sf_dir).orderBy("shard").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
