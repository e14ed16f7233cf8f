"""Driver-conditions gate inside pytest: run the public contract from a
FRESH subprocess, cwd=/tmp, with a bare vanilla SparkSession (not the
package's tuned one).

Why: Python-executed kernels (pandas_udf / mapInPandas / UDTF /
DataSource classes) defined at module level pickle BY REFERENCE and die
in vanilla-session workers with ModuleNotFoundError — a failure class
that repo-cwd pytest with the tuned session cannot see (hit by
skyline_parts and the UDTF in earlier rounds; verify SKILL.md gotchas).
This test makes the bare-session check part of the suite instead of a
manual recipe. One subprocess, a handful of Python-executed queries —
the full 192-query bare sweep stays a round-closing manual step."""

from __future__ import annotations

import subprocess
import sys

# one query per Python-execution surface: mapInPandas two-phase kernel,
# UDTF, Arrow batch transform, GROUPED_AGG pandas_udf, driver-round-trip
# k-means, plus the flagship entry()
_PROBE = """
import sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as e
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
assert e.entry(spark).count() > 0
qs = e.queries()
for name in ["skyline_parts", "udtf_sentences", "multimodal_resize",
             "grouped_agg_pandas", "pandas_normalized_text", "kmeans_clusters"]:
    n = qs[name](spark, {sf!r}).count()
    assert n >= 0, name
    print("ok", name, n)
print("VANILLA-OK")
"""


def test_contract_survives_bare_session_subprocess(sf_dir):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo=repo, sf=sf_dir)],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "VANILLA-OK" in proc.stdout
