"""AQE skew-join proof: the scale notes across this repo lean on "AQE
skew-split handles hot keys" — this pins that the mechanism actually
fires on a skewed join (one key holding 75% of a padded fact table):
the final adaptive plan must show SortMergeJoin(skew=true) with an
AQEShuffleRead that split the hot partition. Subprocess-isolated (skew
thresholds are lowered far below the shared session's defaults)."""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                 "100KB")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.ui.enabled", "false").getOrCreate())

big = spark.range(400000).select(
    F.when(F.col("id") % 4 != 0, 0).otherwise(F.col("id")).alias("k"),
    F.concat(F.lit("x" * 100), F.col("id").cast("string")).alias("pad"))
small = spark.range(20000).select((F.col("id") % 2000).alias("k"),
                                  F.col("id").alias("v"))
# the aggregate executes THIS DataFrame's own QueryExecution, so its
# adaptive plan finalizes (count()/write() plan separate queries whose
# final plans are not reachable from the join frame)
agg = big.join(small, "k").groupBy().count()
n = agg.collect()[0][0]
assert n == 3005000, n
plan = agg._jdf.queryExecution().executedPlan().toString()
assert "isFinalPlan=true" in plan
assert "skew=true" in plan, plan[:2000]
assert "skewed" in plan  # AQEShuffleRead split the hot partition
spark.stop()
print("SKEW-OK")
"""


def test_aqe_splits_the_hot_key():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SKEW-OK" in proc.stdout
