"""Co-located bucketed joins: two tables bucket-written on the same key
join with ZERO exchanges (and zero sorts when sortBy matches) — the
storage-layout lever that turns recurring 100-TB joins into metadata
decisions. Subprocess-isolated: saveAsTable needs its own warehouse dir
and catalog-enabled session."""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import io, sys, tempfile
from contextlib import redirect_stdout
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

wh = tempfile.mkdtemp(prefix="wh-")
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.warehouse.dir", wh)
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.ui.enabled", "false").getOrCreate())

from doc_parser_spark.plans.pipeline import write_bucketed_table

a = spark.range(20000).select(F.col("id").alias("conv_id"),
                              (F.col("id") * 2).alias("x"))
b = spark.range(20000).select(F.col("id").alias("conv_id"),
                              (F.col("id") * 3).alias("y"))
write_bucketed_table(a, "bk_a", "conv_id", 8)
write_bucketed_table(b, "bk_b", "conv_id", 8)

j = spark.table("bk_a").join(spark.table("bk_b"), "conv_id")
buf = io.StringIO()
with redirect_stdout(buf):
    j.explain("formatted")
plan = buf.getvalue()
assert "Exchange" not in plan, "bucketed join still shuffles:\n" + plan
assert "SortMergeJoin" in plan
assert j.count() == 20000

# contrast: the same join over plain (unbucketed) tables DOES shuffle
a.write.mode("overwrite").saveAsTable("plain_a")
b.write.mode("overwrite").saveAsTable("plain_b")
j2 = spark.table("plain_a").join(spark.table("plain_b"), "conv_id")
buf2 = io.StringIO()
with redirect_stdout(buf2):
    j2.explain("formatted")
assert "Exchange" in buf2.getvalue()
spark.stop()
print("BUCKETED-OK")
"""


def test_bucketed_tables_join_without_exchange():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "BUCKETED-OK" in proc.stdout
