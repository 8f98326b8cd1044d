"""Task-retry resilience: a transient executor-side failure (first attempt
of one task raises) must be retried by Spark and converge to EXACTLY the
clean run's output — the property that makes the Arrow-batched operator
path safe on a real cluster where individual tasks fail routinely.

Runs in a SUBPROCESS with its own ``local[4,2]`` session (task retries
enabled; plain local[N] is fail-fast) — the repo's standard pattern for
tests needing a differently-configured SparkContext, since one JVM holds
one context and stopping the shared session would break later tests.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import os, sys, tempfile
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4,2]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())

from doc_parser_spark.operators.multimodal import MEDIA_SCHEMA, decode_images
from doc_parser_spark.sources.synth_media import build_png

rows = [(i, f"c{{i}}", 0, "image", build_png(i), None) for i in range(64)]
media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA).repartition(4)

marker = os.path.join(tempfile.gettempdir(), f"poison-{{os.getpid()}}.flag")
if os.path.exists(marker):
    os.remove(marker)

def poison(batches):
    # kill the task that carries doc 7, exactly once; the marker survives
    # into the retry attempt, which then passes the batch through. The
    # poison stage fuses into the SAME stage as decode_images, so the
    # retry re-executes our operator too.
    for pdf in batches:
        if 7 in set(pdf["media_id"]) and not os.path.exists(marker):
            open(marker, "w").write("tripped")
            raise RuntimeError("injected transient task failure")
        yield pdf

poisoned = media.mapInPandas(poison, schema=MEDIA_SCHEMA)
got = {{r["media_id"]: (r["width"], r["height"], round(r["mean_luma"], 6),
                        r["decode_status"])
       for r in decode_images(poisoned).collect()}}
assert os.path.exists(marker), "the failure was never injected"
os.remove(marker)

clean = {{r["media_id"]: (r["width"], r["height"], round(r["mean_luma"], 6),
                          r["decode_status"])
         for r in decode_images(media).collect()}}
assert got == clean, "retried output differs from clean run"
assert len(got) == 64
assert all(v[3] == "decoded" for v in got.values())
spark.stop()
print("RETRY-OK")
"""


def test_transient_task_failure_retries_to_identical_output():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo="/root/repo")],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "RETRY-OK" in proc.stdout
