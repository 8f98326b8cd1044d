"""Mid-job SIGKILL / resume soak for the extraction pipeline (VERDICT r4 #7).

Proves the manifest resume path at 12M-turn scale with a REAL kill (SIGKILL
of the whole driver process group mid-parquet-write), not a simulated
partial input:

  1. clean run   -> out_clean   (ground truth: count + order-independent hash)
  2. killed run  -> out_killed  (SIGKILL while extracted/ is mid-write)
  3. resume run  -> out_killed  (same command; anti-joins the manifest)
  4. no-op run   -> out_killed  (must process 0 rows)
  5. verify      -> read_extracted(out_killed) == out_clean by
                    count, distinct(conv_id, turn_idx), and value hash
                    (sum of xxhash64 over all payload columns);
                    orphan rows from the killed attempt must exist in the
                    raw files but be filtered by the manifest semi-join.

Usage:  python tools/kill_resume_soak.py <turns_parquet_dir> <workdir>

The per-phase jobs run in fresh subprocesses (CLAUDE.md: a stopped
SparkSession's JVM lingers via py4j), SPARK_DRIVER_MEM=32g — the local
harness hosts all 32 executor threads in one JVM, so the write stage's
sort buffers need cluster-executor-sized heap.
"""
from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """\
import sys
sys.path.insert(0, {repo!r})
from doc_parser_spark.session import get_spark
from doc_parser_spark.plans.pipeline import run_extraction_job
spark = get_spark(master="local[32]")
df = spark.read.parquet({inp!r})
r = run_extraction_job(spark, df, {out!r}, job_run_id={rid!r})
print("JOB_DONE", r["rows"], round(r["wall_s"], 1))
spark.stop()
"""

VERIFY = """\
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from doc_parser_spark.session import get_spark
from doc_parser_spark.plans.pipeline import read_extracted, _extracted_path
spark = get_spark(master="local[32]")

def fingerprint(df):
    # proc_us is per-row wall time — nondeterministic across runs
    cols = [c for c in df.columns
            if not c.startswith("_") and c != "proc_us"]
    h = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
                     for c in sorted(cols)])
    row = df.agg(
        F.count("*").alias("n"),
        # decimal sum: 12M+ int64 hashes overflow a long under ANSI mode
        F.sum(h.cast("decimal(38,0)")).alias("hsum"),
        F.countDistinct("conv_id", "turn_idx").alias("nd"),
    ).first()
    return row["n"], row["nd"], row["hsum"]

clean = read_extracted(spark, {clean!r}).drop("job_run_id")
resumed = read_extracted(spark, {killed!r}).drop("job_run_id")
n_c, nd_c, h_c = fingerprint(clean)
n_k, nd_k, h_k = fingerprint(resumed)
raw = spark.read.parquet(_extracted_path({killed!r})).count()
print("VERIFY", "clean", n_c, nd_c, h_c)
print("VERIFY", "resumed", n_k, nd_k, h_k)
print("VERIFY", "raw_rows_killed_dir", raw)
assert n_c == nd_c, "clean run has duplicate (conv_id, turn_idx)"
assert (n_c, nd_c, h_c) == (n_k, nd_k, h_k), "resume output != clean output"
print("VERIFY_OK orphans_filtered=%d" % (raw - n_k))
spark.stop()
"""


def run_job(inp: str, out: str, rid: str) -> str:
    env = dict(os.environ, SPARK_DRIVER_MEM="32g")
    p = subprocess.run(
        [sys.executable, "-c", JOB.format(repo=REPO, inp=inp, out=out, rid=rid)],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        raise SystemExit(f"job {rid} failed")
    line = [l for l in p.stdout.splitlines() if l.startswith("JOB_DONE")][-1]
    print(f"  {rid}: {line}", flush=True)
    return line


def killed_run(inp: str, out: str) -> None:
    """Start the job in its own process group; SIGKILL the group the moment
    the parquet write is in flight (extracted/ exists with in-progress
    files). Polls rather than sleeping a fixed time so the kill lands
    mid-write across box-speed drift."""
    env = dict(os.environ, SPARK_DRIVER_MEM="32g")
    proc = subprocess.Popen(
        [sys.executable, "-c",
         JOB.format(repo=REPO, inp=inp, out=out, rid="killed-attempt")],
        env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    extracted = os.path.join(out, "extracted")
    deadline = time.time() + 1200
    seen_write = False
    while time.time() < deadline:
        if proc.poll() is not None:
            raise SystemExit(
                "job finished before the kill landed — corpus too small "
                "for this soak"
            )
        if os.path.isdir(extracted):
            # dynamic-partition write in flight: bucket dirs / temporary
            # attempt files appear before the commit
            entries = os.listdir(extracted)
            if entries:
                seen_write = True
                # let a meaningful fraction of task outputs land (task-committed
                # files under _temporary are exactly the stale-attempt hazard
                # the resume path must survive).  The write stage is the TAIL
                # of the job's single action, so keep the grace short or the
                # job wins the race.
                for _ in range(10):
                    if proc.poll() is not None:
                        raise SystemExit(
                            "job finished before the kill landed"
                        )
                    time.sleep(1)
                break
        time.sleep(0.5)
    if not seen_write:
        os.killpg(proc.pid, signal.SIGKILL)
        raise SystemExit("write never started within 20 min")
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()
    manifest = os.path.join(out, "_manifest")
    print(f"  killed mid-write: extracted/ entries={len(os.listdir(extracted))} "
          f"manifest_exists={os.path.isdir(manifest)}", flush=True)


def main() -> None:
    inp, work = sys.argv[1], sys.argv[2]
    out_clean = os.path.join(work, "out_clean")
    out_killed = os.path.join(work, "out_killed")
    if os.path.isdir(out_killed):
        raise SystemExit(f"{out_killed} exists — point at a fresh workdir")
    os.makedirs(work, exist_ok=True)

    t0 = time.time()
    # a completed clean run (manifest present) is deterministic — reusable
    if os.path.isdir(os.path.join(out_clean, "_manifest")):
        print("phase 1: reusing existing clean run", flush=True)
    else:
        print("phase 1: clean reference run", flush=True)
        run_job(inp, out_clean, "clean")
    print("phase 2: killed run", flush=True)
    killed_run(inp, out_killed)
    print("phase 3: resume run", flush=True)
    run_job(inp, out_killed, "resume")
    print("phase 4: no-op run", flush=True)
    line = run_job(inp, out_killed, "noop")
    assert line.split()[1] == "0", f"no-op run processed rows: {line}"
    print("phase 5: verify", flush=True)
    env = dict(os.environ, SPARK_DRIVER_MEM="32g")
    p = subprocess.run(
        [sys.executable, "-c",
         VERIFY.format(repo=REPO, clean=out_clean, killed=out_killed)],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    sys.stdout.write("\n".join(
        l for l in p.stdout.splitlines() if l.startswith("VERIFY")) + "\n")
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        raise SystemExit("verification failed")
    print(f"SOAK_OK total_wall_s={time.time() - t0:.0f}", flush=True)


if __name__ == "__main__":
    main()
