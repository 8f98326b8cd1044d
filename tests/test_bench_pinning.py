"""The iso-frequency scaling protocol (bench.py round 6) is only valid if
the affinity pin actually reaches the Spark JVM and the burners sit on the
complement cores. Drive the real bench CLI and read /proc.

(Diagnosis note: a naive pgrep for 'java' can catch a STALE JVM from an
earlier unpinned run — a stopped SparkSession's JVM lingers for the life
of its driver process. The test identifies the JVM by parent pid.)"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpus_allowed(pid: int) -> str:
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("Cpus_allowed_list:"):
                return line.split()[1]
    raise AssertionError("no Cpus_allowed_list")


def _children(pid: int) -> list[int]:
    out = subprocess.run(
        ["ps", "-o", "pid=", "--ppid", str(pid)],
        capture_output=True, text=True,
    ).stdout.split()
    return [int(p) for p in out]


@pytest.mark.skipif(
    not hasattr(os, "sched_setaffinity"), reason="linux-only"
)
def test_isofreq_pin_reaches_the_jvm(tmp_path):
    corpus = str(tmp_path / "t.parquet")
    pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(50) for _ in range(4)],
            "turn_idx": [j for _ in range(50) for j in range(4)],
            "role": ["user", "assistant"] * 100,
            "text": ["plain text body with several words here"] * 200,
            "tool": [None] * 200,
        }
    ).to_parquet(corpus, index=False)

    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--extract-level", "2", corpus, "1", "0,1", "2,3"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        jvm = None
        deadline = time.time() + 120
        while time.time() < deadline and jvm is None:
            for child in _children(proc.pid):
                with open(f"/proc/{child}/comm") as f:
                    if f.read().strip() == "java":
                        jvm = child
                        break
            time.sleep(0.3)
            if proc.poll() is not None:
                raise AssertionError("bench finished before JVM was seen")
        assert jvm is not None, "JVM never appeared under the pinned driver"
        assert _cpus_allowed(proc.pid) == "0-1"
        assert _cpus_allowed(jvm) == "0-1"
        # burners sit on the complement, one core each
        burner_masks = sorted(
            _cpus_allowed(c)
            for c in _children(proc.pid)
            if c != jvm and open(f"/proc/{c}/comm").read().strip()
            .startswith("python")
        )
        assert burner_masks == ["2", "3"], burner_masks
        out, _ = proc.communicate(timeout=180)
        assert '"tps"' in out.splitlines()[-1]
    finally:
        if proc.poll() is None:
            proc.kill()
