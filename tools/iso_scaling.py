"""Paired iso-frequency scaling experiment at arbitrary core pairs/corpus sizes.

This is the round-7 8->32 measurement as a reusable in-repo tool (the
BENCH/NOTES.md "iso-frequency 8->32" entry was produced by exactly this
procedure). Per round it runs low/high back-to-back on EACH corpus —
one machine window per round — with the low level affinity-pinned to
``low`` cores while burner processes keep the complement of ``high``
busy (one die state across levels, like a real N->4N executor scale-out
where adding machines never changes per-core clocks), each level a fresh
subprocess (a stopped SparkSession's JVM lingers via py4j) via
``bench.py --extract-level``.

Passing TWO corpus sizes interleaved in the same round lets the fixed
per-job overhead be solved out of the walls: with corpus B = k x corpus
A,  wall = F + W/c  gives  F = (k*wall_A - wall_B) / (k - 1)  per level,
and the pure-work ratio (W_low/W_high)/(high/low) is the
overhead-free scaling figure. Round 7 measured F at 1.1-2.1 s
(level-independent: scheduler + task broadcast + Arrow python-worker
spin-up) and pure-work 8->32 at 0.96-0.98.

Usage (from the repo root — Spark python workers resolve
doc_parser_spark via the driver cwd):

    python tools/iso_scaling.py --low 8 --high 32 --rounds 3 \
        /path/corpus_1x.parquet [/path/corpus_kx.parquet --k 10]

Corpora come from sources/transcripts.write_transcripts_parquet
(e.g. n_convs=6000 and 60000, seed=42 for the round-7 pair).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(path: str, cores: int, pin: str, burn: str, runs: int = 3) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--extract-level",
         str(cores), path, str(runs), pin, burn],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def dvfs_ceiling(low: int, high: int) -> float:
    sys.path.insert(0, REPO)
    import bench

    return bench._dvfs_probe(low, high)["ceiling"]


def fixed_overhead(wall_small: float, wall_big: float, k: float) -> float:
    """Solve wall = F + W/c from the same level at two corpus sizes."""
    return (k * wall_small - wall_big) / (k - 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus", help="1x corpus parquet")
    ap.add_argument("corpus_big", nargs="?", default=None,
                    help="optional k-times corpus for overhead decomposition")
    ap.add_argument("--k", type=float, default=10.0,
                    help="size ratio corpus_big / corpus")
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    a = ap.parse_args()

    pin_lo = ",".join(str(c) for c in range(a.low))
    burn_lo = ",".join(str(c) for c in range(a.low, a.high))
    pin_hi = ",".join(str(c) for c in range(a.high))
    iso_small, iso_big, pure = [], [], []
    for r in range(a.rounds):
        lo = run_level(a.corpus, a.low, pin_lo, burn_lo, a.runs)
        hi = run_level(a.corpus, a.high, pin_hi, "", a.runs)
        rec: dict = {
            "round": r,
            "iso_small": round((hi["tps"] / lo["tps"]) / (a.high / a.low), 4),
            "walls_low_small": lo["walls"], "walls_high_small": hi["walls"],
        }
        iso_small.append(rec["iso_small"])
        if a.corpus_big:
            if a.k <= 1:
                raise SystemExit("--k must be > 1 (corpus_big/corpus ratio)")
            lob = run_level(a.corpus_big, a.low, pin_lo, burn_lo, a.runs)
            hib = run_level(a.corpus_big, a.high, pin_hi, "", a.runs)
            rec["iso_big"] = round(
                (hib["tps"] / lob["tps"]) / (a.high / a.low), 4
            )
            iso_big.append(rec["iso_big"])
            f_lo = fixed_overhead(lo["wall_s"], lob["wall_s"], a.k)
            f_hi = fixed_overhead(hi["wall_s"], hib["wall_s"], a.k)
            rec["fixed_overhead_s"] = {
                "low": round(f_lo, 3), "high": round(f_hi, 3)
            }
            # a drifting window can put the solved overhead at/above the
            # measured wall (or below zero) — the decomposition is then
            # non-physical for this round; flag it and keep it out of the
            # pure-work median rather than corrupting the headline figure
            if 0 <= f_lo < lob["wall_s"] and 0 <= f_hi < hib["wall_s"]:
                rec["pure_work_ratio"] = round(
                    ((lob["wall_s"] - f_lo) / (hib["wall_s"] - f_hi))
                    / (a.high / a.low), 4,
                )
                pure.append(rec["pure_work_ratio"])
            else:
                rec["pure_work_ratio"] = None
                rec["overhead_estimate_unstable"] = True
            rec["walls_low_big"] = lob["walls"]
            rec["walls_high_big"] = hib["walls"]
        rec["dvfs_ceiling"] = round(dvfs_ceiling(a.low, a.high), 4)
        print(json.dumps(rec), flush=True)

    def med(xs: list) -> float | None:
        import statistics

        return round(statistics.median(xs), 4) if xs else None

    print(json.dumps({
        "summary": True, "low": a.low, "high": a.high,
        "iso_small_median": med(iso_small),
        "iso_big_median": med(iso_big),
        "pure_work_median": med(pure),
    }), flush=True)


if __name__ == "__main__":
    main()
