"""One-command reproduction of the whole grading contract — the three
graded surfaces, each in its own subprocess (fresh SparkSession, no
conf bleed), with one summary block at the end:

1. correctness — ``tools/verify_local.py`` at sf0.01 (the driver's
   DuckDB-oracle gate; expect ``ALL OK``),
2. bench — ``bench.py`` at sf0.1. Since r10 the bench itself times
   every query cold AND warm (min over ``SPARK_GRAFT_BENCH_WARM``
   re-runs, default 2) in one session and ships both totals in the
   JSON (``value_cold``/``value_warm``) — the graded artifact carries
   its own noise floor; cold totals alone vary up to 2× with host
   load, the warm minimum is the comparable number,
3. tests — ``pytest tests/ -q``.

Usage: python tools/grade.py [--quick]
  --quick: warm=1 bench, the two fast correctness queries, and the
  two cheap regression-gate test files (oracle plan/column-parity +
  docs index — the r8 failure class) — a smoke of the harness, not a
  graded run.

Exit code 0 iff all three surfaces pass.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], env: dict | None = None) -> tuple[int, str]:
    print(f"\n=== {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=ROOT, env={**os.environ, **(env or {})},
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    dt = time.time() - t0
    tail = "\n".join(proc.stdout.strip().splitlines()[-15:])
    print(tail)
    print(f"=== {name}: exit {proc.returncode} in {dt:.0f}s", flush=True)
    return proc.returncode, proc.stdout


def main() -> int:
    quick = "--quick" in sys.argv
    py = sys.executable

    verify_cmd = [py, "tools/verify_local.py", "/root/testdata/sf0.01"]
    if quick:
        verify_cmd += ["market_stats", "exact_dedup"]
    rc_v, out_v = run("correctness", verify_cmd)
    ok_v = rc_v == 0 and "ALL OK" in out_v

    warm = "0" if quick else os.environ.get("SPARK_GRAFT_BENCH_WARM", "2")
    rc_b, out_b = run(
        "bench", [py, "bench.py"], env={"SPARK_GRAFT_BENCH_WARM": warm}
    )
    bench_total = bench_warm = None
    for line in reversed(out_b.strip().splitlines()):
        try:
            parsed = json.loads(line)
            bench_total = parsed["value"]
            bench_warm = parsed.get("value_warm")
            break
        except (json.JSONDecodeError, KeyError, TypeError):
            continue
    ok_b = rc_b == 0 and bench_total is not None

    # quick mode trades the full suite for the two cheap regression
    # gates that catch the r8 failure class (an oracle twin that no
    # longer plans, or a Spark/oracle column-name drift) plus the
    # docs-index guard — ~1 min instead of ~9
    test_cmd = [py, "-m", "pytest", "-q"] + (
        ["tests/test_oracle_sql_parses.py", "tests/test_docs_index.py"]
        if quick
        else ["tests/"]
    )
    rc_t, out_t = run("tests", test_cmd)
    ok_t = rc_t == 0

    print("\n=== GRADE SUMMARY")
    print(f"correctness: {'ALL OK' if ok_v else 'FAIL'}")
    print(
        f"bench      : {bench_total if ok_b else 'FAIL'} s cold / "
        f"{bench_warm} s warm (sf0.1 headline total, min-of-{warm} "
        "warm re-runs)"
    )
    last = out_t.strip().splitlines()[-1] if out_t.strip() else ""
    print(f"tests      : {last if ok_t else 'FAIL — ' + last}")
    return 0 if (ok_v and ok_b and ok_t) else 1


if __name__ == "__main__":
    sys.exit(main())
