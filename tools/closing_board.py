"""Round-closing board: run the full evidence protocol in the right
order on a quiet host and print one summary block.

Sequence (each step is the r13-pinned protocol for its number):
  1. pytest tests/ (correctness suite)
  2. tools/profile_scan.py        -> SCAN_YARDSTICK.json (loadavg guard)
  3. tools/ratio_trend.py         -> RATIO_TREND.json (scale trend)
  4. bench.py                     -> BENCH_LOCAL.json (self-commits)
  5. tools/audit_plans.py         -> zero unwaived flags required
  6. COLD replica gate            -> rm caches; check_oracle --summary
  7. git status must be clean

Steps run SEQUENTIALLY — concurrent perf steps contaminate each
other's readings on this host (documented 2x band). Skip steps with
--skip pytest,trend,... (comma list: pytest scan trend bench audit
gate). Exit code: number of failed steps.

Run:  python tools/closing_board.py            (~35-45 min total)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(label: str, cmd, timeout: int = 3600) -> tuple[bool, str]:
    t0 = time.time()
    try:
        p = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
        ok = p.returncode == 0
        tail = (p.stdout + p.stderr).strip().splitlines()[-1:] or [""]
        return ok, f"{label}: {'ok' if ok else 'FAIL'} " \
                   f"({time.time()-t0:.0f}s) {tail[0][:120]}"
    except subprocess.TimeoutExpired:
        return False, f"{label}: TIMEOUT after {timeout}s"


def main() -> None:
    skip = set()
    for a in sys.argv[1:]:
        if a.startswith("--skip"):
            skip = set(a.split("=", 1)[1].split(",")) if "=" in a else set(
                sys.argv[sys.argv.index(a) + 1].split(",")
            )
    lines = []
    failed = 0
    steps = [
        ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"], 3600),
        ("scan", [sys.executable, "tools/profile_scan.py"], 1200),
        ("trend", [sys.executable, "tools/ratio_trend.py"], 1800),
        ("bench", [sys.executable, "bench.py"], 1800),
        ("audit",
         [sys.executable, "tools/audit_plans.py", "/root/testdata/sf0.001"],
         1800),
    ]
    for name, cmd, to in steps:
        if name in skip:
            lines.append(f"{name}: skipped")
            continue
        ok, line = _run(name, cmd, to)
        failed += 0 if ok else 1
        lines.append(line)
        print(line, flush=True)
    if "gate" not in skip:
        # COLD gate: caches rebuilt from the final tree, nothing stale
        shutil.rmtree("/tmp/xmlgraft_cache", ignore_errors=True)
        shutil.rmtree("/tmp/xml_graft_catalog", ignore_errors=True)
        ok, line = _run(
            "gate",
            [sys.executable, "tools/check_oracle.py", "--summary",
             "/root/testdata/sf0.01"],
            1800,
        )
        failed += 0 if ok else 1
        lines.append(line)
        print(line, flush=True)
    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    if dirty:
        failed += 1
        print(f"git: DIRTY tree at close:\n{dirty}", flush=True)
    else:
        print("git: clean", flush=True)
    print("BOARD " + ("PASS" if failed == 0 else f"FAIL({failed})"))
    sys.exit(failed)


if __name__ == "__main__":
    main()
