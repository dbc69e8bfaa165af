"""Round-closing board: run the full evidence protocol in the right
order on a quiet host and print one summary block.

Sequence (each step is the r13-pinned protocol for its number; PERF
steps run FIRST, r14 fix — the 1-minute loadavg LAGS process churn,
so a yardstick run right after pytest's 32 JVM workers exit passes
the loadavg guard yet reads ~30 % low (r13 measured 650k vs 917k
back-to-back); timing before any JVM storm keeps the guard honest):
  1. tools/profile_scan.py        -> SCAN_YARDSTICK.json (loadavg guard)
  2. tools/ratio_trend.py         -> RATIO_TREND.json (scale trend)
  3. bench.py                     -> BENCH_LOCAL.json (self-commits)
  4. pytest tests/ (correctness suite)
  5. tools/audit_plans.py         -> zero unwaived flags required
  6. COLD replica gate            -> rm caches; check_oracle --summary
  7. git status must be clean

Steps run SEQUENTIALLY — concurrent perf steps contaminate each
other's readings on this host (documented 2x band). Skip steps with
--skip=pytest,trend,... or --skip pytest,trend,... (comma list:
pytest scan trend bench audit gate). Exit code: number of failed
steps.

Run:  python tools/closing_board.py            (~35-45 min total)
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


STATUS: list[dict] = []  # step records -> BOARD_STATUS.json (r15 task 1)


def _run(label: str, cmd, timeout: int = 3600) -> tuple[bool, str]:
    t0 = time.time()
    try:
        p = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
        ok = p.returncode == 0
        out_lines = (p.stdout + p.stderr).strip().splitlines()
        # prefer the machine-greppable SUMMARY/yardstick line over
        # whatever log noise happens to be last; progress-bar fragments
        # ("[Stage 175:> ...") carry no information and previously ended
        # up as the audit/trend step line (VERDICT r15 item 4)
        keyed = [ln for ln in out_lines
                 if "SUMMARY" in ln or "yardstick:" in ln]
        plain = [ln for ln in out_lines
                 if not re.search(r"\[Stage \d+:", ln) and ln.strip()]
        tail = (keyed or plain or out_lines)[-1:] or [""]
        STATUS.append({"name": label, "ok": ok,
                       "secs": round(time.time() - t0),
                       "line": tail[0][:160]})
        return ok, f"{label}: {'ok' if ok else 'FAIL'} " \
                   f"({time.time()-t0:.0f}s) {tail[0][:160]}"
    except subprocess.TimeoutExpired:
        STATUS.append({"name": label, "ok": False, "secs": timeout,
                       "line": f"TIMEOUT after {timeout}s"})
        return False, f"{label}: TIMEOUT after {timeout}s"


def _settle(cap: float = 1.5, cap5: float = 3.0,
            timeout_s: int = 900) -> float:
    """Block until the 1-minute loadavg drops under ``cap`` AND the
    5-minute average under ``cap5`` (or timeout). The board's perf
    steps run back-to-back and each 32-core step loads the host for
    minutes after it exits — r15's final bench started at loadavg 3.35
    because nothing waited, and the r16 board's bench step started at
    [1.47, 5.73, ...] because only the 1-minute average was consulted
    (the lag trap moved one window up). bench.py REFUSES its
    self-commit on an unsettled host under the same two-cap rule, so
    the board must deliver it a settled one or fail its own clean-tree
    check."""
    deadline = time.time() + timeout_s
    while True:
        try:
            la = os.getloadavg()
        except OSError:
            return -1.0
        if (la[0] < cap and la[1] < cap5) or time.time() >= deadline:
            return round(la[0], 2)
        time.sleep(10)


def main() -> None:
    skip = set()
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--skip" and i + 1 < len(argv):
            skip |= set(argv[i + 1].split(","))
            i += 2
            continue
        if a.startswith("--skip="):
            skip |= set(a.split("=", 1)[1].split(","))
            i += 1
            continue
        sys.exit("usage: closing_board.py [--skip=step,step,...]")
    failed = 0
    # perf first (quiet host), pytest's JVM storm after — see module doc
    steps = [
        ("scan", [sys.executable, "tools/profile_scan.py"], 1200),
        ("trend", [sys.executable, "tools/ratio_trend.py"], 1800),
        ("bench", [sys.executable, "bench.py"], 1800),
        ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"], 3600),
        ("audit",
         [sys.executable, "tools/audit_plans.py", "/root/testdata/sf0.001"],
         1800),
    ]
    for name, cmd, to in steps:
        if name in skip:
            print(f"{name}: skipped", flush=True)
            continue
        if name in ("scan", "trend", "bench"):
            la = _settle()
            print(f"{name}: starting at loadavg {la}", flush=True)
        ok, line = _run(name, cmd, to)
        failed += 0 if ok else 1
        print(line, flush=True)
        if ok and name in ("scan", "trend"):
            # this board run IS these artifacts' invoker: commit them
            # here so the clean-tree check at the end means something
            # (bench.py commits its own BENCH_LOCAL.json). BASELINE.md's
            # generated trend block is re-synced IN THE SAME COMMIT —
            # doc == artifact by construction (VERDICT r13 task 2;
            # tests/test_docs_baseline.py fails on drift)
            art = {"scan": "SCAN_YARDSTICK.json",
                   "trend": "RATIO_TREND.json"}[name]
            subprocess.run(
                [sys.executable, "tools/sync_baseline.py"],
                cwd=REPO, capture_output=True,
            )
            subprocess.run(["git", "add", "--", art, "BASELINE.md"],
                           cwd=REPO, capture_output=True)
            if subprocess.run(
                ["git", "diff", "--cached", "--quiet", "--",
                 art, "BASELINE.md"],
                cwd=REPO, capture_output=True,
            ).returncode == 1:
                subprocess.run(
                    ["git", "commit", "-m",
                     f"Record {art} from the closing board "
                     "(BASELINE.md trend block re-synced)", "--only",
                     "--", art, "BASELINE.md"],
                    cwd=REPO, capture_output=True,
                )
    if "gate" not in skip:
        # COLD gate: caches rebuilt from the final tree, nothing stale.
        # Honor the same env/tmpdir the engine reads (a hardcoded /tmp
        # wipe would leave a configured cache warm and report a fake
        # cold pass).
        import tempfile

        shutil.rmtree(
            os.environ.get("XML_GRAFT_CACHE", "/tmp/xmlgraft_cache"),
            ignore_errors=True,
        )
        shutil.rmtree(
            os.path.join(tempfile.gettempdir(), "xml_graft_catalog"),
            ignore_errors=True,
        )
        shutil.rmtree("/tmp/xml_graft_catalog", ignore_errors=True)
        ok, line = _run(
            "gate",
            [sys.executable, "tools/check_oracle.py", "--summary",
             "/root/testdata/sf0.01"],
            1800,
        )
        failed += 0 if ok else 1
        print(line, flush=True)
    # the clean-tree check runs BEFORE the status is written, so the
    # committed BOARD_STATUS.json/BOARD.md can never claim PASS for a
    # run the board itself failed (review r15) — the two board-generated
    # files are excluded from the check since they are about to be
    # committed by this very step
    # porcelain -z with explicit XY/path parsing (ADVICE r15): the old
    # ln.split()[-1] misparsed paths containing spaces and rename entries
    # ("R  BOARD.md -> other" was keyed by the new name), misclassifying
    # some dirty states around the two-file exclusion. With -z, rename/
    # copy entries carry the NEW path in the XY token and the source as
    # the NEXT NUL token (excluded only if the new path is a board file —
    # renaming a board file AWAY is a real dirty state and stays flagged).
    raw = subprocess.run(
        ["git", "status", "--porcelain", "-z"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout
    toks = raw.split("\0")
    entries = []
    i = 0
    while i < len(toks):
        tok = toks[i]
        if not tok:
            i += 1
            continue
        xy, path = tok[:2], tok[3:]
        if xy and xy[0] in "RC":
            i += 1  # consume the rename/copy source path token
        entries.append((xy, path))
        i += 1
    dirty_lines = [
        f"{xy} {p}" for xy, p in entries
        if p not in ("BOARD_STATUS.json", "BOARD.md")
    ]
    if dirty_lines:
        failed += 1
        STATUS.append({"name": "clean-tree", "ok": False, "secs": 0,
                       "line": "; ".join(dirty_lines)[:160]})
        print("git: DIRTY tree at close:\n" + "\n".join(dirty_lines),
              flush=True)
    else:
        STATUS.append({"name": "clean-tree", "ok": True, "secs": 0,
                       "line": ""})
        print("git: clean", flush=True)
    # doc == artifact for the board itself (VERDICT r14 task 1): persist
    # the step log and re-render BOARD.md from the committed artifacts —
    # SURVEY.md cites BOARD.md, never hand-copied numbers. A sync
    # failure must be visible, not silently produce a stale board.
    import json

    with open(os.path.join(REPO, "BOARD_STATUS.json"), "w") as fh:
        json.dump(
            {
                "steps": STATUS,
                "result": "PASS" if failed == 0 else f"FAIL({failed})",
                "skipped": sorted(skip),
            },
            fh, indent=1,
        )
        fh.write("\n")
    sync = subprocess.run([sys.executable, "tools/sync_board.py"],
                          cwd=REPO, capture_output=True, text=True)
    if sync.returncode != 0:
        print(
            f"board: sync_board FAILED (rc={sync.returncode}) — "
            f"BOARD.md may be stale: "
            f"{(sync.stderr or sync.stdout).strip()[:200]}",
            flush=True,
        )
    subprocess.run(["git", "add", "--", "BOARD_STATUS.json", "BOARD.md"],
                   cwd=REPO, capture_output=True)
    if subprocess.run(
        ["git", "diff", "--cached", "--quiet", "--",
         "BOARD_STATUS.json", "BOARD.md"],
        cwd=REPO, capture_output=True,
    ).returncode == 1:
        commit = subprocess.run(
            ["git", "commit", "-m",
             "Record closing-board status (BOARD.md re-synced)",
             "--only", "--", "BOARD_STATUS.json", "BOARD.md"],
            cwd=REPO, capture_output=True, text=True,
        )
        if commit.returncode != 0:
            print(
                f"board: status commit FAILED (rc={commit.returncode}): "
                f"{(commit.stderr or commit.stdout).strip()[:160]}",
                flush=True,
            )
    print("BOARD " + ("PASS" if failed == 0 else f"FAIL({failed})"))
    sys.exit(failed)


if __name__ == "__main__":
    main()
