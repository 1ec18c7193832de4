#!/usr/bin/env python
"""Same-session two-HEAD bench A/B (round-11 verdict item 2).

Cross-session bench comparisons (scripts/bench_compare.py over prior
rounds' artifacts) are host-noise-dominated: r10->r11 showed a uniform
~1.1-1.25x drift across untouched relational scalars, swamping any real
per-query signal.  This script produces the authoritative record: it
checks out ref A into a temporary git worktree, copies the CURRENT
bench harness in (so both sides run the identical measurement code),
and runs A and B interleaved (A,B,A,B,...) as fresh subprocesses on the
same machine minutes apart.  Per-query medians over the reps are
compared and one ``kind="bench_ab"`` record with ``cross_session:
false`` is appended to PROGRESS.jsonl.

Usage:
    python scripts/bench_ab.py --ref-a e56f939 --label-a r11 \
        --label-b r12-head \
        --queries near_dup_native_exactdup,facade_hybrid_prf_gate,topk_exact \
        --reps 3 [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(tree: str, queries: str, sf_dir: str) -> dict[str, float]:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = queries
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if isinstance(obj.get("queries"), dict):
                return {k: float(v) for k, v in obj["queries"].items()}
    raise RuntimeError(
        f"no bench JSON from {tree}\nstdout tail: {proc.stdout[-800:]}\n"
        f"stderr tail: {proc.stderr[-800:]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-a", required=True, help="git ref for side A")
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="HEAD")
    ap.add_argument("--queries", required=True,
                    help="comma-separated query names (flags + controls)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--progress", default=os.path.join(REPO, "PROGRESS.jsonl"))
    args = ap.parse_args()

    tree_a = f"/tmp/bench_ab_{args.ref_a}"
    if not os.path.isdir(tree_a):
        subprocess.run(
            ["git", "worktree", "add", "--detach", tree_a, args.ref_a],
            cwd=REPO, check=True,
        )
    # Identical harness on both sides: the measurement code (bench.py,
    # which reads SPARK_GRAFT_BENCH_ONLY) comes from the CURRENT tree;
    # only the engine package + entry module differ between sides.
    shutil.copy(os.path.join(REPO, "bench.py"),
                os.path.join(tree_a, "bench.py"))

    runs_a: list[dict[str, float]] = []
    runs_b: list[dict[str, float]] = []
    t_start = time.time()
    for rep in range(args.reps):
        # Alternate the within-rep order (A,B / B,A / A,B ...): a
        # fixed order lets PERIODIC host noise land systematically on
        # one side — a round-15 null test (identical code both sides)
        # measured a 2.9x "regression" on the always-second side.
        sides = [("A", tree_a, runs_a), ("B", REPO, runs_b)]
        if rep % 2 == 1:
            sides.reverse()
        for label, tree, sink in sides:
            print(f"rep {rep + 1}/{args.reps}: side {label}",
                  file=sys.stderr)
            sink.append(_run_bench(tree, args.queries, args.sf_dir))

    shared = sorted(
        set.intersection(*(set(r) for r in runs_a + runs_b))
    )

    def _median_ok(runs, q):
        # bench.py records -1.0 for a failed query; a failed rep must
        # not poison the median (negative "timings" would read as
        # speedups in the authoritative record)
        vals = [r[q] for r in runs if r[q] >= 0]
        return statistics.median(vals) if vals else None

    failed = sorted(
        q for q in shared
        if _median_ok(runs_a, q) is None or _median_ok(runs_b, q) is None
    )
    shared = [q for q in shared if q not in failed]
    med_a = {q: _median_ok(runs_a, q) for q in shared}
    med_b = {q: _median_ok(runs_b, q) for q in shared}
    rows = sorted(
        (
            (q, med_a[q], med_b[q],
             round(med_b[q] / med_a[q], 3) if med_a[q] > 0 else None)
            for q in shared
        ),
        key=lambda r: -(r[3] or 0),
    )
    total_a = round(sum(med_a.values()), 3)
    total_b = round(sum(med_b.values()), 3)
    print(f"\n{'query':<34} {args.label_a:>8} {args.label_b:>8} ratio")
    for q, a, b, ratio in rows:
        print(f"{q:<34} {a:>8.3f} {b:>8.3f} {ratio}")
    print(f"{'TOTAL':<34} {total_a:>8.3f} {total_b:>8.3f} "
          f"{round(total_b / total_a, 3) if total_a else None}")

    record = {
        "ts": time.time(),
        "kind": "bench_ab",
        "cross_session": False,
        "ref_a": args.ref_a,
        "label_a": args.label_a,
        "label_b": args.label_b,
        "reps": args.reps,
        "interleaved": True,
        "sf_dir": args.sf_dir,
        "wall_s": round(time.time() - t_start, 1),
        "median_a": {q: round(v, 3) for q, v in med_a.items()},
        "median_b": {q: round(v, 3) for q, v in med_b.items()},
        "ratios": {q: r for q, _, _, r in rows},
        "total_a": total_a,
        "total_b": total_b,
        "total_ratio": round(total_b / total_a, 3) if total_a else None,
        "failed_queries": failed,
        "raw_a": [{k: round(v, 3) for k, v in r.items()} for r in runs_a],
        "raw_b": [{k: round(v, 3) for k, v in r.items()} for r in runs_b],
    }
    with open(args.progress, "a") as f:
        f.write(json.dumps(record, separators=(",", ":")) + "\n")
    print(f"\nbench_ab record appended to {args.progress}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
