#!/usr/bin/env python
"""Round-over-round per-query bench comparison (verdict r9 item 7).

Loads two bench artifacts — driver-signed ``BENCH_r{N}.json`` (tail
capture), local ``BENCH_r{N}_local.json``, or a raw bench.py stdout
line — extracts their per-query second maps, and emits the
comparison: per shared query ``(query, a, b, ratio)`` sorted by ratio
descending (worst regression first), plus shared-total ratio and the
delta lists.  One JSON line is appended to ``PROGRESS.jsonl``
(kind="bench_compare") and the full table goes to stdout, so
host-noise disputes are settled by a committed artifact instead of
ad-hoc worktree controls.

IMPORTANT caveat (NOTES_r9 / the r9 host-control episode): comparing
against a PRIOR ROUND'S FILE measures the host as much as the code —
shared-host load has produced 1.4-2.2x swings on identical commits.
Treat ratios here as a screening signal; a suspected regression is
confirmed only by a same-session control (bench HEAD and the prior
commit minutes apart on the same machine).  The emitted line carries
that caveat machine-readably (``cross_session: true``).

Usage:
    python scripts/bench_compare.py BENCH_r09.json BENCH_r10_local.json \
        --label-a r9 --label-b r10 [--progress PROGRESS.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _parse_bench_line(line: str) -> dict[str, float] | None:
    """Per-query map from one bench.py stdout JSON line (any emission
    stage: ``queries`` dict or the packed ``name:sec`` string)."""
    try:
        obj = json.loads(line)
    except (ValueError, TypeError):
        return None
    if not isinstance(obj, dict):
        return None
    if isinstance(obj.get("queries"), dict):
        return {k: float(v) for k, v in obj["queries"].items()}
    packed = obj.get("queries_packed", obj.get("qp"))
    if isinstance(packed, str):
        out = {}
        for item in packed.split():
            name, _, val = item.rpartition(":")
            try:
                out[name] = float(val)
            except ValueError:
                return None
        return out or None
    # compressed in-artifact name list ("qnz": zlib+base64 of the
    # space-joined names in qv's order — round 16, emitted when the
    # plain name:sec map cannot fit the driver's 2000-char stdout-tail
    # capture): zip it with qv for the full per-query map
    qnz, vals = obj.get("qnz"), obj.get("qv")
    if isinstance(qnz, str) and isinstance(vals, str):
        import base64
        import zlib

        try:
            names = zlib.decompress(base64.b64decode(qnz)).decode().split()
            parts = vals.split()
            if names and len(names) == len(parts):
                return {n: float(v) for n, v in zip(names, parts)}
        except Exception:  # noqa: BLE001
            pass
    # values-only last resort ("qv" + "qh"): zip names back from the
    # current __spark_entry__.queries() order — or, when window
    # rotation has reordered the dict since the artifact was written,
    # from the committed per-round order snapshot
    # (scripts/bench_orders.json, keyed by the qh md5 prefix) — but
    # ONLY if the md5 prefix proves the order matches (silently
    # zipping a stale order would attribute times to the wrong
    # queries)
    vals = obj.get("qv")
    if isinstance(vals, str):
        import hashlib
        import json as _json

        names = None
        try:
            sys.path.insert(0, os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            import __spark_entry__ as entrymod

            live = list(entrymod.queries())
            if hashlib.md5(
                ",".join(live).encode()
            ).hexdigest()[:8] == obj.get("qh"):
                names = live
        except Exception:  # noqa: BLE001
            pass
        if names is None:
            try:
                with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "bench_orders.json",
                )) as fh:
                    names = _json.load(fh).get(obj.get("qh"))
            except Exception:  # noqa: BLE001
                names = None
        if names is None:
            return None
        parts = vals.split()
        if len(parts) != len(names):
            return None
        try:
            return {n: float(v) for n, v in zip(names, parts)}
        except ValueError:
            return None
    return None


def load_query_map(path: str) -> dict[str, float]:
    """Per-query seconds from a bench artifact of any flavor:

    - local artifact: top-level ``queries`` dict (full fidelity);
    - driver artifact: ``tail`` string holding the captured stdout —
      scan its lines LAST to FIRST for a parseable bench line (the
      tail may front-truncate the first line);
    - raw stdout dump: same line scan over the whole file.
    """
    with open(path) as fh:
        text = fh.read()
    try:
        obj = json.loads(text)
    except ValueError:
        obj = None
    if isinstance(obj, dict):
        got = _parse_bench_line(text)
        if got:
            return got
        text = obj.get("tail", "")
    for line in reversed(text.splitlines()):
        # a truncated first line still ends with the final complete
        # line's JSON; try the raw line, then the last {...} span
        got = _parse_bench_line(line.strip())
        if got is None and "{" in line:
            got = _parse_bench_line(line[line.index("{"):])
        if got:
            return got
    raise SystemExit(f"no per-query bench map found in {path}")


def compare(a: dict[str, float], b: dict[str, float]) -> dict:
    shared = sorted(set(a) & set(b))
    rows = []
    for q in shared:
        va, vb = a[q], b[q]
        ratio = round(vb / va, 3) if va > 0 else None
        rows.append({"query": q, "a": va, "b": vb, "ratio": ratio})
    rows.sort(
        key=lambda r: (-(r["ratio"] if r["ratio"] is not None else 0),
                       r["query"])
    )
    ta, tb = sum(a[q] for q in shared), sum(b[q] for q in shared)
    return {
        "shared": len(shared),
        "only_a": sorted(set(a) - set(b)),
        "only_b": sorted(set(b) - set(a)),
        "total_a": round(ta, 1),
        "total_b": round(tb, 1),
        "total_ratio": round(tb / ta, 3) if ta else None,
        "rows": rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("artifact_a")
    ap.add_argument("artifact_b")
    ap.add_argument("--label-a", default=None)
    ap.add_argument("--label-b", default=None)
    ap.add_argument(
        "--progress",
        default=os.path.join(os.path.dirname(__file__), "..",
                             "PROGRESS.jsonl"),
    )
    ap.add_argument(
        "--threshold", type=float, default=1.25,
        help="flag queries with ratio above this AND delta > 0.5 s",
    )
    args = ap.parse_args()

    la = args.label_a or os.path.basename(args.artifact_a)
    lb = args.label_b or os.path.basename(args.artifact_b)
    cmp_ = compare(
        load_query_map(args.artifact_a), load_query_map(args.artifact_b)
    )
    flagged = [
        r for r in cmp_["rows"]
        if r["ratio"] is not None and r["ratio"] > args.threshold
        and (r["b"] - r["a"]) > 0.5
    ]
    print(f"{la} -> {lb}: {cmp_['shared']} shared queries, "
          f"total {cmp_['total_a']}s -> {cmp_['total_b']}s "
          f"(ratio {cmp_['total_ratio']})")
    for r in cmp_["rows"]:
        mark = " <-- " if r in flagged else "     "
        print(f"{mark}{r['query']}: {r['a']} -> {r['b']} "
              f"(x{r['ratio']})")
    if cmp_["only_b"]:
        print(f"new in {lb}: {', '.join(cmp_['only_b'])}")
    if cmp_["only_a"]:
        print(f"dropped since {la}: {', '.join(cmp_['only_a'])}")

    record = {
        "kind": "bench_compare",
        "from": la,
        "to": lb,
        "cross_session": True,
        "shared": cmp_["shared"],
        "total_a": cmp_["total_a"],
        "total_b": cmp_["total_b"],
        "total_ratio": cmp_["total_ratio"],
        "flagged": [
            {"query": r["query"], "a": r["a"], "b": r["b"],
             "ratio": r["ratio"]}
            for r in flagged
        ],
        "rows": {r["query"]: r["ratio"] for r in cmp_["rows"]},
        "new": cmp_["only_b"],
        "dropped": cmp_["only_a"],
    }
    with open(args.progress, "a") as fh:
        fh.write(json.dumps(record, separators=(",", ":")) + "\n")
    print(f"appended bench_compare line to {os.path.abspath(args.progress)}")
    sys.exit(0)


if __name__ == "__main__":
    main()
