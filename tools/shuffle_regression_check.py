"""Shuffle-volume regression gate (r7 verdict item 7, made actionable).

Wall-clock deltas between bench recordings can't separate a plan
regression from co-tenant noise (the r6->r7 kmeans false alarm took a
re-run to dismiss).  Shuffle bytes are plan + data determined — on the
same sf they are reproducible to the byte — so a shuffle-volume jump IS
a plan change, no re-run needed.

Compares the current ``BENCH_DETAIL.json`` ``shuffle`` block against a
baseline recording (default: the latest git-committed BENCH_DETAIL that
carries a shuffle block) and reports per-query shuffle-write deltas
above threshold.  Queries new since the baseline are listed, not
flagged.  Exits 1 on regressions so the check can gate a round.

Usage:
    python tools/shuffle_regression_check.py [baseline.json]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
THRESHOLD_RATIO = 1.30  # >30% more shuffle-write bytes = plan change
MIN_BYTES = 1 << 20  # ignore sub-MiB queries (overhead noise)


def _committed_with_shuffle(skip_shuffle: dict | None = None) -> dict | None:
    """Newest committed recording that carries a shuffle block —
    optionally the newest one whose shuffle block DIFFERS from
    ``skip_shuffle``.

    The newest committed block is the comparison target in both
    directions: if the current file EQUALS it, the working state is the
    already-gated committed state and the gate passes (round-8 ADVICE:
    skipping identical blocks walked back to an OLDER round and
    re-flagged a delta the round had already accepted — unchanged code
    exiting 1).  The equality pass still prints an INFORMATIONAL diff
    against the newest DISTINCT committed block (ADVICE r9: a regressed
    record committed without running the gate would otherwise never be
    seen again — the gate can't retroactively fail it, since that round
    already accepted it, but it must not be invisible)."""
    revs = subprocess.run(
        ["git", "log", "--format=%H", "--", "BENCH_DETAIL.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.split()
    for rev in revs:
        raw = subprocess.run(
            ["git", "show", f"{rev}:BENCH_DETAIL.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout
        try:
            d = json.loads(raw)
        except json.JSONDecodeError:
            continue
        if d.get("shuffle") and (
            skip_shuffle is None or d["shuffle"] != skip_shuffle
        ):
            return d
    return None


def main() -> int:
    cur = json.loads((REPO / "BENCH_DETAIL.json").read_text())
    if not cur.get("shuffle"):
        print("current BENCH_DETAIL.json has no shuffle block — run bench.py")
        return 2
    informational = False
    if len(sys.argv) > 1:
        base = json.loads(Path(sys.argv[1]).read_text())
    else:
        base = _committed_with_shuffle()
        if base is None:
            print("no committed baseline with a shuffle block yet — recording only")
            return 0
        if base["shuffle"] == cur["shuffle"]:
            # already gated — but still SHOW the diff vs the newest
            # distinct committed block (exit 0 regardless): this keeps
            # a commit-without-gating from hiding its deltas forever
            base = _committed_with_shuffle(skip_shuffle=cur["shuffle"])
            if base is None:
                print(
                    "shuffle block identical to the newest committed "
                    "recording (no earlier distinct block) — already "
                    "gated, pass"
                )
                return 0
            informational = True
            print(
                "shuffle block identical to the newest committed recording "
                "— already gated, pass; informational diff vs the newest "
                "DISTINCT committed block follows"
            )
    if base.get("sf") != cur.get("sf"):
        print(f"sf mismatch (base {base.get('sf')} vs cur {cur.get('sf')}) — skip")
        return 0
    bs, cs = base["shuffle"], cur["shuffle"]
    regressions, improved, new = [], [], sorted(set(cs) - set(bs))
    for name in sorted(set(bs) & set(cs)):
        b = bs[name]["shuffle_write_bytes"]
        c = cs[name]["shuffle_write_bytes"]
        if c > THRESHOLD_RATIO * b and c - b > MIN_BYTES:
            regressions.append((name, b, c))
        elif b > THRESHOLD_RATIO * c and b - c > MIN_BYTES:
            improved.append((name, b, c))
    for name, b, c in regressions:
        print(f"REGRESSION {name}: shuffle_write {b:,} -> {c:,} bytes")
    for name, b, c in improved:
        print(f"improved   {name}: shuffle_write {b:,} -> {c:,} bytes")
    if new:
        print(f"new since baseline (not compared): {', '.join(new)}")
    print(
        f"{len(regressions)} regressions / {len(improved)} improvements "
        f"over {len(set(bs) & set(cs))} common queries"
        + (" [informational — already gated]" if informational else "")
    )
    return 1 if regressions and not informational else 0


if __name__ == "__main__":
    sys.exit(main())
