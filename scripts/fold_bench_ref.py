#!/usr/bin/env python3
"""Fold one or more clean bench runs into scripts/bench_ref.json.

The reference is a COMPOSITE: elementwise per-query MIN across every
clean run that ever contributed (BASELINE.md round 16 on — a single
run's noise should never loosen the gate). New queries enter at their
first clean-run value. Deliberate re-bases (a composite point no full
run ever reproduced, q126/r17 precedent) are explicit arguments, never
silent: the old value is printed and must be justified in BASELINE.md.

Usage:
  python3 scripts/fold_bench_ref.py run1.json [run2.json ...] \
      [--rebase q130_incremental_ann=2.2 ...] [--dry-run]
"""
import json
import sys

REF = "/root/repo/scripts/bench_ref.json"


def main():
    runs, rebases, dry = [], {}, False
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--dry-run":
            dry = True
        elif a == "--rebase":  # --rebase name=value
            i += 1
            name, val = args[i].split("=", 1)
            rebases[name] = float(val)
        else:
            runs.append(a)
        i += 1
    if not runs and not rebases:
        sys.exit(__doc__)

    ref = json.load(open(REF))
    q = dict(ref["queries"])
    tightened, added = [], []
    for path in runs:
        run = json.load(open(path))
        if run.get("contaminated"):
            sys.exit(f"{path} is self-declared contaminated — not foldable")
        for name, t in run["queries"].items():
            if name not in q:
                q[name] = t
                added.append((name, t))
            elif t < q[name]:
                tightened.append((name, q[name], t))
                q[name] = t
    for name, v in rebases.items():
        old = q.get(name)
        print(f"REBASE {name}: {old} -> {v} (document the rationale in BASELINE.md)")
        q[name] = v
    ref["queries"] = dict(sorted(q.items()))
    ref["value"] = round(sum(q.values()), 3)
    print(f"rows {len(q)}, composite total {ref['value']}")
    print(f"tightened {len(tightened)}, added {len(added)}: "
          f"{[(n, round(t, 2)) for n, t in added]}")
    if dry:
        print("(dry run — reference not written)")
        return
    json.dump(ref, open(REF, "w"))
    print(f"wrote {REF}")


if __name__ == "__main__":
    main()
