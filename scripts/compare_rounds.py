#!/usr/bin/env python3
"""Round-over-round bench comparison from ENGINE artifacts.

The driver's BENCH_rNN.json captures only the last 2000 chars of stdout,
which cannot hold a complete per-query map at 181+ catalog rows (r18's
tail lost pipeline_e2e and q01-q04, and `parsed` went null). The engine's
full-precision artifact (SPARK_GRAFT_BENCH_OUT, default target/bench.json,
archived per round as target/bench_full_rNN*.json) is the artifact of
record; this script diffs two of them in one command:

    python3 scripts/compare_rounds.py OLD.json NEW.json [--thr 2.0]
    python3 scripts/compare_rounds.py --ref NEW.json        # vs scripts/bench_ref.json

Output: totals (batch/streaming split), contamination verdicts of both
runs, and every common row whose NEW/OLD ratio exceeds --thr (default
2.0), plus rows present in only one artifact. Falls back to parsing a
driver BENCH_rNN.json (reads `parsed`, else regexes the tail) so old
rounds remain comparable. Exit code 1 when any >thr row exists AND the
new run is clean (a contaminated run's ratios are not a trend).
"""
import json
import re
import sys


def load(path):
    """Return (queries: name->sec, meta) from an engine artifact or a
    driver BENCH_rNN.json. Engine keys are full names; driver tails key
    on the unique qNN prefix — comparison normalizes to the prefix."""
    with open(path) as f:
        txt = f.read()
    d = json.loads(txt)
    if "tail" in d:  # driver capture
        if d.get("parsed") and d["parsed"].get("queries"):
            p = d["parsed"]
            return p["queries"], {k: p.get(k) for k in (
                "value", "total_batch", "total_streaming", "contaminated",
                "contaminated_by", "host_other_cores")}
        # regex the truncated tail: whatever query rows survive
        qs = {m.group(1): float(m.group(2)) for m in re.finditer(
            r'"(q\d+|pipeline[a-z_]*)"\s*:\s*(-?[0-9][0-9.eE+-]*)', d["tail"])}
        return qs, {"value": None, "note": "driver tail (truncated capture)"}
    meta = {k: d.get(k) for k in (
        "value", "total_batch", "total_streaming", "contaminated",
        "contaminated_by", "host_other_cores", "host_steal_pct",
        "calibration_sec", "calibration_end_sec", "launch_mode", "sf")}
    return d["queries"], meta


def prefix(name):
    return name.split("_")[0]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--thr"):
            thr = float(a.split("=", 1)[1] if "=" in a else args.pop())
    if "--ref" in sys.argv[1:]:
        old_path, new_path = "scripts/bench_ref.json", args[0]
    else:
        old_path, new_path = args[0], args[1]
    old_q, old_m = load(old_path)
    new_q, new_m = load(new_path)
    old_p = {prefix(k): v for k, v in old_q.items() if v >= 0}
    new_p = {prefix(k): v for k, v in new_q.items() if v >= 0}
    common = sorted(set(old_p) & set(new_p))
    only_old = sorted(set(old_p) - set(new_p))
    only_new = sorted(set(new_p) - set(old_p))
    sum_old = sum(old_p[k] for k in common)
    sum_new = sum(new_p[k] for k in common)

    print(f"OLD {old_path}: total={old_m.get('value')} "
          f"contaminated={old_m.get('contaminated')} "
          f"by={old_m.get('contaminated_by')}")
    print(f"NEW {new_path}: total={new_m.get('value')} "
          f"contaminated={new_m.get('contaminated')} "
          f"by={new_m.get('contaminated_by')} "
          f"host_other_cores={new_m.get('host_other_cores')}")
    ratio = sum_new / sum_old if sum_old else float("nan")
    print(f"common rows: {len(common)}  sum OLD={sum_old:.1f}s "
          f"NEW={sum_new:.1f}s  ratio={ratio:.3f}")
    if only_old:
        print(f"only in OLD ({len(only_old)}): {','.join(only_old)}")
    if only_new:
        print(f"only in NEW ({len(only_new)}): {','.join(only_new)}")

    hot = [(k, old_p[k], new_p[k]) for k in common
           if new_p[k] > thr * old_p[k] and new_p[k] - old_p[k] > 0.5]
    cold = [(k, old_p[k], new_p[k]) for k in common
            if old_p[k] > thr * new_p[k] and old_p[k] - new_p[k] > 0.5]
    if hot:
        print(f"\nrows >{thr}x SLOWER in NEW (+0.5s floor):")
        for k, o, n in sorted(hot, key=lambda t: -t[2] / max(t[1], 1e-9)):
            print(f"  {k}: {o:.2f}s -> {n:.2f}s  ({n / max(o, 1e-9):.2f}x)")
    if cold:
        print(f"\nrows >{thr}x FASTER in NEW (+0.5s floor):")
        for k, o, n in sorted(cold, key=lambda t: -t[1] / max(t[2], 1e-9)):
            print(f"  {k}: {o:.2f}s -> {n:.2f}s  ({n / max(o, 1e-9):.2f}x)")
    if not hot and not cold:
        print(f"\nno rows moved more than {thr}x in either direction.")

    new_clean = not new_m.get("contaminated", False)
    sys.exit(1 if (hot and new_clean) else 0)


if __name__ == "__main__":
    main()
