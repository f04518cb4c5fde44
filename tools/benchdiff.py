#!/usr/bin/env python3
"""Compare two bench artifacts with ambient adjudication.

Usage: python3 tools/benchdiff.py OLD.json NEW.json [--top N]

Prints the common-query total delta, the control-family reading
(q31/q45/q01/q22 — the stable scan/shuffle vs iterative split used for
ambient adjudication since round 7), the top movers each way, and the
queries present in only one artifact. Reads plain JSON — no Spark, no
DuckDB; safe to run while a bench is running elsewhere.
"""
import json
import sys

CONTROLS = ["q31_dedup_ngram_jaccard", "q45_dedup_clusters",
            "q01_conv_rollup", "q22_closure"]


def main():
    argv = sys.argv[1:]
    top = 8
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = argv
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    old = json.load(open(args[0]))["queries"]
    new = json.load(open(args[1]))["queries"]
    common = sorted(set(old) & set(new))
    s_old = sum(old[k] for k in common)
    s_new = sum(new[k] for k in common)
    print(f"common {len(common)}: {s_old:.1f}s -> {s_new:.1f}s "
          f"({(s_new / s_old - 1) * 100:+.1f}%)")
    print("controls (ambient gauge):")
    for c in CONTROLS:
        if c in old and c in new:
            print(f"  {c}: {old[c]:.2f} -> {new[c]:.2f} "
                  f"({(new[c] / old[c] - 1) * 100:+.0f}%)")
    movers = sorted(common, key=lambda k: new[k] - old[k])
    print("improved:")
    for k in movers[:top]:
        if new[k] < old[k]:
            print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f}")
    print("regressed:")
    for k in movers[-top:]:
        if new[k] > old[k]:
            print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print("only in OLD:", ", ".join(only_old))
    if only_new:
        print("only in NEW:",
              ", ".join(f"{k} ({new[k]:.2f}s)" for k in only_new))


if __name__ == "__main__":
    main()
