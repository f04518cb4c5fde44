#!/usr/bin/env python3
"""Summarize a full-registry VarianceProbe sweep into SIGSWEEP_rN.json.

Usage: python3 tools/sigsweep_summarize.py <varianceprobe.log> <run-NNNN.json> <out.json> <doc>

Reads the per-iteration JSON lines a `runMain graft.tools.VarianceProbe q <iters>`
run prints, classifies every query:
  pinned      - one sig across all iterations
  iter1_build - iteration 1 differs (session-store build jobs fold into
                the first fingerprint), iterations 2..N byte-identical
  bistable    - anything else (adjudicate; the q108 class)
and cross-checks each query's STEADY sig (last iteration's) against the
bench record's plan map. Only stdlib.
"""
import json
import sys


def main(log_path, run_path, out_path, doc):
    iters = {}
    for line in open(log_path):
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if "iter" in d:
            iters.setdefault(d["query"], []).append((d["iter"], d["plan"]["sig"]))

    run = json.load(open(run_path))
    plan = run.get("plan", {})

    pinned, build, bistable, mismatches = [], [], [], []
    n_iters = 0
    for q, rows in sorted(iters.items()):
        rows.sort()
        sigs = [s for _, s in rows]
        n_iters = max(n_iters, len(sigs))
        steady = sigs[-1]
        if len(set(sigs)) == 1:
            pinned.append(q)
        elif len(set(sigs[1:])) == 1 and sigs[0] != sigs[1]:
            build.append({"query": q, "build_sig": sigs[0], "steady_sig": steady})
        else:
            bistable.append({"query": q, "sigs": sorted(set(sigs))})
        rec = plan.get(q, {}).get("sig")
        if rec is not None and rec != steady:
            mismatches.append({"query": q, "steady_sig": steady, "record_sig": rec})

    out = {
        "_doc": doc,
        "n_queries": len(iters),
        "iters": n_iters,
        "pinned_all_iters": len(pinned),
        "iter1_build_class": build,
        "bistable": bistable,
        "steady_sig_matches_record": not mismatches,
        "record": run_path.split("/")[-1],
        "steady_sig_mismatches": mismatches,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"{len(iters)} queries: {len(pinned)} pinned, {len(build)} iter1-build, "
          f"{len(bistable)} bistable; steady-vs-record mismatches: {len(mismatches)}")
    for b in bistable:
        print("BISTABLE:", b["query"], b["sigs"])
    for m in mismatches[:10]:
        print("MISMATCH:", m)


if __name__ == "__main__":
    main(*sys.argv[1:5])
