#!/usr/bin/env python3
"""Telemetry diff between two full bench runs (VERDICT r15 item 6).

The r14->r15 adjudication showed a +12.5% total swing that one per-query
exec-telemetry diff proved to be ambient (byte-identical shuffle/tasks/jobs
on every top mover). This tool makes that diff a committed per-round
artifact instead of a manual forensic step.

Usage:
    python3 tools/bench_diff.py [old.json new.json] [--out PATH]

With no positional args it picks the two highest-numbered
bench_history/run-NNNN.json files. Writes a JSON report (default
bench_history/diff-<old>-<new>.json) and prints a short markdown summary
to stdout.

Classification per common query. When BOTH runs carry executed-plan
fingerprints (the `plan` map, round-16 on), the signature is the primary
signal — it pins plan identity exactly, so byte drift under an equal sig
is ambient BY CONSTRUCTION (compressed-shuffle size / bus-attribution
noise), never something to adjudicate:
  identical       - plan sig equal AND shuffle_read/tasks/jobs byte-equal.
  same_plan_drift - plan sig equal, telemetry moved a LITTLE (bytes
                    within 5% relative, jobs within +-2): ambient byte /
                    scheduling drift under a PINNED identical plan (the
                    round-16 q05/q126 class).
  same_plan_work_delta - plan sig equal but telemetry moved a LOT
                    (shuffle_read rel > 5% or |jobs delta| > 2). The sig
                    deliberately normalizes away exchange-reuse loss,
                    AQEShuffleRead coalesce changes and build-side swaps
                    (PlanSig scaladoc) — a work regression of that class
                    hides under an equal sig, so it joins the drift list
                    for adjudication (round-17, ADVICE item 1).
  plan_delta      - plan sig moved -> a real plan change; adjudicate
                    (the node-histogram diff rides the row).
  plan_delta_known - plan sig moved but BOTH sigs belong to the query's
                    accepted set in bench_history/SIG_CLASSES.json: a
                    root-caused AQE race class (round-18, the q108
                    anti-join conversion race) — self-adjudicating, the
                    class name rides the row. A sig outside the set
                    still reads plan_delta.
The sig is authoritative only when both sides folded at least one real
plan (n_plans > 0): Collector.takeFingerprint can race the async
listener bus and return an empty fingerprint (sig = md5("")), and two
empty sigs comparing equal must not mask a real plan change — such rows
fall back to the byte classes (ADVICE item 2).
Fallback (either run lacks fingerprints), by exec telemetry alone:
  identical  - shuffle_read, tasks and jobs all byte-equal -> any wall
               delta is ambient (scheduler/CPU noise), not plan drift.
  jitter     - shuffle_read within 1% relative and jobs within +-2:
               compressed-shuffle byte drift / store-build variance in
               session fixtures, not a plan change (observed 0.01-0.03%
               on q57/q181/q160-class queries between identical plans).
  jobs_delta - same shuffle_read but job/task counts moved (priced guard
               additions look like this: +1..3 jobs, ~equal bytes).
  work_delta - shuffle_read moved >= 1% -> the PLAN changed; adjudicate.
Only stdlib; safe to run anywhere the repo is checked out.
"""
import json
import os
import re
import sys

HIST = os.path.join(os.path.dirname(__file__), "..", "bench_history")

# Accepted band for a run's calib MEDIAN, seconds (round-19, VERDICT
# r18 item 2; documented in BASELINE.md "Round-19: the pinned ambient
# calib band"). Derivation: committed medians 0.603-0.70 s
# (run-0015..0017) widened by the worst single-sample spread observed
# in the 24-sample record (0.486-0.855 around a 0.632 median, ~±35%).
# A record whose calib median leaves this band ran on a machine whose
# ambient is OUTSIDE the regime every committed number was priced in —
# the diff flags it so a machine-degradation round is detectable from
# the artifact alone (the 243-281 s same-work swings of r16-r17 stayed
# INSIDE this band; leaving it is a different animal). Only medians
# from the dense cadence (>= MIN_CALIB_SAMPLES, the every-32-queries
# sampling of run-0017 on) are flagged: the sparse 3-sample records
# are indicative only.
CALIB_BAND = (0.45, 0.95)
MIN_CALIB_SAMPLES = 8


def latest_two(hist):
    runs = sorted(
        (int(m.group(1)), os.path.join(hist, f))
        for f in os.listdir(hist)
        for m in [re.fullmatch(r"run-(\d{4})\.json", f)]
        if m
    )
    if len(runs) < 2:
        sys.exit("need two full runs in bench_history/ to diff")
    return runs[-2][1], runs[-1][1]


def load(path):
    with open(path) as fh:
        return json.load(fh)


def load_sig_classes(hist):
    """Adjudicated sig-race registry (bench_history/SIG_CLASSES.json):
    query -> {class, accepted_sigs, sig_v}. Absent file = empty."""
    path = os.path.join(hist, "SIG_CLASSES.json")
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        raw = json.load(fh)
    return {k: v for k, v in raw.items() if not k.startswith("_")}


def classify(old_e, new_e, old_p=None, new_p=None, sig_class=None):
    if old_e is None or new_e is None:
        return "no_telemetry"
    so, sn = old_e.get("shuffle_read", 0), new_e.get("shuffle_read", 0)
    same_bytes = so == sn
    rel = abs(sn - so) / so if so else (0.0 if sn == 0 else 1.0)
    same_sched = (old_e.get("tasks") == new_e.get("tasks")
                  and old_e.get("jobs") == new_e.get("jobs"))
    jobs_close = abs(
        (new_e.get("jobs") or 0) - (old_e.get("jobs") or 0)) <= 2
    # plan fingerprints, when present on both sides AT THE SAME
    # ALGORITHM VERSION and folded from at least one real plan each,
    # are authoritative (a normalization-rule change bumps the version;
    # an empty fingerprint — listener-bus race, n_plans=0 — is not a
    # plan identity and falls through to the byte classes)
    if (old_p and new_p and old_p.get("sig") and new_p.get("sig")
            and old_p.get("v") == new_p.get("v")
            and (old_p.get("n_plans") or 0) > 0
            and (new_p.get("n_plans") or 0) > 0):
        if old_p["sig"] != new_p["sig"]:
            # the registry entry must match BOTH fingerprints' algorithm
            # version (ADVICE r18 item 1). The outer branch already
            # requires old_p.v == new_p.v, so checking new_p here is
            # redundant TODAY — it is kept explicit so the invariant
            # survives a refactor that relaxes the outer condition
            # (e.g. a future cross-version comparability rule): a stale
            # SIG_CLASSES entry must never self-adjudicate a sig pair
            # computed under a different normalization.
            if (sig_class
                    and sig_class.get("sig_v") == old_p.get("v")
                    and sig_class.get("sig_v") == new_p.get("v")
                    and old_p["sig"] in sig_class.get("accepted_sigs", [])
                    and new_p["sig"] in sig_class.get("accepted_sigs", [])):
                return "plan_delta_known"
            return "plan_delta"
        if same_bytes and same_sched:
            return "identical"
        if rel > 0.05 or not jobs_close:
            return "same_plan_work_delta"
        return "same_plan_drift"
    if same_bytes and same_sched:
        return "identical"
    if same_bytes:
        return "jobs_delta"
    if rel < 0.01 and jobs_close:
        return "jitter"
    return "work_delta"


def main(argv):
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) == 2:
        old_path, new_path = argv
    elif not argv:
        old_path, new_path = latest_two(HIST)
    else:
        sys.exit(__doc__)

    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    oe, ne = old.get("exec", {}), new.get("exec", {})
    op, np_ = old.get("plan", {}), new.get("plan", {})
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    sig_classes = load_sig_classes(HIST)
    rows = []
    for name in common:
        dt = nq[name] - oq[name]
        cls = classify(oe.get(name), ne.get(name),
                       op.get(name), np_.get(name), sig_classes.get(name))
        row = {"query": name, "t_old": oq[name], "t_new": nq[name],
               "dt": round(dt, 4), "class": cls}
        if cls == "plan_delta_known":
            row["sig_class"] = sig_classes[name]["class"]
        if cls in ("jobs_delta", "work_delta", "jitter",
                   "same_plan_drift", "same_plan_work_delta", "plan_delta",
                   "plan_delta_known"):
            for k in ("shuffle_read", "tasks", "jobs"):
                row[k + "_old"] = oe.get(name, {}).get(k)
                row[k + "_new"] = ne.get(name, {}).get(k)
        if cls == "plan_delta":
            row["nodes_old"] = op.get(name, {}).get("nodes")
            row["nodes_new"] = np_.get(name, {}).get("nodes")
            row["n_plans_old"] = op.get(name, {}).get("n_plans")
            row["n_plans_new"] = np_.get(name, {}).get("n_plans")
        rows.append(row)

    total_old = sum(oq[n] for n in common)
    total_new = sum(nq[n] for n in common)
    by_class = {}
    for r in rows:
        by_class[r["class"]] = by_class.get(r["class"], 0) + 1
    movers = sorted(rows, key=lambda r: -abs(r["dt"]))[:15]
    drift = [r for r in rows if r["class"] in
             ("work_delta", "plan_delta", "same_plan_work_delta")]

    # ambient normalization (round-18): when both runs carry the fixed
    # calibration row (Bench `calib`: constant input, constant plan,
    # sampled every 32 queries), the MEDIAN ratio is an in-artifact
    # ambient denominator — common_ratio_ambient_adj answers "how much
    # of the total swing is the MACHINE" without per-round forensics.
    # Median, not min: the first calib-vs-calib diff (0015->0016)
    # showed min biases to one best-case burst instant and can move
    # OPPOSITE to the sustained ambient the queries ran under. With the
    # old 3-samples-per-run records the median is still coarse — treat
    # ambient_ratio from those as indicative, not authoritative.
    def med(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0
    calib_old, calib_new = old.get("calib") or [], new.get("calib") or []
    ambient = (round(med(calib_new) / med(calib_old), 4)
               if calib_old and calib_new and med(calib_old) > 0 else None)

    # calib-band check (round-19): each side with a dense calib record
    # gets its median checked against the pinned CALIB_BAND; an
    # out-of-band side is flagged in the report AND on stdout, so a
    # machine-degradation round announces itself in the artifact.
    def band_status(samples):
        if len(samples) < MIN_CALIB_SAMPLES:
            return None  # sparse record: indicative only, never flagged
        m = med(samples)
        lo, hi = CALIB_BAND
        return {"median": round(m, 4), "lo": lo, "hi": hi,
                "status": "ok" if lo <= m <= hi else "out_of_band"}
    calib_band = {
        k: v for k, v in (("old", band_status(calib_old)),
                          ("new", band_status(calib_new))) if v}

    report = {
        "old": os.path.basename(old_path), "new": os.path.basename(new_path),
        "common_total_old_sec": round(total_old, 2),
        "common_total_new_sec": round(total_new, 2),
        "common_ratio": round(total_new / total_old, 4) if total_old else None,
        "calib_old": calib_old, "calib_new": calib_new,
        "calib_band": calib_band or None,
        "ambient_ratio": ambient,
        "common_ratio_ambient_adj": (
            round(total_new / total_old / ambient, 4)
            if ambient and total_old else None),
        "n_common": len(common), "added": added, "removed": removed,
        "class_counts": by_class,
        "work_delta_queries": [r["query"] for r in drift],
        "top_movers": movers,
    }

    if out_path is None:
        tag = (re.sub(r"\D", "", os.path.basename(old_path)) + "-"
               + re.sub(r"\D", "", os.path.basename(new_path)))
        out_path = os.path.join(os.path.dirname(new_path), f"diff-{tag}.json")
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")

    ident = by_class.get("identical", 0)
    print(f"# bench diff {report['old']} -> {report['new']}")
    for side, b in (calib_band or {}).items():
        if b["status"] == "out_of_band":
            print(f"WARNING: {side} run's calib median {b['median']}s is "
                  f"OUTSIDE the pinned ambient band [{b['lo']}, {b['hi']}] "
                  f"(BASELINE.md) — machine-degradation round; totals are "
                  f"not comparable to the committed record book raw")
    amb = (f", ambient {ambient:.3f}x -> adj "
           f"{report['common_ratio_ambient_adj']:.3f}x" if ambient else "")
    print(f"common {len(common)}: {total_old:.1f}s -> {total_new:.1f}s "
          f"({report['common_ratio']:.3f}x{amb}); classes {by_class}")
    print(f"{ident}/{len(common)} byte-identical work; "
          f"plan drift in: {report['work_delta_queries'] or 'none'}")
    for r in movers[:8]:
        print(f"  {r['query']:40s} {r['t_old']:7.2f} -> {r['t_new']:7.2f} "
              f"({r['dt']:+.2f}s, {r['class']})")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
