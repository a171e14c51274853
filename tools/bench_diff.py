"""Round-over-round per-query bench regression gate (VERDICT r06 #4).

Compares the freshly-written ``BENCH_DETAIL.json`` (all per-query
seconds from the last `bench.py` run) against the PRIOR round's detail
— by default the last committed version, read via
``git show HEAD:BENCH_DETAIL.json`` so the tool needs no side files —
and writes ``BENCH_DIFF_r{N}.json`` with every >2x steady-state
regression, for the pre-snapshot checklist.

Usage:
    python tools/bench_diff.py --round 7 [--old PATH] [--new PATH]

Flag logic (matches the documented bench protocol, BASELINE.md "Bench
protocol"):

- a pair is a REGRESSION candidate when new/old > 2;
- the noise floor: entries are ignored while new <= max(1.0 s,
  2 x steady) — BENCH_STEADY.json records each query's fresh-JVM
  steady state, and sub-second jitter at sf0.1 is host noise, not a
  plan change;
- cache-ATTRIBUTION shifts inside the shared-subplan dedup/cluster
  family (the PPJoin pair table, shingle-set and simhash caches are
  built by whichever family member runs first in registration order,
  so a registry rotation moves whole pipeline cost between entries)
  are excused when the FAMILY SUM stayed within 1.5x — the family sum
  is the stable quantity, single entries are not. Excused entries are
  still listed, marked ``excused_by_family``.

``--recheck`` makes the gate self-verifying: every unexcused
regression candidate is re-measured in its own fresh JVM
(`bench.py --single`, the steady-state protocol) and the smaller of
in-session/fresh is kept — in-session entries under bench.py's 3 s
rerun floor never get the in-bench recheck, so a registry-rotation
change of ITERATION ORDER can shift cold-cache attribution onto them
(observed round 7: q_dedup_exact 0.47→1.79 in-session, 0.81 fresh).
A candidate that survives a fresh JVM is a real plan regression.

Exit status 1 when any unexcused regression remains, so the checklist
can gate on it.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries sharing cached subplans (pair/shingle/simhash pipelines +
# the cluster label-propagation consumers): registration order decides
# which entry gets billed for the cold pipeline, so only the SUM over
# this set is round-over-round comparable.
SHARED_SUBPLAN_FAMILY = {
    "q_dedup_ngram_jaccard",
    "q_dedup_clusters",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_simhash_hamming",
    "q_containment_dedup",
    "q_dup_cluster_profile",
    "q_dup_chunk_fraction",
    "q_winnow_overlap",
    "q_cluster_canonical",
    "q_chunk_dedup_rewrite",
    "q_incremental_dedup",
}


def _load(path_or_ref: str) -> dict[str, float]:
    if path_or_ref.startswith("git:"):
        ref = path_or_ref[4:]
        raw = subprocess.run(
            ["git", "-C", REPO, "show", f"{ref}:BENCH_DETAIL.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        data = json.loads(raw)
    else:
        with open(path_or_ref) as f:
            data = json.load(f)
    q = data.get("queries", data)
    return {k: float(v) for k, v in q.items()}


def diff(
    old: dict[str, float], new: dict[str, float], steady: dict[str, float]
) -> dict:
    pairs = sorted(set(old) & set(new))
    # family sums over the INTERSECTION of rounds only (ADVICE r07):
    # a family member added or removed between rounds would otherwise
    # skew one sum — removal shrinks fam_new and can excuse a real
    # regression in a surviving member; addition can de-excuse a
    # legitimate attribution shift.
    fam_both = SHARED_SUBPLAN_FAMILY & set(old) & set(new)
    fam_old = sum(old[q] for q in fam_both)
    fam_new = sum(new[q] for q in fam_both)
    fam_ok = fam_old > 0 and fam_new / fam_old <= 1.5
    regressions = []
    for q in pairs:
        o, n = old[q], new[q]
        if o <= 0 or n / o <= 2:
            continue
        if n <= max(1.0, 2 * steady.get(q, 0.0)):
            continue  # under the noise floor
        excused = q in SHARED_SUBPLAN_FAMILY and fam_ok
        regressions.append(
            {
                "query": q,
                "old_sec": o,
                "new_sec": n,
                "ratio": round(n / o, 2),
                "steady_sec": steady.get(q),
                "excused_by_family": excused,
            }
        )
    unexcused = [r for r in regressions if not r["excused_by_family"]]
    return {
        "n_pairs": len(pairs),
        "n_regressions": len(unexcused),
        "regressions": regressions,
        "family_sum_old_sec": round(fam_old, 2),
        "family_sum_new_sec": round(fam_new, 2),
        "family_sum_stable": fam_ok,
        "new_queries": sorted(set(new) - set(old)),
        "removed_queries": sorted(set(old) - set(new)),
        "total_old_sec": round(sum(old.values()), 2),
        "total_new_sec": round(sum(new.values()), 2),
    }


# Host-drift sentinels (round 10): trivial-plan queries nobody's
# change touches — scan+filter, scan+agg, scan+project. When the
# HOST is slower than when BENCH_STEADY was measured (shared-VM
# steal, thermal), every fresh-JVM figure inflates together; the
# sentinels' fresh/steady ratio measures that inflation so a
# candidate whose fresh time is within the SCALED noise floor is
# excused as drift, not misread as a plan regression (observed this
# round: untouched q_rfm_segments flagged at 3.1x while q_filter and
# q_tpch_q6 ran 2.4-3x their steady entries on the same box).
_DRIFT_SENTINELS = ("q_filter", "q_tpch_q6", "q_project_rekey")


def _recorded_host_scale(new_path: str) -> tuple[float, dict] | None:
    """Self-normalizing bench artifact (VERDICT r10 #5): bench.py now
    records its own sentinel readings under ``host_scale`` in
    BENCH_DETAIL.json — read them instead of re-measuring (the
    readings were taken in the same co-tenancy window as the timings
    they normalize, which an after-the-fact re-measure is not)."""
    try:
        with open(new_path) as f:
            hs = json.load(f).get("host_scale")
    except (OSError, ValueError):
        return None
    if not isinstance(hs, dict) or not hs.get("sentinels"):
        return None
    return float(hs["median_ratio"]), dict(hs["sentinels"])


def _host_scale(steady: dict[str, float], sf_dir: str) -> tuple[float, dict]:
    """Median fresh/steady ratio over the sentinels (1.0 floor)."""
    ratios, readings = [], {}
    for q in _DRIFT_SENTINELS:
        s = steady.get(q, 0.0)
        if s <= 0:
            continue
        try:
            t = _fresh_single(q, sf_dir)
        except Exception:
            continue
        readings[q] = {"fresh_sec": t, "steady_sec": s, "ratio": round(t / s, 2)}
        ratios.append(t / s)
    if not ratios:
        return 1.0, readings
    ratios.sort()
    return max(1.0, ratios[len(ratios) // 2]), readings


def _fresh_single(name: str, sf_dir: str) -> float:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--single", name],
        capture_output=True,
        text=True,
        timeout=900,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
    )
    return float(proc.stdout.strip().splitlines()[-1])


def _stale_steady_entries() -> list[str]:
    """Run the plan-fingerprint staleness check (steady_refresh
    --check) and return the stale/missing list — a noise floor that
    references plans that no longer exist must fail the gate loudly
    (VERDICT r08 #7a), not silently excuse a real regression."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "steady_refresh.py"), "--check"],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in proc.stdout.splitlines():
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if "stale_or_missing" in d:
            return list(d["stale_or_missing"]) + list(
                d.get("entries_for_removed_queries", [])
            )
    raise RuntimeError(
        f"steady_refresh --check produced no parseable report: {proc.stdout!r}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--old", default="git:HEAD")
    ap.add_argument("--new", default=os.path.join(REPO, "BENCH_DETAIL.json"))
    ap.add_argument("--recheck", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--no-stale-check",
        action="store_true",
        help="skip the steady-floor fingerprint staleness gate "
        "(iteration use only — the round gate must run it)",
    )
    args = ap.parse_args()
    steady_path = os.path.join(REPO, "BENCH_STEADY.json")
    steady = {}
    if os.path.exists(steady_path):
        with open(steady_path) as f:
            steady = {k: float(v) for k, v in json.load(f).items()}
    stale_floor: list[str] = []
    if not args.no_stale_check:
        stale_floor = _stale_steady_entries()
    old, new = _load(args.old), _load(args.new)
    report = diff(old, new, steady)
    if args.recheck and report["n_regressions"]:
        fresh = {}
        for r in report["regressions"]:
            if r["excused_by_family"]:
                continue
            q = r["query"]
            try:
                fresh[q] = _fresh_single(q, args.sf_dir)
            except Exception as exc:  # keep the in-session figure, say so
                print(f"fresh recheck failed for {q}: {exc!r}")
        for q, t in fresh.items():
            new[q] = min(new[q], t)
        report = diff(old, new, steady)
        for r in report["regressions"]:
            if r["query"] in fresh:
                r["fresh_sec"] = fresh[r["query"]]
        report["rechecked"] = sorted(fresh)
        # host-drift excusal: only engaged when the sentinels say the
        # box is measurably slower than the steady era (>1.2x), and
        # only for candidates whose FRESH time fits the scaled floor
        if report["n_regressions"]:
            recorded = (
                _recorded_host_scale(args.new)
                if not args.new.startswith("git:")
                else None
            )
            scale, readings = recorded or _host_scale(steady, args.sf_dir)
            report["host_scale"] = round(scale, 2)
            report["host_sentinels"] = readings
            if scale > 1.2:
                for r in report["regressions"]:
                    s = r.get("steady_sec") or 0.0
                    f2 = r.get("fresh_sec")
                    if (
                        not r["excused_by_family"]
                        and f2 is not None
                        and s > 0
                        and f2 <= 2 * s * scale
                    ):
                        r["excused_by_host_drift"] = True
                report["n_regressions"] = sum(
                    1
                    for r in report["regressions"]
                    if not r["excused_by_family"]
                    and not r.get("excused_by_host_drift")
                )
    report["stale_steady_entries"] = sorted(stale_floor)
    out = os.path.join(REPO, f"BENCH_DIFF_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: v for k, v in report.items() if k != "regressions"}))
    for r in report["regressions"]:
        print(json.dumps(r))
    print(f"wrote {out}")
    if stale_floor:
        print(
            f"STALE steady floor ({len(stale_floor)} entries) — run "
            f"`python tools/steady_refresh.py --refresh` before gating: "
            f"{stale_floor[:10]}{'...' if len(stale_floor) > 10 else ''}"
        )
    return 1 if (report["n_regressions"] or stale_floor) else 0


if __name__ == "__main__":
    raise SystemExit(main())
