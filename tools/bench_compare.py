#!/usr/bin/env python3
"""Compare two bench maps (the {"sf":…, "queries":{name:sec}} shape or a
raw Bench JSON line): per-query deltas, common-subset ratio, new/gone —
plus the CANARY adjudication (round-14 directive 7): when both files
carry a "canary" block (plan fingerprint + shuffle read/write bytes per
headline query), classify each wall-time delta mechanically:

  DRIFT        same fingerprint, same bytes, wall moved  -> environment
  STABLE       same fingerprint, same bytes, wall ~flat  -> nothing
  PLAN-CHANGED fingerprint differs                       -> real change
  INVESTIGATE  same fingerprint, bytes moved             -> data/volume

Bytes on the data-dependent iterative kernels wobble a few percent run
to run (seen ±3–7% on same-code sweeps), so "same bytes" means within
BYTES_TOL; everything past it is INVESTIGATE, not silently drift.
"""
import json
import sys

BYTES_TOL = 0.10   # relative shuffle-bytes tolerance for "same bytes"
WALL_TOL = 0.25    # relative wall tolerance below which a pair is STABLE


def load_full(path):
    d = json.load(open(path))
    if "tail" in d and "queries" not in d:
        sys.exit(f"{path} is the driver's truncated wrapper (a 2000-char "
                 "'tail') — diff the full artifacts instead: "
                 "bench_queries.json / bench_last.json, snapshotted "
                 "per round")
    return d


def load(path):
    d = load_full(path)
    return d["queries"] if "queries" in d else d


def same_bytes(a, b):
    if a == b:
        return True
    hi = max(abs(a), abs(b), 1)
    return abs(a - b) / hi <= BYTES_TOL


def canary_diff(old_full, new_full, old_q, new_q):
    co, cn = old_full.get("canary"), new_full.get("canary")
    if not co or not cn:
        print("\n(no canary block on both sides — wall-only compare; "
              "adjudication unavailable)")
        return
    print(f"\ncanary adjudication ({len(set(co) & set(cn))} common):")
    verdicts = {}
    for q in sorted(set(co) & set(cn)):
        o, n = co[q], cn[q]
        wo, wn = old_q.get(q), new_q.get(q)
        wall = (f"{wo:.2f}->{wn:.2f}s" if wo is not None and wn is not None
                else "wall n/a")
        if o["p"] != n["p"]:
            # the optimized-plan hash embeds cache substitution, so it
            # is sensitive to the sweep's cache-build interleaving (r14
            # finding); the cache-blind logical hash disambiguates
            if (o.get("pl") and o.get("pl") == n.get("pl")
                    and same_bytes(o["sr"], n["sr"])
                    and same_bytes(o["sw"], n["sw"])):
                verdict = "CACHE-LAYOUT (bytes ok)"
            elif o.get("pl") and o.get("pl") == n.get("pl"):
                # same construction (cache-blind hash matches) but the
                # shuffle volume moved: not a plan change — a data/AQE
                # volume movement that needs a standalone reproduction
                verdict = "INVESTIGATE (bytes moved, pl same)"
            elif o["sr"] == n["sr"] and o["sw"] == n["sw"]:
                # both hashes moved but the shuffles are EXACTLY equal:
                # seen when Spark's canonicalization orders commutative
                # operands by pre-normalization exprId hashCodes (lambda
                # variables salt them per session — r15 l57 finding);
                # verify with a standalone fingerprint probe, but equal
                # bytes mean the executed work is identical
                verdict = "FP-CHANGED (bytes equal)"
            else:
                verdict = "PLAN-CHANGED"
        elif same_bytes(o["sr"], n["sr"]) and same_bytes(o["sw"], n["sw"]):
            if (wo is not None and wn is not None and
                    abs(wn - wo) / max(wo, 1e-3) > WALL_TOL):
                verdict = "DRIFT (env)"
            else:
                verdict = "stable"
        else:
            verdict = "INVESTIGATE (bytes moved)"
        verdicts[verdict.split(" ")[0]] = verdicts.get(
            verdict.split(" ")[0], 0) + 1
        print(f"  {verdict:24s} {q}  {wall}  "
              f"sr {o['sr']}->{n['sr']}  sw {o['sw']}->{n['sw']}  "
              f"fp {o['p'][:12]}{'==' if o['p'] == n['p'] else '!='}"
              f"{n['p'][:12]}")
    for q in sorted(set(cn) - set(co)):
        verdicts["NEW-CANARY"] = verdicts.get("NEW-CANARY", 0) + 1
        print(f"  NEW-CANARY               {q}")
    # machine-readable tally so the round notes can cite the tool's
    # output verbatim (zero hand-adjudicated entries)
    print("verdict tally: " + json.dumps(verdicts, sort_keys=True))


def main(old_path, new_path, top=15):
    old_full, new_full = load_full(old_path), load_full(new_path)
    old = old_full.get("queries", old_full)
    new = new_full.get("queries", new_full)
    common = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(f"common {len(common)} queries: old={t_old:.1f}s new={t_new:.1f}s "
          f"ratio={t_new / t_old:.3f}")
    added = sorted(set(new) - set(old))
    gone = sorted(set(old) - set(new))
    if added:
        t_add = sum(new[q] for q in added)
        print(f"added ({len(added)}, {t_add:.1f}s): "
              + ", ".join(f"{q}={new[q]:.2f}" for q in added))
    if gone:
        print(f"gone ({len(gone)}): " + ", ".join(gone))
    deltas = sorted(((new[q] - old[q], q) for q in common), reverse=True)
    print(f"\ntop +{top} regressions (sec):")
    for d, q in deltas[:top]:
        print(f"  {d:+6.2f}  {q}  ({old[q]:.2f} -> {new[q]:.2f})")
    print(f"\ntop {top} improvements (sec):")
    for d, q in deltas[-top:][::-1]:
        print(f"  {d:+6.2f}  {q}  ({old[q]:.2f} -> {new[q]:.2f})")
    canary_diff(old_full, new_full, old, new)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 15)
