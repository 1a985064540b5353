#!/usr/bin/env python3
"""Compare two bench maps (the {"sf":…, "queries":{name:sec}} shape or a
raw Bench JSON line): per-query deltas, common-subset ratio, new/gone."""
import json
import sys


def load(path):
    d = json.load(open(path))
    return d["queries"] if "queries" in d else d


def main(old_path, new_path, top=15):
    old, new = load(old_path), load(new_path)
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


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 15)
