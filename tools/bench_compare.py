#!/usr/bin/env python3
"""Round-over-round bench comparison, normalized by machine_factor.

Usage: tools/bench_compare.py OLD.json NEW.json [--top N]

Reads two bench artifacts (bench_last.json / BENCH_r*.json shape),
divides NEW's per-query warm times by NEW's machine_factor (OLD's
factor too when present — pre-r16 artifacts carry none and default to
1.0), and prints the common-query totals plus the largest normalized
drifts in both directions. The factor is the 5-query sentinel total
against the pinned sf0.1 reference — see Bench.scala.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip())
    queries = d.get("queries", {})
    factor = float(d.get("machine_factor", 1.0))
    return queries, factor, d


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 10
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1]) if "=" in a else top
    old_q, old_f, _old_d = load(args[0])
    new_q, new_f, _new_d = load(args[1])
    common = sorted(set(old_q) & set(new_q))
    print(f"old: {len(old_q)} queries, machine_factor {old_f:.3f}")
    print(f"new: {len(new_q)} queries, machine_factor {new_f:.3f}")
    print(f"common: {len(common)}")
    old_t = sum(old_q[k] for k in common)
    new_t = sum(new_q[k] for k in common)
    print(f"raw common totals:        {old_t:8.1f}s -> {new_t:8.1f}s "
          f"({new_t / old_t:.3f}x)")
    old_n = old_t / old_f
    new_n = new_t / new_f
    print(f"normalized common totals: {old_n:8.1f}s -> {new_n:8.1f}s "
          f"({new_n / old_n:.3f}x)")

    # Per-BLOCK normalization (r17): when an artifact carries
    # block_factors, each query additionally divides by its block's
    # RELATIVE factor (block factor / that sweep's median block factor)
    # — the r16 graded sweep proved load can land mid-sweep. RELATIVE,
    # because block sentinels run on a warm session while machine_factor
    # comes from a fresh-JVM probe: the absolute bases differ ~2x, so
    # only within-sweep drift is meaningful. The warm headline is the
    # min over two staggered warm passes, so a query's relative factor
    # is the MIN of its two blocks' (load only ever ADDS time; min
    # matches the min-time estimator and never inflates an improvement).
    def block_norm(queries, d):
        bf = d.get("block_factors")
        if not bf or "warm" not in bf:
            return None
        every = int(d.get("restart_every", 64))
        names = sorted(queries)
        f0 = float(d.get("machine_factor", 1.0))
        w1, w2 = bf.get("warm", []), bf.get("warm2", [])
        allb = sorted(w1 + w2)
        if not allb:
            return None
        med = allb[len(allb) // 2]
        out = {}
        for i, k in enumerate(names):
            b1 = i // every  # warm pass restarts at every, 2*every, ...
            b2 = (i + every // 2) // every  # warm2 staggered by half
            r1 = 1.0 if b1 == 0 or not w1 else w1[min(b1 - 1, len(w1) - 1)] / med
            r2 = 1.0 if b2 == 0 or not w2 else w2[min(b2 - 1, len(w2) - 1)] / med
            out[k] = queries[k] / (f0 * min(r1, r2))
        return out

    nb = block_norm(new_q, _new_d)
    ob = block_norm(old_q, _old_d)
    if nb and ob:
        new_bt = sum(nb[k] for k in common)
        old_bt = sum(ob[k] for k in common)
        print(f"block-normalized common:  {old_bt:8.1f}s -> {new_bt:8.1f}s "
              f"({new_bt / old_bt:.3f}x)")
    elif nb:
        new_bt = sum(nb[k] for k in common)
        print(f"block-normalized common:  (old artifact has no block "
              f"factors) -> {new_bt:8.1f}s vs plain-normalized "
              f"{new_n:8.1f}s")
    drifts = []
    for k in common:
        o = old_q[k] / old_f
        n = new_q[k] / new_f
        if o > 0.05:  # sub-50ms timings are pure scheduling noise
            drifts.append((n / o, k, old_q[k], new_q[k]))
    drifts.sort(reverse=True)
    print(f"\nlargest normalized regressions (ratio, query, old_raw, new_raw):")
    for r, k, o, n in drifts[:top]:
        print(f"  {r:5.2f}x  {k:<30s} {o:7.3f} -> {n:7.3f}")
    print(f"\nlargest normalized improvements:")
    for r, k, o, n in sorted(drifts)[:top]:
        print(f"  {r:5.2f}x  {k:<30s} {o:7.3f} -> {n:7.3f}")
    new_only = sorted(set(new_q) - set(old_q))
    if new_only:
        add = sum(new_q[k] for k in new_only)
        print(f"\nnew queries: {len(new_only)} adding {add:.1f}s raw "
              f"({add / max(len(new_only), 1):.2f}s each)")


if __name__ == "__main__":
    main()
