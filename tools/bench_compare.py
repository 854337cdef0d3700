#!/usr/bin/env python3
"""Compare two bench artifacts row-by-row (medians recomputed from raw
samples, 2-sample rows use the mean — the r17 protocol's stat)."""
import json, sys

def stat(ts):
    ts = [t for t in ts if t >= 0]
    if not ts: return -1.0
    if len(ts) == 2: return min(ts)
    return sorted(ts)[len(ts) // 2]

def load(p):
    d = json.load(open(p))
    return {k: stat(v) for k, v in d.get('samples', {}).items()}, d

a_path, b_path = sys.argv[1], sys.argv[2]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
A, da = load(a_path)
B, db = load(b_path)
common = sorted(set(A) & set(B))
sa = sum(A[k] for k in common if A[k] > 0 and B[k] > 0)
sb = sum(B[k] for k in common if A[k] > 0 and B[k] > 0)
print(f"common rows: {len(common)}  sum {a_path.split('/')[-1]}={sa:.1f}s "
      f"{b_path.split('/')[-1]}={sb:.1f}s  ratio={sb/sa:.3f}")
moves = sorted(((B[k] - A[k], k) for k in common if A[k] > 0 and B[k] > 0),
               key=lambda x: abs(x[0]), reverse=True)
print(f"\nrows moving > {thr}s:")
for d, k in moves:
    if abs(d) < thr: break
    print(f"  {k:34s} {A[k]:7.2f} -> {B[k]:7.2f}  ({d:+.2f})")
