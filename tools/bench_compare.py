#!/usr/bin/env python3
"""Compare two bench artifacts row-by-row and CLASSIFY each mover.

Stats are recomputed from the raw sample arrays with the r17 protocol's
stat: 1 sample -> itself, 2 -> their MIN (box noise is one-sided: contention
only adds wall), 3+ -> median. NOTE the cross-protocol trap (r17 ADVICE):
pre-r17 artifacts took 3 samples/row and their recorded stat was the median;
min <= median, so mixing stats across the boundary reads as spurious
speedups. When either side predates the adaptive protocol, pass
`--stat=min2` to recompute BOTH sides as min-of-the-first-two-samples so the
statistic is identical on each side.

Drift classifier (r17 verdict ask #3 — that round burned a full
adjudication cycle separating box noise from code changes by hand):
every mover is labeled with the first matching cause, checked in order:

  plan-changed   the artifacts' plan rows differ in shuffles/broadcasts —
                 a real plan change, adjudicate as code
  batch-ms       stream twin whose summed trigger wall moved the same
                 direction by >= half the wall move — the stateful logic
                 itself moved, adjudicate as code
  load-episode   a sample_load stamp on the slower side exceeds the run's
                 own load envelope — the sample started under contention;
                 re-measure before adjudicating. The threshold is RELATIVE:
                 max(--load-thr [default 2.0], 1.5 x that run's median
                 stamp), because the bench itself drives 1-min load to ~4-6
                 mid-run (32 local threads) — an absolute threshold would
                 flag every row; a genuine external episode (r17c-style
                 load 12+) still clears the envelope.
  unexplained    none of the above — the rows that deserve a named re-pin

Mover gate (r18 verdict ask #4): a row is flagged when it moves by more
than thr_sec (absolute, default 1.0 s) OR by >= 2x in ratio AND >= 0.3 s
(relative — sub-second climbers like r18e's q_histo2d 0.34->1.05 had no
classifier coverage under the absolute gate alone). Both directions.

usage: bench_compare.py OLD.json NEW.json [thr_sec] [--stat=min2]
       [--load-thr=2.0] [--rel=2.0] [--rel-floor=0.3]
"""
import json, sys


def stat_auto(ts):
    ts = [t for t in ts if t >= 0]
    if not ts:
        return -1.0
    if len(ts) == 2:
        return min(ts)
    return sorted(ts)[len(ts) // 2]


def stat_min2(ts):
    ts = [t for t in ts if t >= 0]
    if not ts:
        return -1.0
    return min(ts[:2])


def load(p, stat):
    d = json.load(open(p))
    return {k: stat(v) for k, v in d.get('samples', {}).items()}, d


def load_envelope(d, load_thr):
    """Run-relative load ceiling: the bench's own threads push 1-min load to
    ~4-6 on long rows, so 'episode' means clearing 1.5x the run's median
    stamp (or the explicit floor, whichever is higher)."""
    stamps = [l for v in d.get('sample_load', {}).values() for l in v]
    if not stamps:
        return load_thr
    med = sorted(stamps)[len(stamps) // 2]
    return max(load_thr, 1.5 * med)


def classify(k, da, db, slower_new, load_thr):
    pa = da.get('plans', {}).get(k)
    pb = db.get('plans', {}).get(k)
    if pa and pb and (pa.get('shuffles'), pa.get('broadcasts')) != \
            (pb.get('shuffles'), pb.get('broadcasts')):
        return (f"plan-changed sh {pa.get('shuffles')}->{pb.get('shuffles')} "
                f"bc {pa.get('broadcasts')}->{pb.get('broadcasts')}")
    sa = da.get('stream_stats', {}).get(k)
    sb = db.get('stream_stats', {}).get(k)
    if sa and sb:
        ba = sum(m for m in sa.get('batch_ms', []) if m >= 0) / 1e3
        bb = sum(m for m in sb.get('batch_ms', []) if m >= 0) / 1e3
        # per-sample telemetry keeps only the LAST sample's batches, so this
        # is a steady-state signal, not an exact wall decomposition
        if ba > 0 and bb > 0:
            moved = bb - ba if slower_new else ba - bb
            if moved > 0.3:
                return f"batch-ms {ba:.2f}s->{bb:.2f}s triggers"
    side = db if slower_new else da
    loads = side.get('sample_load', {}).get(k, [])
    env = load_envelope(side, load_thr)
    peaks = [l for l in loads if l >= env]
    if peaks:
        return (f"load-episode max {max(peaks):.1f} at sample start "
                f"(run envelope {env:.1f})")
    return "unexplained"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    opts = dict(a.lstrip('-').split('=', 1) for a in sys.argv[1:]
                if a.startswith('--') and '=' in a)
    stat = stat_min2 if opts.get('stat') == 'min2' else stat_auto
    load_thr = float(opts.get('load-thr', 2.0))
    a_path, b_path = args[0], args[1]
    thr = float(args[2]) if len(args) > 2 else 1.0
    A, da = load(a_path, stat)
    B, db = load(b_path, stat)
    proto_a = da.get('protocol', 'pre-r17')
    proto_b = db.get('protocol', 'pre-r17')
    if proto_a != proto_b and opts.get('stat') != 'min2':
        print(f"WARNING: protocols differ ({proto_a} vs {proto_b}) — "
              "recorded stats are not comparable; re-run with --stat=min2")
    common = sorted(set(A) & set(B))
    sa = sum(A[k] for k in common if A[k] > 0 and B[k] > 0)
    sb = sum(B[k] for k in common if A[k] > 0 and B[k] > 0)
    print(f"common rows: {len(common)}  sum {a_path.split('/')[-1]}={sa:.1f}s "
          f"{b_path.split('/')[-1]}={sb:.1f}s  ratio={sb/sa:.3f}")
    rel = float(opts.get('rel', 2.0))
    rel_floor = float(opts.get('rel-floor', 0.3))

    def flagged(k):
        d = B[k] - A[k]
        if abs(d) >= thr:
            return True
        ratio = max(B[k] / A[k], A[k] / B[k])
        return ratio >= rel and abs(d) >= rel_floor

    moves = sorted(((B[k] - A[k], k) for k in common
                    if A[k] > 0 and B[k] > 0 and flagged(k)),
                   key=lambda x: abs(x[0]), reverse=True)
    print(f"\nrows moving > {thr}s or >= {rel}x and {rel_floor}s"
          "  [classification]:")
    for d, k in moves:
        cls = classify(k, da, db, slower_new=(d > 0), load_thr=load_thr)
        print(f"  {k:34s} {A[k]:7.2f} -> {B[k]:7.2f}  ({d:+.2f})  [{cls}]")


if __name__ == '__main__':
    main()
