#!/usr/bin/env python3
"""Distill a quiet bench artifact into QUIET_PINS.json — the per-row
comparison envelope the NEXT bench run loads to self-classify its own
anomalies (r18 verdict ask #1: the driver's tail-only ~4 KB capture of
BENCH_r{N}.json drops the mid-object sample_load/plans telemetry, so the
run must carry its own verdicts in an `anomalies` object emitted as the
LAST key of the JSON, where the tail capture keeps it).

Per row: the r17-protocol stat (1 sample -> itself, 2 -> min, 3+ ->
median), the plan counts (shuffles/broadcasts) when recorded, and for
stream twins the summed per-trigger wall (batch_ms_sum) so a steady-state
regression classifies as batch-ms rather than load.

usage: make_pins.py QUIET_ARTIFACT.json > QUIET_PINS.json
"""
import json
import sys


def stat(ts):
    ts = [t for t in ts if t >= 0]
    if not ts:
        return -1.0
    if len(ts) == 2:
        return min(ts)
    return sorted(ts)[len(ts) // 2]


def main():
    src = sys.argv[1]
    d = json.load(open(src))
    pins = {}
    for k, ts in d.get('samples', {}).items():
        s = stat(ts)
        if s < 0:
            continue
        pin = {'stat': round(s, 3)}
        p = d.get('plans', {}).get(k)
        if p and p.get('shuffles', -1) >= 0:
            pin['shuffles'] = p['shuffles']
            pin['broadcasts'] = p['broadcasts']
        st = d.get('stream_stats', {}).get(k)
        if st:
            bms = [m for m in st.get('batch_ms', []) if m >= 0]
            if bms:
                pin['batch_ms_sum'] = round(sum(bms) / 1e3, 3)
        pins[k] = pin
    out = {'source': src.split('/')[-1],
           'protocol': d.get('protocol', 'unknown'),
           'pins': pins}
    json.dump(out, sys.stdout, separators=(',', ':'))
    print()


if __name__ == '__main__':
    main()
