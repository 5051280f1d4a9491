#!/usr/bin/env python
"""Op-level breakdown of a jax.profiler trace (no tensorboard needed).

Parses the XSpace protobuf (`*.xplane.pb` written by
`tools/profile.py --trace-dir`) with a schema-light protobuf walker and
prints per-op device time aggregated over steps — the quickest way to see
what the TPU is actually spending time on when the tensorboard profile
plugin isn't available/compatible.

Usage:
    python tools/trace_ops.py /tmp/train_trace [--top 40] [--steps 20]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os.path as osp
import struct


def parse_fields(buf: bytes):
    """Walk one protobuf message -> {field_no: [raw values]}."""
    out = collections.defaultdict(list)
    i, n = 0, len(buf)
    while i < n:
        tag = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7f) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wt = tag >> 3, tag & 7
        if wt == 0:                                   # varint
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7f) << shift
                shift += 7
                if not b & 0x80:
                    break
            out[field].append(v)
        elif wt == 1:                                 # fixed64
            out[field].append(struct.unpack('<d', buf[i:i + 8])[0])
            i += 8
        elif wt == 2:                                 # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7f) << shift
                shift += 7
                if not b & 0x80:
                    break
            out[field].append(buf[i:i + ln])
            i += ln
        elif wt == 5:                                 # fixed32
            out[field].append(struct.unpack('<f', buf[i:i + 4])[0])
            i += 4
        else:
            raise ValueError(f'unsupported wire type {wt}')
    return out


def op_breakdown(xplane_path: str, device_substr: str = '/device:'):
    """Aggregate per-op duration from the device plane's 'XLA Ops' line.

    XSpace: planes=1. XPlane: name=2, lines=3, event_metadata=4 (map).
    XLine: name=2, events=4. XEvent: metadata_id=1, duration_ps=3.
    XEventMetadata (map value field 2): id=1, name=2.
    """
    space = parse_fields(open(xplane_path, 'rb').read())
    dur = collections.Counter()
    cnt = collections.Counter()
    for pl in space.get(1, []):
        p = parse_fields(pl)
        pname = p.get(2, [b''])[0].decode()
        if device_substr not in pname or 'CUSTOM' in pname:
            continue
        meta = {}
        for m in p.get(4, []):
            e = parse_fields(m)
            em = parse_fields(e[2][0])
            meta[e[1][0]] = em.get(2, [b'?'])[0].decode()
        for ln in p.get(3, []):
            l = parse_fields(ln)
            if l.get(2, [b''])[0] != b'XLA Ops':
                continue
            for ev in l.get(4, []):
                e = parse_fields(ev)
                name = meta.get(e[1][0], str(e[1][0]))
                dur[name] += e.get(3, [0])[0]
                cnt[name] += 1
    return dur, cnt


def module_steps(xplane_path: str, device_substr: str = '/device:') -> int:
    """Number of executions of the dominant (longest-total) XLA module.

    Dividing op totals by this count gives honest per-step numbers; the
    wall-clock-longest module is the profiled workload, shorter modules
    (sync sums etc.) are ignored.
    """
    space = parse_fields(open(xplane_path, 'rb').read())
    per_module = collections.Counter()
    counts = collections.Counter()
    for pl in space.get(1, []):
        p = parse_fields(pl)
        pname = p.get(2, [b''])[0].decode()
        if device_substr not in pname or 'CUSTOM' in pname:
            continue
        meta = {}
        for m in p.get(4, []):
            e = parse_fields(m)
            em = parse_fields(e[2][0])
            meta[e[1][0]] = em.get(2, [b'?'])[0].decode()
        for ln in p.get(3, []):
            l = parse_fields(ln)
            if l.get(2, [b''])[0] != b'XLA Modules':
                continue
            for ev in l.get(4, []):
                e = parse_fields(ev)
                name = meta.get(e[1][0], str(e[1][0]))
                per_module[name] += e.get(3, [0])[0]
                counts[name] += 1
    if not per_module:
        return 1
    return max(counts[per_module.most_common(1)[0][0]], 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('trace_dir')
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--steps', type=int, default=0,
                    help='steps captured (divides totals); 0 = derive '
                         'from the dominant XLA Modules span count')
    args = ap.parse_args()

    files = sorted(glob.glob(
        osp.join(args.trace_dir, 'plugins/profile/*/*.xplane.pb')))
    if not files:
        raise SystemExit(f'no .xplane.pb under {args.trace_dir}')
    if not args.steps:
        args.steps = module_steps(files[-1])
    dur, cnt = op_breakdown(files[-1])
    total = sum(dur.values())
    print(f'# {files[-1]}')
    print(f'total device op time: {total / 1e12 / args.steps * 1e3:.2f} '
          f'ms/step ({args.steps} steps)')
    for name, d in dur.most_common(args.top):
        print(f'{d / 1e12 / args.steps * 1e3:8.3f} ms/step  '
              f'x{cnt[name] // args.steps:<4d} {name[:120]}')


if __name__ == '__main__':
    main()
