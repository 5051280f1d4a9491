#!/usr/bin/env python
"""Group a trace's per-op device time into model components.

Builds on `tools/trace_ops.py`'s XSpace walker: instead of a flat
top-N op list, ops are bucketed by name/shape heuristics tuned to the
HRFuser inference program (RoIAlign kernel, RoI-head FCs, small-C
branch chains, window attention, NMS loops, layout copies, ...), which
is the per-component attribution VERDICT r2 asked for (the "90 ms long
tail" of sub-0.4 ms ops).

Usage:
    python tools/trace_groups.py /tmp/r3_trace [--steps 0] [--other 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os.path as osp
import re
import sys as _sys

_sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tools.trace_ops import module_steps, op_breakdown


def classify(name: str) -> str:
    """Bucket one XLA op name (with its shape string) into a component."""
    if 'multilevel_roi_align_pallas' in name or 'pallas_call' in name:
        return 'roi_align pallas kernel'
    if re.search(r'cond\.\d+ = \(bf16\[\d+,1000,49,', name):
        return 'roi_align fallback conds'
    shape = re.search(r'= \(?(?:pred|f32|bf16|s32|u32|f16)\[([\d,]*)\]', name)
    dims = tuple(int(d) for d in shape.group(1).split(',')
                 if d) if shape and shape.group(1) else ()
    rhs = name.split(' = ', 1)[1] if ' = ' in name else name
    toks = rhs.split('(', 1)[0].split()
    op = toks[-1] if toks else rhs[:20]
    kind = ('copy' if op.startswith('copy') or 'transpose' in op
            else 'while' if op.startswith('while')
            else 'cond' if op.startswith('cond')
            else 'sort' if 'sort' in op or 'top_k' in name
            else 'conv' if 'convolution' in name
            else 'dot' if 'dot' in name or 'einsum' in name
            else 'fusion' if 'fusion' in op
            else op)
    # RoI head: [*, 1000, 49|1024|...] or [8000, ...] shapes
    if dims[:2] in ((8, 1000),) or (dims and dims[0] in (8000, 24000)) \
            or (len(dims) >= 2 and dims[1] == 1000):
        if kind == 'while':
            return 'nms/sort loops'
        return f'roi head ({kind})'
    if kind == 'while':
        return 'nms/sort loops'
    if kind == 'sort':
        return 'nms/sort loops'
    # branch spatial sizes at r640: stride4 96x160, s8 48x80, s16 24x40,
    # s32 12x20; stem 192x320 / 384x640
    sdims = set(dims)
    if {96, 160} <= sdims or {18} <= sdims or {72} <= sdims:
        hit = 'branch0 (s4)'
    elif {48, 80} <= sdims or {36} <= sdims:
        hit = 'branch1 (s8)'
    elif {24, 40} <= sdims or {144} <= sdims:
        hit = 'branch2 (s16)'
    elif {12, 20} <= sdims:
        hit = 'branch3 (s32)'
    elif {192, 320} <= sdims or {384, 640} <= sdims:
        hit = 'stem'
    elif len(dims) == 3 and dims[-1] in (18, 36, 72, 144, 54, 108, 216,
                                         432) or \
            (len(dims) == 3 and dims[1] == 49):
        hit = 'window attention'
    elif len(dims) >= 3 and 21816 in dims:
        hit = 'hrfpn/flat-pyramid'
    else:
        hit = 'misc'
    if kind == 'copy':
        return f'layout copies [{hit}]'
    return f'{hit} ({kind})'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('trace_dir')
    ap.add_argument('--steps', type=int, default=0)
    ap.add_argument('--other', type=int, default=25,
                    help='show the top-N ops inside the largest bucket')
    args = ap.parse_args()

    files = sorted(glob.glob(
        osp.join(args.trace_dir, 'plugins/profile/*/*.xplane.pb')))
    if not files:
        raise SystemExit(f'no .xplane.pb under {args.trace_dir}')
    steps = args.steps or module_steps(files[-1])
    dur, cnt = op_breakdown(files[-1])

    groups = collections.Counter()
    gops = collections.defaultdict(collections.Counter)
    for name, d in dur.items():
        g = classify(name)
        groups[g] += d
        gops[g][name] += d
    total = sum(dur.values())
    print(f'# {files[-1]}  ({steps} steps)')
    print(f'total device op time: {total / 1e12 / steps * 1e3:.2f} ms/step')
    print()
    for g, d in groups.most_common():
        n_ops = len(gops[g])
        print(f'{d / 1e12 / steps * 1e3:8.2f} ms/step  {g}  '
              f'[{n_ops} ops]')
    big = groups.most_common(1)[0][0]
    print(f'\n## top ops inside "{big}"')
    for name, d in gops[big].most_common(args.other):
        print(f'{d / 1e12 / steps * 1e3:8.3f} ms/step  {name[:140]}')


if __name__ == '__main__':
    main()
