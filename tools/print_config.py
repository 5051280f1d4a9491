#!/usr/bin/env python
"""Print a fully-resolved experiment config.

Rebuild of the reference `tools/misc/print_config.py`: configs here are
frozen dataclasses, so the "resolved config" is just a structured repr —
this renders it as an indented tree (or json with --json).

Usage:
    python tools/print_config.py cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion
    python tools/print_config.py --list
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import dataclasses
import json


def to_tree(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: to_tree(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, dict):
        return {k: to_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [to_tree(v) for v in obj]
    return obj


def render(node, indent=0):
    pad = '  ' * indent
    lines = []
    if isinstance(node, dict):
        for k, v in node.items():
            if isinstance(v, (dict, list)) and v and \
                    any(isinstance(x, (dict, list))
                        for x in (v.values() if isinstance(v, dict) else v)):
                lines.append(f'{pad}{k}:')
                lines.extend(render(v, indent + 1))
            else:
                lines.append(f'{pad}{k}: {v}')
    elif isinstance(node, list):
        for i, v in enumerate(node):
            lines.append(f'{pad}[{i}]:')
            lines.extend(render(v, indent + 1))
    else:
        lines.append(f'{pad}{node}')
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config', nargs='?', default=None)
    ap.add_argument('--json', action='store_true')
    ap.add_argument('--list', action='store_true',
                    help='list all registered config names')
    args = ap.parse_args()

    from hrfuser_tpu.configs import get_config, list_configs

    if args.list or not args.config:
        for name in list_configs():
            print(name)
        return

    cfg = get_config(args.config)
    tree = to_tree(cfg)
    if args.json:
        print(json.dumps(tree, indent=2, default=str))
    else:
        print('\n'.join(render(tree)))


if __name__ == '__main__':
    main()
