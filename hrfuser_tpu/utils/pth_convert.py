"""Torch .pth checkpoint -> flax variables converter.

One-time converter for the released HRFuser checkpoints (SURVEY §5.4):
maps the reference's parameter names onto this framework's module tree
and transposes layouts (conv OIHW -> HWIO, depthwise [C,1,kh,kw] ->
[kh,kw,1,C], linear [out,in] -> [in,out]). WindowMSA ships a fused qkv
(`hrformer.py:84`), WindowMCA split q/k/v (`hrfuser_hrformer_based.py:
92-94`) — both map 1:1 onto this framework's layers.

Usage:
    python tools/convert_pth.py <ckpt.pth> <config_name> <out_dir>
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np


def _t_conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _t_dwconv(w: np.ndarray) -> np.ndarray:
    """torch depthwise [C,1,kh,kw] -> flax grouped HWIO [kh,kw,1,C]."""
    return np.transpose(w, (2, 3, 1, 0))


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


class Converter:
    """Accumulates (flax_path, value) assignments from torch names."""

    def __init__(self):
        self.params: Dict[Tuple[str, ...], np.ndarray] = {}
        self.batch_stats: Dict[Tuple[str, ...], np.ndarray] = {}
        self.unmapped: List[str] = []

    def put_conv(self, path: Tuple[str, ...], w, bias=None, depthwise=False):
        self.params[path + ('kernel',)] = (_t_dwconv(w) if depthwise
                                           else _t_conv(w))
        if bias is not None:
            self.params[path + ('bias',)] = np.asarray(bias)

    def put_bn(self, path: Tuple[str, ...], sd: dict, prefix: str):
        self.params[path + ('bn', 'scale')] = np.asarray(
            sd[prefix + '.weight'])
        self.params[path + ('bn', 'bias')] = np.asarray(sd[prefix + '.bias'])
        self.batch_stats[path + ('bn', 'mean')] = np.asarray(
            sd[prefix + '.running_mean'])
        self.batch_stats[path + ('bn', 'var')] = np.asarray(
            sd[prefix + '.running_var'])

    def put_ln(self, path: Tuple[str, ...], sd: dict, prefix: str):
        self.params[path + ('scale',)] = np.asarray(sd[prefix + '.weight'])
        self.params[path + ('bias',)] = np.asarray(sd[prefix + '.bias'])

    def put_linear(self, path: Tuple[str, ...], sd: dict, prefix: str):
        self.params[path + ('kernel',)] = _t_linear(
            np.asarray(sd[prefix + '.weight']))
        if prefix + '.bias' in sd:
            self.params[path + ('bias',)] = np.asarray(sd[prefix + '.bias'])


def _convert_convnorm(cv: Converter, sd: dict, torch_conv: str,
                      torch_bn: str, path: Tuple[str, ...],
                      depthwise: bool = False):
    cv.put_conv(path + ('conv',), np.asarray(sd[torch_conv + '.weight']),
                sd.get(torch_conv + '.bias'), depthwise=depthwise)
    cv.put_bn(path + ('norm',), sd, torch_bn)


def _convert_res_block(cv, sd, tp: str, path, bottleneck: bool):
    """One BasicBlock/Bottleneck: conv1/bn1[,conv2/bn2[,conv3/bn3]]."""
    n = 3 if bottleneck else 2
    for i in range(1, n + 1):
        _convert_convnorm(cv, sd, f'{tp}.conv{i}', f'{tp}.bn{i}',
                          path + (f'conv{i}',))
    if f'{tp}.downsample.0.weight' in sd:
        _convert_convnorm(cv, sd, f'{tp}.downsample.0', f'{tp}.downsample.1',
                          path + ('downsample',))


def _convert_res_layer(cv, sd, tp: str, path, num_blocks: int,
                       bottleneck: bool):
    for i in range(num_blocks):
        _convert_res_block(cv, sd, f'{tp}.{i}', path + (f'block{i}',),
                           bottleneck)


def _convert_crossffn(cv, sd, tp: str, path):
    """CrossFFN Sequential indices: 0 conv1x1, 1 bn, 3 dw3x3, 4 bn,
    6 conv1x1, 7 bn (GELUs at 2/5/8)."""
    cv.put_conv(path + ('fc1',), np.asarray(sd[f'{tp}.layers.0.weight']),
                sd.get(f'{tp}.layers.0.bias'))
    cv.put_bn(path + ('norm1',), sd, f'{tp}.layers.1')
    cv.put_conv(path + ('dw',), np.asarray(sd[f'{tp}.layers.3.weight']),
                sd.get(f'{tp}.layers.3.bias'), depthwise=True)
    cv.put_bn(path + ('norm2',), sd, f'{tp}.layers.4')
    cv.put_conv(path + ('fc2',), np.asarray(sd[f'{tp}.layers.6.weight']),
                sd.get(f'{tp}.layers.6.bias'))
    cv.put_bn(path + ('norm3',), sd, f'{tp}.layers.7')


def _convert_hrformer_block(cv, sd, tp: str, path):
    cv.put_ln(path + ('norm1',), sd, f'{tp}.norm1')
    cv.put_ln(path + ('norm2',), sd, f'{tp}.norm2')
    cv.put_linear(path + ('attn', 'qkv'), sd, f'{tp}.attn.attn.qkv')
    cv.put_linear(path + ('attn', 'out_proj'), sd, f'{tp}.attn.attn.out_proj')
    cv.params[path + ('attn', 'rpe', 'relative_position_bias_table')] = \
        np.asarray(sd[f'{tp}.attn.attn.relative_position_bias_table'])


def _convert_fusion_block(cv, sd, tp: str, path, num_modalities: int):
    for k in range(num_modalities):
        cv.put_ln(path + (f'norm1_{k}',), sd, f'{tp}.norm1.{k}')
        cv.put_ln(path + (f'norm2_{k}',), sd, f'{tp}.norm2.{k}')
        base = f'{tp}.attn.{k}.attn'
        for proj in ('q_proj', 'k_proj', 'v_proj', 'out_proj'):
            cv.put_linear(path + (f'attn_{k}', proj), sd, f'{base}.{proj}')
        cv.params[path + (f'attn_{k}', 'rpe',
                          'relative_position_bias_table')] = \
            np.asarray(sd[f'{base}.relative_position_bias_table'])
    cv.put_ln(path + ('norm3',), sd, f'{tp}.norm3')
    _convert_crossffn(cv, sd, f'{tp}.ffn', path + ('ffn',))


def _convert_transition(cv, sd, tp: str, path, in_channels, out_channels):
    pre = len(in_channels)
    for i, oc in enumerate(out_channels):
        if i < pre:
            if oc != in_channels[i] and f'{tp}.{i}.0.weight' in sd:
                # existing branch: Sequential(conv, bn, relu)
                cv.put_conv(path + (f'trans{i}', 'conv'),
                            np.asarray(sd[f'{tp}.{i}.0.weight']))
                cv.put_bn(path + (f'trans{i}', 'norm'), sd, f'{tp}.{i}.1')
                # HRFuser stage-2 quirk uses conv-only; also emit that name
                cv.params[path + (f'trans{i}_conv', 'kernel')] = _t_conv(
                    np.asarray(sd[f'{tp}.{i}.0.weight']))
        else:
            for j in range(i + 1 - pre):
                base = f'{tp}.{i}.{j}'
                _convert_convnorm(cv, sd, f'{base}.0', f'{base}.1',
                                  path + (f'trans{i}_step{j}',))


def _convert_hr_module(cv, sd, tp: str, path, stage, in_channels):
    is_former = stage.block == 'HRFORMER'
    nb = stage.num_branches
    for i in range(nb):
        if is_former:
            for j in range(stage.num_blocks[i]):
                _convert_hrformer_block(cv, sd, f'{tp}.branches.{i}.{j}',
                                        path + (f'branch{i}_block{j}',))
                _convert_crossffn(cv, sd, f'{tp}.branches.{i}.{j}.ffn',
                                  path + (f'branch{i}_block{j}', 'ffn'))
        else:
            _convert_res_layer(cv, sd, f'{tp}.branches.{i}',
                               path + (f'branch{i}',), stage.num_blocks[i],
                               bottleneck=stage.block == 'BOTTLENECK')
    if nb == 1:
        return
    out_ch = stage.out_channels
    for i in range(nb):
        for j in range(nb):
            if i == j:
                continue
            base = f'{tp}.fuse_layers.{i}.{j}'
            if f'{base}.0.weight' not in sd and \
                    f'{base}.0.0.weight' not in sd:
                continue
            if j > i:
                _convert_convnorm(cv, sd, f'{base}.0', f'{base}.1',
                                  path + (f'fuse{i}_{j}', 'proj'))
            else:
                for k in range(i - j):
                    sb = f'{base}.{k}'
                    if is_former:
                        _convert_convnorm(
                            cv, sd, f'{sb}.0', f'{sb}.1',
                            path + (f'fuse{i}_{j}', f'step{k}_dw'),
                            depthwise=True)
                        _convert_convnorm(
                            cv, sd, f'{sb}.2', f'{sb}.3',
                            path + (f'fuse{i}_{j}', f'step{k}_pw'))
                    else:
                        _convert_convnorm(cv, sd, f'{sb}.0', f'{sb}.1',
                                          path + (f'fuse{i}_{j}',
                                                  f'step{k}'))


def convert_state_dict(sd: Dict[str, np.ndarray], model_cfg) -> Dict:
    """Convert a reference state_dict to {'params', 'batch_stats'} trees.

    Args:
        sd: torch state dict (tensor values convertible via np.asarray).
        model_cfg: `DetectorCfg` of the matching config.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    cv = Converter()
    bb = model_cfg.backbone
    B = ('backbone',)

    # stem + layer1
    _convert_convnorm(cv, sd, 'backbone.conv1', 'backbone.bn1',
                      B + ('stem', 'conv1'))
    _convert_convnorm(cv, sd, 'backbone.conv2', 'backbone.bn2',
                      B + ('stem', 'conv2'))
    _convert_res_layer(cv, sd, 'backbone.layer1', B + ('layer1',),
                       bb.stage1.num_blocks[0], bottleneck=True)

    # camera transitions + stages
    s1_out = (bb.stage1.out_channels[0],)
    _convert_transition(cv, sd, 'backbone.transition1', B + ('transition1',),
                        s1_out, bb.stage2.out_channels)
    _convert_transition(cv, sd, 'backbone.transition2', B + ('transition2',),
                        bb.stage2.out_channels, bb.stage3.out_channels)
    _convert_transition(cv, sd, 'backbone.transition3', B + ('transition3',),
                        bb.stage3.out_channels, bb.stage4.out_channels)
    for sname, stage in (('stage2', bb.stage2), ('stage3', bb.stage3),
                         ('stage4', bb.stage4)):
        for m in range(stage.num_modules):
            _convert_hr_module(cv, sd, f'backbone.{sname}.{m}',
                               B + (sname, f'module{m}'), stage,
                               stage.out_channels)

    # modality streams
    nm = bb.num_fused_modalities
    for k in range(nm):
        _convert_convnorm(cv, sd, f'backbone.conv_a.{k}',
                          f'backbone.norm_a.{k}',
                          B + (f'stem_mod{k}', 'conv1'))
        _convert_convnorm(cv, sd, f'backbone.conv_b.{k}',
                          f'backbone.norm_b.{k}',
                          B + (f'stem_mod{k}', 'conv2'))
        _convert_res_layer(cv, sd, f'backbone.layer_a.{k}',
                           B + (f'layer_a{k}',), bb.stage_a.num_blocks[0],
                           bottleneck=True)
    if nm:
        sa_out = (bb.stage_a.out_channels[0],)
        mod_stage_map = (('transition_a', sa_out, bb.fusion_a.num_channels),
                         ('transition_b', bb.stage_b.out_channels,
                          bb.fusion_b.num_channels),
                         ('transition_c', bb.stage_c.out_channels,
                          bb.fusion_c.num_channels))
        for name, in_ch, out_ch in mod_stage_map:
            for k in range(nm):
                _convert_transition(cv, sd, f'backbone.{name}.{k}',
                                    B + (name, f'mod{k}'), in_ch, out_ch)
        for name, stage in (('stage_b', bb.stage_b), ('stage_c', bb.stage_c)):
            for k in range(nm):
                for m in range(stage.num_modules):
                    _convert_hr_module(cv, sd, f'backbone.{name}.{k}.{m}',
                                       B + (name, f'mod{k}', f'module{m}'),
                                       stage, stage.out_channels)
        for name, fus in (('fusion_a', bb.fusion_a), ('fusion_b',
                                                      bb.fusion_b),
                          ('fusion_c', bb.fusion_c)):
            for i in range(fus.num_branches):
                _convert_fusion_block(cv, sd, f'backbone.{name}.{i}',
                                      B + (name, f'branch{i}'), nm)

    # neck
    cv.put_conv(('neck', 'reduction_conv'),
                np.asarray(sd['neck.reduction_conv.conv.weight']),
                sd.get('neck.reduction_conv.conv.bias'))
    i = 0
    while f'neck.fpn_convs.{i}.conv.weight' in sd:
        cv.put_conv(('neck', f'fpn_conv{i}'),
                    np.asarray(sd[f'neck.fpn_convs.{i}.conv.weight']),
                    sd.get(f'neck.fpn_convs.{i}.conv.bias'))
        i += 1

    # rpn
    for name in ('rpn_conv', 'rpn_cls', 'rpn_reg'):
        cv.put_conv(('rpn_head', name),
                    np.asarray(sd[f'rpn_head.{name}.weight']),
                    sd.get(f'rpn_head.{name}.bias'))

    # cascade bbox heads
    for i in range(model_cfg.roi.num_stages):
        base = f'roi_head.bbox_head.{i}'
        p = ('roi_head', f'bbox_head{i}')
        cv.put_linear(p + ('shared_fc0',), sd, f'{base}.shared_fcs.0')
        cv.put_linear(p + ('shared_fc1',), sd, f'{base}.shared_fcs.1')
        cv.put_linear(p + ('fc_cls',), sd, f'{base}.fc_cls')
        cv.put_linear(p + ('fc_reg',), sd, f'{base}.fc_reg')

    return _unflatten(cv)


def _unflatten(cv: Converter) -> Dict:
    def build(flat):
        tree: Dict = {}
        for path, val in flat.items():
            node = tree
            for key in path[:-1]:
                node = node.setdefault(key, {})
            node[path[-1]] = val
        return tree
    return {'params': build(cv.params),
            'batch_stats': build(cv.batch_stats)}


def verify_against(variables, converted) -> List[str]:
    """Compare converted tree against an initialized variables tree;
    returns a list of mismatch/missing descriptions (empty = clean)."""
    import jax
    problems = []

    def flat(tree):
        return {tuple(str(getattr(k, 'key', k)) for k in path): v
                for path, v in
                jax.tree_util.tree_flatten_with_path(tree)[0]}

    for coll in ('params', 'batch_stats'):
        want = flat(variables.get(coll, {}))
        got = flat(converted.get(coll, {}))
        for k, v in want.items():
            if k not in got:
                problems.append(f'missing {coll}/{"/".join(k)}')
            elif tuple(got[k].shape) != tuple(v.shape):
                problems.append(
                    f'shape {coll}/{"/".join(k)}: got {got[k].shape}, '
                    f'want {v.shape}')
        for k in got:
            if k not in want:
                problems.append(f'extra {coll}/{"/".join(k)}')
    return problems
