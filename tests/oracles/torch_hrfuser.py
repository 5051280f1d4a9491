"""Plain-torch reimplementation of the full reference HRFuser detector.

Test oracle for end-to-end converter/model parity: the whole reference
forward — HRFuser backbone (`mmdet/models/backbones/
hrfuser_hrformer_based.py:331-628`), HRFPN (`mmdet/models/necks/
hrfpn.py:12-100`), RPN tower (`mmdet/models/dense_heads/rpn_head.py`),
and the cascade RoI pipeline (`mmdet/models/roi_heads/
cascade_roi_head.py:288-411`) — rebuilt in eager torch with the
reference's *parameter names*, so its `state_dict()` feeds
`hrfuser_tpu.utils.pth_convert.convert_state_dict` exactly like a real
checkpoint would.

This file is test-support code (CPU, f32, eval-mode only, tiny
configs); it deliberately mirrors the reference's module layout and
forward quirks:

  * stage-2 camera transition applies only its conv on existing
    branches (`hrfuser_hrformer_based.py:553`, `transition1[i][0]`);
  * HRFormer fuse up-paths are conv1x1+BN then the forward's
    `F.interpolate(..., 'bilinear', align_corners=False)`
    (`hrnet.py:199-203`); conv-block (HRNet) fuse up-paths carry an
    `nn.Upsample(mode='nearest')` inside the Sequential (`hrnet.py:146`);
  * fused qkv in WindowMSA vs split q/k/v in WindowMCA
    (`hrformer.py:84` vs `hrfuser_hrformer_based.py:92-94`);
  * center-pad window partition (`hrformer.py:200-236`);
  * cascade reg-class-agnostic refinement + stage score averaging
    (`cascade_roi_head.py:342-399`).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from hrfuser_tpu.ops.window import center_pad_shape, relative_position_index


# --------------------------------------------------------------------------
# building blocks (reference parameter names)
# --------------------------------------------------------------------------

def conv3x3(cin, cout, stride=1, groups=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, groups=groups,
                     bias=False)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * self.expansion
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes, stride)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.bn3(self.conv3(x))
        return F.relu(x + idt)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = conv3x3(cin, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.bn2(self.conv2(x))
        return F.relu(x + idt)


def res_layer(block_cls, cin, planes, n):
    layers = [block_cls(cin, planes)]
    for _ in range(1, n):
        layers.append(block_cls(planes * block_cls.expansion, planes))
    return nn.Sequential(*layers)


class WindowMSA(nn.Module):
    """Fused-qkv window self-attention + RPE (`hrformer.py:18-131`)."""

    def __init__(self, c, num_heads, ws):
        super().__init__()
        self.num_heads = num_heads
        self.ws = ws
        self.qkv = nn.Linear(c, 3 * c)
        self.out_proj = nn.Linear(c, c)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, num_heads) * 0.1)

    def forward(self, x):                         # [B_, N, C]
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        q, k, v = self.qkv(x).reshape(b, n, 3, h, hd).permute(2, 0, 3, 1, 4)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        idx = torch.from_numpy(
            np.asarray(relative_position_index(self.ws, self.ws)))
        bias = self.relative_position_bias_table[idx.reshape(-1)].reshape(
            n, n, h).permute(2, 0, 1)
        attn = torch.softmax(attn + bias[None], dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.out_proj(out)


class WindowMCA(nn.Module):
    """Split-projection window cross-attention
    (`hrfuser_hrformer_based.py:21-151`)."""

    def __init__(self, c, num_heads, ws):
        super().__init__()
        self.num_heads = num_heads
        self.ws = ws
        self.q_proj = nn.Linear(c, c)
        self.k_proj = nn.Linear(c, c)
        self.v_proj = nn.Linear(c, c)
        self.out_proj = nn.Linear(c, c)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, num_heads) * 0.1)

    def forward(self, xw, zw):                    # [B_, N, C] windows
        b, n, c = xw.shape
        h = self.num_heads
        hd = c // h
        q = self.q_proj(xw).reshape(b, n, h, hd).permute(0, 2, 1, 3)
        k = self.k_proj(zw).reshape(b, n, h, hd).permute(0, 2, 1, 3)
        v = self.v_proj(zw).reshape(b, n, h, hd).permute(0, 2, 1, 3)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        idx = torch.from_numpy(
            np.asarray(relative_position_index(self.ws, self.ws)))
        bias = self.relative_position_bias_table[idx.reshape(-1)].reshape(
            n, n, h).permute(2, 0, 1)
        attn = torch.softmax(attn + bias[None], dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.out_proj(out)


def crossffn(c, hidden):
    """CrossFFN Sequential with the reference's indices
    (`hrformer.py:239-295`)."""
    return nn.Sequential(
        nn.Conv2d(c, hidden, 1), nn.BatchNorm2d(hidden), nn.GELU(),
        nn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden),
        nn.BatchNorm2d(hidden), nn.GELU(),
        nn.Conv2d(hidden, c, 1), nn.BatchNorm2d(c), nn.GELU())


def _windows(x, ws):
    """NCHW -> [B*nW, ws*ws, C] with the reference's center padding."""
    b, c, h, w = x.shape
    pt, pb, pl, pr = center_pad_shape(h, w, ws, ws)
    xp = F.pad(x, (pl, pr, pt, pb))
    hp, wp = h + pt + pb, w + pl + pr
    xw = xp.reshape(b, c, hp // ws, ws, wp // ws, ws)
    xw = xw.permute(0, 2, 4, 3, 5, 1).reshape(-1, ws * ws, c)
    return xw, (hp, wp, pt, pl)


def _reverse(wins, b, h, w, ws, geom):
    hp, wp, pt, pl = geom
    c = wins.shape[-1]
    x = wins.reshape(b, hp // ws, wp // ws, ws, ws, c)
    x = x.permute(0, 5, 1, 3, 2, 4).reshape(b, c, hp, wp)
    return x[:, :, pt:pt + h, pl:pl + w]


class HRFormerBlock(nn.Module):
    """LN -> windowed MHSA -> residual; LN -> CrossFFN -> residual
    (`hrformer.py:298-386`)."""

    def __init__(self, c, num_heads, ws, mlp_ratio=4):
        super().__init__()
        self.ws = ws
        self.norm1 = nn.LayerNorm(c, eps=1e-6)
        self.norm2 = nn.LayerNorm(c, eps=1e-6)

        class A(nn.Module):
            pass
        self.attn = A()
        self.attn.attn = WindowMSA(c, num_heads, ws)

        class Ffn(nn.Module):
            pass
        self.ffn = Ffn()
        self.ffn.layers = crossffn(c, int(c * mlp_ratio))

    def forward(self, x):                         # NCHW
        b, c, h, w = x.shape
        n = self.norm1(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        wins, geom = _windows(n, self.ws)
        a = _reverse(self.attn.attn(wins), b, h, w, self.ws, geom)
        x = x + a
        n = self.norm2(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        return x + self.ffn.layers(n)


class FusionBlock(nn.Module):
    """HRFuserFusionBlock (`hrfuser_hrformer_based.py:250-326`)."""

    def __init__(self, c, num_heads, ws, num_mod, mlp_ratio=4):
        super().__init__()
        self.ws = ws
        self.norm1 = nn.ModuleList(
            [nn.LayerNorm(c, eps=1e-6) for _ in range(num_mod)])
        self.norm2 = nn.ModuleList(
            [nn.LayerNorm(c, eps=1e-6) for _ in range(num_mod)])
        self.norm3 = nn.LayerNorm(c, eps=1e-6)

        class A(nn.Module):
            pass
        self.attn = nn.ModuleList()
        for _ in range(num_mod):
            a = A()
            a.attn = WindowMCA(c, num_heads, ws)
            self.attn.append(a)

        class Ffn(nn.Module):
            pass
        self.ffn = Ffn()
        self.ffn.layers = crossffn(c, int(c * mlp_ratio))

    def forward(self, x, mods):                   # NCHW
        b, c, h, w = x.shape

        def ln(m, t):
            return m(t.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

        x_tmp = x
        for k, z in enumerate(mods):
            qw, geom = _windows(ln(self.norm1[k], x_tmp), self.ws)
            kw, _ = _windows(ln(self.norm2[k], z), self.ws)
            a = _reverse(self.attn[k].attn(qw, kw), b, h, w, self.ws, geom)
            x = x + z + a
        return x + self.ffn.layers(ln(self.norm3, x))


class HRModule(nn.Module):
    """Multi-branch exchange module. `former=True` -> HRFormer blocks,
    sep-conv downsampling, bilinear forward upsampling; `former=False` ->
    BASIC conv blocks, nearest Upsample in the fuse Sequential."""

    def __init__(self, stage, in_channels):
        super().__init__()
        self.former = stage.block == 'HRFORMER'
        self.nb = stage.num_branches
        out = stage.out_channels
        branches = []
        for i in range(self.nb):
            if self.former:
                blocks = [HRFormerBlock(out[i], stage.num_heads[i],
                                        stage.window_sizes[i],
                                        stage.mlp_ratios[i])
                          for _ in range(stage.num_blocks[i])]
                branches.append(nn.Sequential(*blocks))
            else:
                branches.append(res_layer(BasicBlock, in_channels[i],
                                          stage.num_channels[i],
                                          stage.num_blocks[i]))
        self.branches = nn.ModuleList(branches)

        if self.nb == 1:
            self.fuse_layers = None
            return
        fuse = []
        for i in range(self.nb):
            row = []
            for j in range(self.nb):
                if j == i:
                    row.append(nn.Identity())
                elif j > i:
                    mods = [nn.Conv2d(out[j], out[i], 1, bias=False),
                            nn.BatchNorm2d(out[i])]
                    if not self.former:     # hrnet.py:146
                        mods.append(nn.Upsample(scale_factor=2 ** (j - i),
                                                mode='nearest'))
                    row.append(nn.Sequential(*mods))
                else:
                    steps = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = out[i] if last else out[j]
                        if self.former:     # hrformer.py:524-557
                            sub = [conv3x3(out[j], out[j], 2, groups=out[j]),
                                   nn.BatchNorm2d(out[j]),
                                   nn.Conv2d(out[j], ch, 1, bias=False),
                                   nn.BatchNorm2d(ch)]
                        else:               # hrnet.py:150-177
                            sub = [conv3x3(out[j], ch, 2),
                                   nn.BatchNorm2d(ch)]
                        if not last:
                            sub.append(nn.ReLU(False))
                        steps.append(nn.Sequential(*sub))
                    row.append(nn.Sequential(*steps))
            fuse.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse)

    def forward(self, xs):
        feats = [self.branches[i](xs[i]) for i in range(self.nb)]
        if self.nb == 1:
            return feats
        outs = []
        for i in range(self.nb):
            y = feats[i]
            for j in range(self.nb):
                if j == i:
                    continue
                t = self.fuse_layers[i][j](feats[j])
                if j > i:                   # hrnet.py:199-203
                    t = F.interpolate(t, size=feats[i].shape[2:],
                                      mode='bilinear', align_corners=False)
                y = y + t
            outs.append(F.relu(y))
        return outs


def transition(in_channels, out_channels):
    """`_make_transition_layer` (`hrnet.py:422-463`)."""
    pre = len(in_channels)
    mods = []
    for i, oc in enumerate(out_channels):
        if i < pre:
            if oc != in_channels[i]:
                mods.append(nn.Sequential(conv3x3(in_channels[i], oc),
                                          nn.BatchNorm2d(oc),
                                          nn.ReLU(False)))
            else:
                mods.append(nn.Identity())
        else:
            steps = []
            for j in range(i + 1 - pre):
                last = j == i - pre
                cin = in_channels[-1] if j == 0 else out_prev
                ch = oc if last else in_channels[-1]
                steps.append(nn.Sequential(conv3x3(cin, ch, 2),
                                           nn.BatchNorm2d(ch),
                                           nn.ReLU(False)))
                out_prev = ch
            mods.append(nn.Sequential(*steps))
    return nn.ModuleList(mods)


def apply_transition(trans, xs, in_pre, conv_only_on_existing=False):
    """Forward through a transition ModuleList.

    `conv_only_on_existing` replicates `hrfuser_hrformer_based.py:553`
    (`self.transition1[i][0]`): existing branches with a channel change
    run only the conv; new branches run only the first chain step."""
    del in_pre
    out = []
    for i, m in enumerate(trans):
        if isinstance(m, nn.Identity):
            out.append(xs[i])
        else:
            out.append(m[0](xs[-1]) if conv_only_on_existing else m(xs[-1]))
    return out


# --------------------------------------------------------------------------
# full detector
# --------------------------------------------------------------------------

class TorchHRFuserDetector(nn.Module):
    """Reference-named torch build of the complete HRFuser cascade
    detector for one `DetectorCfg` (HRFormer-based fusion variant)."""

    def __init__(self, cfg):
        super().__init__()
        bb = cfg.backbone
        self.cfg = cfg
        self.bb = bb
        nm = bb.num_fused_modalities

        class Ns(nn.Module):
            pass

        backbone = Ns()
        self.backbone = backbone
        backbone.conv1 = conv3x3(3, 64, 2)
        backbone.bn1 = nn.BatchNorm2d(64)
        backbone.conv2 = conv3x3(64, 64, 2)
        backbone.bn2 = nn.BatchNorm2d(64)
        backbone.layer1 = res_layer(Bottleneck, 64,
                                    bb.stage1.num_channels[0],
                                    bb.stage1.num_blocks[0])
        s1_out = bb.stage1.out_channels[0]
        backbone.transition1 = transition((s1_out,), bb.stage2.out_channels)
        backbone.transition2 = transition(bb.stage2.out_channels,
                                          bb.stage3.out_channels)
        backbone.transition3 = transition(bb.stage3.out_channels,
                                          bb.stage4.out_channels)
        for name, st in (('stage2', bb.stage2), ('stage3', bb.stage3),
                         ('stage4', bb.stage4)):
            setattr(backbone, name, nn.ModuleList(
                [HRModule(st, st.out_channels)
                 for _ in range(st.num_modules)]))

        # modality streams
        backbone.conv_a = nn.ModuleList(
            [conv3x3(bb.mod_in_channels[k], 64, 2) for k in range(nm)])
        backbone.norm_a = nn.ModuleList(
            [nn.BatchNorm2d(64) for _ in range(nm)])
        backbone.conv_b = nn.ModuleList(
            [conv3x3(64, 64, 2) for _ in range(nm)])
        backbone.norm_b = nn.ModuleList(
            [nn.BatchNorm2d(64) for _ in range(nm)])
        backbone.layer_a = nn.ModuleList(
            [res_layer(Bottleneck, 64, bb.stage_a.num_channels[0],
                       bb.stage_a.num_blocks[0]) for _ in range(nm)])
        sa_out = bb.stage_a.out_channels[0]
        backbone.transition_a = nn.ModuleList(
            [transition((sa_out,), bb.fusion_a.num_channels)
             for _ in range(nm)])
        backbone.transition_b = nn.ModuleList(
            [transition(bb.stage_b.out_channels, bb.fusion_b.num_channels)
             for _ in range(nm)])
        backbone.transition_c = nn.ModuleList(
            [transition(bb.stage_c.out_channels, bb.fusion_c.num_channels)
             for _ in range(nm)])
        for name, st in (('stage_b', bb.stage_b), ('stage_c', bb.stage_c)):
            setattr(backbone, name, nn.ModuleList(
                [nn.ModuleList([HRModule(st, st.out_channels)
                                for _ in range(st.num_modules)])
                 for _ in range(nm)]))
        for name, fus in (('fusion_a', bb.fusion_a), ('fusion_b',
                                                      bb.fusion_b),
                          ('fusion_c', bb.fusion_c)):
            setattr(backbone, name, nn.ModuleList(
                [FusionBlock(fus.num_channels[i], fus.num_heads[i],
                             fus.window_sizes[i], nm, fus.mlp_ratios[i])
                 for i in range(fus.num_branches)]))

        # neck (mmdet HRFPN)
        neck = Ns()
        self.neck = neck
        cin = sum(bb.stage4.out_channels)

        class ConvModule(nn.Module):
            def __init__(self, ci, co, k):
                super().__init__()
                self.conv = nn.Conv2d(ci, co, k, padding=k // 2)
        neck.reduction_conv = ConvModule(cin, cfg.neck_out_channels, 1)
        neck.fpn_convs = nn.ModuleList(
            [ConvModule(cfg.neck_out_channels, cfg.neck_out_channels, 3)
             for _ in range(5)])

        # rpn
        rpn = Ns()
        self.rpn_head = rpn
        na = len(cfg.anchor_ratios) * len(cfg.anchor_scales)
        rpn.rpn_conv = nn.Conv2d(cfg.neck_out_channels,
                                 cfg.neck_out_channels, 3, padding=1)
        rpn.rpn_cls = nn.Conv2d(cfg.neck_out_channels, na, 1)
        rpn.rpn_reg = nn.Conv2d(cfg.neck_out_channels, na * 4, 1)

        # cascade bbox heads
        roi = Ns()
        self.roi_head = roi

        class BBoxHead(nn.Module):
            def __init__(self, c_in, fc, ncls):
                super().__init__()
                self.shared_fcs = nn.ModuleList(
                    [nn.Linear(c_in, fc), nn.Linear(fc, fc)])
                self.fc_cls = nn.Linear(fc, ncls + 1)
                self.fc_reg = nn.Linear(fc, 4)

            def forward(self, x):                 # [N, C, 7, 7]
                x = x.flatten(1)
                for f in self.shared_fcs:
                    x = F.relu(f(x))
                return self.fc_cls(x), self.fc_reg(x)

        rcfg = cfg.roi
        c_in = cfg.neck_out_channels * rcfg.roi_size ** 2
        roi.bbox_head = nn.ModuleList(
            [BBoxHead(c_in, rcfg.fc_out_channels, rcfg.num_classes)
             for _ in range(rcfg.num_stages)])

    # -- forward pieces ----------------------------------------------------

    def backbone_forward(self, img, mod_imgs):
        bb = self.bb
        b = self.backbone
        nm = bb.num_fused_modalities

        x = F.relu(b.bn1(b.conv1(img)))
        x = F.relu(b.bn2(b.conv2(x)))
        x = b.layer1(x)

        mods = []
        for k in range(nm):
            m = F.relu(b.norm_a[k](b.conv_a[k](mod_imgs[k])))
            m = F.relu(b.norm_b[k](b.conv_b[k](m)))
            mods.append(b.layer_a[k](m))

        def run_stage(stage_mods, xs):
            for m in stage_mods:
                xs = m(xs)
            return xs

        def mod_transition(trans, feats, in_pre):
            per_mod = [apply_transition(trans[k], [feats[k]], in_pre)
                       for k in range(nm)]
            nb = len(per_mod[0])
            return [[per_mod[k][i] for k in range(nm)] for i in range(nb)]

        def fuse(bank, xs, m_br):
            return [bank[i](xs[i], m_br[i]) for i in range(len(xs))]

        # stage 2 (+ fusion A, modality stage B)
        xs = apply_transition(b.transition1, [x], 1,
                              conv_only_on_existing=True)
        m_br = mod_transition(b.transition_a, mods, 1)
        xs = fuse(b.fusion_a, xs, m_br)
        ys = run_stage(b.stage2, xs)
        mods = [run_stage(b.stage_b[k], [m_br[0][k]])[0] for k in range(nm)]

        # stage 3 (+ fusion B, modality stage C)
        xs = apply_transition(b.transition2, ys, len(bb.stage2.out_channels))
        m_br = mod_transition(b.transition_b, mods, 1)
        xs = fuse(b.fusion_b, xs, m_br)
        ys = run_stage(b.stage3, xs)
        mods = [run_stage(b.stage_c[k], [m_br[0][k]])[0] for k in range(nm)]

        # stage 4 (+ fusion C)
        xs = apply_transition(b.transition3, ys, len(bb.stage3.out_channels))
        m_br = mod_transition(b.transition_c, mods, 1)
        xs = fuse(b.fusion_c, xs, m_br)
        return run_stage(b.stage4, xs)

    def neck_forward(self, feats):
        ups = [feats[0]]
        for i in range(1, len(feats)):
            ups.append(F.interpolate(feats[i], size=feats[0].shape[2:],
                                     mode='bilinear', align_corners=False))
        x = self.neck.reduction_conv.conv(torch.cat(ups, 1))
        outs = [x]
        for i in range(1, 5):
            k = 2 ** i
            outs.append(F.avg_pool2d(x, kernel_size=k, stride=k))
        return [self.neck.fpn_convs[i].conv(outs[i]) for i in range(5)]

    def rpn_forward(self, feats):
        cls_scores, bbox_preds = [], []
        for f in feats:
            h = F.relu(self.rpn_head.rpn_conv(f))
            cls_scores.append(self.rpn_head.rpn_cls(h))
            bbox_preds.append(self.rpn_head.rpn_reg(h))
        return cls_scores, bbox_preds

    def cascade_decode(self, feats, proposals, valid, img_shape):
        """Cascade refine + decode (no NMS), mirroring
        `cascade_roi_head.py:342-399` with reg-class-agnostic heads.

        feats: 4 NCHW pyramid levels; proposals: [R, 4] numpy.
        Returns (boxes [R, 4], scores [R, C+1]) numpy."""
        rcfg = self.cfg.roi
        rois = np.asarray(proposals, np.float64)
        ms_logits = []
        deltas = None
        for i in range(rcfg.num_stages):
            pooled = roi_align_multilevel(
                [f.detach().numpy() for f in feats], rois,
                rcfg.featmap_strides, rcfg.roi_size, rcfg.finest_scale)
            logits, deltas = self.roi_head.bbox_head[i](
                torch.from_numpy(pooled.astype(np.float32)))
            logits = logits.detach().numpy()
            deltas = deltas.detach().numpy()
            ms_logits.append(logits)
            if i < rcfg.num_stages - 1:
                rois = delta2bbox_np(rois, deltas, rcfg.stage_stds[i],
                                     img_shape)
        avg = sum(ms_logits) / len(ms_logits)
        scores = np.exp(avg - avg.max(-1, keepdims=True))
        scores = scores / scores.sum(-1, keepdims=True)
        boxes = delta2bbox_np(rois, deltas, rcfg.stage_stds[-1], img_shape)
        scores = np.where(np.asarray(valid)[:, None], scores, 0.0)
        return boxes, scores


# --------------------------------------------------------------------------
# numpy detection math (independent of hrfuser_tpu.ops)
# --------------------------------------------------------------------------

def delta2bbox_np(rois, deltas, stds, img_shape, wh_ratio_clip=16 / 1000):
    stds = np.asarray(stds)
    d = deltas * stds
    pxy = (rois[:, :2] + rois[:, 2:]) * 0.5
    pwh = rois[:, 2:] - rois[:, :2]
    max_ratio = abs(math.log(wh_ratio_clip))
    dwh = np.clip(d[:, 2:], -max_ratio, max_ratio)
    gxy = pxy + pwh * d[:, :2]
    gwh = pwh * np.exp(dwh)
    boxes = np.concatenate([gxy - gwh * 0.5, gxy + gwh * 0.5], axis=1)
    h, w = img_shape
    boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
    boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
    return boxes


def _axis_weights(start, bin_size, size, out_size, grid):
    """Per-output-bin tap positions/weights along one axis
    (`sampling_ratio=0` adaptive grid, aligned=True)."""
    taps = []
    for p in range(out_size):
        row = []
        for s in range(grid):
            coord = start + (p + (s + 0.5) / grid) * bin_size
            if coord < -1.0 or coord > size:
                continue
            c = min(max(coord, 0.0), size - 1.0)
            lo = math.floor(c)
            hi = min(lo + 1, size - 1)
            w_hi = c - lo
            row.append((int(lo), int(hi), (1 - w_hi) / grid, w_hi / grid))
        taps.append(row)
    return taps


def roi_align_multilevel(feats, rois, strides, out_size, finest_scale,
                         max_grid=4):
    """Adaptive (sampling_ratio=0) aligned RoIAlign with FPN level
    routing (`single_level_roi_extractor.py:58-115`). feats NCHW."""
    n = rois.shape[0]
    c = feats[0].shape[1]
    out = np.zeros((n, c, out_size, out_size), np.float64)
    num_levels = len(strides)
    for r in range(n):
        x1, y1, x2, y2 = rois[r]
        scale = math.sqrt(max(x2 - x1, 0) * max(y2 - y1, 0))
        lvl = int(np.floor(np.log2(scale / finest_scale + 1e-6)))
        lvl = min(max(lvl, 0), num_levels - 1)
        f = feats[lvl][0]                        # [C, H, W]
        hgt, wid = f.shape[1:]
        s = 1.0 / strides[lvl]
        fx1, fy1 = x1 * s - 0.5, y1 * s - 0.5
        bw = (x2 * s - 0.5 - fx1) / out_size
        bh = (y2 * s - 0.5 - fy1) / out_size
        gx = min(max(int(np.ceil(bw)), 1), max_grid)
        gy = min(max(int(np.ceil(bh)), 1), max_grid)
        tx = _axis_weights(fx1, bw, wid, out_size, gx)
        ty = _axis_weights(fy1, bh, hgt, out_size, gy)
        for p in range(out_size):
            for q in range(out_size):
                acc = np.zeros(c, np.float64)
                for (ylo, yhi, wyl, wyh) in ty[p]:
                    for (xlo, xhi, wxl, wxh) in tx[q]:
                        acc += (wyl * wxl * f[:, ylo, xlo]
                                + wyl * wxh * f[:, ylo, xhi]
                                + wyh * wxl * f[:, yhi, xlo]
                                + wyh * wxh * f[:, yhi, xhi])
                out[r, :, p, q] = acc
    return out
