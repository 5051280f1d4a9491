"""Full-detector numerical parity vs a plain-torch reference rebuild.

End-to-end version of `test_pth_convert.py`: the complete reference
forward (HRFuser backbone -> HRFPN -> RPN -> cascade decode) is
reimplemented in eager torch with the reference's parameter names
(`tests/oracles/torch_hrfuser.py`), its random weights are converted via
`pth_convert.convert_state_dict`, and this framework must reproduce the
same neck features, RPN maps, and cascade boxes/scores on random input.

One test de-risks every silent mAP killer called out in SURVEY §7:
fuse upsample modes (`hrnet.py:146,199-203`), fused-qkv vs split
projections (`hrformer.py:84` vs `hrfuser_hrformer_based.py:92-94`),
center-pad off-by-one (`hrformer.py:200-236`), the stage-2 transition
quirk (`hrfuser_hrformer_based.py:553`), and cascade decode order /
stage score averaging (`cascade_roi_head.py:342-399`).
"""

import dataclasses
import functools

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from hrfuser_tpu.configs.presets import detector, hrfuser_backbone
from hrfuser_tpu.models import CascadeRCNN
from hrfuser_tpu.models.dense_heads.rpn_head import get_proposals_single
from hrfuser_tpu.utils.pth_convert import convert_state_dict, verify_against
from tests.oracles.torch_hrfuser import TorchHRFuserDetector

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `-m "not slow"` fast tier


def _tiny_cfg():
    model = detector(hrfuser_backbone(channels=(8, 16, 24, 32),
                                      heads=(1, 2, 2, 4),
                                      stage3_modules=1, lidar_c_modules=1),
                     num_classes=4)
    return dataclasses.replace(
        model,
        roi=dataclasses.replace(model.roi, num_classes=4,
                                fc_out_channels=32,
                                sample_num=0,            # exact adaptive
                                pool_method='gather',
                                pool_method_eval='gather',
                                gather_bf16=False),
        rpn_test=dataclasses.replace(model.rpn_test, nms_pre=64,
                                     max_per_img=48),
        neck_out_channels=32)


def test_full_detector_parity():
    torch.manual_seed(0)
    cfg = _tiny_cfg()
    tm = TorchHRFuserDetector(cfg).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict(sd, cfg)

    h, w = 64, 96
    rng = np.random.default_rng(3)
    img = rng.normal(0, 1, (1, h, w, 3)).astype(np.float32)
    mods = [rng.normal(0, 1, (1, h, w, 3)).astype(np.float32)
            for _ in range(2)]

    det = CascadeRCNN(cfg)
    init = jax.jit(functools.partial(det.init, train=False))(
        jax.random.PRNGKey(0), jnp.asarray(img),
        [jnp.asarray(m) for m in mods])
    # The converter dual-emits transition weights on channel-changing
    # existing branches (full ConvNorm name + the `trans{i}_conv` quirk
    # name) because it cannot know which forward variant a config uses;
    # the unused variant is legitimately 'extra'. Everything else —
    # missing or mis-shaped entries anywhere, extras elsewhere — fails.
    problems = [p for p in verify_against(init, variables)
                if not (p.startswith('extra') and '/transition' in p)]
    assert problems == []

    # ---- neck features + RPN maps --------------------------------------
    feats, cls_scores, bbox_preds = det.apply(
        variables, jnp.asarray(img), [jnp.asarray(m) for m in mods],
        False, method='forward_features')

    with torch.no_grad():
        t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
        t_mods = [torch.from_numpy(m).permute(0, 3, 1, 2) for m in mods]
        t_bb = tm.backbone_forward(t_img, t_mods)
        t_feats = tm.neck_forward(t_bb)
        t_cls, t_reg = tm.rpn_forward(t_feats)

    for lvl in range(5):
        want = t_feats[lvl].permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(feats[lvl]), want,
                                   atol=5e-3, rtol=1e-3,
                                   err_msg=f'neck level {lvl}')
        np.testing.assert_allclose(
            np.asarray(cls_scores[lvl]),
            t_cls[lvl].permute(0, 2, 3, 1).numpy(), atol=5e-3, rtol=1e-3,
            err_msg=f'rpn cls level {lvl}')
        np.testing.assert_allclose(
            np.asarray(bbox_preds[lvl]),
            t_reg[lvl].permute(0, 2, 3, 1).numpy(), atol=5e-3, rtol=1e-3,
            err_msg=f'rpn reg level {lvl}')

    # ---- cascade decode on identical proposals -------------------------
    gen = cfg.anchor_generator()
    sizes = [tuple(f.shape[1:3]) for f in feats]
    anchors = [jnp.asarray(a) for a in gen.grid_anchors(sizes)]
    props = get_proposals_single(
        [s[0] for s in cls_scores], [p[0] for p in bbox_preds], anchors,
        (jnp.float32(h), jnp.float32(w)),
        nms_pre=cfg.rpn_test.nms_pre, max_per_img=cfg.rpn_test.max_per_img,
        nms_iou=cfg.rpn_test.nms_iou)

    boxes, scores = det.apply(
        variables, [f[0] for f in feats[:4]], props.boxes, props.valid,
        (jnp.float32(h), jnp.float32(w)), method='roi_decode')

    t_boxes, t_scores = tm.cascade_decode(
        t_feats[:4], np.asarray(props.boxes, np.float64),
        np.asarray(props.valid), (h, w))

    valid = np.asarray(props.valid)
    assert valid.any()
    np.testing.assert_allclose(np.asarray(boxes)[valid], t_boxes[valid],
                               atol=0.15, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(scores)[valid], t_scores[valid],
                               atol=5e-3, rtol=0)
