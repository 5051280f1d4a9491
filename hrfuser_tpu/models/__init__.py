from hrfuser_tpu.models.backbones import (HRBackboneCfg, HRFormerBackbone,
                                          HRFuserBackbone,
                                          backbone_cfg_from_extra)
from hrfuser_tpu.models.detectors.cascade_rcnn import (CascadeRCNN,
                                                       DetectorCfg,
                                                       RPNTestCfg, predict)
from hrfuser_tpu.models.detectors.tta import (predict_aug_test_flip,
                                              predict_tta_flip)
from hrfuser_tpu.models.necks import HRFPN
from hrfuser_tpu.models.roi_heads.cascade_roi_head import (CascadeRoIHead,
                                                           Detections,
                                                           RoIHeadCfg)

__all__ = ['HRBackboneCfg', 'HRFormerBackbone', 'HRFuserBackbone',
           'backbone_cfg_from_extra', 'CascadeRCNN', 'DetectorCfg',
           'RPNTestCfg', 'predict', 'predict_aug_test_flip',
           'predict_tta_flip', 'HRFPN', 'CascadeRoIHead', 'Detections',
           'RoIHeadCfg']
