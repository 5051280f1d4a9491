from hrfuser_tpu.models.backbones.hr_config import (HRBackboneCfg, FusionCfg,
                                                    StageCfg,
                                                    apply_stochastic_depth,
                                                    backbone_cfg_from_extra)
from hrfuser_tpu.models.backbones.hrformer import HRFormerBackbone
from hrfuser_tpu.models.backbones.hrfuser import HRFuserBackbone

__all__ = ['HRBackboneCfg', 'FusionCfg', 'StageCfg', 'apply_stochastic_depth',
           'backbone_cfg_from_extra', 'HRFormerBackbone', 'HRFuserBackbone']
