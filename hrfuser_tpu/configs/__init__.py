from hrfuser_tpu.configs.presets import (DataCfg, ExperimentCfg, OptimCfg,
                                         ScheduleCfg, get_config,
                                         list_configs)

__all__ = ['DataCfg', 'ExperimentCfg', 'OptimCfg', 'ScheduleCfg',
           'get_config', 'list_configs']
