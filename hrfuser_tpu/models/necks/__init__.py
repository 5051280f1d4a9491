from hrfuser_tpu.models.necks.hrfpn import HRFPN

__all__ = ['HRFPN']
