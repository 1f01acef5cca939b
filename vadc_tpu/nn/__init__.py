from vadc_tpu.nn import functional

__all__ = ["functional"]
