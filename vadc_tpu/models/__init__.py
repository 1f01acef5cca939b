from vadc_tpu.models.weights import load_params, detect_model_family
from vadc_tpu.models import silero_v31, silero_v4, silero_v5

__all__ = [
    "load_params",
    "detect_model_family",
    "silero_v31",
    "silero_v4",
    "silero_v5",
]
