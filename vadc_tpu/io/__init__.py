from vadc_tpu.io.testtensor import (
    load_testtensor,
    load_testtensor_bytes,
    save_testtensor,
    save_testtensor_bytes,
)

__all__ = [
    "load_testtensor",
    "load_testtensor_bytes",
    "save_testtensor",
    "save_testtensor_bytes",
]
