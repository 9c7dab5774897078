from catears_tpu.utils.errors import (
    CatEarsError,
    CorruptionError,
    IOError_,
    NotImplementedError_,
    RuntimeError_,
    last_error,
    record_error,
)

__all__ = [
    "CatEarsError",
    "CorruptionError",
    "IOError_",
    "NotImplementedError_",
    "RuntimeError_",
    "last_error",
    "record_error",
]
