"""Data types supported by the engine.

Mirrors the reference's value-type policy (rten `src/value.rs:20`,
`src/lib.rs:83-88`): the runtime natively supports a small closed set of
dtypes; wider types arriving from ONNX models are narrowed at the boundary
(i64 -> i32, f64 -> f32). On TPU we additionally keep bf16 as a first-class
compute type since the MXU natively prefers it.
"""

from __future__ import annotations

import enum

import numpy as np


class DataType(enum.Enum):
    """Engine-native tensor element types."""

    Float = "float32"
    BFloat16 = "bfloat16"
    Int32 = "int32"
    Int8 = "int8"
    UInt8 = "uint8"
    Bool = "bool"

    @property
    def np_dtype(self) -> np.dtype:
        if self is DataType.BFloat16:
            import ml_dtypes

            return np.dtype(ml_dtypes.bfloat16)
        return np.dtype(self.value)

    @classmethod
    def from_np(cls, dtype) -> "DataType":
        dtype = np.dtype(dtype)
        name = dtype.name
        if name in _NARROWING:
            name = _NARROWING[name]
        for dt in cls:
            if dt.value == name:
                return dt
        raise ValueError(f"unsupported dtype {dtype}")


# ONNX-boundary narrowing policy (reference: rten src/lib.rs:83-88).
_NARROWING = {
    "float64": "float32",
    "int64": "int32",
    "int16": "int32",
    "uint16": "int32",
    "uint32": "int32",
    "uint64": "int32",
    "float16": "float32",
}


def narrow_array(arr: np.ndarray) -> np.ndarray:
    """Apply the boundary narrowing policy to a numpy array.

    i64 values outside i32 range are clamped (the reference errors instead;
    clamping keeps INT64_MIN/MAX sentinel values used by ONNX `Slice` etc.
    meaningful after narrowing).
    """
    name = arr.dtype.name
    if name not in _NARROWING:
        return arr
    target = _NARROWING[name]
    if target == "int32" and arr.dtype.itemsize > 4:
        arr = np.clip(arr, np.iinfo(np.int32).min, np.iinfo(np.int32).max)
    return arr.astype(target)
