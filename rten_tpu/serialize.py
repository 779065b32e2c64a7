"""Tensor (de)serialization: .npy/.npz and safetensors, read + write.

Analog of rten-serialize (rten-serialize/src/lib.rs:1-35), used by the CLI
--inputs/--check-outputs flow. safetensors is implemented directly (8-byte
LE header length + JSON header + raw little-endian buffers) rather than via
the safetensors package, mirroring the reference's from-scratch approach.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Dict, Union

import numpy as np

_ST_DTYPES = {
    "F64": np.dtype("<f8"),
    "F32": np.dtype("<f4"),
    "F16": np.dtype("<f2"),
    "BF16": None,  # handled specially
    "I64": np.dtype("<i8"),
    "I32": np.dtype("<i4"),
    "I16": np.dtype("<i2"),
    "I8": np.dtype("i1"),
    "U8": np.dtype("u1"),
    "U16": np.dtype("<u2"),
    "U32": np.dtype("<u4"),
    "U64": np.dtype("<u8"),
    "BOOL": np.dtype("bool"),
}


def _np_to_st_dtype(dtype: np.dtype) -> str:
    name = np.dtype(dtype).name
    if name == "bfloat16":
        return "BF16"
    table = {
        "float64": "F64", "float32": "F32", "float16": "F16",
        "int64": "I64", "int32": "I32", "int16": "I16", "int8": "I8",
        "uint8": "U8", "uint16": "U16", "uint32": "U32", "uint64": "U64",
        "bool": "BOOL",
    }
    if name not in table:
        raise ValueError(f"unsupported dtype for safetensors: {name}")
    return table[name]


def read_safetensors(path: Union[str, os.PathLike]) -> Dict[str, np.ndarray]:
    """Zero-copy-ish read: tensors are views over one mmap."""
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    (header_len,) = struct.unpack("<Q", bytes(mm[:8]))
    header = json.loads(bytes(mm[8 : 8 + header_len]))
    data_start = 8 + header_len
    out: Dict[str, np.ndarray] = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        start, end = info["data_offsets"]
        raw = mm[data_start + start : data_start + end]
        st_dtype = info["dtype"]
        if st_dtype == "BF16":
            import ml_dtypes

            arr = np.frombuffer(raw, dtype=ml_dtypes.bfloat16)
        else:
            dt = _ST_DTYPES.get(st_dtype)
            if dt is None:
                raise ValueError(f"unsupported safetensors dtype {st_dtype}")
            arr = np.frombuffer(raw, dtype=dt)
        out[name] = arr.reshape(info["shape"])
    return out


def write_safetensors(
    path: Union[str, os.PathLike],
    tensors: Dict[str, np.ndarray],
    metadata: Dict[str, str] = None,
) -> None:
    header = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        raw = arr.tobytes()
        header[name] = {
            "dtype": _np_to_st_dtype(arr.dtype),
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        offset += len(raw)
        blobs.append(raw)
    if metadata:
        header["__metadata__"] = metadata
    hjson = json.dumps(header).encode("utf-8")
    # Pad header to 8-byte alignment (spec recommendation).
    pad = (-(8 + len(hjson))) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for raw in blobs:
            f.write(raw)


def read_tensors(path: Union[str, os.PathLike]) -> Dict[str, np.ndarray]:
    """Sniff .npy/.npz/.safetensors by extension/magic and load."""
    path = os.fspath(path)
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic[:6] == b"\x93NUMPY":
        return {"0": np.load(path)}
    if magic[:2] == b"PK":
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    return read_safetensors(path)


def write_tensors(path: Union[str, os.PathLike], tensors: Dict[str, np.ndarray]):
    path = os.fspath(path)
    if path.endswith(".npy"):
        if len(tensors) != 1:
            raise ValueError(".npy holds exactly one tensor")
        np.save(path, next(iter(tensors.values())))
    elif path.endswith(".npz"):
        np.savez(path, **tensors)
    else:
        write_safetensors(path, tensors)
