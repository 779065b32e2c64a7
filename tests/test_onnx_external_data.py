"""ONNX external-data loading: hand-encoded protobuf with out-of-file
weights (the rten external_data.rs path). Also exercises parser robustness
on a model we encode ourselves rather than torch-exported bytes."""

import struct

import numpy as np
import pytest

from rten_tpu.model import LoadError, Model


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _ld(num: int, payload: bytes) -> bytes:  # length-delimited
    return _field(num, 2) + _varint(len(payload)) + payload


def _str(num: int, s: str) -> bytes:
    return _ld(num, s.encode())


def _int(num: int, v: int) -> bytes:
    return _field(num, 0) + _varint(v)


def _kv(num: int, key: str, value: str) -> bytes:
    return _ld(num, _str(1, key) + _str(2, value))


def make_model_with_external_weight(tmp_path, w: np.ndarray):
    """MatMul(x, W) with W stored in an external .bin file."""
    (tmp_path / "weights.bin").write_bytes(b"\x00" * 16 + w.tobytes())

    tensor = (
        _int(1, w.shape[0]) + _int(1, w.shape[1])  # dims
        + _int(2, 1)                               # data_type FLOAT
        + _str(8, "W")                             # name
        + _kv(13, "location", "weights.bin")
        + _kv(13, "offset", "16")
        + _kv(13, "length", str(w.nbytes))
        + _int(14, 1)                              # data_location EXTERNAL
    )

    def value_info(name, dims):
        shape = b"".join(_ld(1, _int(1, d)) for d in dims)
        ttype = _ld(1, _int(1, 1) + _ld(2, shape))
        return _ld(0, b"")[:0] + _str(1, name) + _ld(2, ttype)

    node = _str(1, "x") + _str(1, "W") + _str(2, "y") + _str(4, "MatMul")
    graph = (
        _ld(1, node)
        + _str(2, "g")
        + _ld(5, tensor)
        + _ld(11, value_info("x", [2, 3]))
        + _ld(12, value_info("y", [2, 4]))
    )
    model = _int(1, 8) + _ld(7, graph) + _ld(8, _str(1, "") + _int(2, 17))
    path = tmp_path / "ext.onnx"
    path.write_bytes(model)
    return str(path)


def test_external_data_loads_and_runs(tmp_path):
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    path = make_model_with_external_weight(tmp_path, w)
    model = Model.load_file(path)
    x = np.ones((2, 3), np.float32)
    got = np.asarray(model.run({"x": x})[0])
    np.testing.assert_allclose(got, x @ w, rtol=1e-6)


def test_external_data_path_escape_rejected(tmp_path):
    w = np.zeros((3, 4), np.float32)
    path = make_model_with_external_weight(tmp_path, w)
    data = open(path, "rb").read()
    evil = data.replace(b"weights.bin", b"../evil.bin")
    evil_path = tmp_path / "evil.onnx"
    evil_path.write_bytes(evil)
    with pytest.raises(LoadError):
        # Parse succeeds; resolving the tensor must fail on path escape.
        Model.load_file(str(evil_path))


def test_missing_external_file_errors(tmp_path):
    w = np.zeros((3, 4), np.float32)
    path = make_model_with_external_weight(tmp_path, w)
    (tmp_path / "weights.bin").unlink()
    with pytest.raises((LoadError, FileNotFoundError)):
        Model.load_file(path)
