"""Dependency-free ONNX initializer extraction (protobuf wire format).

The `onnx` package is not in this image, but converting the reference's model
distribution (8 .onnx graphs, README.md:69-93) only needs the *initializers*
(named weight tensors), not graph semantics.  ONNX files are standard
protobufs; this module walks the wire format directly:

  ModelProto.graph (field 7) -> GraphProto.initializer (repeated field 5)
  -> TensorProto { dims=1, data_type=2, name=8, raw_data=9,
                   float_data=4, int32_data=5, int64_data=7 }

Returns {name: np.ndarray}.  Supports the dtypes that appear in NN weights
(f32/f16/bf16/i8/u8/i32/i64/f64/bool).  External-data tensors (field 13) are
resolved relative to the model file.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

# ONNX TensorProto.DataType -> numpy dtype (bf16 handled specially)
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
    12: np.uint32,
    13: np.uint64,
    16: "bfloat16",
}


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yields (field_number, wire_type, value) over a message buffer.
    value: int for varint/fixed, bytes for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == 1:  # fixed64
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
            yield field, wire, val
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos : pos + length]
            pos += length
        elif wire == 5:  # fixed32
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
            yield field, wire, val
        else:
            raise ValueError(f"unsupported wire type {wire} (field {field})")


def _zigzag_passthrough(v: int) -> int:
    # ONNX dims/int64_data are plain (non-zigzag) varints; negatives encode as
    # 10-byte two's complement
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def _parse_tensor(buf: bytes, base_dir: str) -> Tuple[Optional[str], Optional[np.ndarray]]:
    dims: List[int] = []
    data_type = 0
    name = None
    raw: Optional[bytes] = None
    float_data: List[float] = []
    int_data: List[int] = []
    external: Dict[str, str] = {}
    data_location = 0

    for field, wire, val in _iter_fields(buf):
        if field == 1:  # dims
            if wire == 0:
                dims.append(_zigzag_passthrough(val))
            else:  # packed
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    dims.append(_zigzag_passthrough(v))
        elif field == 2 and wire == 0:
            data_type = val
        elif field == 8 and wire == 2:
            name = val.decode("utf-8", errors="replace")
        elif field == 9 and wire == 2:
            raw = val
        elif field == 4:  # float_data (packed or repeated fixed32)
            if wire == 2:
                float_data.extend(
                    struct.unpack(f"<{len(val) // 4}f", val[: (len(val) // 4) * 4])
                )
            elif wire == 5:
                float_data.append(struct.unpack("<f", struct.pack("<I", val))[0])
        elif field in (5, 7):  # int32_data / int64_data varints
            if wire == 2:
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    int_data.append(_zigzag_passthrough(v))
            elif wire == 0:
                int_data.append(_zigzag_passthrough(val))
        elif field == 13 and wire == 2:  # external_data: StringStringEntryProto
            k = v = None
            for f2, w2, val2 in _iter_fields(val):
                if f2 == 1 and w2 == 2:
                    k = val2.decode()
                elif f2 == 2 and w2 == 2:
                    v = val2.decode()
            if k is not None:
                external[k] = v or ""
        elif field == 14 and wire == 0:
            data_location = val

    if name is None:
        return None, None

    if data_location == 1 and external.get("location"):
        path = os.path.join(base_dir, external["location"])
        offset = int(external.get("offset", "0") or 0)
        length = int(external.get("length", "0") or 0)
        with open(path, "rb") as f:
            f.seek(offset)
            raw = f.read(length) if length else f.read()

    dtype = _DTYPES.get(data_type)
    if dtype is None:
        return name, None  # unsupported (string/complex); caller may warn

    shape = tuple(dims)
    if raw is not None:
        if dtype == "bfloat16":
            u16 = np.frombuffer(raw, "<u2")
            arr = (u16.astype(np.uint32) << 16).view(np.float32).astype(np.float32)
        else:
            arr = np.frombuffer(raw, np.dtype(dtype).newbyteorder("<")).astype(dtype)
    elif float_data:
        arr = np.asarray(float_data, np.float32)
    elif int_data:
        base = np.int64 if data_type == 7 else np.int32
        arr = np.asarray(int_data, base)
        if dtype != "bfloat16":
            arr = arr.astype(dtype, copy=False)
    else:
        arr = np.zeros(shape, np.float32 if dtype == "bfloat16" else dtype)
    return name, arr.reshape(shape)


def load_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """Extract {name: array} initializers from an .onnx file."""
    with open(path, "rb") as f:
        buf = f.read()
    base_dir = os.path.dirname(os.path.abspath(path))
    out: Dict[str, np.ndarray] = {}
    for field, wire, val in _iter_fields(buf):
        if field == 7 and wire == 2:  # ModelProto.graph
            _walk_graph(val, base_dir, out)
    return out


def _walk_graph(graph_buf: bytes, base_dir: str, out: Dict[str, np.ndarray]) -> None:
    for field, wire, val in _iter_fields(graph_buf):
        if field == 5 and wire == 2:  # initializer
            name, arr = _parse_tensor(val, base_dir)
            if name is not None and arr is not None:
                out[name] = arr
        elif field == 1 and wire == 2:  # node: recurse into subgraph attributes
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 5 and w2 == 2:  # attribute
                    for f3, w3, v3 in _iter_fields(v2):
                        if f3 == 6 and w3 == 2:  # AttributeProto.g (subgraph)
                            _walk_graph(v3, base_dir, out)


# ---------------------------------------------------------------------------
# Minimal ONNX *writer* (test fixtures / re-export): emits a ModelProto whose
# graph carries the given initializers.  Mirrors the reader above; used to
# fabricate graphs with the reference export's naming so the converter path
# is provable without the real assets (SURVEY §2.2 contracts).
# ---------------------------------------------------------------------------

_DTYPE_CODES = {
    np.dtype(np.float32): 1,
    np.dtype(np.uint8): 2,
    np.dtype(np.int8): 3,
    np.dtype(np.int16): 5,
    np.dtype(np.int32): 6,
    np.dtype(np.int64): 7,
    np.dtype(np.bool_): 9,
    np.dtype(np.float16): 10,
    np.dtype(np.float64): 11,
}


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _encode_tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    code = _DTYPE_CODES.get(arr.dtype)
    if code is None:
        if str(arr.dtype) == "bfloat16":
            code = 16
            raw = arr.view(np.uint16).astype("<u2").tobytes()
        else:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name}")
    else:
        raw = arr.astype(arr.dtype.newbyteorder("<"), copy=False).tobytes()
    out = bytearray()
    for d in arr.shape:
        out += _tag(1, 0) + _varint(int(d))
    out += _tag(2, 0) + _varint(code)
    out += _len_field(8, name.encode("utf-8"))
    out += _len_field(9, raw)
    return bytes(out)


def write_onnx_model(path: str, initializers: Dict[str, np.ndarray],
                     graph_name: str = "g") -> None:
    """Write a minimal .onnx file whose graph holds ``initializers``."""
    graph = bytearray()
    for name, arr in initializers.items():
        graph += _len_field(5, _encode_tensor(name, np.asarray(arr)))
    graph += _len_field(2, graph_name.encode("utf-8"))
    model = _tag(1, 0) + _varint(10)  # ir_version
    model += _len_field(7, bytes(graph))
    with open(path, "wb") as f:
        f.write(model)
