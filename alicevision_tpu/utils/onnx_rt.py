"""From-scratch ONNX model loading + JAX execution (no onnxruntime, no
protobuf library).

The reference runs its segmentation / sphere-detection networks through an
ONNX Runtime session (ref: src/aliceVision/segmentation/segmentation.hpp
:119-120 createSession/tiled inference; sphereDetection/sphereDetection.cpp
ONNX forward). This image ships no onnxruntime, so this module implements
the needed slice natively:

  * a protobuf WIRE-FORMAT reader for `ModelProto` (varint +
    length-delimited decoding against the fixed onnx.proto field numbers —
    no .proto compilation, no protobuf runtime), plus the symmetric writer
    the tests use to author real `.onnx` files byte-compatible with the
    spec;
  * an executor that binds each graph node to a jax.numpy implementation
    and jit-compiles the whole forward per input shape — convolutions and
    matmuls ride the MXU via `lax.conv_general_dilated` / `dot_general`.

Supported ops cover segmentation-style CNNs: Conv, ConvTranspose,
BatchNormalization, Relu/LeakyRelu/Sigmoid/Tanh/Softmax/Clip, MaxPool/
AveragePool/GlobalAveragePool, Add/Sub/Mul/Div/Pow/Sqrt/Exp/Neg, MatMul/
Gemm, Concat/Reshape/Transpose/Flatten/Squeeze/Unsqueeze/Identity/Cast,
Resize/Upsample (nearest + linear), Pad (constant), ArgMax,
ReduceMean/ReduceSum/ReduceMax, Constant/ConstantOfShape/Shape/Gather/
Slice. Shape-producing ops are constant-folded at bind time so the traced
forward stays static-shaped (dynamic data-dependent shapes are out of
scope, as they are for XLA generally).
"""

from __future__ import annotations

import struct
from functools import partial

import numpy as np

# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------

_WIRE_VARINT, _WIRE_I64, _WIRE_LEN, _WIRE_I32 = 0, 1, 2, 5


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a serialized message."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == _WIRE_VARINT:
            v, i = _read_varint(buf, i)
        elif wire == _WIRE_I64:
            v = buf[i:i + 8]
            i += 8
        elif wire == _WIRE_LEN:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wire == _WIRE_I32:
            v = buf[i:i + 4]
            i += 4
        else:  # pragma: no cover - groups are not used by onnx
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def _collect(buf: bytes) -> dict:
    out: dict = {}
    for field, wire, v in _fields(buf):
        out.setdefault(field, []).append((wire, v))
    return out


def _svint(v: int) -> int:
    """Two's-complement interpretation of a 64-bit varint."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _packed_varints(entries) -> list[int]:
    vals = []
    for wire, v in entries:
        if wire == _WIRE_VARINT:
            vals.append(_svint(v))
        else:  # packed
            i = 0
            while i < len(v):
                x, i = _read_varint(v, i)
                vals.append(_svint(x))
    return vals


def _packed_floats(entries) -> list[float]:
    vals = []
    for wire, v in entries:
        if wire == _WIRE_I32:
            vals.append(struct.unpack("<f", v)[0])
        else:  # packed
            vals.extend(struct.unpack(f"<{len(v) // 4}f", v))
    return vals


_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
            7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64}


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    f = _collect(buf)
    dims = _packed_varints(f.get(1, []))
    dt = _packed_varints(f.get(2, [0]))[0]
    name = f[8][0][1].decode() if 8 in f else ""
    np_dt = _DTYPES.get(dt, np.float32)
    if 9 in f:  # raw_data
        arr = np.frombuffer(f[9][0][1], dtype=np_dt)
    elif 4 in f:  # float_data
        arr = np.asarray(_packed_floats(f[4]), np.float32)
    elif 7 in f:  # int64_data
        arr = np.asarray(_packed_varints(f[7]), np.int64)
    elif 5 in f:  # int32_data
        arr = np.asarray(_packed_varints(f[5]), np.int32).astype(np_dt)
    elif 10 in f:  # double_data
        arr = np.asarray(
            [struct.unpack("<d", w[1])[0] if w[0] == _WIRE_I64 else 0.0
             for w in f[10]], np.float64)
    else:
        arr = np.zeros(0, np_dt)
    return name, arr.reshape(dims) if dims else arr


def _parse_attr(buf: bytes) -> tuple[str, object]:
    f = _collect(buf)
    name = f[1][0][1].decode()
    if 2 in f:  # f
        return name, struct.unpack("<f", f[2][0][1])[0]
    if 3 in f:  # i
        return name, _svint(f[3][0][1])
    if 4 in f:  # s
        return name, f[4][0][1].decode()
    if 5 in f:  # t
        return name, _parse_tensor(f[5][0][1])[1]
    if 7 in f:  # floats
        return name, _packed_floats(f[7])
    if 8 in f:  # ints
        return name, _packed_varints(f[8])
    if 9 in f:  # strings
        return name, [w[1].decode() for w in f[9]]
    return name, None


class Node:
    __slots__ = ("op", "inputs", "outputs", "attrs", "name")

    def __init__(self, op, inputs, outputs, attrs, name=""):
        self.op, self.inputs, self.outputs = op, inputs, outputs
        self.attrs, self.name = attrs, name

    def __repr__(self):
        return f"Node({self.op}, {self.inputs} -> {self.outputs})"


def _parse_node(buf: bytes) -> Node:
    f = _collect(buf)
    return Node(
        op=f[4][0][1].decode() if 4 in f else "",
        inputs=[w[1].decode() for w in f.get(1, [])],
        outputs=[w[1].decode() for w in f.get(2, [])],
        attrs=dict(_parse_attr(w[1]) for w in f.get(5, [])),
        name=f[3][0][1].decode() if 3 in f else "",
    )


def _parse_value_info(buf: bytes) -> tuple[str, list]:
    f = _collect(buf)
    name = f[1][0][1].decode()
    shape: list = []
    if 2 in f:  # TypeProto
        tf = _collect(f[2][0][1])
        if 1 in tf:  # tensor_type
            tt = _collect(tf[1][0][1])
            if 2 in tt:  # shape
                sh = _collect(tt[2][0][1])
                for _, dbuf in sh.get(1, []):
                    df = _collect(dbuf)
                    if 1 in df:
                        shape.append(_svint(df[1][0][1]))
                    else:
                        shape.append(None)  # dim_param (symbolic)
    return name, shape


class OnnxGraph:
    def __init__(self, nodes, initializers, inputs, outputs, name=""):
        self.nodes = nodes
        self.initializers = initializers  # name -> np.ndarray
        self.inputs = inputs  # [(name, shape)]
        self.outputs = outputs
        self.name = name


def parse_model(data: bytes) -> OnnxGraph:
    """Parse serialized ModelProto bytes into an OnnxGraph."""
    f = _collect(data)
    if 7 not in f:
        raise ValueError("no GraphProto in model")
    g = _collect(f[7][0][1])
    inits = dict(_parse_tensor(w[1]) for w in g.get(5, []))
    inputs = [_parse_value_info(w[1]) for w in g.get(11, [])]
    outputs = [_parse_value_info(w[1]) for w in g.get(12, [])]
    nodes = [_parse_node(w[1]) for w in g.get(1, [])]
    name = g[2][0][1].decode() if 2 in g else ""
    # graph inputs include initializers in some exporters; keep only true
    # runtime inputs
    inputs = [(n, s) for n, s in inputs if n not in inits]
    return OnnxGraph(nodes, inits, inputs, outputs, name)


def load_model(path: str) -> OnnxGraph:
    with open(path, "rb") as fh:
        return parse_model(fh.read())


# ---------------------------------------------------------------------------
# protobuf writer (used by tests to author real .onnx files)
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, _WIRE_LEN) + _varint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    return _tag(field, _WIRE_VARINT) + _varint(value)


def _f32(field: int, value: float) -> bytes:
    return _tag(field, _WIRE_I32) + struct.pack("<f", value)


_DT_CODES = {np.dtype(np.float32): 1, np.dtype(np.uint8): 2,
             np.dtype(np.int8): 3, np.dtype(np.int32): 6,
             np.dtype(np.int64): 7, np.dtype(np.bool_): 9,
             np.dtype(np.float16): 10, np.dtype(np.float64): 11}


def make_tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    out = b"".join(_vi(1, int(d)) for d in arr.shape)
    out += _vi(2, _DT_CODES[arr.dtype])
    out += _ld(8, name.encode())
    out += _ld(9, arr.tobytes())
    return out


def _attr(name: str, value) -> bytes:
    out = _ld(1, name.encode())
    if isinstance(value, float):
        out += _f32(2, value) + _vi(20, 1)  # FLOAT
    elif isinstance(value, (bool, int, np.integer)):
        out += _vi(3, int(value)) + _vi(20, 2)  # INT
    elif isinstance(value, str):
        out += _ld(4, value.encode()) + _vi(20, 3)  # STRING
    elif isinstance(value, np.ndarray):
        out += _ld(5, make_tensor("", value)) + _vi(20, 4)  # TENSOR
    elif isinstance(value, (list, tuple)) and value and isinstance(
            value[0], float):
        out += b"".join(_f32(7, v) for v in value) + _vi(20, 6)  # FLOATS
    elif isinstance(value, (list, tuple)):
        out += b"".join(_vi(8, int(v)) for v in value) + _vi(20, 7)  # INTS
    else:  # pragma: no cover
        raise TypeError(f"unsupported attribute {name}={value!r}")
    return out


def make_node(op: str, inputs, outputs, **attrs) -> bytes:
    out = b"".join(_ld(1, s.encode()) for s in inputs)
    out += b"".join(_ld(2, s.encode()) for s in outputs)
    out += _ld(4, op.encode())
    out += b"".join(_ld(5, _attr(k, v)) for k, v in attrs.items())
    return out


def _value_info(name: str, shape) -> bytes:
    dims = b"".join(_ld(1, _vi(1, int(d))) for d in shape)
    tensor_type = _vi(1, 1) + _ld(2, dims)  # elem_type=FLOAT, shape
    return _ld(1, name.encode()) + _ld(2, _ld(1, tensor_type))


def make_model(nodes, inputs, outputs, initializers=None,
               graph_name: str = "g", opset: int = 13) -> bytes:
    """Serialize a ModelProto: nodes = [make_node(...)], inputs/outputs =
    [(name, shape)], initializers = {name: np.ndarray}."""
    g = b"".join(_ld(1, n) for n in nodes)
    g += _ld(2, graph_name.encode())
    for name, arr in (initializers or {}).items():
        g += _ld(5, make_tensor(name, arr))
    for name, shape in inputs:
        g += _ld(11, _value_info(name, shape))
    for name, shape in outputs:
        g += _ld(12, _value_info(name, shape))
    m = _vi(1, 8)  # ir_version
    m += _ld(2, b"alicevision_tpu")  # producer
    m += _ld(7, g)
    m += _ld(8, _vi(2, opset))  # opset_import { version }
    return m


# ---------------------------------------------------------------------------
# executor
# ---------------------------------------------------------------------------


def _pairs(pads, nd):
    """ONNX pads [b1..bn, e1..en] -> ((b1, e1), ...) for nd spatial dims."""
    if not pads:
        return ((0, 0),) * nd
    half = len(pads) // 2
    return tuple((int(pads[i]), int(pads[i + half])) for i in range(half))


class OnnxModel:
    """Executable ONNX model: parses once, jit-compiles per input shape.

    Call with positional arrays matching the graph inputs (or a dict); NCHW
    layouts follow the ONNX spec. Returns the single output array, or a
    tuple when the graph declares several."""

    def __init__(self, model: OnnxGraph | bytes | str):
        if isinstance(model, (bytes, bytearray)):
            model = parse_model(bytes(model))
        elif isinstance(model, str):
            model = load_model(model)
        self.graph = model
        self._jitted: dict = {}

    @property
    def input_names(self):
        return [n for n, _ in self.graph.inputs]

    @property
    def output_names(self):
        return [n for n, _ in self.graph.outputs]

    def __call__(self, *args, **feeds):
        import jax

        named = dict(zip(self.input_names, args))
        named.update(feeds)
        key = tuple(
            (n, np.asarray(named[n]).shape, np.asarray(named[n]).dtype.str)
            for n in self.input_names
        )
        if key not in self._jitted:
            self._jitted[key] = jax.jit(partial(self._run))
        vals = [np.asarray(named[n]) for n in self.input_names]
        out = self._jitted[key](*vals)
        return out if len(self.graph.outputs) > 1 else out[0]

    # -- traced forward ----------------------------------------------------
    def _run(self, *inputs):
        import jax
        import jax.numpy as jnp
        from jax import lax

        env: dict = {"": None}
        env.update({k: jnp.asarray(v)
                    for k, v in self.graph.initializers.items()})
        env.update(dict(zip(self.input_names, inputs)))

        def const_of(name):
            """Concrete numpy value for shape-carrying inputs (must be an
            initializer or a folded constant, not runtime data). env
            values are tracers under jit even for constants, so
            initializers resolve from the parsed graph directly."""
            if name in self.graph.initializers:
                return np.asarray(self.graph.initializers[name])
            v = env[name]
            if isinstance(v, jax.core.Tracer):
                raise ValueError(
                    f"data-dependent shape input '{name}' is not supported"
                )
            return np.asarray(v)

        for nd in self.graph.nodes:
            a = nd.attrs
            x = [env[i] for i in nd.inputs] if nd.inputs else []
            op = nd.op
            if op == "Conv" or op == "ConvTranspose":
                w = x[1]
                nsp = w.ndim - 2
                strides = tuple(a.get("strides", (1,) * nsp))
                dil = tuple(a.get("dilations", (1,) * nsp))
                group = int(a.get("group", 1))
                pads = _pairs(a.get("pads"), nsp)
                if a.get("auto_pad", "NOTSET") in ("SAME_UPPER",
                                                   "SAME_LOWER"):
                    pads = "SAME"
                dn = lax.conv_dimension_numbers(
                    x[0].shape, w.shape,
                    ("NCHW", "OIHW", "NCHW") if nsp == 2 else
                    ("NCH", "OIH", "NCH"))
                if op == "Conv":
                    y = lax.conv_general_dilated(
                        x[0], w, strides, pads, rhs_dilation=dil,
                        dimension_numbers=dn, feature_group_count=group)
                else:  # ConvTranspose: fractionally-strided conv
                    opads = tuple(a.get("output_padding", (0,) * nsp))
                    kd = [(w.shape[2 + i] - 1) * dil[i] + 1
                          for i in range(nsp)]
                    if pads == "SAME":
                        pads = ((0, 0),) * nsp
                    tpads = tuple(
                        (kd[i] - 1 - pads[i][0],
                         kd[i] - 1 - pads[i][1] + opads[i])
                        for i in range(nsp))
                    y = lax.conv_general_dilated(
                        x[0], jnp.flip(w, axis=tuple(range(2, w.ndim))
                                       ).swapaxes(0, 1),
                        (1,) * nsp, tpads, lhs_dilation=strides,
                        rhs_dilation=dil, dimension_numbers=dn,
                        feature_group_count=group)
                if len(x) > 2:
                    y = y + x[2].reshape((1, -1) + (1,) * nsp)
            elif op == "BatchNormalization":
                scale, bias, mean, var = x[1], x[2], x[3], x[4]
                eps = a.get("epsilon", 1e-5)
                sh = (1, -1) + (1,) * (x[0].ndim - 2)
                y = (x[0] - mean.reshape(sh)) * (
                    scale.reshape(sh) * lax.rsqrt(var.reshape(sh) + eps)
                ) + bias.reshape(sh)
            elif op == "Relu":
                y = jnp.maximum(x[0], 0)
            elif op == "LeakyRelu":
                y = jnp.where(x[0] >= 0, x[0], a.get("alpha", 0.01) * x[0])
            elif op == "Sigmoid":
                y = jax.nn.sigmoid(x[0])
            elif op == "Tanh":
                y = jnp.tanh(x[0])
            elif op == "Softmax":
                y = jax.nn.softmax(x[0], axis=int(a.get("axis", -1)))
            elif op == "Clip":
                lo = x[1] if len(x) > 1 and x[1] is not None else a.get(
                    "min", -np.inf)
                hi = x[2] if len(x) > 2 and x[2] is not None else a.get(
                    "max", np.inf)
                y = jnp.clip(x[0], lo, hi)
            elif op in ("MaxPool", "AveragePool"):
                ks = tuple(a["kernel_shape"])
                nsp = len(ks)
                strides = tuple(a.get("strides", ks))
                pads = _pairs(a.get("pads"), nsp)
                win = (1, 1) + ks
                strd = (1, 1) + strides
                pad = ((0, 0), (0, 0)) + pads
                if op == "MaxPool":
                    y = lax.reduce_window(
                        x[0], -jnp.inf, lax.max, win, strd, pad)
                else:
                    s = lax.reduce_window(x[0], 0.0, lax.add, win, strd, pad)
                    if a.get("count_include_pad", 0):
                        y = s / float(np.prod(ks))
                    else:
                        ones = jnp.ones_like(x[0])
                        cnt = lax.reduce_window(
                            ones, 0.0, lax.add, win, strd, pad)
                        y = s / cnt
            elif op == "GlobalAveragePool":
                y = jnp.mean(x[0], axis=tuple(range(2, x[0].ndim)),
                             keepdims=True)
            elif op in ("Add", "Sub", "Mul", "Div", "Pow"):
                import operator

                fn = {"Add": operator.add, "Sub": operator.sub,
                      "Mul": operator.mul, "Div": operator.truediv,
                      "Pow": operator.pow}[op]
                y = fn(x[0], x[1])
            elif op == "Sqrt":
                y = jnp.sqrt(x[0])
            elif op == "Exp":
                y = jnp.exp(x[0])
            elif op == "Neg":
                y = -x[0]
            elif op == "MatMul":
                y = jnp.matmul(x[0], x[1])
            elif op == "Gemm":
                A = x[0].T if a.get("transA", 0) else x[0]
                B = x[1].T if a.get("transB", 0) else x[1]
                y = a.get("alpha", 1.0) * (A @ B)
                if len(x) > 2:
                    y = y + a.get("beta", 1.0) * x[2]
            elif op == "Concat":
                y = jnp.concatenate(x, axis=int(a["axis"]))
            elif op == "Reshape":
                shape = [int(s) for s in const_of(nd.inputs[1])]
                shape = [x[0].shape[i] if s == 0 else s
                         for i, s in enumerate(shape)]
                y = x[0].reshape(shape)
            elif op == "Transpose":
                perm = a.get("perm") or list(range(x[0].ndim))[::-1]
                y = jnp.transpose(x[0], [int(p) for p in perm])
            elif op == "Flatten":
                ax = int(a.get("axis", 1))
                y = x[0].reshape((int(np.prod(x[0].shape[:ax])), -1))
            elif op == "Squeeze":
                axes = ([int(s) for s in const_of(nd.inputs[1])]
                        if len(nd.inputs) > 1 else a.get("axes"))
                y = (jnp.squeeze(x[0], axis=tuple(axes)) if axes
                     else jnp.squeeze(x[0]))
            elif op == "Unsqueeze":
                axes = ([int(s) for s in const_of(nd.inputs[1])]
                        if len(nd.inputs) > 1 else a["axes"])
                y = x[0]
                for ax in sorted(int(v) for v in axes):
                    y = jnp.expand_dims(y, ax)
            elif op in ("Identity", "Dropout"):
                y = x[0]
            elif op == "Cast":
                to = {1: jnp.float32, 6: jnp.int32, 7: jnp.int64,
                      9: jnp.bool_, 11: jnp.float64}[int(a["to"])]
                y = x[0].astype(to)
            elif op in ("Resize", "Upsample"):
                import jax.image as jimage

                if op == "Upsample":
                    scales = (a.get("scales")
                              or const_of(nd.inputs[1]).tolist())
                    sizes = [int(round(d * s))
                             for d, s in zip(x[0].shape, scales)]
                else:
                    sizes = None
                    if len(nd.inputs) > 3 and nd.inputs[3]:
                        sizes = [int(s) for s in const_of(nd.inputs[3])]
                    elif len(nd.inputs) > 2 and nd.inputs[2]:
                        scales = const_of(nd.inputs[2]).tolist()
                        sizes = [int(round(d * s))
                                 for d, s in zip(x[0].shape, scales)]
                mode = a.get("mode", "nearest")
                method = {"nearest": "nearest", "linear": "bilinear",
                          "cubic": "bicubic"}[mode]
                y = jimage.resize(x[0], sizes, method=method)
            elif op == "Pad":
                pads = ([int(p) for p in const_of(nd.inputs[1])]
                        if len(nd.inputs) > 1 else a["pads"])
                half = len(pads) // 2
                widths = [(pads[i], pads[i + half]) for i in range(half)]
                mode = a.get("mode", "constant")
                if mode == "constant":
                    cval = 0.0
                    if len(nd.inputs) > 2 and nd.inputs[2]:
                        cval = float(const_of(nd.inputs[2]))
                    y = jnp.pad(x[0], widths, constant_values=cval)
                else:
                    y = jnp.pad(x[0], widths,
                                mode={"reflect": "reflect",
                                      "edge": "edge"}[mode])
            elif op == "ArgMax":
                ax = int(a.get("axis", 0))
                y = jnp.argmax(x[0], axis=ax)
                if a.get("keepdims", 1):
                    y = jnp.expand_dims(y, ax)
            elif op in ("ReduceMean", "ReduceSum", "ReduceMax"):
                fn = {"ReduceMean": jnp.mean, "ReduceSum": jnp.sum,
                      "ReduceMax": jnp.max}[op]
                axes = a.get("axes")
                if axes is None and len(nd.inputs) > 1:
                    axes = [int(s) for s in const_of(nd.inputs[1])]
                y = fn(x[0], axis=tuple(int(v) for v in axes) if axes
                       else None, keepdims=bool(a.get("keepdims", 1)))
            elif op == "Constant":
                y = jnp.asarray(a.get("value"))
            elif op == "ConstantOfShape":
                shape = [int(s) for s in const_of(nd.inputs[0])]
                val = a.get("value")
                v0 = float(np.asarray(val).reshape(-1)[0]) if val is not (
                    None) else 0.0
                y = jnp.full(shape, v0)
            elif op == "Shape":
                y = np.asarray(env[nd.inputs[0]].shape, np.int64)
            elif op == "Gather":
                idx = x[1]
                y = jnp.take(x[0], idx, axis=int(a.get("axis", 0)))
                if isinstance(x[0], np.ndarray) and isinstance(
                        idx, (np.ndarray, np.integer, int)):
                    y = np.take(x[0], idx, axis=int(a.get("axis", 0)))
            elif op == "Slice":
                starts = [int(s) for s in const_of(nd.inputs[1])]
                ends = [int(s) for s in const_of(nd.inputs[2])]
                axes = ([int(s) for s in const_of(nd.inputs[3])]
                        if len(nd.inputs) > 3 else list(range(len(starts))))
                steps = ([int(s) for s in const_of(nd.inputs[4])]
                         if len(nd.inputs) > 4 else [1] * len(starts))
                sl = [slice(None)] * x[0].ndim
                for s0, e0, ax, st in zip(starts, ends, axes, steps):
                    sl[ax] = slice(s0, None if e0 >= 2**31 else e0, st)
                y = x[0][tuple(sl)]
            else:
                raise NotImplementedError(f"ONNX op {op} not supported")
            outs = (y,) if not isinstance(y, tuple) else y
            for name, val in zip(nd.outputs, outs):
                env[name] = val

        return tuple(jnp.asarray(env[n]) for n in self.output_names)
