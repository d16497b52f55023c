"""Frozen TF1 GraphDef → JAX executor (exact legacy Inception metrics).

The reference's image IS / FID / sFID protocol is OpenAI's npz evaluator
running the frozen 2015 ``classify_image_graph_def.pb`` InceptionV3 graph
under a TF1 session (`evaluations/evaluator.py:586-614`,
`evaluations/compute_image_is.py:16-24`).  Those numbers are only comparable
to published tables when computed by *that graph*, not by a reimplementation
— so instead of porting the architecture, this module executes the frozen
graph itself: the GraphDef protobuf is parsed in pure Python (wire-format
decoding shared with :mod:`.tf_bundle`; no TensorFlow, no protobuf runtime)
and each node is interpreted with jax/lax ops, so the whole network runs
jit-compiled on TPU.

Supported op set covers the Inception classifier family (Conv2D, legacy
BatchNormWithGlobalNormalization, Max/AvgPool with TF-SAME counting,
ResizeBilinear with TF1 legacy grid, Concat[V2], MatMul, Softmax, ...);
unknown ops raise by name.  ``batch_agnostic=True`` reproduces the
evaluator's ``_update_shapes`` patch (`evaluator.py:617-639`): frozen
batch-1 ``Reshape`` targets are relaxed to ``-1`` so any batch runs.

:class:`InceptionV3Features` packages the exact evaluator contract on top:
feed ``ExpandDims:0`` with float images in [0,255], fetch ``pool_3:0``
(2048-d) and ``mixed_6/conv:0[..., :7]`` (sFID spatial head), and compute
the IS softmax as ``acts @ W`` with the graph's ``softmax/logits/MatMul``
weight and **no bias** (`evaluator.py:603-614`).
"""

from __future__ import annotations

import struct
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple, Union

import numpy as np

from .tf_bundle import _np_dtype, _proto_fields, _read_varint

# ---------------------------------------------------------------------------
# protobuf decoding: GraphDef / NodeDef / AttrValue / TensorProto
# ---------------------------------------------------------------------------


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _packed_varints(buf: bytes) -> List[int]:
    out, pos = [], 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(_signed(v))
    return out


def _parse_shape(buf: bytes) -> Tuple[int, ...]:
    dims = []
    for f, _w, v in _proto_fields(buf):
        if f == 2:  # Dim
            size = 0
            for f2, _w2, v2 in _proto_fields(v):
                if f2 == 1:
                    size = _signed(v2)
            dims.append(size)
    return tuple(dims)


# TensorProto typed-value fields (tensor.proto): 5 float_val, 6 double_val,
# 7 int_val, 10 int64_val, 11 bool_val, 13 half_val (uint16 bit patterns).
_TYPED_VAL_FIELDS = {5, 6, 7, 10, 11, 13}


def _parse_tensor(buf: bytes) -> np.ndarray:
    dtype_enum = 1
    shape: Tuple[int, ...] = ()
    content = b""
    vals: List[Any] = []
    for f, w, v in _proto_fields(buf):
        if f == 1:
            dtype_enum = v
        elif f == 2:
            shape = _parse_shape(v)
        elif f == 4:
            content = v
        elif f in _TYPED_VAL_FIELDS:
            if f == 5 and w == 5:  # float_val, unpacked
                vals.append(struct.unpack("<f", v.to_bytes(4, "little"))[0])
            elif f == 5 and w == 2:  # float_val, packed
                vals.extend(struct.unpack(f"<{len(v) // 4}f", v))
            elif f == 6 and w == 1:  # double_val, unpacked
                vals.append(struct.unpack("<d", v.to_bytes(8, "little"))[0])
            elif f == 6 and w == 2:  # double_val, packed
                vals.extend(struct.unpack(f"<{len(v) // 8}d", v))
            elif f == 13:  # half_val: uint16 bit patterns of float16
                raw = _packed_varints(v) if w == 2 else [_signed(v)]
                vals.extend(
                    np.array(raw, np.uint16).view(np.float16).tolist()
                )
            elif w == 0:  # int_val / int64_val / bool_val, unpacked
                vals.append(_signed(v))
            elif w == 2:  # same, packed
                vals.extend(_packed_varints(v))
    dtype = _np_dtype(dtype_enum)
    size = int(np.prod(shape)) if shape else 1
    if content:
        arr = np.frombuffer(content, dtype=dtype.newbyteorder("<")).astype(dtype)
    else:
        if not vals:
            vals = [0]
        if len(vals) < size:  # TF splat semantics: last value repeats
            vals = vals + [vals[-1]] * (size - len(vals))
        arr = np.array(vals[:size], dtype=dtype)
    return arr.reshape(shape)


class AttrValue:
    """Decoded attr_value.proto oneof (only the fields classifiers use)."""

    __slots__ = ("s", "i", "f", "b", "type", "shape", "tensor", "list_i", "list_s")

    def __init__(self, buf: bytes):
        self.s = None
        self.i = None
        self.f = None
        self.b = None
        self.type = None
        self.shape = None
        self.tensor = None
        self.list_i: List[int] = []
        self.list_s: List[bytes] = []
        for f, w, v in _proto_fields(buf):
            if f == 2:
                self.s = v
            elif f == 3:
                self.i = _signed(v)
            elif f == 4:
                self.f = struct.unpack("<f", v.to_bytes(4, "little"))[0]
            elif f == 5:
                self.b = bool(v)
            elif f == 6:
                self.type = v
            elif f == 7:
                self.shape = _parse_shape(v)
            elif f == 8:
                self.tensor = _parse_tensor(v)
            elif f == 1:  # ListValue
                for f2, w2, v2 in _proto_fields(v):
                    if f2 == 3:
                        if w2 == 2:
                            self.list_i.extend(_packed_varints(v2))
                        else:
                            self.list_i.append(_signed(v2))
                    elif f2 == 2:
                        self.list_s.append(v2)


class NodeDef:
    __slots__ = ("name", "op", "inputs", "attrs")

    def __init__(self, buf: bytes):
        self.name = ""
        self.op = ""
        self.inputs: List[str] = []
        self.attrs: Dict[str, AttrValue] = {}
        for f, _w, v in _proto_fields(buf):
            if f == 1:
                self.name = v.decode("utf-8")
            elif f == 2:
                self.op = v.decode("utf-8")
            elif f == 3:
                self.inputs.append(v.decode("utf-8"))
            elif f == 5:  # map<string, AttrValue> entry
                key, val = "", None
                for f2, _w2, v2 in _proto_fields(v):
                    if f2 == 1:
                        key = v2.decode("utf-8")
                    elif f2 == 2:
                        val = AttrValue(v2)
                if val is not None:
                    self.attrs[key] = val


def parse_graphdef(data: bytes) -> List[NodeDef]:
    return [NodeDef(v) for f, _w, v in _proto_fields(data) if f == 1]


# ---------------------------------------------------------------------------
# op interpreter
# ---------------------------------------------------------------------------


def _tf_resize_bilinear(x, out_hw, align_corners: bool):
    """TF1 ResizeBilinear (half_pixel_centers=False): legacy grid
    ``src = i * in/out`` (or ``i * (in-1)/(out-1)`` when align_corners) —
    deliberately NOT jax.image.resize, whose half-pixel grid differs."""
    import jax.numpy as jnp

    n, in_h, in_w, c = x.shape
    out_h, out_w = int(out_hw[0]), int(out_hw[1])

    def axis_coords(in_dim, out_dim):
        if align_corners and out_dim > 1:
            scale = (in_dim - 1) / (out_dim - 1)
        else:
            scale = in_dim / out_dim
        src = jnp.arange(out_dim, dtype=jnp.float32) * scale
        lo = jnp.clip(jnp.floor(src), 0, in_dim - 1).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_dim - 1)
        frac = src - lo.astype(jnp.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_coords(in_h, out_h)
    xlo, xhi, xf = axis_coords(in_w, out_w)
    x = x.astype(jnp.float32)
    top = x[:, ylo][:, :, xlo] * (1 - xf)[None, None, :, None] + x[:, ylo][
        :, :, xhi
    ] * xf[None, None, :, None]
    bot = x[:, yhi][:, :, xlo] * (1 - xf)[None, None, :, None] + x[:, yhi][
        :, :, xhi
    ] * xf[None, None, :, None]
    return top * (1 - yf)[None, :, None, None] + bot * yf[None, :, None, None]


def _pool(x, attrs, kind: str):
    import jax.numpy as jnp
    from jax import lax

    ksize = attrs["ksize"].list_i
    strides = attrs["strides"].list_i
    padding = attrs["padding"].s.decode()
    window = tuple(ksize)
    stride = tuple(strides)
    if kind == "max":
        return lax.reduce_window(x, -jnp.inf, lax.max, window, stride, padding)
    total = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add, window, stride, padding
    )
    if padding == "VALID":
        return total / float(np.prod(ksize))
    # TF SAME avg pooling divides by the VALID element count per window
    ones = jnp.ones(x.shape[1:3], jnp.float32)[None, :, :, None]
    count = lax.reduce_window(ones, 0.0, lax.add, window, stride, padding)
    return total / count


class GraphDefExecutor:
    """Interpret a frozen GraphDef with jax ops.

    ``run(fetches, feeds)`` evaluates tensor names (``node`` or ``node:i``)
    given fed tensors, memoized per call; wrap with ``jax.jit`` via
    :meth:`as_jax_fn` for compiled execution.
    """

    def __init__(self, graph: Union[str, bytes], batch_agnostic: bool = True):
        if isinstance(graph, str):
            with open(graph, "rb") as f:
                graph = f.read()
        self.nodes: Dict[str, NodeDef] = {n.name: n for n in parse_graphdef(graph)}
        self.batch_agnostic = batch_agnostic
        self._consts: Dict[str, np.ndarray] = {}

    # -- graph utilities ---------------------------------------------------

    def const_value(self, name: str) -> np.ndarray:
        """Fetch a Const node's tensor (e.g. the IS softmax weight,
        evaluator.py:609-613) without running anything."""
        name = name.split(":")[0]
        if name not in self._consts:
            node = self.nodes[name]
            if node.op != "Const":
                raise ValueError(f"{name!r} is a {node.op}, not a Const")
            self._consts[name] = _parse_tensor(
                b""
            ) if node.attrs.get("value") is None else node.attrs["value"].tensor
        return self._consts[name]

    def as_jax_fn(self, fetches: Sequence[str], feed_names: Sequence[str]):
        """Positional-arg callable suitable for jax.jit."""

        def fn(*args):
            return self.run(fetches, dict(zip(feed_names, args)))

        return fn

    # -- evaluation ---------------------------------------------------------

    def run(self, fetches: Sequence[str], feeds: Dict[str, Any]) -> List[Any]:
        feeds = {self._canon(k): v for k, v in feeds.items()}
        memo: Dict[str, Any] = dict(feeds)
        return [self._eval(self._canon(name), memo) for name in fetches]

    @staticmethod
    def _canon(name: str) -> str:
        name = name.lstrip("^")
        return name if ":" in name else name + ":0"

    def _eval(self, tensor: str, memo: Dict[str, Any]):
        if tensor in memo:
            return memo[tensor]
        node_name, out_idx = tensor.rsplit(":", 1)
        # iterative DFS so deep classifier chains don't hit the recursion cap
        stack = [node_name]
        while stack:
            name = stack[-1]
            if self._canon(name) in memo:
                stack.pop()
                continue
            node = self.nodes.get(name)
            if node is None:
                raise KeyError(f"graph has no node {name!r}")
            deps = [
                self._canon(i)
                for i in node.inputs
                if not i.startswith("^")  # control edges don't carry values
            ]
            missing = [d for d in deps if d not in memo]
            if missing:
                stack.extend(m.rsplit(":", 1)[0] for m in missing)
                continue
            outs = self._apply(node, [memo[d] for d in deps])
            if not isinstance(outs, tuple):
                outs = (outs,)
            for i, o in enumerate(outs):
                memo[f"{name}:{i}"] = o
            stack.pop()
        return memo[f"{node_name}:{out_idx}"]

    def _apply(self, node: NodeDef, inputs: List[Any]):
        import jax.numpy as jnp
        from jax import lax

        op = node.op
        a = node.attrs
        if op == "Const":
            # numpy, NOT jnp: under jit every jnp op stages to a tracer, and
            # consts that feed shape positions (Reshape targets, resize
            # sizes, concat axes) must stay static.  Math ops accept numpy
            # operands and stage them as jaxpr constants on use.
            return a["value"].tensor
        if op == "Placeholder":
            raise ValueError(
                f"placeholder {node.name!r} was not fed (feeds must cover it)"
            )
        if op in ("Identity", "CheckNumerics", "StopGradient", "PreventGradient"):
            return inputs[0]
        if op == "Cast":
            return jnp.asarray(inputs[0]).astype(_np_dtype(a["DstT"].type))
        if op == "ExpandDims":
            return jnp.expand_dims(inputs[0], int(inputs[1]))
        if op == "Squeeze":
            dims = a["squeeze_dims"].list_i if "squeeze_dims" in a else None
            return jnp.squeeze(inputs[0], axis=tuple(dims) if dims else None)
        if op == "Reshape":
            target = list(np.asarray(inputs[1]))
            x = inputs[0]
            if (
                self.batch_agnostic
                and len(target) > 0
                and target[0] == 1
                and -1 not in target
                and x.shape[0] != 1
            ):
                # evaluator.py _update_shapes parity: frozen batch-1 graphs
                # get their leading reshape dim relaxed so any batch runs
                target[0] = -1
            return jnp.reshape(x, target)
        if op in ("Sub", "Mul", "Add", "AddV2", "RealDiv", "Maximum", "Minimum"):
            f = {
                "Sub": jnp.subtract,
                "Mul": jnp.multiply,
                "Add": jnp.add,
                "AddV2": jnp.add,
                "RealDiv": jnp.divide,
                "Maximum": jnp.maximum,
                "Minimum": jnp.minimum,
            }[op]
            return f(inputs[0], inputs[1])
        if op == "BiasAdd":
            return inputs[0] + inputs[1]
        if op == "Relu":
            return jnp.maximum(inputs[0], 0)
        if op == "Relu6":
            return jnp.clip(inputs[0], 0, 6)
        if op == "Softmax":
            import jax

            return jax.nn.softmax(inputs[0], axis=-1)
        if op == "Conv2D":
            strides = a["strides"].list_i
            return lax.conv_general_dilated(
                inputs[0],
                inputs[1],
                window_strides=(int(strides[1]), int(strides[2])),
                padding=a["padding"].s.decode(),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if op == "BatchNormWithGlobalNormalization":
            t, m, v, beta, gamma = inputs
            eps = a["variance_epsilon"].f
            inv = lax.rsqrt(v + eps)
            if a["scale_after_normalization"].b:
                inv = inv * gamma
            return t * inv + (beta - m * inv)
        if op == "FusedBatchNorm" or op == "FusedBatchNormV3":
            t, gamma, beta, m, v = inputs
            eps = a["epsilon"].f
            inv = lax.rsqrt(v + eps) * gamma
            return t * inv + (beta - m * inv)
        if op == "MaxPool":
            return _pool(inputs[0], a, "max")
        if op == "AvgPool":
            return _pool(inputs[0], a, "avg").astype(inputs[0].dtype)
        if op == "Concat":  # axis first (TF1)
            return jnp.concatenate(inputs[1:], axis=int(inputs[0]))
        if op == "ConcatV2":  # axis last
            return jnp.concatenate(inputs[:-1], axis=int(inputs[-1]))
        if op == "MatMul":
            x, w = inputs
            if a.get("transpose_a") is not None and a["transpose_a"].b:
                x = x.T
            if a.get("transpose_b") is not None and a["transpose_b"].b:
                w = w.T
            return x @ w
        if op == "ResizeBilinear":
            align = a.get("align_corners")
            return _tf_resize_bilinear(
                inputs[0], np.asarray(inputs[1]), bool(align.b) if align else False
            )
        if op == "Shape":
            return jnp.asarray(np.array(inputs[0].shape, np.int32))
        if op == "Pad":
            pads = np.asarray(inputs[1])
            return jnp.pad(inputs[0], [(int(l), int(h)) for l, h in pads])
        raise NotImplementedError(
            f"GraphDef op {op!r} (node {node.name!r}) is not implemented — "
            "extend GraphDefExecutor._apply if the frozen graph needs it"
        )


# ---------------------------------------------------------------------------
# the evaluator's Inception contract
# ---------------------------------------------------------------------------

FID_POOL_NAME = "pool_3:0"  # evaluator.py:23
FID_SPATIAL_NAME = "mixed_6/conv:0"  # evaluator.py:24
_INPUT_NAME = "ExpandDims:0"  # evaluator.py:592-595
_SOFTMAX_W_NODE = "softmax/weights"  # input 1 of softmax/logits/MatMul


class InceptionV3Features:
    """`classify_image_graph_def.pb` with the OpenAI evaluator's exact
    tensor contract (evaluator.py:129-133,586-614): images in [0,255]
    NHWC float -> (pool_3 [N,2048], spatial mixed_6/conv[...,:7] [N,2023]);
    IS softmax = acts @ W (no bias)."""

    def __init__(self, pb_path: str):
        import jax

        self.executor = GraphDefExecutor(pb_path, batch_agnostic=True)
        matmul = self.executor.nodes["softmax/logits/MatMul"]
        w = self.executor.const_value(matmul.inputs[1])
        self._softmax_w = np.asarray(w)
        self._features = jax.jit(
            self.executor.as_jax_fn(
                [FID_POOL_NAME, FID_SPATIAL_NAME], [_INPUT_NAME]
            )
        )

    def features(self, images_0_255: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        import jax

        pool, spatial = self._features(np.asarray(images_0_255, np.float32))
        pool, spatial = jax.device_get((pool, spatial))
        n = pool.shape[0]
        # evaluator.py:155-158 flattens both heads; :599 slices spatial to 7
        return (
            np.asarray(pool).reshape(n, -1),
            np.asarray(spatial)[..., :7].reshape(n, -1),
        )

    def softmax(self, pool_acts: np.ndarray) -> np.ndarray:
        logits = np.asarray(pool_acts, np.float32) @ self._softmax_w
        logits = logits - logits.max(axis=-1, keepdims=True)
        e = np.exp(logits)
        return e / e.sum(axis=-1, keepdims=True)


def inception_score_openai(preds: np.ndarray, split_size: int = 5000) -> float:
    """IS over softmax predictions (evaluator.py:179-194 / improved-gan)."""
    scores = []
    for i in range(0, len(preds), split_size):
        part = preds[i : i + split_size]
        kl = part * (np.log(part) - np.log(np.mean(part, axis=0, keepdims=True)))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores))
