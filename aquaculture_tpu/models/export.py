"""JAX parameter-tree -> ultralytics ``.pt`` checkpoint export.

The inverse of :mod:`aquaculture_tpu.models.weights`: serializes this
framework's parameter tree as a torch-zip checkpoint holding a flat
ultralytics-layout state dict (``model.4.cv1.conv.weight`` etc., OIHW),
WITHOUT torch as a dependency — the pickle stream is emitted opcode by
opcode in the exact shape torch's unpickler rebuilds tensors from
(``torch._utils._rebuild_tensor_v2`` + persistent storage ids).

Why: the reference ecosystem consumes ``.pt`` weights everywhere
(reference README.md:52,60,77 — train from yolov5m.pt, serve
multilabel_farms_exp2.pt). Import already round-trips (models/weights.py);
export closes the loop so a model trained HERE can flow back into
ultralytics tooling. Validated against real torch.load in tests.

Scope note: the file is a STATE-DICT checkpoint (``torch.load`` ->
``{name: Tensor}``), the layout ``Model.load_state_dict`` and this
framework's own loader consume. It is NOT the full object-pickled
``{'model': Model}`` graph ultralytics' ``attempt_load`` rebuilds — that
pickle embeds ultralytics' own class graph, which only their repo can
construct faithfully.
"""

from __future__ import annotations

import zipfile
from typing import Dict, Optional, Sequence

import numpy as np

from aquaculture_tpu.models.weights import family_layout

# ---------------------------------------------------------------------------
# param tree -> ultralytics state dict
# ---------------------------------------------------------------------------


def _oihw(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1)))


def _conv_to_torch(p: dict, prefix: str, sd: Dict[str, np.ndarray]) -> None:
    if "wq" in p:
        raise ValueError(
            f"{prefix}: int8-quantized layer (wq layout) — ultralytics .pt "
            "stores float weights; export the pre-quantization tree"
        )
    w = np.asarray(p["w"])
    if w.ndim == 4 and w.shape[0] == 2:
        raise ValueError(
            f"{prefix}: k2 kernel — this tree was fused with down_s2d; "
            "export the training-layout (or plain-fused) tree instead"
        )
    sd[f"{prefix}.conv.weight"] = _oihw(w)
    if "bn" in p:
        bn = p["bn"]
        sd[f"{prefix}.bn.weight"] = np.asarray(bn["scale"], np.float32)
        sd[f"{prefix}.bn.bias"] = np.asarray(bn["bias"], np.float32)
        sd[f"{prefix}.bn.running_mean"] = np.asarray(bn["mean"], np.float32)
        sd[f"{prefix}.bn.running_var"] = np.asarray(bn["var"], np.float32)
        # ultralytics BN modules carry this buffer; harmless but expected
        sd[f"{prefix}.bn.num_batches_tracked"] = np.asarray(0, np.int64)
    elif "b" in p:
        sd[f"{prefix}.conv.bias"] = np.asarray(p["b"], np.float32)


def _c3_to_torch(p: dict, prefix: str, sd: Dict[str, np.ndarray]) -> None:
    _conv_to_torch(p["cv1"], f"{prefix}.cv1", sd)
    _conv_to_torch(p["cv2"], f"{prefix}.cv2", sd)
    _conv_to_torch(p["cv3"], f"{prefix}.cv3", sd)
    for i, m in enumerate(p["m"]):
        _conv_to_torch(m["cv1"], f"{prefix}.m.{i}.cv1", sd)
        _conv_to_torch(m["cv2"], f"{prefix}.m.{i}.cv2", sd)


def state_dict_from_params(
    model, params: dict, anchors: Optional[Sequence] = None
) -> Dict[str, np.ndarray]:
    """Flat ultralytics state dict (OIHW numpy arrays) from a param tree.

    The exact inverse of weights.params_from_state_dict: layer-index map
    per family, Conv/C3/SPPF sub-layouts, Detect head at model.24 (P5) /
    model.33 (P6). ``anchors`` defaults to the model's anchor table and is
    stored as the Detect ``anchors`` buffer in grid units (the layout
    weights.anchors_from_state_dict reads back)."""
    layer_index, detect_index, sppf_name = family_layout(model)

    b0 = params["b0"]
    if "wq" in b0:
        raise ValueError(
            "this tree is int8-quantized (wq/wscale layout) — ultralytics "
            ".pt stores float weights; export the pre-quantization tree"
        )
    if "w" not in b0:
        raise ValueError(f"b0 has no conv weight (keys: {sorted(b0)})")
    w0 = np.asarray(b0["w"])
    if w0.shape[0] != 6:
        raise ValueError(
            "b0 kernel is not k6 — this tree was fused with stem_s2d; "
            "export the training-layout tree (or fuse(stem_s2d=False))"
        )

    sd: Dict[str, np.ndarray] = {}
    for name, idx in layer_index.items():
        p = params[name]
        prefix = f"model.{idx}"
        if name == sppf_name:
            _conv_to_torch(p["cv1"], f"{prefix}.cv1", sd)
            _conv_to_torch(p["cv2"], f"{prefix}.cv2", sd)
        elif "m" in p:  # C3
            _c3_to_torch(p, prefix, sd)
        else:
            _conv_to_torch(p, prefix, sd)

    for i, hp in enumerate(params["head"]):
        sd[f"model.{detect_index}.m.{i}.weight"] = _oihw(hp["w"])
        sd[f"model.{detect_index}.m.{i}.bias"] = np.asarray(hp["b"], np.float32)

    table = np.asarray(anchors if anchors is not None else model.anchor_table, np.float32)
    strides = np.asarray(model.strides, np.float32)[:, None, None]
    sd[f"model.{detect_index}.anchors"] = table / strides
    return sd


# ---------------------------------------------------------------------------
# torch-free .pt writer (torch zip format, hand-emitted pickle stream)
# ---------------------------------------------------------------------------

_DTYPE_STORAGE = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.bool_): "BoolStorage",
}

# pickle protocol-2 opcodes (only what the stream needs)
_PROTO2 = b"\x80\x02"
_EMPTY_DICT, _MARK, _SETITEMS, _STOP = b"}", b"(", b"u", b"."
_TUPLE, _EMPTY_TUPLE, _REDUCE = b"t", b")", b"R"
_BINPERSID, _NEWFALSE = b"Q", b"\x89"


def _op_str(s: str) -> bytes:  # BINUNICODE
    b = s.encode("utf-8")
    return b"X" + len(b).to_bytes(4, "little") + b


def _op_int(i: int) -> bytes:  # BININT (32-bit signed covers all our sizes)
    return b"J" + int(i).to_bytes(4, "little", signed=True)


def _op_global(module: str, name: str) -> bytes:
    return b"c" + module.encode() + b"\n" + name.encode() + b"\n"


def _pickle_tensor(key: str, arr: np.ndarray) -> bytes:
    """Opcode sequence rebuilding one tensor:
    torch._utils._rebuild_tensor_v2(
        <persistent ('storage', torch.XStorage, key, 'cpu', numel)>,
        0, size, contiguous_strides, False, collections.OrderedDict())."""
    storage_cls = _DTYPE_STORAGE[arr.dtype]
    strides = []
    acc = 1
    for dim in reversed(arr.shape):
        strides.insert(0, acc)
        acc *= dim
    out = [_op_global("torch._utils", "_rebuild_tensor_v2"), _MARK]
    out += [
        _MARK,
        _op_str("storage"),
        _op_global("torch", storage_cls),
        _op_str(key),
        _op_str("cpu"),
        _op_int(arr.size),
        _TUPLE,
        _BINPERSID,
    ]
    out.append(_op_int(0))  # storage_offset
    out += [_MARK, *[_op_int(d) for d in arr.shape], _TUPLE]
    out += [_MARK, *[_op_int(s) for s in strides], _TUPLE]
    out.append(_NEWFALSE)  # requires_grad
    out += [_op_global("collections", "OrderedDict"), _EMPTY_TUPLE, _REDUCE]
    out += [_TUPLE, _REDUCE]
    return b"".join(out)


def write_pt(path: str, state_dict: Dict[str, np.ndarray], root: str = "archive") -> None:
    """Write ``{name: array}`` as a torch-zip ``.pt`` (flat tensor state
    dict — the layout ``torch.load(..., weights_only=True)`` accepts and
    weights._load_pt_no_torch reads back)."""
    entries = []  # (storage_key, bytes)
    pkl = [_PROTO2, _EMPTY_DICT, _MARK]
    for i, (name, arr) in enumerate(state_dict.items()):
        # NB: ascontiguousarray promotes 0-d to 1-d; reshape restores it
        arr = np.ascontiguousarray(arr).reshape(np.shape(arr))
        if arr.dtype not in _DTYPE_STORAGE:
            arr = arr.astype(np.float32)
        key = str(i)
        pkl.append(_op_str(name))
        pkl.append(_pickle_tensor(key, arr))
        entries.append((key, arr.tobytes()))
    pkl += [_SETITEMS, _STOP]

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{root}/data.pkl", b"".join(pkl))
        for key, raw in entries:
            zf.writestr(f"{root}/data/{key}", raw)
        zf.writestr(f"{root}/version", b"3\n")
        zf.writestr(f"{root}/byteorder", b"little")


def export_ultralytics_pt(
    model, params: dict, path: str, anchors: Optional[Sequence] = None
) -> Dict[str, np.ndarray]:
    """Export a (training-layout or plain-fused) param tree as an
    ultralytics-layout ``.pt``. Returns the state dict written."""
    sd = state_dict_from_params(model, params, anchors=anchors)
    write_pt(path, sd)
    return sd
