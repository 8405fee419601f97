"""Ultralytics ``.pt`` checkpoint -> JAX parameter-tree porting.

Lets the bundled reference weights (``multilabel_farms_exp2.pt``,
reference README.md:60,77) drive this detector for output parity. The
mapping is by layer INDEX in the ultralytics sequential model definition,
which is fixed for the public v6 architecture:

    model.0..9    backbone (Conv, Conv, C3, Conv, C3, Conv, C3, Conv, C3, SPPF)
    model.10..23  PANet neck
    model.24      Detect (m.0/m.1/m.2 1x1 convs)

P6 models (n6..x6) use the yolov5-p6 numbering instead: backbone
model.0..11 (extra 768->1024 Conv+C3 before SPPF), 4-level neck
model.12..32, Detect at model.33 with four m.* convs (_LAYER_INDEX_P6).

Torch tensors are OIHW; we store HWIO. BatchNorm maps 1:1
(weight->scale, bias->bias, running_mean->mean, running_var->var).
"""

from __future__ import annotations

import io
import os
import pickle
import zipfile
from typing import Dict

import jax.numpy as jnp
import numpy as np

# our-name -> ultralytics model index
_LAYER_INDEX = {
    "b0": 0, "b1": 1, "b2": 2, "b3": 3, "b4": 4, "b5": 5, "b6": 6,
    "b7": 7, "b8": 8, "b9": 9,
    "n10": 10, "n13": 13, "n14": 14, "n17": 17, "n18": 18, "n20": 20,
    "n21": 21, "n23": 23,
}
_DETECT_INDEX = 24

# P6 family (public yolov5-p6 yaml layer numbering)
_LAYER_INDEX_P6 = {
    "b0": 0, "b1": 1, "b2": 2, "b3": 3, "b4": 4, "b5": 5, "b6": 6,
    "b7": 7, "b8": 8, "b9": 9, "b10": 10, "b11": 11,
    "n12": 12, "n15": 15, "n16": 16, "n19": 19, "n20": 20, "n23": 23,
    "n24": 24, "n26": 26, "n27": 27, "n29": 29, "n30": 30, "n32": 32,
}
_DETECT_INDEX_P6 = 33


def family_layout(model) -> tuple:
    """(layer_index, detect_index, sppf_name) for a model's family — the
    single source of the ultralytics layer numbering, shared by import
    (params_from_state_dict) and export (models/export.py) so the two
    directions can never disagree."""
    if getattr(model, "is_p6", False):
        return _LAYER_INDEX_P6, _DETECT_INDEX_P6, "b11"
    return _LAYER_INDEX, _DETECT_INDEX, "b9"


def _conv_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    w = sd[f"{prefix}.conv.weight"]
    out = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if f"{prefix}.bn.weight" in sd:
        out["bn"] = {
            "scale": jnp.asarray(sd[f"{prefix}.bn.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bn.bias"]),
            "mean": jnp.asarray(sd[f"{prefix}.bn.running_mean"]),
            "var": jnp.asarray(sd[f"{prefix}.bn.running_var"]),
        }
    elif f"{prefix}.conv.bias" in sd:
        # Fused checkpoint: conv carries the folded bias.
        out["b"] = jnp.asarray(sd[f"{prefix}.conv.bias"])
    return out


def _c3_from_torch(sd: Dict[str, np.ndarray], prefix: str, n: int) -> dict:
    return {
        "cv1": _conv_from_torch(sd, f"{prefix}.cv1"),
        "cv2": _conv_from_torch(sd, f"{prefix}.cv2"),
        "cv3": _conv_from_torch(sd, f"{prefix}.cv3"),
        "m": [
            {
                "cv1": _conv_from_torch(sd, f"{prefix}.m.{i}.cv1"),
                "cv2": _conv_from_torch(sd, f"{prefix}.m.{i}.cv2"),
            }
            for i in range(n)
        ],
    }


def params_from_state_dict(model, state_dict: Dict[str, np.ndarray]) -> dict:
    """Build this framework's param tree from an ultralytics state dict.

    Args:
        model: a :class:`aquaculture_tpu.models.yolov5.YoloV5`
        state_dict: name -> numpy array, with keys like
            ``model.4.cv1.conv.weight`` (a ``model.model.`` prefix is
            stripped automatically).
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("model.model.", "model.")
        sd[k] = np.asarray(v, dtype=np.float32)

    dp = model.depths()
    layer_index, detect_index, sppf_name = family_layout(model)
    if getattr(model, "is_p6", False):
        c3_depths = {
            "b2": dp["n3"], "b4": dp["n6"], "b6": dp["n9"], "b8": dp["n3"],
            "b10": dp["n3"], "n15": dp["n3"], "n19": dp["n3"], "n23": dp["n3"],
            "n26": dp["n3"], "n29": dp["n3"], "n32": dp["n3"],
        }
    else:
        c3_depths = {
            "b2": dp["n3"], "b4": dp["n6"], "b6": dp["n9"], "b8": dp["n3"],
            "n13": dp["n3"], "n17": dp["n3"], "n20": dp["n3"], "n23": dp["n3"],
        }

    params: dict = {}
    for name, idx in layer_index.items():
        prefix = f"model.{idx}"
        if name in c3_depths:
            params[name] = _c3_from_torch(sd, prefix, c3_depths[name])
        elif name == sppf_name:
            params[name] = {
                "cv1": _conv_from_torch(sd, f"{prefix}.cv1"),
                "cv2": _conv_from_torch(sd, f"{prefix}.cv2"),
            }
        else:
            params[name] = _conv_from_torch(sd, prefix)

    head = []
    for i in range(len(model.strides)):
        w = sd[f"model.{detect_index}.m.{i}.weight"]
        b = sd[f"model.{detect_index}.m.{i}.bias"]
        head.append({"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(b)})
    params["head"] = head
    return params


def anchors_from_state_dict(state_dict: Dict[str, np.ndarray]):
    """Extract the per-stride anchor table if present — (3, 3, 2) for
    P5 checkpoints, (4, 3, 2) for the P6 family."""
    for k in state_dict:
        if k.endswith("anchors"):
            a = np.asarray(state_dict[k], dtype=np.float32)
            if a.shape in ((3, 3, 2), (4, 3, 2)):
                # ultralytics stores anchors in grid units; scale by stride.
                strides = np.array([8.0, 16.0, 32.0, 64.0][: a.shape[0]])[:, None, None]
                return tuple(tuple(map(tuple, lvl)) for lvl in a * strides)
    return None


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pt`` checkpoint into a flat numpy state dict.

    Prefers the torch runtime when available (robust); falls back to a
    self-contained zip+pickle reader for plain tensor-only checkpoints so
    torch is not a hard runtime dependency.
    """
    try:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "state_dict"):
            sd = obj["model"].float().state_dict()
        elif isinstance(obj, dict) and all(hasattr(v, "numpy") for v in obj.values()):
            sd = obj
        elif hasattr(obj, "state_dict"):
            sd = obj.float().state_dict()
        else:
            sd = obj
        return {k: v.detach().cpu().float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    except ImportError:
        return _load_pt_no_torch(path)


class _Shadow:
    """Stand-in for any class the checkpoint pickles by reference
    (models.yolo.Model, torch.nn.* modules, ...): absorbs constructor args
    and state, exposing them as plain attributes for harvesting."""

    def __init__(self, *args, **kwargs):
        self._shadow_args = args

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_shadow_state"] = state


def _bf16_to_f32(raw: bytes) -> np.ndarray:
    u16 = np.frombuffer(raw, dtype=np.uint16).astype(np.uint32)
    return (u16 << 16).view(np.float32)


def _load_pt_no_torch(path: str) -> Dict[str, np.ndarray]:
    """Torch-free reader for real ultralytics ``.pt`` checkpoints.

    Handles BOTH layouts of the torch zip format:
    * tensor-only state dicts, and
    * object-pickled ``{'model': Model, 'ema': Model, ...}`` payloads (the
      format of ``multilabel_farms_exp2.pt``, reference README.md:77) —
      every class reference is swallowed by a shadow class and the
      ``nn.Module`` tree is walked via its pickled ``_parameters`` /
      ``_buffers`` / ``_modules`` dicts to reconstruct the state dict.
      Prefers the EMA weights when present (matching ultralytics
      ``attempt_load``).
    """
    dtype_map = {
        "FloatStorage": np.float32,
        "HalfStorage": np.float16,
        "DoubleStorage": np.float64,
        "LongStorage": np.int64,
        "IntStorage": np.int32,
        "ShortStorage": np.int16,
        "CharStorage": np.int8,
        "ByteStorage": np.uint8,
        "BoolStorage": np.bool_,
    }
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    pkl_name = next(n for n in names if n.endswith("data.pkl"))
    root = pkl_name[: -len("data.pkl")]

    def _storage_name(stype) -> str:
        return stype if isinstance(stype, str) else getattr(stype, "__name__", str(stype))

    def _rebuild(storage, offset, size, stride, *args):
        stype, key, _numel = storage
        sname = _storage_name(stype)
        raw = zf.read(f"{root}data/{key}")
        if sname == "BFloat16Storage":
            arr = _bf16_to_f32(raw)
        elif sname in dtype_map:
            arr = np.frombuffer(raw, dtype=dtype_map[sname])
        else:
            # Reinterpreting an unknown storage byte-wise as f32 would load
            # garbage silently; fail with the checkpoint's actual type.
            raise ValueError(f"unsupported torch storage type in checkpoint: {sname}")
        n = int(np.prod(size)) if size else 1
        if size and stride:
            flat = arr[offset:]
            return np.lib.stride_tricks.as_strided(
                flat, shape=size, strides=[s * arr.itemsize for s in stride]
            ).copy()
        return arr[offset : offset + n].copy().reshape(size or ())

    def _rebuild_parameter(data, requires_grad=True, hooks=None):
        return data

    _special = {
        "_rebuild_tensor_v2": _rebuild,
        "_rebuild_tensor": lambda storage, offset, size, stride: _rebuild(
            storage, offset, size, stride
        ),
        "_rebuild_parameter": _rebuild_parameter,
    }
    _shadow_cache: Dict[str, type] = {}

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if name in _special:
                return _special[name]
            if "Storage" in name:
                return name
            if module in ("collections", "builtins", "copyreg", "__builtin__"):
                return super().find_class(module, name)
            if module.startswith(("numpy", "numpy.core")):
                return super().find_class(module, name)
            # torch.nn.*, models.yolo.Model, anything else: shadow it
            full = f"{module}.{name}"
            cls = _shadow_cache.get(full)
            if cls is None:
                cls = type(name, (_Shadow,), {"_shadow_origin": full})
                _shadow_cache[full] = cls
            return cls

        def persistent_load(self, pid):
            # ('storage', storage_type, key, location, numel)
            _, stype, key, _, numel = pid
            return (stype, key, numel)

    with zf.open(pkl_name) as f:
        obj = _Unpickler(io.BytesIO(f.read())).load()

    # Flat state dict (possibly mixed with scalar metadata like 'epoch'):
    # keep the tensor entries, matching the torch-path reader's filtering.
    if isinstance(obj, dict):
        flat = {
            k: np.asarray(v, dtype=np.float32)
            for k, v in obj.items()
            if isinstance(v, np.ndarray)
        }
        if flat and not any(k in obj for k in ("ema", "model")):
            return flat

    def _harvest(module_obj, prefix: str, out: Dict[str, np.ndarray]) -> None:
        d = getattr(module_obj, "__dict__", None)
        if not isinstance(d, dict):
            return
        for src in ("_parameters", "_buffers"):
            entries = d.get(src)
            if isinstance(entries, dict):
                for name, t in entries.items():
                    if isinstance(t, np.ndarray):
                        out[prefix + name] = t
        subs = d.get("_modules")
        if isinstance(subs, dict):
            for name, sub in subs.items():
                if sub is not None:
                    _harvest(sub, f"{prefix}{name}.", out)

    candidates = []
    if isinstance(obj, dict):
        # ultralytics checkpoint: prefer EMA (attempt_load semantics)
        for key in ("ema", "model"):
            m = obj.get(key)
            if m is not None and not isinstance(m, (int, float, str, list)):
                candidates.append(m)
    elif isinstance(obj, _Shadow):
        candidates.append(obj)

    for m in candidates:
        sd: Dict[str, np.ndarray] = {}
        _harvest(m, "", sd)
        if sd:
            return {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    raise ValueError(
        f"no tensors found in {path!r}: unsupported checkpoint layout "
        "(install torch for the full-fidelity path)"
    )


def load_pretrained(model, path: str):
    """Load a .pt checkpoint into (params, anchors?) for this model."""
    sd = load_torch_checkpoint(path)
    params = params_from_state_dict(model, sd)
    anchors = anchors_from_state_dict(sd)
    return params, anchors
