"""Ahead-of-time serving artifacts: the jitted detection program as a file.

The reference deploys by shipping Python + torch + the ultralytics tree and
re-importing all of it on every serving host. A TPU-native framework can do
better: `jax.export` lowers the FULL serving program (resize + forward +
decode + NMS + pixel-space mapping — exactly `pipeline.make_infer_fn`'s
computation) to versioned StableHLO once, and the resulting artifact is a
single file that any later process can load and call WITHOUT the model
code, the tracer, or the Python-side config that built it. Weights stay
runtime arguments, so one artifact serves every checkpoint of its variant.

What the artifact does and does not buy:

* DOES: removes trace+lower from cold start, freezes the serving math
  against library drift (StableHLO is forward-compatible), and makes the
  deployable unit (program file + checkpoint dir) auditable and shippable
  without the framework installed.
* DOES NOT: skip backend (XLA) compilation — that is the persistent
  compilation cache's job (`warmup()` below seeds it, and the cache dir
  can be rsync'd to a fleet alongside the artifact).

Params travel as FLATTENED LEAVES: the artifact's entry point takes
``(leaves, images)`` and rebuilds the tree from the treedef captured at
export time. This sidesteps custom-pytree serialization entirely (the
int8 pipeline's QTensor scales and any future container serialize for
free) at the cost of a leaf-structure fingerprint check at load time.

File format: ``AQX1`` magic + u32 JSON-header length + JSON metadata +
the raw `jax.export` blob. One file, no directory layout.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
from typing import Any, Callable, Optional, Tuple

_MAGIC = b"AQX1"


def _path_key(entry) -> str:
    # DictKey has .key, GetAttrKey has .name, SequenceKey has .idx; str() of
    # the raw entry is the fallback for exotic containers.
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def _leaf_fingerprint(params) -> dict:
    """Structure fingerprint used to validate checkpoints against artifacts.

    Hashes our own (path, shape, dtype) encoding rather than str(treedef):
    PyTreeDef repr is not a stable serialization contract across jax
    versions, and a repr change must not invalidate every artifact."""
    import jax

    paths_leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    spec = [
        ("/".join(_path_key(k) for k in path), list(a.shape), str(a.dtype))
        for path, a in paths_leaves
    ]
    h = hashlib.sha256(json.dumps(spec).encode()).hexdigest()[:16]
    return {"n_leaves": len(spec), "spec_sha": h}


def export_serving(
    model,
    params,
    cfg=None,
    batch_size: int = 32,
    tile: Optional[int] = None,
    platforms: Optional[Tuple[str, ...]] = None,
) -> Tuple[bytes, dict]:
    """Export the serving program for (model, cfg) to a StableHLO blob.

    The exported computation is bit-identical to what `detect_files` jits
    (it is built by the same `pipeline.make_infer_fn`, forced to the
    single-device form — AOT artifacts target one chip per process, the
    pod runner's deployment shape). Returns ``(blob, meta)``.

    ``params`` supplies only shapes/dtypes/tree structure; the weights
    themselves are NOT baked into the artifact. The model's ANCHOR TABLE
    is a baked compile-time constant — it is recorded in meta and
    re-checked at serve time (serving_fn), because a checkpoint trained
    with different anchors would otherwise silently decode garbage.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from aquaculture_tpu.config import IM_WIDTH, DetectConfig
    from aquaculture_tpu.pipeline import make_infer_fn

    cfg = cfg or DetectConfig()
    tile = tile or IM_WIDTH
    plats = tuple(platforms) if platforms else (jax.default_backend(),)
    # the tunneled single-chip backend registers as "axon" but lowers as tpu
    plats = tuple("tpu" if p == "axon" else p for p in plats)
    # The NMS backend is a trace-time choice: resolve it for the TARGET
    # platform(s), never this build host's devices. A multi-platform
    # artifact must take the portable XLA path (the Pallas kernel only
    # lowers for TPU).
    if cfg.nms_backend == "auto":
        want = (
            f"auto:{plats[0]}"
            if len(plats) == 1
            else ("auto:tpu" if all(p in ("tpu", "axon") for p in plats) else "xla")
        )
        cfg = dataclasses.replace(cfg, nms_backend=want)
    # batch_size=1 disables the local-device batch sharding inside
    # make_infer_fn (gcd(1, n_dev) == 1): the artifact must not embed this
    # build host's device mesh.
    infer = make_infer_fn(model, params, cfg, tile=tile, batch_size=1)

    leaves, treedef = jax.tree_util.tree_flatten(params)

    def infer_flat(leaves, images_u8):
        p = jax.tree_util.tree_unflatten(treedef, leaves)
        return infer(p, images_u8)

    leaf_specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in leaves]
    img_spec = jax.ShapeDtypeStruct((batch_size, tile, tile, 3), jnp.uint8)
    exported = jax.export.export(jax.jit(infer_flat), platforms=list(plats))(
        leaf_specs, img_spec
    )
    meta = {
        "kind": "aquaculture_tpu.serving",
        "variant": getattr(model, "variant", None),
        "num_classes": getattr(model, "num_classes", None),
        "batch_size": batch_size,
        "tile": tile,
        "img_size": cfg.img_size,
        "conf_threshold": cfg.conf_threshold,
        "iou_threshold": cfg.iou_threshold,
        "max_detections": cfg.max_detections,
        "multi_label": cfg.multi_label,
        "augment": cfg.augment,
        # the pass geometry is baked into the exported program; record it
        # so the artifact stays auditable (and reconstructable) when a
        # non-default TTA ensemble was exported
        "tta_scales": list(cfg.tta_scales),
        "tta_flips": list(cfg.tta_flips),
        "nms_backend": cfg.nms_backend,
        "anchors": [
            [[float(w), float(h)] for (w, h) in level]
            for level in getattr(model, "anchor_table", ())
        ],
        "quantized": any(str(a.dtype) == "int8" for a in leaves),
        "platforms": list(plats),
        "jax_version": jax.__version__,
        "params": _leaf_fingerprint(params),
    }
    return exported.serialize(), meta


def save_aot(path: str, blob: bytes, meta: dict) -> None:
    """Write a single-file artifact: AQX1 | len(json) | json | blob."""
    head = json.dumps(meta, sort_keys=True).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(head)))
        f.write(head)
        f.write(blob)
    os.replace(tmp, path)


def _read_header(f, path: str) -> dict:
    if f.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an aquaculture_tpu AOT artifact")
    raw = f.read(4)
    if len(raw) != 4:
        raise ValueError(f"{path}: truncated AOT artifact header")
    (n,) = struct.unpack("<I", raw)
    head = f.read(n)
    if len(head) != n:
        raise ValueError(f"{path}: truncated AOT artifact header")
    try:
        return json.loads(head)
    except ValueError:
        raise ValueError(f"{path}: corrupt AOT artifact metadata") from None


def read_meta(path: str) -> dict:
    with open(path, "rb") as f:
        return _read_header(f, path)


def load_aot(path: str):
    """Load an artifact -> (jax.export.Exported, meta)."""
    import jax

    with open(path, "rb") as f:
        meta = _read_header(f, path)
        blob = f.read()
    return jax.export.deserialize(bytearray(blob)), meta


def serving_fn_loaded(
    exported, meta: dict, params, anchors=None, label: str = "artifact"
) -> Callable[[Any, Any], Any]:
    """Already-loaded artifact + checkpoint -> an `infer_fn`.

    Validates the checkpoint's leaf structure against the fingerprint the
    artifact was exported with — and, when ``anchors`` (the serving
    model's anchor table) is given, that it matches the table BAKED into
    the exported decode: anchors are compile-time constants, and a
    checkpoint whose training evolved different anchors would silently
    decode every box wrong. Returns ``fn(params, images_u8)`` (params are
    re-flattened per call, so callers can pass updated weights of the
    same structure).
    """
    import jax
    import numpy as np

    want, got = meta["params"], _leaf_fingerprint(params)
    if want != got:
        raise ValueError(
            f"{label}: checkpoint tree does not match the artifact "
            f"(artifact {want}, checkpoint {got}); re-export or load the "
            f"matching variant/precision"
        )
    baked = meta.get("anchors")
    if anchors is not None and baked:
        ours = [[[float(w), float(h)] for (w, h) in lvl] for lvl in anchors]
        if len(ours) != len(baked) or not all(
            np.shape(a) == np.shape(b) and np.allclose(a, b)
            for a, b in zip(ours, baked)
        ):
            raise ValueError(
                f"{label}: anchor table mismatch — the artifact bakes "
                f"{baked} but the checkpoint's model uses {ours}; "
                f"re-export the artifact from this checkpoint"
            )
    call = jax.jit(exported.call)

    def fn(p, images_u8):
        return call(jax.tree_util.tree_leaves(p), images_u8)

    return fn


def serving_fn(path: str, params, anchors=None) -> Tuple[Callable[[Any, Any], Any], dict]:
    """Artifact file + checkpoint -> (`infer_fn` for `detect_files`, meta)."""
    exported, meta = load_aot(path)
    return serving_fn_loaded(exported, meta, params, anchors=anchors, label=path), meta


def warmup(path: str, params, anchors=None) -> float:
    """Compile the artifact's program on this host's backend (seeding the
    persistent compilation cache if one is configured). Returns seconds."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    fn, meta = serving_fn(path, params, anchors=anchors)
    b, t = meta["batch_size"], meta["tile"]
    x = jnp.asarray(np.zeros((b, t, t, 3), np.uint8))
    t0 = time.perf_counter()
    det, valid = fn(params, x)
    jax.block_until_ready(det)
    return time.perf_counter() - t0
