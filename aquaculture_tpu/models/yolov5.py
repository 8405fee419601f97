"""YOLOv5 detector family (n/s/m/l/x + the P6 models n6..x6) in pure
functional JAX.

From-scratch implementation of the public YOLOv5 v6 architecture (PAPERS.md,
arXiv 2407.20892): CSPDarknet backbone (6x6/s2 stem, C3 blocks, SPPF),
PANet feature pyramid neck, anchor-based Detect head at strides 8/16/32 —
or, for the *6 variants, an extra 768->1024 backbone stage, a 4-level
PANet, and a stride-64 Detect level (public yolov5-p6 yaml). The reference
pipeline trains/infers YOLOv5m at 640 px (reference: README.md:52,77); the
vendored submodule is empty, so this is a ground-up build, not a port.

TPU-first design choices:
* NHWC layout, bf16 activations, f32 conv accumulation (MXU native)
* static shapes end to end: decode emits a fixed (B, sum_l (S/s_l)^2*na,
  5+nc) tensor — 25,200 rows for a P5 model at 640 px
* BN folded into convs for the inference path (``fuse``)
* no Python control flow on traced values — the layer graph is static
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aquaculture_tpu.models import layers as L

# depth_multiple, width_multiple per variant (public YOLOv5 scaling table).
# The "*6" names are the P6 family (1280px-native, extra stride-64 level) —
# same scaling pair as their base letter, different topology.
VARIANTS: Dict[str, Tuple[float, float]] = {
    "n": (0.33, 0.25),
    "s": (0.33, 0.50),
    "m": (0.67, 0.75),
    "l": (1.00, 1.00),
    "x": (1.33, 1.25),
    "n6": (0.33, 0.25),
    "s6": (0.33, 0.50),
    "m6": (0.67, 0.75),
    "l6": (1.00, 1.00),
    "x6": (1.33, 1.25),
    # mt: TPU-lane-aligned m-class variant — m's depths, channel map from
    # CHANNEL_OVERRIDES below (width multiple unused). See BENCHMARKS.md.
    "mt": (0.67, 0.75),
}

# Explicit channel maps for TPU-lane-aligned variants. A listed variant
# takes its c1..c5 (c6) widths from here instead of the width multiple;
# depth still comes from VARIANTS. Found by scripts/lane_search.py against
# the tile-aware roofline (scripts/roofline.py): channel counts chosen so
# the implicit-GEMM K/N dims land on the 128-lane MXU tile instead of
# padding (BENCHMARKS.md "lane-aligned variant"). No reference analogue:
# the reference's variants are the public GPU-tuned table only.
CHANNEL_OVERRIDES: Dict[str, Dict[str, int]] = {
    # Searched over the m@640 serving roofline (useful FLOPs >= m,
    # minimize tile-padded bound time): early HBM-bound stages shrink
    # (alignment is irrelevant when bandwidth-bound), MXU-bound mid/late
    # stages land exactly on the lane tile (256 = 2x128 with 128-wide C3
    # hidden halves; 1024 = 8x128, hidden 512). Measured on v5e:
    # 1,939.5 tiles/s vs 1,845 same-session m (+5.1%), 47.3% MFU, with
    # useful FLOPs 48.8 vs 47.9 GF/img and 25.0M vs 20.9M params.
    "mt": {"c1": 32, "c2": 64, "c3": 256, "c4": 256, "c5": 1024},
}

# Default COCO anchors per stride level (w, h) in pixels.
DEFAULT_ANCHORS = (
    ((10.0, 13.0), (16.0, 30.0), (33.0, 23.0)),      # P3/8
    ((30.0, 61.0), (62.0, 45.0), (59.0, 119.0)),     # P4/16
    ((116.0, 90.0), (156.0, 198.0), (373.0, 326.0)),  # P5/32
)
STRIDES = (8, 16, 32)

# P6 family (public yolov5-p6 anchor table, pixels at 1280px)
DEFAULT_ANCHORS_P6 = (
    ((19.0, 27.0), (44.0, 40.0), (38.0, 94.0)),          # P3/8
    ((96.0, 68.0), (86.0, 152.0), (180.0, 137.0)),       # P4/16
    ((140.0, 301.0), (303.0, 264.0), (238.0, 542.0)),    # P5/32
    ((436.0, 615.0), (739.0, 380.0), (925.0, 792.0)),    # P6/64
)
STRIDES_P6 = (8, 16, 32, 64)


def _make_divisible(c: float, divisor: int = 8) -> int:
    return max(int(np.ceil(c / divisor) * divisor), divisor)


def _width(c: int, wm: float) -> int:
    return _make_divisible(c * wm) if c != 3 else 3


def _depth(n: int, dm: float) -> int:
    return max(int(round(n * dm)), 1)


@dataclasses.dataclass(frozen=True)
class YoloV5:
    """Static architecture description + functional apply methods.

    anchors=None resolves to the family default (DEFAULT_ANCHORS /
    DEFAULT_ANCHORS_P6); pass an explicit table (e.g. from a checkpoint)
    to override. Use ``anchor_table`` / ``strides`` everywhere downstream.
    """

    variant: str = "m"
    num_classes: int = 5
    anchors: Sequence = None

    @property
    def is_p6(self) -> bool:
        return self.variant.endswith("6")

    @property
    def strides(self) -> Tuple[int, ...]:
        return STRIDES_P6 if self.is_p6 else STRIDES

    @property
    def anchor_table(self) -> Sequence:
        if self.anchors is not None:
            return self.anchors
        return DEFAULT_ANCHORS_P6 if self.is_p6 else DEFAULT_ANCHORS

    @property
    def depth_multiple(self):
        return VARIANTS[self.variant][0]

    @property
    def width_multiple(self):
        return VARIANTS[self.variant][1]

    @property
    def na(self) -> int:
        return len(self.anchor_table[0])

    @property
    def no(self) -> int:
        return self.num_classes + 5

    def channels(self) -> Dict[str, int]:
        w = self.width_multiple
        ch = {
            "c1": _width(64, w),
            "c2": _width(128, w),
            "c3": _width(256, w),
            "c4": _width(512, w),
            "c5": _width(1024, w),
        }
        if self.is_p6:
            # P6 backbone: ... 512 -> 768 -> 1024 (public yolov5-p6 yaml)
            ch["c5"] = _width(768, w)
            ch["c6"] = _width(1024, w)
        ch.update(CHANNEL_OVERRIDES.get(self.variant, {}))
        return ch

    def depths(self) -> Dict[str, int]:
        d = self.depth_multiple
        return {"n3": _depth(3, d), "n6": _depth(6, d), "n9": _depth(9, d)}

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------

    @staticmethod
    def _init_backbone_prefix(rng, ch, dp) -> dict:
        """b0..b8 — the CSPDarknet prefix both families share (the P6
        family's c5 is 768-wide, but the expressions are identical)."""
        return {
            "b0": L.conv_init(rng, 3, ch["c1"], 6),
            "b1": L.conv_init(rng, ch["c1"], ch["c2"], 3),
            "b2": L.c3_init(rng, ch["c2"], ch["c2"], dp["n3"]),
            "b3": L.conv_init(rng, ch["c2"], ch["c3"], 3),
            "b4": L.c3_init(rng, ch["c3"], ch["c3"], dp["n6"]),
            "b5": L.conv_init(rng, ch["c3"], ch["c4"], 3),
            "b6": L.c3_init(rng, ch["c4"], ch["c4"], dp["n9"]),
            "b7": L.conv_init(rng, ch["c4"], ch["c5"], 3),
            "b8": L.c3_init(rng, ch["c5"], ch["c5"], dp["n3"]),
        }

    def init(self, seed: int = 0) -> dict:
        if self.is_p6:
            return self._init_p6(seed)
        ch = self.channels()
        dp = self.depths()
        rng = np.random.default_rng(seed)
        params = {
            **self._init_backbone_prefix(rng, ch, dp),
            "b9": L.sppf_init(rng, ch["c5"], ch["c5"]),
            # neck (PANet)
            "n10": L.conv_init(rng, ch["c5"], ch["c4"], 1),
            "n13": L.c3_init(rng, 2 * ch["c4"], ch["c4"], dp["n3"]),
            "n14": L.conv_init(rng, ch["c4"], ch["c3"], 1),
            "n17": L.c3_init(rng, 2 * ch["c3"], ch["c3"], dp["n3"]),
            "n18": L.conv_init(rng, ch["c3"], ch["c3"], 3),
            "n20": L.c3_init(rng, 2 * ch["c3"], ch["c4"], dp["n3"]),
            "n21": L.conv_init(rng, ch["c4"], ch["c4"], 3),
            "n23": L.c3_init(rng, 2 * ch["c4"], ch["c5"], dp["n3"]),
            # detect head: one 1x1 conv (with bias) per level
            "head": [
                _detect_conv_init(rng, c, self.na * self.no)
                for c in (ch["c3"], ch["c4"], ch["c5"])
            ],
        }
        return params

    def _init_p6(self, seed: int = 0) -> dict:
        """P6 topology (public yolov5-p6 yaml): one more backbone stage
        (768 -> 1024) and a 4-level PANet with a stride-64 Detect level."""
        ch = self.channels()
        dp = self.depths()
        rng = np.random.default_rng(seed)
        return {
            # backbone (layer indices 0..11 in the ultralytics yaml)
            **self._init_backbone_prefix(rng, ch, dp),
            "b9": L.conv_init(rng, ch["c5"], ch["c6"], 3),
            "b10": L.c3_init(rng, ch["c6"], ch["c6"], dp["n3"]),
            "b11": L.sppf_init(rng, ch["c6"], ch["c6"]),
            # neck (12..32)
            "n12": L.conv_init(rng, ch["c6"], ch["c5"], 1),
            "n15": L.c3_init(rng, 2 * ch["c5"], ch["c5"], dp["n3"]),
            "n16": L.conv_init(rng, ch["c5"], ch["c4"], 1),
            "n19": L.c3_init(rng, 2 * ch["c4"], ch["c4"], dp["n3"]),
            "n20": L.conv_init(rng, ch["c4"], ch["c3"], 1),
            "n23": L.c3_init(rng, 2 * ch["c3"], ch["c3"], dp["n3"]),
            "n24": L.conv_init(rng, ch["c3"], ch["c3"], 3),
            "n26": L.c3_init(rng, 2 * ch["c3"], ch["c4"], dp["n3"]),
            "n27": L.conv_init(rng, ch["c4"], ch["c4"], 3),
            "n29": L.c3_init(rng, 2 * ch["c4"], ch["c5"], dp["n3"]),
            "n30": L.conv_init(rng, ch["c5"], ch["c5"], 3),
            "n32": L.c3_init(rng, 2 * ch["c5"], ch["c6"], dp["n3"]),
            "head": [
                _detect_conv_init(rng, c, self.na * self.no)
                for c in (ch["c3"], ch["c4"], ch["c5"], ch["c6"])
            ],
        }

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def features(self, params: dict, x: jnp.ndarray, training: bool = False):
        """Backbone+neck forward -> per-level raw head outputs.

        Args:
            params: parameter tree from ``init`` (optionally fused)
            x: (B, H, W, 3) image batch, values in [0, 1]
        Returns:
            (feats, new_params): feats is a list of (B, H/s, W/s, na*no)
            raw tensors, one per stride level (``self.strides`` — three
            for P5 models, four for the *6 family).
        """
        np_ = dict(params)

        def cb(name, t, stride=1, padding=None):
            y, np_[name] = L.conv_block(t, params[name], stride, padding, training)
            return y

        def c3b(name, t, shortcut=True):
            y, np_[name] = L.c3(t, params[name], shortcut, training)
            return y

        def down(name, t):
            # Stride-2 downsample conv. After fuse(down_s2d=...) the stored
            # kernel is k2 — a shape no native YOLOv5 conv has — and the
            # layer runs as space-to-depth + k2/s1 with (1, 0) padding
            # (exactly equivalent; layers.down_weights_to_s2d).
            w = params[name].get("w", params[name].get("wq"))
            if w is not None and w.shape[0] == 2:
                return cb(name, L.qs2d(t), 1, [(1, 0), (1, 0)])
            return cb(name, t, 2)

        # Backbone. The stem runs either as the native k6/s2 conv on C=3
        # (training / unfused) or, after fuse(stem_s2d=True), as
        # space-to-depth + an exactly equivalent k3/s1 conv on 12 channels
        # (MXU-friendly lanes; see layers.stem_weights_to_s2d).
        w0 = params["b0"].get("w", params["b0"].get("wq"))
        if w0 is not None and w0.shape[0] == 3 and w0.shape[2] == 4 * x.shape[-1]:
            y = cb("b0", L.space_to_depth2(x), 1, [(1, 1), (1, 1)])
        else:
            y = cb("b0", x, 2, [(2, 2), (2, 2)])
        y = down("b1", y)
        y = c3b("b2", y)
        y = down("b3", y)
        p3 = c3b("b4", y)            # stride 8
        y = down("b5", p3)
        p4 = c3b("b6", y)            # stride 16
        y = down("b7", p4)

        if self.is_p6:
            p5 = c3b("b8", y)        # stride 32
            y = down("b9", p5)
            y = c3b("b10", y)
            y, np_["b11"] = L.sppf(y, params["b11"], training=training)  # stride 64
            # 4-level PANet
            t12 = cb("n12", y)
            y = L.qcat([L.qup2(t12), p5], axis=-1)
            y = c3b("n15", y, shortcut=False)
            t16 = cb("n16", y)
            y = L.qcat([L.qup2(t16), p4], axis=-1)
            y = c3b("n19", y, shortcut=False)
            t20 = cb("n20", y)
            y = L.qcat([L.qup2(t20), p3], axis=-1)
            o3 = c3b("n23", y, shortcut=False)                 # P3 out
            y = down("n24", o3)
            y = L.qcat([y, t20], axis=-1)
            o4 = c3b("n26", y, shortcut=False)                 # P4 out
            y = down("n27", o4)
            y = L.qcat([y, t16], axis=-1)
            o5 = c3b("n29", y, shortcut=False)                 # P5 out
            y = down("n30", o5)
            y = L.qcat([y, t12], axis=-1)
            o6 = c3b("n32", y, shortcut=False)                 # P6 out
            outs = (o3, o4, o5, o6)
        else:
            y = c3b("b8", y)
            y, np_["b9"] = L.sppf(y, params["b9"], training=training)  # stride 32

            # Neck (qcat/qup2 are QTensor-aware passthroughs of
            # concat/upsample: the int8 serving pipeline keeps activations
            # quantized through the whole backbone+neck; float paths are
            # unchanged)
            t10 = cb("n10", y)
            u = L.qup2(t10)
            y = L.qcat([u, p4], axis=-1)
            y = c3b("n13", y, shortcut=False)
            t14 = cb("n14", y)
            u = L.qup2(t14)
            y = L.qcat([u, p3], axis=-1)
            o3 = c3b("n17", y, shortcut=False)                 # P3 out
            y = down("n18", o3)
            y = L.qcat([y, t14], axis=-1)
            o4 = c3b("n20", y, shortcut=False)                 # P4 out
            y = down("n21", o4)
            y = L.qcat([y, t10], axis=-1)
            o5 = c3b("n23", y, shortcut=False)                 # P5 out
            outs = (o3, o4, o5)

        feats = []
        new_head = []
        for o, hp in zip(outs, params["head"]):
            o = L.deq(o)  # head stays floating point (feeds the box decode)
            f = L.conv2d(o, hp["w"].astype(o.dtype)).astype(o.dtype) + hp["b"].astype(o.dtype)
            feats.append(f)
            new_head.append(hp)
        np_["head"] = new_head
        return feats, np_

    def decode(self, feats: List[jnp.ndarray]) -> jnp.ndarray:
        """Decode raw head outputs to (B, N, 5+nc) predictions.

        Box decode (public YOLOv5 inference transform):
            xy = (2*sigmoid(t_xy) - 0.5 + grid) * stride
            wh = (2*sigmoid(t_wh))**2 * anchor
        obj/cls are sigmoided. Output order: [cx, cy, w, h, obj, cls...]
        in input-image pixel coordinates. Fixed shape: N = sum(HW * na).
        """
        outs = []
        for f, anchors, stride in zip(feats, self.anchor_table, self.strides):
            b, h, w, _ = f.shape
            f = f.reshape(b, h, w, self.na, self.no).astype(jnp.float32)
            p = jax.nn.sigmoid(f)
            gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
            gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
            grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]  # (1,h,w,1,2)
            anc = jnp.asarray(anchors, jnp.float32)[None, None, None, :, :]  # (1,1,1,na,2)
            xy = (p[..., 0:2] * 2.0 - 0.5 + grid) * float(stride)
            wh = jnp.square(p[..., 2:4] * 2.0) * anc
            out = jnp.concatenate([xy, wh, p[..., 4:]], axis=-1)
            outs.append(out.reshape(b, h * w * self.na, self.no))
        return jnp.concatenate(outs, axis=1)

    def apply(self, params: dict, x: jnp.ndarray, training: bool = False):
        """Full forward: images -> decoded predictions.

        Returns (preds, new_params); in eval mode new_params == params.
        """
        feats, np_ = self.features(params, x, training)
        return self.decode(feats), np_

    def fuse(self, params: dict, stem_s2d: bool = True,
             down_s2d: Sequence[str] = ()) -> dict:
        """Fold all BN layers into conv weights for inference.

        stem_s2d reparametrizes the k6/s2 stem into space-to-depth(2) +
        an EXACTLY equivalent k3/s1 conv over 12 channels: the original
        stem convolves a C=3 input, the worst-tiled layer on the TPU
        (lane padding 3 -> 128); the s2d form feeds the MXU 12 channels
        at 1/4 the spatial size. features() dispatches on the stored
        kernel shape. Same trick as ultralytics' old Focus layer, applied
        as an inference-time weight transform.

        down_s2d names stride-2 downsample convs (e.g. ("b1", "b3")) to
        rewrite the same way: k3/s2/p1 -> space-to-depth + k2/s1/(1,0)
        (layers.down_weights_to_s2d, exact). The early downsamples have
        channel counts far below the 128-lane MXU tile; s2d quadruples
        their contraction depth at identical FLOPs."""
        fused = {}
        for name, p in params.items():
            if name == "head":
                fused[name] = p
            else:
                fused[name] = L.tree_map_fuse(p)
        if stem_s2d and "w" in fused["b0"] and fused["b0"]["w"].shape[0] == 6:
            fused["b0"] = {**fused["b0"], "w": L.stem_weights_to_s2d(fused["b0"]["w"])}
        eligible = (
            {"b1", "b3", "b5", "b7", "b9", "n24", "n27", "n30"}
            if self.is_p6
            else {"b1", "b3", "b5", "b7", "n18", "n21"}
        )
        for name in down_s2d:
            # Fail loudly on a name that can't be rewritten: a typo, a
            # P5 neck name passed to a P6 model, or a quantized tree
            # would otherwise make down_s2d a silent no-op and mislabel
            # any A/B measurement built on it.
            if name not in eligible:
                raise ValueError(
                    f"down_s2d: {name!r} is not a stride-2 downsample conv of "
                    f"this {'P6' if self.is_p6 else 'P5'} model; eligible: "
                    f"{sorted(eligible)}"
                )
            p = fused[name]
            if "w" not in p or p["w"].shape[0] != 3:
                raise ValueError(
                    f"down_s2d: layer {name!r} has no float k3 kernel "
                    f"(keys={sorted(p)}); quantized/already-rewritten trees are ineligible"
                )
            fused[name] = {**p, "w": L.down_weights_to_s2d(p["w"])}
        return fused

    def num_params(self, params: dict) -> int:
        return sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params))


def _detect_conv_init(rng: np.random.Generator, cin: int, cout: int) -> dict:
    w = L._he_init(rng, (1, 1, cin, cout), cin)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def init_detect_biases(model: YoloV5, params: dict, img_size: int = 640, cls_prior: float = 0.01) -> dict:
    """Ultralytics-style detect bias initialization for stable early training:
    obj bias ~ log(8 / (640/stride)^2), cls bias ~ log(prior / (nc - 1))."""
    new_head = []
    for hp, stride in zip(params["head"], model.strides):
        b = np.array(hp["b"]).reshape(model.na, model.no)
        b[:, 4] += np.log(8.0 / (img_size / stride) ** 2)
        b[:, 5:] += np.log(cls_prior / max(model.num_classes - 1, 1))
        new_head.append({"w": hp["w"], "b": jnp.asarray(b.reshape(-1), jnp.float32)})
    return {**params, "head": new_head}


def yolov5_init(variant: str = "m", num_classes: int = 5, seed: int = 0):
    """Convenience constructor -> (model, params)."""
    model = YoloV5(variant=variant, num_classes=num_classes)
    params = model.init(seed)
    params = init_detect_biases(model, params)
    return model, params
