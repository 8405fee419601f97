"""Full-model ``.pt`` export (attempt_load-compatible object graph).

VERDICT r4 #6: either produce a full-model pickle ultralytics
``attempt_load`` can rebuild, or prove it impossible. It is possible —
the pickle stream only needs GLOBAL references to the consumer's classes
(``models.yolo``/``models.common``/torch.nn) plus each module's instance
state; the classes resolve at LOAD time from the consumer's environment.

ultralytics itself is not installed in this image, so these tests load
the emitted file under REAL torch against a distilled stand-in of the
yolov5 v7 class set (the public architecture's forward semantics, the
same math aquaculture_tpu.models.yolov5 implements; reference
README.md:77 is the consuming command). Everything else — NEWOBJ/BUILD
module reconstruction, Parameter/buffer rebuilding, Conv2d/BatchNorm2d
internals, the routing attrs (f/i/save), fuse() compatibility — runs on
real torch classes. The rebuilt torch model's forward must match this
framework's decode numerically.
"""

from __future__ import annotations

import os
import sys
import textwrap

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from aquaculture_tpu.models.export import export_full_model_pt
from aquaculture_tpu.models.yolov5 import yolov5_init

_COMMON = textwrap.dedent(
    """
    # Distilled yolov5 v7 models/common.py forward semantics (public
    # architecture; test oracle only).
    import torch
    import torch.nn as nn

    class Conv(nn.Module):
        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

        def forward_fuse(self, x):
            return self.act(self.conv(x))

    class Bottleneck(nn.Module):
        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class C3(nn.Module):
        def forward(self, x):
            return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))

    class SPPF(nn.Module):
        def forward(self, x):
            x = self.cv1(x)
            y1 = self.m(x)
            y2 = self.m(y1)
            return self.cv2(torch.cat((x, y1, y2, self.m(y2)), 1))

    class Concat(nn.Module):
        def forward(self, x):
            return torch.cat(x, self.d)
    """
)

_YOLO = textwrap.dedent(
    """
    # Distilled yolov5 v7 models/yolo.py (Detect grid decode +
    # DetectionModel routed forward + fuse), test oracle only.
    import torch
    import torch.nn as nn
    from torch.nn.utils.fusion import fuse_conv_bn_eval

    from models.common import Conv

    class Detect(nn.Module):
        def _make_grid(self, nx, ny, i):
            t = self.anchors[i].dtype
            yv, xv = torch.meshgrid(
                torch.arange(ny, dtype=t), torch.arange(nx, dtype=t),
                indexing="ij")
            grid = (torch.stack((xv, yv), 2)
                    .expand(1, self.na, ny, nx, 2) - 0.5)
            anchor_grid = ((self.anchors[i] * self.stride[i])
                           .view(1, self.na, 1, 1, 2)
                           .expand(1, self.na, ny, nx, 2))
            return grid, anchor_grid

        def forward(self, x):
            z = []
            for i in range(self.nl):
                x[i] = self.m[i](x[i])
                bs, _, ny, nx = x[i].shape
                x[i] = (x[i].view(bs, self.na, self.no, ny, nx)
                        .permute(0, 1, 3, 4, 2).contiguous())
                if self.grid[i].shape[2:4] != x[i].shape[2:4]:
                    self.grid[i], self.anchor_grid[i] = self._make_grid(nx, ny, i)
                xy, wh, conf = x[i].sigmoid().split((2, 2, self.nc + 1), 4)
                xy = (xy * 2 + self.grid[i]) * self.stride[i]
                wh = (wh * 2) ** 2 * self.anchor_grid[i]
                z.append(torch.cat((xy, wh, conf), 4)
                         .view(bs, self.na * ny * nx, self.no))
            return (torch.cat(z, 1), x)

    class DetectionModel(nn.Module):
        def forward(self, x):
            y = []
            for m in self.model:
                if m.f != -1:
                    x = (y[m.f] if isinstance(m.f, int)
                         else [x if j == -1 else y[j] for j in m.f])
                x = m(x)
                y.append(x if m.i in self.save else None)
            return x

        def fuse(self):
            for m in self.modules():
                if isinstance(m, Conv) and hasattr(m, "bn"):
                    m.conv = fuse_conv_bn_eval(m.conv, m.bn)
                    delattr(m, "bn")
                    m.forward = m.forward_fuse
            return self

    Model = DetectionModel
    """
)


@pytest.fixture()
def standin_yolov5(tmp_path):
    pkg = tmp_path / "models"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "common.py").write_text(_COMMON)
    (pkg / "yolo.py").write_text(_YOLO)
    sys.path.insert(0, str(tmp_path))
    # a previously-imported `models` package would shadow the stand-in
    for k in [k for k in sys.modules if k == "models" or k.startswith("models.")]:
        del sys.modules[k]
    yield
    sys.path.remove(str(tmp_path))
    for k in [k for k in sys.modules if k == "models" or k.startswith("models.")]:
        del sys.modules[k]


def _per_level_views(model, preds_jax, z_torch, img):
    """Align our (pos, anchor)-flat decode with torch's (anchor, pos)
    flat ordering, per level."""
    views = []
    off_j = off_t = 0
    for s in model.strides:
        h = w = img // int(s)
        n = h * w * 3
        pj = np.asarray(preds_jax[0, off_j:off_j + n]).reshape(h, w, 3, -1)
        pt = z_torch[0, off_t:off_t + n].detach().numpy().reshape(3, h, w, -1)
        views.append((np.transpose(pj, (2, 0, 1, 3)), pt))
        off_j += n
        off_t += n
    return views


def test_full_model_pt_rebuilds_and_forward_matches(standin_yolov5, tmp_path):
    import jax.numpy as jnp

    model, params = yolov5_init("n", num_classes=2, seed=0)
    path = str(tmp_path / "full.pt")
    export_full_model_pt(model, params, path, names=["circle", "square"])

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert set(ckpt) >= {"model", "ema", "epoch"}
    assert ckpt["ema"] is None
    m = ckpt["model"]
    import models.yolo as my

    assert isinstance(m, my.DetectionModel)
    # attempt_load's compatibility surface
    assert hasattr(m, "stride") and list(m.stride) == [8.0, 16.0, 32.0]
    assert m.names == {0: "circle", 1: "square"}
    m = m.float().eval()

    rng = np.random.default_rng(3)
    img = 160
    x = rng.random((1, img, img, 3), np.float32)
    with torch.no_grad():
        z, _raw = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    preds, _ = model.apply(params, jnp.asarray(x).astype(jnp.float32))

    for pj, pt in _per_level_views(model, preds, z, img):
        np.testing.assert_allclose(pj, pt, rtol=2e-4, atol=2e-3)


def test_full_model_pt_fuse_then_forward(standin_yolov5, tmp_path):
    """The consumer's own Conv+BN fuse (attempt_load calls model.fuse())
    must run on the rebuilt graph — requires real Conv2d/BatchNorm2d
    attrs (in/out channels, eps, momentum) to be correct."""
    import jax.numpy as jnp

    model, params = yolov5_init("n", num_classes=2, seed=0)
    path = str(tmp_path / "full.pt")
    export_full_model_pt(model, params, path)
    m = torch.load(path, map_location="cpu", weights_only=False)["model"]
    m = m.float().fuse().eval()

    rng = np.random.default_rng(4)
    img = 160
    x = rng.random((1, img, img, 3), np.float32)
    with torch.no_grad():
        z, _ = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    preds, _ = model.apply(params, jnp.asarray(x).astype(jnp.float32))
    for pj, pt in _per_level_views(model, preds, z, img):
        np.testing.assert_allclose(pj, pt, rtol=2e-4, atol=2e-3)


def test_full_model_pt_p6_family(standin_yolov5, tmp_path):
    import jax.numpy as jnp

    model, params = yolov5_init("n6", num_classes=3, seed=1)
    path = str(tmp_path / "full6.pt")
    export_full_model_pt(model, params, path)
    m = torch.load(path, map_location="cpu", weights_only=False)["model"]
    assert list(m.stride) == [8.0, 16.0, 32.0, 64.0]
    m = m.float().eval()
    rng = np.random.default_rng(5)
    img = 128
    x = rng.random((1, img, img, 3), np.float32)
    with torch.no_grad():
        z, _ = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    preds, _ = model.apply(params, jnp.asarray(x).astype(jnp.float32))
    for pj, pt in _per_level_views(model, preds, z, img):
        np.testing.assert_allclose(pj, pt, rtol=2e-4, atol=2e-3)


def test_full_model_pt_refuses_fused_tree(tmp_path):
    model, params = yolov5_init("n", num_classes=2, seed=0)
    fused = model.fuse(params)
    with pytest.raises(ValueError, match="training-layout"):
        export_full_model_pt(model, fused, str(tmp_path / "x.pt"))
    # plain-fused (stem_s2d=False) keeps the k6 stem but folds every BN —
    # the round-5 self-review case that slipped the k6-only guard and
    # would silently drop all folded biases
    plain = model.fuse(params, stem_s2d=False)
    with pytest.raises(ValueError, match="training-layout"):
        export_full_model_pt(model, plain, str(tmp_path / "y.pt"))
