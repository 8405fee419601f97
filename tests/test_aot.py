"""AOT serving artifacts (models/aot.py, cli/aot.py, cli.detect --aot).

The exported StableHLO program must be the SAME serving computation
`detect_files` jits — verified bitwise — and artifact/checkpoint
mismatches must fail loudly, not serve garbage.
"""

import glob
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def nmodel():
    from aquaculture_tpu.models.yolov5 import yolov5_init

    model, params = yolov5_init("n", num_classes=2, seed=0)
    return model, model.fuse(params)


def test_aot_roundtrip_bitwise_equals_live(nmodel, tmp_path):
    import jax.numpy as jnp

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models import aot
    from aquaculture_tpu.pipeline import make_infer_fn

    model, params = nmodel
    cfg = DetectConfig(img_size=160, conf_threshold=1e-5)
    blob, meta = aot.export_serving(model, params, cfg, batch_size=2, tile=256)
    path = str(tmp_path / "serving.aqx")
    aot.save_aot(path, blob, meta)

    got = aot.read_meta(path)
    assert got["variant"] == "n" and got["num_classes"] == 2
    assert got["batch_size"] == 2 and got["tile"] == 256
    assert got["params"]["n_leaves"] > 0

    fn, _ = aot.serving_fn(path, params)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 256, 256, 3), np.uint8)
    )
    det_a, val_a = fn(params, x)
    live = make_infer_fn(model, params, cfg, tile=256, batch_size=1)
    det_l, val_l = live(params, x)
    assert (np.asarray(det_a) == np.asarray(det_l)).all()
    assert (np.asarray(val_a) == np.asarray(val_l)).all()

    # warmup compiles and runs
    assert aot.warmup(path, params) > 0


def test_aot_int8_program_roundtrip(nmodel, tmp_path):
    """The int8 serving program exports too: QTensor params flatten to
    plain leaves, so `aq-aot export --int8` artifacts serve bitwise-equal
    to the live quantized path."""
    import jax.numpy as jnp

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models import aot
    from aquaculture_tpu.models.quantize import quantize_model
    from aquaculture_tpu.pipeline import make_infer_fn

    model, params = nmodel
    rng = np.random.default_rng(1)
    calib = jnp.asarray(rng.random((2, 160, 160, 3), np.float32))
    qparams = quantize_model(model, params, calib)

    cfg = DetectConfig(img_size=160, conf_threshold=1e-5)
    blob, meta = aot.export_serving(model, qparams, cfg, batch_size=2, tile=256)
    assert meta["quantized"] is True  # detect.py/warmup use this to demand --int8
    path = str(tmp_path / "serving_int8.aqx")
    aot.save_aot(path, blob, meta)

    fn, _ = aot.serving_fn(path, qparams)
    x = jnp.asarray(rng.integers(0, 255, (2, 256, 256, 3), np.uint8))
    det_a, val_a = fn(qparams, x)
    live = make_infer_fn(model, qparams, cfg, tile=256, batch_size=1)
    det_l, val_l = live(qparams, x)
    assert (np.asarray(det_a) == np.asarray(det_l)).all()
    assert (np.asarray(val_a) == np.asarray(val_l)).all()

    # a bf16 checkpoint must NOT load into the int8 artifact
    with pytest.raises(ValueError, match="does not match the artifact"):
        aot.serving_fn(path, params)


def test_aot_checkpoint_structure_mismatch_raises(nmodel, tmp_path):
    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models import aot
    from aquaculture_tpu.models.yolov5 import yolov5_init

    model, params = nmodel
    blob, meta = aot.export_serving(
        model, params, DetectConfig(img_size=160), batch_size=2, tile=256
    )
    path = str(tmp_path / "serving.aqx")
    aot.save_aot(path, blob, meta)

    other, oparams = yolov5_init("s", num_classes=2, seed=0)
    with pytest.raises(ValueError, match="does not match the artifact"):
        aot.serving_fn(path, other.fuse(oparams))

    # not-an-artifact file
    bad = str(tmp_path / "bad.aqx")
    with open(bad, "wb") as f:
        f.write(b"nope")
    with pytest.raises(ValueError, match="not an aquaculture_tpu AOT artifact"):
        aot.read_meta(bad)

    # truncated file (magic only) and corrupt metadata must raise
    # ValueError, not struct.error / JSONDecodeError
    trunc = str(tmp_path / "trunc.aqx")
    with open(trunc, "wb") as f:
        f.write(b"AQX1")
    with pytest.raises(ValueError, match="truncated"):
        aot.read_meta(trunc)
    corrupt = str(tmp_path / "corrupt.aqx")
    with open(corrupt, "wb") as f:
        f.write(b"AQX1" + (7).to_bytes(4, "little") + b"not-js{")
    with pytest.raises(ValueError, match="corrupt"):
        aot.read_meta(corrupt)


def test_aot_anchor_mismatch_raises(nmodel, tmp_path):
    """Anchors are baked compile-time constants of the decode: serving a
    checkpoint whose model evolved a different anchor table must fail
    loudly, not silently mis-decode every box."""
    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models import aot
    from aquaculture_tpu.models.yolov5 import DEFAULT_ANCHORS, YoloV5

    model, params = nmodel
    blob, meta = aot.export_serving(
        model, params, DetectConfig(img_size=160), batch_size=2, tile=256
    )
    assert meta["anchors"]  # recorded
    path = str(tmp_path / "serving.aqx")
    aot.save_aot(path, blob, meta)

    # same leaf structure, different anchors: fingerprint passes, anchor
    # check must catch it
    evolved = tuple(
        tuple((w * 1.5, h * 0.75) for (w, h) in lvl) for lvl in DEFAULT_ANCHORS
    )
    other = YoloV5(variant="n", num_classes=2, anchors=evolved)
    with pytest.raises(ValueError, match="anchor table mismatch"):
        aot.serving_fn(path, params, anchors=other.anchor_table)

    # matching anchors pass
    fn, _ = aot.serving_fn(path, params, anchors=model.anchor_table)
    assert fn is not None

    # a DIFFERENT anchors-per-level count (ragged vs the baked table) must
    # still produce the diagnostic, not a numpy broadcast ValueError
    ragged = tuple(
        tuple(lvl) + ((99.0, 99.0),) for lvl in DEFAULT_ANCHORS
    )
    with pytest.raises(ValueError, match="anchor table mismatch"):
        aot.serving_fn(path, params, anchors=ragged)


def test_leaf_fingerprint_hashes_paths_not_treedef_repr():
    """The structure fingerprint is built from our own (path, shape, dtype)
    encoding, not str(PyTreeDef) — jax's repr is not a stable contract, and
    a jax upgrade must not invalidate every artifact/checkpoint pair."""
    import numpy as np

    from aquaculture_tpu.models.aot import _leaf_fingerprint

    a = {"conv": {"kernel": np.zeros((3, 3, 1, 8), np.float32)},
         "bn": {"scale": np.ones(8, np.float32)}}
    same = {"bn": {"scale": np.zeros(8, np.float32)},
            "conv": {"kernel": np.ones((3, 3, 1, 8), np.float32)}}
    assert _leaf_fingerprint(a) == _leaf_fingerprint(same)  # values don't matter

    renamed = {"conv2": a["conv"], "bn": a["bn"]}
    assert _leaf_fingerprint(a) != _leaf_fingerprint(renamed)

    reshaped = {"conv": {"kernel": np.zeros((1, 1, 1, 8), np.float32)},
                "bn": a["bn"]}
    assert _leaf_fingerprint(a) != _leaf_fingerprint(reshaped)

    recast = {"conv": {"kernel": a["conv"]["kernel"].astype(np.float16)},
              "bn": a["bn"]}
    assert _leaf_fingerprint(a) != _leaf_fingerprint(recast)


def test_aot_cross_platform_backend_choice(nmodel, tmp_path):
    """The NMS backend is resolved for the TARGET platform, not this build
    host: a tpu-target export bakes the Pallas kernel even from a CPU
    host, and a multi-platform export takes the portable XLA path."""
    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models import aot

    model, params = nmodel
    cfg = DetectConfig(img_size=160)
    _, meta_tpu = aot.export_serving(
        model, params, cfg, batch_size=2, tile=256, platforms=("tpu",)
    )
    assert meta_tpu["nms_backend"] == "auto:tpu"
    assert meta_tpu["platforms"] == ["tpu"]
    _, meta_multi = aot.export_serving(
        model, params, cfg, batch_size=2, tile=256, platforms=("cpu", "tpu")
    )
    assert meta_multi["nms_backend"] == "xla"


def test_cli_detect_serves_from_artifact(tmp_path, monkeypatch):
    """aq-aot export -> cli.detect --aot emits the same labels as the live
    path with identical thresholds.

    The live arm is pinned to one device: artifacts are single-device
    programs (one chip per process, the pod deployment shape), and under
    the conftest's 8-device mesh the sharded live program keeps a
    different set of borderline conf~1e-5 candidates (numeric noise at
    the threshold), which is not what this test is about."""
    import jax

    monkeypatch.setattr(jax, "local_device_count", lambda *a, **k: 1)
    from aquaculture_tpu.cli import aot as cli_aot
    from aquaculture_tpu.cli import detect as cli_detect
    from aquaculture_tpu.utils.checkpoint import save_params
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from PIL import Image

    rng = np.random.default_rng(3)
    src = tmp_path / "tiles"
    src.mkdir()
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (1024, 1024, 3), np.uint8), "RGB"
        ).save(src / f"ORTHOIMAGERY.ORTHOPHOTOS2014_{i}_0_0.jpeg")

    _, params = yolov5_init("n", num_classes=2, seed=0)
    ckpt = str(tmp_path / "ckpt")
    save_params(ckpt, params, {"variant": "n", "num_classes": 2})

    prog = str(tmp_path / "serving.aqx")
    cli_aot.main([
        "export", "--weights", ckpt, "--variant", "n", "--num-classes", "2",
        "--batch", "2", "--img", "160",
        "--conf", "1e-5", "--out", prog,
    ])
    cli_aot.main(["describe", "--program", prog])

    common = ["--weights", ckpt, "--source", str(src / "*.jpeg")]
    cli_detect.main(common + ["--aot", prog, "--out", str(tmp_path / "aot_labels")])
    cli_detect.main(common + [
        "--variant", "n", "--num-classes", "2", "--img", "160",
        "--conf", "1e-5", "--batch", "2", "--out", str(tmp_path / "live_labels"),
    ])

    aot_files = sorted(glob.glob(str(tmp_path / "aot_labels" / "*.txt")))
    live_files = sorted(glob.glob(str(tmp_path / "live_labels" / "*.txt")))
    assert [os.path.basename(p) for p in aot_files] == [
        os.path.basename(p) for p in live_files
    ]
    assert aot_files
    for a, b in zip(aot_files, live_files):
        assert open(a).read() == open(b).read(), os.path.basename(a)
