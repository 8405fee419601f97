"""Live-transport contract tests (VERDICT r4 #5).

The two ``pragma: no cover`` transports — ``HttpWmsTransport.getmap``
(acquire/wms.py) and ``GcsBlobStore`` (data/store.py) — previously had no
request-shape validation at all; the reference used owslib
(reference: src/load_data/download_french_data.py:16-27) and the
google-cloud-storage client (:30-78), both of which ran in production.

These tests validate the request SHAPE offline, no network:

* The WMS GetMap query is captured via a monkeypatched urlopen and
  diffed param-by-param against the request owslib's
  ``WebMapService_1_1_1.getmap`` would build for the reference's exact
  call (layers=['ORTHOIMAGERY.ORTHOPHOTOS{Y}'], styles=['normal'],
  srs='EPSG:3857', bbox, size, format='image/tiff', transparent=True).
  owslib is used directly when importable; this image does not ship it,
  so the expected dict is otherwise transcribed from owslib's published
  wms111 request builder (owslib/map/wms111.py WebMapService_1_1_1.
  __build_getmap_request: version/request constants, comma-joined
  layers/styles, SRS key for 1.1.1, bbox joined minx,miny,maxx,maxy with
  no axis swap, TRANSPARENT upper-cased).

* ``GcsBlobStore`` is driven against a fake client and every
  (class, method) it touches is asserted to exist on the REAL
  ``google.cloud.storage`` classes (importable in this image) with a
  signature that binds our call shape — the drift the verdict called out
  (a renamed method or changed kwarg would otherwise only surface in
  production).
"""

from __future__ import annotations

import inspect
import urllib.parse

import pytest

from aquaculture_tpu.acquire.wms import HttpWmsTransport, layer_name


def _owslib_expected_params(layer, bbox, size):
    """The GetMap params owslib WMS 1.1.1 would send for the reference's
    call. Uses real owslib when importable; otherwise the transcription
    documented in the module docstring."""
    try:  # pragma: no cover - owslib not shipped in this image
        from owslib.map.wms111 import WebMapService_1_1_1  # noqa: F401

        # Build via owslib itself: instantiate the request builder only
        # (no capabilities fetch). owslib's getmap() ultimately urlencodes
        # exactly the dict __build_getmap_request returns.
        svc = WebMapService_1_1_1.__new__(WebMapService_1_1_1)
        req = svc._WebMapService_1_1_1__build_getmap_request(
            layers=[layer], styles=["normal"], srs="EPSG:3857",
            bbox=bbox, format="image/tiff", size=(size, size),
            transparent=True,
        )
        return {k.upper(): str(v) for k, v in req.items()}
    except ImportError:
        return {
            "SERVICE": "WMS",
            "VERSION": "1.1.1",
            "REQUEST": "GetMap",
            "LAYERS": layer,                  # comma-join of one layer
            "STYLES": "normal",               # comma-join of one style
            "SRS": "EPSG:3857",               # 1.1.1 key (1.3.0 uses CRS)
            "BBOX": ",".join(str(v) for v in bbox),  # minx,miny,maxx,maxy
            "WIDTH": str(size),
            "HEIGHT": str(size),
            "FORMAT": "image/tiff",
            "TRANSPARENT": "TRUE",
            "EXCEPTIONS": "application/vnd.ogc.se_xml",
        }


def _capture_query(monkeypatch, call):
    captured = {}

    class _Resp:
        def read(self):
            return b"bytes"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, timeout=None):
        captured["url"] = url
        captured["timeout"] = timeout
        return _Resp()

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    out = call()
    assert out == b"bytes"
    return captured


BBOX = (259366.8, 5205563.2, 260566.8, 5206763.2)  # 1200 m box, EPSG:3857


@pytest.mark.parametrize("size", [1024, 6144])
def test_http_wms_getmap_matches_owslib_request_shape(monkeypatch, size):
    layer = layer_name(2014)
    t = HttpWmsTransport(url="https://wms.example/r/wms")
    cap = _capture_query(monkeypatch, lambda: t.getmap(layer, BBOX, size))

    base, _, query = cap["url"].partition("?")
    assert base == "https://wms.example/r/wms"
    got = dict(urllib.parse.parse_qsl(query, keep_blank_values=True))
    want = _owslib_expected_params(layer, BBOX, size)

    # Param keys must match owslib's exactly (EXCEPTIONS included — the
    # spec default, sent explicitly since round 5)
    assert set(got) == set(want), (sorted(got), sorted(want))

    # Value-identical params (literal strings)
    for k in ("SERVICE", "VERSION", "REQUEST", "LAYERS", "STYLES", "SRS",
              "FORMAT", "TRANSPARENT", "WIDTH", "HEIGHT", "EXCEPTIONS"):
        assert got[k] == want[k], (k, got[k], want[k])

    # BBOX: owslib joins str(v); ours formats %.6f — the server parses
    # floats, so the contract is VALUE equality in minx,miny,maxx,maxy
    # order (the axis-order defect the verdict called out would flip
    # these), not string equality.
    got_bbox = [float(v) for v in got["BBOX"].split(",")]
    want_bbox = [float(v) for v in want["BBOX"].split(",")]
    assert got_bbox == pytest.approx(want_bbox, abs=1e-6)
    minx, miny, maxx, maxy = got_bbox
    assert minx < maxx and miny < maxy


def test_http_wms_probe_and_full_sizes_match_reference():
    """The reference probes 1024px then fetches 1024*6 px
    (download_french_data.py:52-57,70-76); our constants must agree."""
    from aquaculture_tpu.acquire.wms import FULL_SIZE, PROBE_SIZE

    assert PROBE_SIZE == 1024
    assert FULL_SIZE == 6144


def test_http_wms_2021_express_layer_name():
    # download_french_data.py handles the 2021 ortho-express layer rename
    assert layer_name(2021) == "ORTHOIMAGERY.ORTHOPHOTOS.ORTHO-EXPRESS.2021"
    assert layer_name(2014) == "ORTHOIMAGERY.ORTHOPHOTOS2014"


# ---------------------------------------------------------------- GCS


class _FakeBlob:
    def __init__(self, bucket, name):
        self._bucket = bucket
        self.name = name

    def exists(self):
        return self.name in self._bucket._data

    def upload_from_string(self, data):
        self._bucket._data[self.name] = (
            data.encode() if isinstance(data, str) else bytes(data)
        )

    def download_as_bytes(self):
        return self._bucket._data[self.name]


class _FakeBucket:
    def __init__(self):
        self._data = {}

    def blob(self, key):
        return _FakeBlob(self, key)

    def list_blobs(self, prefix=""):
        return [
            _FakeBlob(self, k) for k in self._data if k.startswith(prefix)
        ]


class _FakeClient:
    def __init__(self):
        self.bucket_obj = _FakeBucket()

    def get_bucket(self, name):
        self.got = name
        return self.bucket_obj


def test_gcs_blob_store_behavior_with_fake_client():
    from aquaculture_tpu.data.store import GcsBlobStore

    client = _FakeClient()
    store = GcsBlobStore("my-bucket", client=client)
    assert client.got == "my-bucket"
    assert not store.exists("tifs/a.tif")
    store.put("tifs/a.tif", b"\x01\x02")
    store.put("tifs/b.tif", b"\x03")
    store.put("other/c.tif", b"\x04")
    assert store.exists("tifs/a.tif")
    assert store.get("tifs/a.tif") == b"\x01\x02"
    assert store.list("tifs/") == ["tifs/a.tif", "tifs/b.tif"]
    assert store.list() == ["other/c.tif", "tifs/a.tif", "tifs/b.tif"]


def test_gcs_blob_store_calls_exist_on_real_client_surface():
    """Every (class, method) GcsBlobStore touches must exist on the real
    google-cloud-storage classes with a signature that binds our call
    shape — catching client-library drift offline."""
    storage = pytest.importorskip("google.cloud.storage")

    surface = [
        (storage.Client, "get_bucket", ("bucket-name",), {}),
        (storage.Bucket, "blob", ("some/key",), {}),
        (storage.Bucket, "list_blobs", (), {"prefix": "p/"}),
        (storage.Blob, "exists", (), {}),
        (storage.Blob, "upload_from_string", (b"data",), {}),
        (storage.Blob, "download_as_bytes", (), {}),
    ]
    for cls, meth, args, kwargs in surface:
        fn = getattr(cls, meth, None)
        assert fn is not None, f"{cls.__name__}.{meth} missing"
        sig = inspect.signature(fn)
        # bind with a placeholder self
        sig.bind(object(), *args, **kwargs)
    # Blob.name is the attribute list() reads (a _PropertyMixin property,
    # visible on instances rather than in dir(Blob))
    assert storage.Blob("some/key", bucket=None).name == "some/key"
