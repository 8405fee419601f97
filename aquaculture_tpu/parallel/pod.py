"""Pod-scale execution: multi-host corpus sharding + global detection gather.

The reference's "distribution" is files on GCS and a process pool (SURVEY
§2.4); here multi-chip/multi-host is first-class:

* DCN level: each host claims a deterministic, disjoint shard of the tile
  corpus (contiguous balanced split — streaming locality per host).
* ICI level: within a host, the batch shards over the local-device `data`
  mesh axis (aquaculture_tpu.parallel.sharded).
* Aggregation: per-host detection tables travel to every host with one
  padded all-gather over DCN (process_allgather) — the only cross-host
  collective in the pipeline; everything else is embarrassingly parallel.

Single-host degenerates to the plain pipeline — the same code path runs in
tests and on a pod.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from aquaculture_tpu.utils.logging import log_info


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed when running multi-host (no-op single
    host). Returns (process_index, process_count)."""
    import jax

    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def shard_corpus(paths: Sequence[str], num_hosts: int, host_id: int) -> List[str]:
    """Deterministic contiguous balanced shard of the corpus for one host.

    Contiguous (not strided) so each host streams neighboring GCS objects;
    balanced so shard sizes differ by at most 1.
    """
    assert 0 <= host_id < num_hosts
    paths = list(paths)
    n = len(paths)
    base, extra = divmod(n, num_hosts)
    start = host_id * base + min(host_id, extra)
    size = base + (1 if host_id < extra else 0)
    return paths[start : start + size]


def gather_detection_tables(
    boxes: np.ndarray, conf: np.ndarray, cls: np.ndarray, tile_ids: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All-gather per-host detection tables across processes (padded to the
    max per-host count, then unpadded). Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return boxes, conf, cls, tile_ids

    from jax.experimental import multihost_utils

    n_local = np.asarray([len(boxes)], np.int32)
    counts = multihost_utils.process_allgather(n_local).reshape(-1)
    n_max = int(counts.max())

    def pad(a, fill=0):
        out = np.full((n_max,) + a.shape[1:], fill, a.dtype)
        out[: len(a)] = a
        return out

    gb = multihost_utils.process_allgather(pad(boxes.astype(np.float64)))
    gc = multihost_utils.process_allgather(pad(conf.astype(np.float64)))
    gk = multihost_utils.process_allgather(pad(cls.astype(np.int64)))
    gt = multihost_utils.process_allgather(pad(tile_ids.astype(np.int64)))

    out_b, out_c, out_k, out_t = [], [], [], []
    for h, n in enumerate(counts):
        out_b.append(gb[h, :n])
        out_c.append(gc[h, :n])
        out_k.append(gk[h, :n])
        out_t.append(gt[h, :n])
    return (
        np.concatenate(out_b),
        np.concatenate(out_c),
        np.concatenate(out_k),
        np.concatenate(out_t),
    )


_LAYER_BYTES = 96  # fixed-width utf-8 budget for gathering layer strings


def _spec_rows(specs) -> np.ndarray:
    return np.asarray(
        [(s.year, s.bbox_ind, s.x_offset, s.y_offset) for s in specs], np.int64
    ).reshape(-1, 4)


def _spec_layers(specs) -> np.ndarray:
    return np.asarray([s.layer for s in specs], dtype=np.str_)


def _rows_to_specs(rows: np.ndarray, layers=None):
    from aquaculture_tpu.data.filenames import TileSpec

    rows = np.asarray(rows, np.int64).reshape(-1, 4)
    lay = [""] * len(rows) if layers is None else [str(l) for l in layers]
    return [
        TileSpec(
            year=int(r[0]), bbox_ind=int(r[1]), x_offset=int(r[2]),
            y_offset=int(r[3]), layer=lay[i],
        )
        for i, r in enumerate(rows)
    ]


def _corpus_fingerprint(
    all_paths: Sequence[str], n_hosts: int, cfg=None, overlap: int = 0
) -> str:
    """Identity of a resumable run: corpus list + host count + the
    detection-relevant config + the tiling overlap. Without cfg/overlap in
    the hash, a resume with a different conf threshold or a different
    --overlap would silently merge detections produced under different
    settings (mixed hard-grid and strided-grid tiles) into one output."""
    import hashlib

    h = hashlib.sha1()
    h.update(f"hosts={n_hosts}\n".encode())
    if overlap:
        # Only strided runs carry the overlap term: hard-grid (overlap=0)
        # manifests written before overlap existed stay resumable.
        h.update(f"overlap={overlap}\n".encode())
    if cfg is not None:
        h.update(repr(cfg).encode())
        h.update(b"\n")
    for p in all_paths:
        h.update(p.encode())
        h.update(b"\n")
    return h.hexdigest()


def _chunk_files(checkpoint_dir: str, host: int) -> List[str]:
    import glob as _glob

    return sorted(_glob.glob(os.path.join(checkpoint_dir, f"pod_host{host}_chunk*.npz")))


def _load_progress(checkpoint_dir: str, host: int, fingerprint: str):
    """Union of all prior chunk manifests for this host.

    Raises if any chunk was written under a different corpus/host-count:
    resuming across a topology change would double-count tiles now owned by
    another host (its manifest still carries them) — fail loudly instead.
    Returns (done_paths set, boxes, conf, cls, spec_rows, spec_layers).
    """
    done: set = set()
    bs, cs, ks, rs, ls = [], [], [], [], []
    for f in _chunk_files(checkpoint_dir, host):
        z = np.load(f, allow_pickle=False)
        fp = str(z["fingerprint"])
        if fp != fingerprint:
            raise RuntimeError(
                f"pod checkpoint {f} was written for a different corpus, "
                f"host count, or detection config (fingerprint {fp[:12]} != "
                f"{fingerprint[:12]}); resume requires the SAME corpus list, "
                "process count, and config — delete the checkpoint dir to "
                "start fresh"
            )
        done.update(str(p) for p in z["done_paths"])
        bs.append(z["boxes"].reshape(-1, 4))
        cs.append(z["conf"])
        ks.append(z["cls"])
        rs.append(z["spec_rows"].reshape(-1, 4))
        ls.append(z["spec_layers"])
    if not bs:
        return (
            set(), np.zeros((0, 4)), np.zeros(0), np.zeros(0, np.int64),
            np.zeros((0, 4), np.int64), np.zeros(0, np.str_),
        )
    return (
        done,
        np.concatenate(bs),
        np.concatenate(cs),
        np.concatenate(ks),
        np.concatenate(rs),
        np.concatenate(ls),
    )


def _append_chunk(
    checkpoint_dir: str, host: int, idx: int, fingerprint: str,
    chunk_paths, boxes, conf, cls, specs,
) -> None:
    """One append-only chunk manifest (atomic publish via os.replace);
    write volume stays O(chunk), not O(total progress)."""
    path = os.path.join(checkpoint_dir, f"pod_host{host}_chunk{idx:06d}.npz")
    # dot-prefixed temp so the _chunk_files glob can NEVER pick up a
    # partial file left by a crash mid-write (explicit .npz suffix so
    # np.savez doesn't append another)
    tmp = os.path.join(checkpoint_dir, f".pod_host{host}_chunk{idx:06d}.tmp.npz")
    np.savez(
        tmp,
        fingerprint=np.str_(fingerprint),
        done_paths=np.asarray(list(chunk_paths), dtype=np.str_),
        boxes=np.asarray(boxes, np.float64).reshape(-1, 4),
        conf=np.asarray(conf, np.float64),
        cls=np.asarray(cls, np.int64),
        spec_rows=_spec_rows(specs),
        spec_layers=_spec_layers(specs),
    )
    os.replace(tmp, path)


def run_pod_pipeline(
    all_paths: Sequence[str],
    model,
    params,
    download_bboxes,
    cfg=None,
    batch_size: int = 32,
    out_path: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1024,
    store=None,
    overlap: int = 0,
    overlap_iou: float = 0.5,
):
    """Config-5 runner: every host detects over its corpus shard; host 0
    assembles and writes the global detections GeoJSON.

    overlap > 0 enables overlap serving on large rasters (the bulk-sweep
    production recommendation, BENCHMARKS.md P6 study): tiles step by
    (tile - overlap) px and the duplicate detections collapse via
    meter-space cross-tile NMS AFTER the global gather — correct even
    though overlap duplicates are intra-raster (and rasters never split
    across hosts: sharding is per file), because the NMS runs on the
    assembled global table every host holds.

    store: a data.store.BlobStore — when given, ``all_paths`` are blob KEYS
    and each host streams its contiguous key shard straight from the store
    (the reference's corpus transport: GCS blobs, utils.py:192-238); resume
    manifests are keyed by blob name so elastic recovery works identically
    for store corpora.

    checkpoint_dir enables elastic recovery (SURVEY §5: the reference's
    only recovery is rerun-from-scratch with artifact caching): every
    checkpoint_every tiles each host publishes an append-only chunk
    manifest (atomic os.replace, O(chunk) write volume); a restarted run
    skips finished tiles and merges the saved tables before the global
    gather, so a host failure costs at most checkpoint_every tiles of
    work. Resume requires the SAME corpus and process count — manifests
    carry a fingerprint and a mismatch fails loudly rather than
    double-counting tiles that a re-shard moved to another host.
    """
    import jax

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.pipeline import detect_files
    from aquaculture_tpu.post.geocode import geocode_detections

    cfg = cfg or DetectConfig()
    from aquaculture_tpu.pipeline import overlap_stride

    stride = overlap_stride(overlap)
    host, n_hosts = jax.process_index(), jax.process_count()
    shard = shard_corpus(all_paths, n_hosts, host)
    log_info("host %d/%d: %d of %d tiles", host, n_hosts, len(shard), len(all_paths))

    if checkpoint_dir:
        from aquaculture_tpu.pipeline import PipelineStats, make_infer_fn

        os.makedirs(checkpoint_dir, exist_ok=True)
        fingerprint = _corpus_fingerprint(all_paths, n_hosts, cfg, overlap=overlap)
        done, boxes0, conf0, cls0, spec_rows0, spec_layers0 = _load_progress(
            checkpoint_dir, host, fingerprint
        )
        todo = [p for p in shard if p not in done]
        if done:
            log_info(
                "host %d: resuming — %d tiles already done, %d remain",
                host, len(done), len(todo),
            )
        next_idx = len(_chunk_files(checkpoint_dir, host))
        stats = PipelineStats()  # counts only THIS run's work, not resumed tiles
        # One compiled program for every chunk: detect_files would otherwise
        # rebuild its jitted infer fn per call (a remote recompile per chunk).
        infer_fn = make_infer_fn(model, params, cfg, batch_size=batch_size) if todo else None
        # Accumulate per-chunk arrays in lists (one concatenate per table at
        # the end) — concatenating the whole history every chunk is O(n^2)
        # copied bytes over a big shard.
        acc_b = [np.asarray(boxes0).reshape(-1, 4)]
        acc_c = [np.asarray(conf0)]
        acc_k = [np.asarray(cls0, np.int64)]
        acc_r = [np.asarray(spec_rows0, np.int64).reshape(-1, 4)]
        acc_l = [np.asarray(spec_layers0, dtype=np.str_)]
        for i in range(0, len(todo), checkpoint_every):
            chunk = todo[i : i + checkpoint_every]
            b, c, k, specs, st = detect_files(
                chunk, model, params, cfg, batch_size, infer_fn=infer_fn,
                store=store, stride=stride,
            )
            stats.tiles += st.tiles
            stats.batches += st.batches
            stats.detections += st.detections
            stats.infer_seconds += st.infer_seconds
            _append_chunk(
                checkpoint_dir, host, next_idx, fingerprint, chunk, b, c, k, specs
            )
            next_idx += 1
            acc_b.append(np.asarray(b).reshape(-1, 4))
            acc_c.append(np.asarray(c))
            acc_k.append(np.asarray(k, np.int64))
            acc_r.append(_spec_rows(specs))
            acc_l.append(_spec_layers(specs))
        boxes = np.concatenate(acc_b)
        conf = np.concatenate(acc_c)
        cls = np.concatenate(acc_k)
        spec_rows = np.concatenate(acc_r)
        spec_layers = np.concatenate([a.astype(np.str_) for a in acc_l]) if acc_l else np.zeros(0, np.str_)
        specs = _rows_to_specs(spec_rows, spec_layers)
    else:
        boxes, conf, cls, specs, stats = detect_files(
            shard, model, params, cfg, batch_size, store=store, stride=stride
        )

    # Encode specs as ids for the numeric gather, decode after.
    spec_table = list({s for s in specs})
    spec_id = {s: i for i, s in enumerate(spec_table)}
    tile_ids = np.asarray([spec_id[s] for s in specs], np.int64)

    if n_hosts > 1:
        # Spec tables are host-local; shift ids into a global namespace by
        # gathering the tables too: the (year, bbox, x, y) rows as int64 and
        # the layer strings as fixed-width utf-8 bytes (process_allgather is
        # numeric-only).
        from jax.experimental import multihost_utils

        enc = _spec_rows(spec_table)
        n_local = np.asarray([len(enc)], np.int32)
        counts = multihost_utils.process_allgather(n_local).reshape(-1)
        n_max = int(counts.max()) if len(counts) else 0
        pad = np.zeros((n_max, 4), np.int64)
        pad[: len(enc)] = enc
        lay = np.zeros((n_max, _LAYER_BYTES), np.uint8)
        for i, s in enumerate(spec_table):
            b = s.layer.encode("utf-8")
            if len(b) > _LAYER_BYTES:
                # truncating could split a multi-byte codepoint (decode on
                # every host would then raise at the final gather) and
                # would corrupt the tile identity — fail loudly up front
                raise ValueError(
                    f"TileSpec layer exceeds the {_LAYER_BYTES}-byte gather "
                    f"budget: {s.layer!r}"
                )
            lay[i, : len(b)] = np.frombuffer(b, np.uint8)
        tables = multihost_utils.process_allgather(pad)
        layer_tables = multihost_utils.process_allgather(lay)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        tile_ids = tile_ids + offsets[host]
        rows, layers = [], []
        for h in range(len(counts)):
            rows.append(tables[h, : counts[h]])
            layers.extend(
                bytes(layer_tables[h, i]).rstrip(b"\x00").decode("utf-8")
                for i in range(counts[h])
            )
        global_specs = _rows_to_specs(np.concatenate(rows) if rows else np.zeros((0, 4)), layers)
        boxes, conf, cls, tile_ids = gather_detection_tables(boxes, conf, cls, tile_ids)
    else:
        global_specs = spec_table

    det = geocode_detections(
        boxes.astype(np.int64),
        conf,
        cls.astype(np.int64),
        [global_specs[i] for i in tile_ids],
        download_bboxes,
    )
    if overlap and len(det):
        from aquaculture_tpu.post.dedup import nms_cross_tile

        before = len(det)
        det = nms_cross_tile(det, iou_thresh=overlap_iou)
        log_info("cross-tile NMS: %d -> %d detections", before, len(det))
    if out_path and host == 0:
        det.to_file(out_path)
        log_info("host 0 wrote %d global detections -> %s", len(det), out_path)
    return det, stats
