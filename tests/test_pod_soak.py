"""Corpus-scale pod-pipeline soak (VERDICT r4 #7). See scripts/pod_soak.py
— the same harness runs standalone for the BENCH_POST row; this test pins
the at-scale invariants on a 50k-tile synthetic corpus."""

import sys

import pytest

sys.path.insert(0, "/root/repo/scripts")

N = 50_000


@pytest.mark.slow
def test_pod_pipeline_50k_tile_soak(tmp_path):
    from pod_soak import CHUNK, run_soak

    row = run_soak(N, str(tmp_path / "ckpt"), str(tmp_path / "out.geojson"))

    # accounting: every tile counted exactly once, streamed exactly once
    assert row["tiles"] == N
    assert row["store_gets"] == N
    assert row["detections"] > N / 10  # the fake infer's ~0.19/tile rate

    # bounded RSS: from 25% progress to completion the host must not grow
    # with the corpus (chunked accumulators; a leak of even 1 KB/tile
    # would show as ~37 MB here)
    assert row["rss_growth_mb"] < 100, row

    # bounded manifests: exactly ceil(N/CHUNK) chunk files, O(detections)
    # bytes (~1 KB/det would be pathological)
    assert row["manifest_files"] == -(-N // CHUNK), row
    assert row["manifest_mb"] < 60, row

    # sustained throughput: the orchestration (stubbed forward) must not
    # be the serving bottleneck even on this 1-core box
    assert row["tiles_per_s"] > 300, row
