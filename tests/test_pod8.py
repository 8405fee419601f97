"""8-process pod proofs (VERDICT r4 #3): the multichip driver contract is
judged at 8 devices (dryrun_multichip(8)), but the multi-process proofs
stopped at 4. These run the same workers at num_processes=8 — gather with
an uneven tail across seven process boundaries, DP-training fingerprint
vs 1-process on the same 8-device global mesh the dry run uses, and
elastic kill/restart with SEVEN survivors on the broken collective.

Reference scope: the reference has no distributed code at all; this is
the TPU-native multi-host corpus-sharding story (SURVEY §2.4, DCN-side).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

from aquaculture_tpu.parallel.pod import shard_corpus

WORKER_DIR = os.path.dirname(__file__)
NDEV = 8


def _port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env() -> dict:
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.slow
def test_run_pod_pipeline_eight_processes_uneven_tail(tmp_path):
    """10 tiles over 8 hosts shard [2, 2, 1, 1, 1, 1, 1, 1]: the padded
    detection all-gather merges ragged per-host tables across seven
    process boundaries; the merged result must equal a single-process run
    on the identical corpus."""
    from PIL import Image

    from aquaculture_tpu import frame as gf

    shards = [shard_corpus([f"p{i}" for i in range(10)], 8, h) for h in range(8)]
    assert [len(s) for s in shards] == [2, 2, 1, 1, 1, 1, 1, 1]

    rng = np.random.default_rng(23)
    corpus = tmp_path / "tiles"
    corpus.mkdir()
    for i in range(10):
        p = corpus / f"ORTHOIMAGERY.ORTHOPHOTOS2014_{i}_0_0.jpeg"
        Image.fromarray(rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)).save(p)

    worker = os.path.join(WORKER_DIR, "pod_worker.py")

    def launch(nproc, out):
        port = _port()
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(nproc), str(port),
                 str(corpus), out],
                env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
            for pid in range(nproc)
        ]
        outs = [p.communicate(timeout=1800) for p in procs]
        tiles = []
        for p, (so, se) in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{so}\n{se[-2000:]}"
            m = re.search(r"OK tiles=(\d+)", so)
            assert m, so
            tiles.append(int(m.group(1)))
        return tiles

    ref_path = str(tmp_path / "single.geojson")
    multi_path = str(tmp_path / "multi.geojson")
    launch(1, ref_path)
    per_host = launch(8, multi_path)
    assert sorted(per_host, reverse=True) == [2, 2, 1, 1, 1, 1, 1, 1]

    ref = gf.read_file(ref_path)
    got = gf.read_file(multi_path)
    assert len(got) == len(ref) > 0, (len(got), len(ref))

    def key(frame):
        rows = []
        for conf, g in zip(frame["det_conf"], frame["geometry"]):
            c = g.centroid
            rows.append((round(float(conf), 6), round(c.x, 9), round(c.y, 9)))
        return sorted(rows)

    assert key(got) == key(ref)


@pytest.mark.slow
def test_pod_train_eight_processes():
    """8-process DP training (1 local CPU device each, the same 8-device
    global mesh dryrun_multichip validates): loss + parameter fingerprint
    must match the 1-process run — the GSPMD gradient all-reduce crossing
    SEVEN process boundaries."""
    worker = os.path.join(WORKER_DIR, "pod_train_worker.py")

    def launch(nproc):
        port = _port()
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(nproc), str(port),
                 str(NDEV)],
                env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
            for pid in range(nproc)
        ]
        outs = [p.communicate(timeout=1800) for p in procs]
        results = []
        for p, (so, se) in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{so}\n{se[-2000:]}"
            m = re.search(r"OK loss=([\d.eE+-]+) fp=([\d.eE+-]+)", so)
            assert m, so
            results.append((float(m.group(1)), float(m.group(2))))
        return results

    (ref_loss, ref_fp), = launch(1)
    multi = launch(8)
    assert len(multi) == 8
    for loss, fp in multi:
        assert np.isclose(loss, ref_loss, rtol=1e-4), (loss, ref_loss)
        assert np.isclose(fp, ref_fp, rtol=1e-5), (fp, ref_fp)


@pytest.mark.slow
def test_pod_train_elastic_recovery_eight_processes(tmp_path):
    """Kill 1 of 8 DP-training processes mid-run, restart the 8-process
    job from the TrainState checkpoint, fingerprint-match an
    uninterrupted 8-process run — seven survivors block on the broken
    collective instead of three."""
    worker = os.path.join(WORKER_DIR, "pod_train_elastic_worker.py")
    ckpt = str(tmp_path / "train_ckpt")
    N, NPROC = 5, 8
    N_CRASH = 2

    def popen(pid, port, mode):
        return subprocess.Popen(
            [sys.executable, worker, str(pid), str(NPROC), str(port), mode,
             ckpt, str(N), str(N_CRASH), str(NDEV)],
            env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )

    def parse_fp(out):
        m = re.search(r"OK loss=[\d.eE+-]+ fp=([\d.eE+-]+) fpe=([\d.eE+-]+)", out)
        assert m, out
        return float(m.group(1)), float(m.group(2))

    port = _port()
    procs = [popen(i, port, "full") for i in range(NPROC)]
    outs = [pr.communicate(timeout=1800) for pr in procs]
    for pr, (so, se) in zip(procs, outs):
        assert pr.returncode == 0, f"{so}\n{se[-2000:]}"
    ref_fp, ref_fpe = parse_fp(outs[0][0])

    port = _port()
    procs = [popen(i, port, "crash") for i in range(NPROC)]
    so1, se1 = procs[1].communicate(timeout=1800)
    assert procs[1].returncode == 1, (procs[1].returncode, so1, se1[-500:])
    survivor_out = []
    for i in (0,) + tuple(range(2, NPROC)):
        try:
            so, _ = procs[i].communicate(timeout=60)
        except subprocess.TimeoutExpired:
            procs[i].kill()
            so, _ = procs[i].communicate()
        survivor_out.append(so)
    assert "CHECKPOINTED step=2" in survivor_out[0]
    assert os.path.exists(os.path.join(ckpt, "params.npz"))

    port = _port()
    procs = [popen(i, port, "resume") for i in range(NPROC)]
    outs = [pr.communicate(timeout=1800) for pr in procs]
    for pr, (so, se) in zip(procs, outs):
        assert pr.returncode == 0, f"{so}\n{se[-2000:]}"
    for so, _ in outs:
        fp, fpe = parse_fp(so)
        assert np.isclose(fp, ref_fp, rtol=1e-5), (fp, ref_fp)
        assert np.isclose(fpe, ref_fpe, rtol=1e-5), (fpe, ref_fpe)
