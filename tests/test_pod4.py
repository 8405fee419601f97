"""4-process pod proofs (VERDICT r3 next #5): the 2-process results in
test_pod.py exercise the multi-host branches, but gather padding, uneven
shard tails, and elastic restart were never run past 2 processes while
dryrun_multichip covers 8 devices only single-process. These tests scale
the same workers to num_processes=4 on the virtual CPU mesh.

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
def test_run_pod_pipeline_four_processes_uneven_tail(tmp_path):
    """6 tiles over 4 hosts shard [2, 2, 1, 1] (uneven tail): the padded
    detection all-gather must merge ragged per-host tables, and the result
    must equal a single-process run on the identical corpus."""
    from PIL import Image

    from aquaculture_tpu import frame as gf

    # the shard math this test claims to exercise
    shards = [shard_corpus([f"p{i}" for i in range(6)], 4, h) for h in range(4)]
    assert [len(s) for s in shards] == [2, 2, 1, 1]

    rng = np.random.default_rng(11)
    corpus = tmp_path / "tiles"
    corpus.mkdir()
    for i in range(6):
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
        outs = [p.communicate(timeout=900) for p in procs]
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
    per_host = launch(4, multi_path)
    assert sorted(per_host, reverse=True) == [2, 2, 1, 1]

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
def test_pod_train_four_processes():
    """4-process DP training (1 local CPU device each, same 4-device global
    mesh as the 1-process reference): loss + parameter fingerprint must
    match — the GSPMD gradient all-reduce crossing THREE process
    boundaries instead of one."""
    worker = os.path.join(WORKER_DIR, "pod_train_worker.py")

    def launch(nproc):
        port = _port()
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(nproc), str(port)],
                env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
            for pid in range(nproc)
        ]
        outs = [p.communicate(timeout=900) for p in procs]
        results = []
        for p, (so, se) in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{so}\n{se[-2000:]}"
            m = re.search(r"OK loss=([\d.eE+-]+) fp=([\d.eE+-]+)", so)
            assert m, so
            results.append((float(m.group(1)), float(m.group(2))))
        return results

    (ref_loss, ref_fp), = launch(1)
    multi = launch(4)
    assert len(multi) == 4
    for loss, fp in multi:
        assert np.isclose(loss, ref_loss, rtol=1e-4), (loss, ref_loss)
        assert np.isclose(fp, ref_fp, rtol=1e-5), (fp, ref_fp)


@pytest.mark.slow
def test_pod_train_elastic_recovery_four_processes(tmp_path):
    """Kill 1 of 4 DP-training processes mid-run, restart the 4-process job
    from the TrainState checkpoint, fingerprint-match an uninterrupted
    4-process run. Scales test_pod.test_pod_train_elastic_recovery's proof
    to the topology where THREE survivors block on the broken collective."""
    worker = os.path.join(WORKER_DIR, "pod_train_elastic_worker.py")
    ckpt = str(tmp_path / "train_ckpt")
    N, NPROC = 6, 4
    N_CRASH = 3

    def popen(pid, port, mode):
        return subprocess.Popen(
            [sys.executable, worker, str(pid), str(NPROC), str(port), mode,
             ckpt, str(N), str(N_CRASH)],
            env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )

    def parse_fp(out):
        m = re.search(r"OK loss=[\d.eE+-]+ fp=([\d.eE+-]+) fpe=([\d.eE+-]+)", out)
        assert m, out
        return float(m.group(1)), float(m.group(2))

    # ground truth: uninterrupted 4-process 6-step run
    port = _port()
    procs = [popen(i, port, "full") for i in range(NPROC)]
    outs = [pr.communicate(timeout=900) for pr in procs]
    for pr, (so, se) in zip(procs, outs):
        assert pr.returncode == 0, f"{so}\n{se[-2000:]}"
    ref_fp, ref_fpe = parse_fp(outs[0][0])

    # crash run: checkpoint at step 3, worker 1 hard-exits; the three
    # survivors die on the broken collective or hang — reap all of them
    port = _port()
    procs = [popen(i, port, "crash") for i in range(NPROC)]
    so1, se1 = procs[1].communicate(timeout=900)
    assert procs[1].returncode == 1, (procs[1].returncode, so1, se1[-500:])
    survivor_out = []
    for i in (0, 2, 3):
        try:
            so, _ = procs[i].communicate(timeout=60)
        except subprocess.TimeoutExpired:
            procs[i].kill()
            so, _ = procs[i].communicate()
        survivor_out.append(so)
    assert "CHECKPOINTED step=3" in survivor_out[0]
    assert os.path.exists(os.path.join(ckpt, "params.npz"))

    # restart: fresh 4-process job resumes steps 4..6 from the checkpoint
    port = _port()
    procs = [popen(i, port, "resume") for i in range(NPROC)]
    outs = [pr.communicate(timeout=900) for pr in procs]
    for pr, (so, se) in zip(procs, outs):
        assert pr.returncode == 0, f"{so}\n{se[-2000:]}"
    for so, _ in outs:
        fp, fpe = parse_fp(so)
        assert np.isclose(fp, ref_fp, rtol=1e-5), (fp, ref_fp)
        assert np.isclose(fpe, ref_fpe, rtol=1e-5), (fpe, ref_fpe)
