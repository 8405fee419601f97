"""Worker process for the 2-process DP *training* proof (see test_pod.py).

Each worker joins a jax.distributed cluster over localhost with K local CPU
devices (K = 4 / num_processes so the GLOBAL mesh is always 4 devices and
the compiled program is identical across runs). The global batch of 4 images
is deterministic; each worker feeds only the rows its devices own via
mesh.shard_local_batch (no host materializes data it doesn't train on —
the DCN-side input path). Prints the loss after 3 sharded train steps plus
a parameter-fingerprint so the test can assert 1-process == 2-process.
"""

import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    # optional global device count (test_pod8 runs the same proof on an
    # 8-device global mesh, matching dryrun_multichip's topology)
    ndev = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    local_devices = ndev // nproc
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == ndev, len(jax.devices())

    import numpy as np
    import jax.numpy as jnp

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.parallel.mesh import make_mesh, shard_local_batch
    from aquaculture_tpu.parallel.sharded import sharded_train_step
    from aquaculture_tpu.train.trainer import init_train_state

    mesh = make_mesh(n_data=ndev, n_model=1)
    model, params = yolov5_init("n", num_classes=5, seed=0)
    cfg = TrainConfig(
        img_size=64, batch_size=ndev, max_boxes_per_image=8,
        compute_dtype="float32"
    )
    state = init_train_state(model, params)

    rng = np.random.default_rng(0)
    b, m = ndev, cfg.max_boxes_per_image
    global_batch = {
        "images": rng.random((b, 64, 64, 3), dtype=np.float32),
        "labels": np.stack(
            [
                rng.integers(0, 5, (b, m)).astype(np.float32),
                rng.uniform(8, 56, (b, m)).astype(np.float32),
                rng.uniform(8, 56, (b, m)).astype(np.float32),
                rng.uniform(4, 16, (b, m)).astype(np.float32),
                rng.uniform(4, 16, (b, m)).astype(np.float32),
            ],
            axis=-1,
        ),
        "label_mask": rng.random((b, m)) > 0.3,
    }
    # This process's contiguous slice of the global batch (process order).
    lo, hi = pid * (b // nproc), (pid + 1) * (b // nproc)
    local = {k: v[lo:hi] for k, v in global_batch.items()}

    with mesh:
        step_fn, sh_state = sharded_train_step(
            model, cfg, mesh, steps_per_epoch=10, state=state
        )
        batch = shard_local_batch(local, mesh)
        for _ in range(3):
            sh_state, metrics = step_fn(sh_state, batch)
        jax.block_until_ready(sh_state.params)

    loss = float(np.asarray(metrics["total"]))

    # Parameter fingerprint: global L1 of all params, computed on-mesh and
    # replicated so every process can read it.
    @jax.jit
    def fingerprint(p):
        return sum(jnp.abs(x).sum() for x in jax.tree_util.tree_leaves(p))

    fp = float(np.asarray(fingerprint(sh_state.params)))

    # put_global correctness on a leaf sharded ACROSS process boundaries:
    # a (1, 4) mesh puts the 'model' axis over all 4 devices, which spans
    # both processes when nproc=2. Each process supplies its full host copy;
    # the reassembled global array must equal it exactly.
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from aquaculture_tpu.parallel.mesh import put_global

    mesh2 = Mesh(np.asarray(jax.devices()).reshape(1, ndev), ("data", "model"))
    host = np.arange(8 * ndev, dtype=np.float32).reshape(8, ndev)
    g = put_global(host, NamedSharding(mesh2, P(None, "model")))
    back = multihost_utils.process_allgather(g, tiled=True)
    assert back.shape == host.shape and np.array_equal(back, host), back

    print(f"WORKER {pid} OK loss={loss:.10f} fp={fp:.6f}", flush=True)


if __name__ == "__main__":
    main()
