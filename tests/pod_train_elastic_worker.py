"""Worker for the elastic multi-host TRAINING test (see test_pod.py).

Proves SCALING.md's multi-host DP training claim survives a host failure:
a 2-process jax.distributed training job checkpoints full TrainState
(params + SGD momenta + EMA + step) via utils/checkpoint.py, one process is
killed mid-run, and a RESTARTED 2-process job resumes from the checkpoint
and lands on the exact parameter fingerprint of an uninterrupted run.

Modes:
  full    — train steps 1..N from init, print fingerprint (ground truth)
  crash   — train steps 1..K, checkpoint at K, then pid 1 hard-exits
            (os._exit) simulating host death; pid 0 is reaped by the test
  resume  — load the checkpoint, train steps K+1..N, print fingerprint

Batches are generated per-step from a seeded rng (batch_for_step), so every
mode sees the identical global data stream.
"""

import os
import sys


def batch_for_step(step: int, b: int, m: int, size: int):
    import numpy as np

    rng = np.random.default_rng(1000 + step)
    return {
        "images": rng.random((b, size, size, 3), dtype=np.float32),
        "labels": np.stack(
            [
                rng.integers(0, 5, (b, m)).astype(np.float32),
                rng.uniform(8, size - 8, (b, m)).astype(np.float32),
                rng.uniform(8, size - 8, (b, m)).astype(np.float32),
                rng.uniform(4, 16, (b, m)).astype(np.float32),
                rng.uniform(4, 16, (b, m)).astype(np.float32),
            ],
            axis=-1,
        ),
        "label_mask": rng.random((b, m)) > 0.3,
    }


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    mode = sys.argv[4]  # full | crash | resume
    ckpt_dir = sys.argv[5]
    n_total = int(sys.argv[6])
    n_crash = int(sys.argv[7])
    # optional global device count (test_pod8: 8-device global mesh)
    ndev = int(sys.argv[8]) if len(sys.argv) > 8 else 4

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

    import numpy as np
    import jax.numpy as jnp

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.parallel.mesh import make_mesh, shard_local_batch
    from aquaculture_tpu.parallel.sharded import sharded_train_step
    from aquaculture_tpu.train.optimizer import SGDState
    from aquaculture_tpu.train.trainer import TrainState, init_train_state
    from aquaculture_tpu.utils.checkpoint import load_params, save_params

    mesh = make_mesh(n_data=ndev, n_model=1)
    model, params = yolov5_init("n", num_classes=5, seed=0)
    cfg = TrainConfig(
        img_size=64, batch_size=ndev, max_boxes_per_image=8,
        compute_dtype="float32"
    )
    state = init_train_state(model, params)

    start_step = 0
    if mode == "resume":
        loaded = load_params(ckpt_dir)
        state = TrainState(
            params=loaded["params"],
            opt=SGDState(momentum=loaded["opt_momentum"], step=loaded["opt_step"]),
            ema=loaded["ema"],
            step=loaded["step"],
        )
        start_step = int(np.asarray(loaded["step"]))
        assert start_step == n_crash, start_step

    b, m = cfg.batch_size, cfg.max_boxes_per_image
    lo, hi = pid * (b // nproc), (pid + 1) * (b // nproc)

    with mesh:
        step_fn, sh_state = sharded_train_step(
            model, cfg, mesh, steps_per_epoch=10, state=state
        )
        for step in range(start_step, n_total):
            local = {k: v[lo:hi] for k, v in batch_for_step(step, b, m, 64).items()}
            sh_state, metrics = step_fn(sh_state, shard_local_batch(local, mesh))
            jax.block_until_ready(sh_state.params)
            done = step + 1
            if mode == "crash" and done == n_crash:
                # DP state is fully replicated: host 0's copy is complete
                if pid == 0:
                    host_state = jax.device_get(
                        {
                            "params": sh_state.params,
                            "opt_momentum": sh_state.opt.momentum,
                            "opt_step": sh_state.opt.step,
                            "ema": sh_state.ema,
                            "step": sh_state.step,
                        }
                    )
                    save_params(ckpt_dir, host_state, metadata={"step": done})
                    print(f"WORKER {pid} CHECKPOINTED step={done}", flush=True)
                # barrier so the checkpoint finishes before the "host dies"
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("ckpt_done")
                if pid == 1:
                    os._exit(1)  # simulated host failure, no cleanup
                # pid 0 keeps trying to train; it dies on the broken
                # collective (or is reaped by the test harness)

    @jax.jit
    def fingerprint(p):
        return sum(jnp.abs(x).sum() for x in jax.tree_util.tree_leaves(p))

    fp = float(np.asarray(fingerprint(sh_state.params)))
    fpe = float(np.asarray(fingerprint(sh_state.ema)))
    loss = float(np.asarray(metrics["total"]))
    print(f"WORKER {pid} OK loss={loss:.10f} fp={fp:.6f} fpe={fpe:.6f}", flush=True)


if __name__ == "__main__":
    main()
