"""Worker process for the 2-process CPU `jax.distributed` smoke test.

Run by tests/test_multihost.py as::

    python tests/multihost_worker.py <process_id> <coordinator_port>

Each process owns 2 CPU devices (4 global), joins via
`jax.distributed.initialize` — the TPU-native analog of the reference's
multi-node DDP bootstrap (base_trainer.py:20-73) — feeds its LOCAL half of
the global batch through `shard_batch` (host_local_array_to_global_array),
and runs one flagship tiny-HRNet contrast train step over the global mesh.
Prints `loss=<v> bank=<checksum>` so the parent can assert the two
controllers computed the identical global program.
"""

import os
import sys

os.environ.pop("XLA_FLAGS", None)  # conftest's 8-device flag would override

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)


def main():
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np

    from hcmoco_tpu.core.config import TrainConfig
    from hcmoco_tpu.models.build import build_model
    from hcmoco_tpu.parallel.mesh import make_mesh, shard_batch, \
        replicated_sharding
    from hcmoco_tpu.train.state import create_train_state
    from hcmoco_tpu.train.contrast_step import make_contrast_train_step
    from hcmoco_tpu.data.synthetic import synthetic_contrast_batch

    n_data = 64
    cfg = TrainConfig(
        method="Customize", modal="RGBD2S", arch="HRNet", width=4,
        mem="bank", nce_k=15, batch_size=8, epochs=2, learning_rate=0.05,
        modality_missing=True, compute_dtype="float32")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    global_batch = synthetic_contrast_batch(rng, 8, size=32, num_joints=16,
                                            n_data=n_data)
    # DistributedSampler analog: this controller materializes only its rows
    local = {k: v[pid * 4:(pid + 1) * 4] for k, v in global_batch.items()}

    mesh = make_mesh()
    rep = replicated_sharding(mesh)
    # init on-device under jit so the replicated state spans both processes
    state = jax.jit(
        lambda: create_train_state(
            cfg, model, jax.random.PRNGKey(0),
            {k: v[:1] for k, v in global_batch.items()},
            n_data=n_data, steps_per_epoch=2),
        out_shardings=rep)()
    step = make_contrast_train_step(cfg, model, steps_per_epoch=2,
                                    mesh=mesh)

    sharded = shard_batch(local, mesh)
    new_state, metrics = step(state, sharded, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    bank_sum = float(jax.numpy.sum(new_state.memory.banks))
    print(f"RESULT pid={pid} loss={loss:.6f} bank={bank_sum:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
