"""Worker process for the 2-process ``jax.distributed`` smoke test.

Not a test module — spawned by tests/test_distributed.py. Each worker:

1. initializes the JAX distributed runtime against a shared coordinator
   (real process boundaries, DCN-style init — not simulated indices),
2. builds the sharded input pipeline with the DEFAULT process sharding
   (``jax.process_index()``/``count()`` resolved from the runtime),
3. assembles a global data-parallel batch across processes and runs ONE
   train step over the global ('data', 'spatial') mesh — the gradient
   all-reduce crosses the process boundary,
4. prints machine-checkable lines the parent asserts on.

Usage: python distributed_worker.py PORT PROC_ID NPROCS IMG_DIR SEG_DIR
"""

import sys


def main():
    port, pid, nproc, img_dir, seg_dir = sys.argv[1:6]
    pid, nproc = int(pid), int(nproc)

    import jax

    # the ambient axon plugin ignores JAX_PLATFORMS (sitecustomize imports
    # jax first) — force CPU through the config like tests/conftest.py
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert jax.process_index() == pid

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils as mhu

    from tpureg.data import volume2slices_datasets
    from tpureg.parallel import make_mesh
    from tpureg.reg import OpticalFlowReg
    from tpureg.train import create_train_state, make_train_step

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    print(f"WORKER {pid} local_devices={n_local} global_devices={n_global}",
          flush=True)

    # --- sharded input pipeline with runtime-resolved process indices
    train, _, _, train_len, _ = volume2slices_datasets(
        img_dir, seg_dir, batch_size=4, with_seg=False
    )
    vols = [it["image"] for it in train.source.items]
    print(f"WORKER {pid} train_len={train_len} vols={sorted(vols)}",
          flush=True)
    imgs = np.asarray(next(iter(train))["image_c"])  # local (4, 256, 256, 2)
    imgs = imgs[:, ::4, ::4, :]                    # 64² keeps compile cheap

    # --- global DP mesh spanning both processes
    mesh = make_mesh()
    global_batch = mhu.host_local_array_to_global_array(imgs, mesh,
                                                        P(("data",)))

    model = OpticalFlowReg(conv_predictor="flownets")
    state = create_train_state(model, jax.random.key(0), imgs)
    # replicate the (identically-initialized) state across processes
    state = jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), NamedSharding(mesh, P())),
        state,
    )

    step = make_train_step(donate=False)
    state, metrics = step(state, global_batch)
    loss = float(metrics["loss"])                  # replicated → fetchable
    assert np.isfinite(loss)
    print(f"WORKER {pid} loss={loss:.6f}", flush=True)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
