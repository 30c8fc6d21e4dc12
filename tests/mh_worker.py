"""Worker for tests/test_multihost.py — NOT a test module.

Runs as one of ``num_processes`` real OS processes, each with
``8 // num_processes`` virtual CPU devices; together they form the same
8-device ('data','council') mesh the single-process baseline uses, so the
trained parameters must match.

usage: python tests/mh_worker.py <process_id> <num_processes> <port> <out.npz> [det]

The optional 5th arg "det" turns on cfg.det_data_reduction (order-fixed
cross-'data' reductions) — the mode under which the trained parameters are
asserted BITWISE equal to the single-process run.
"""

import os
import sys


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    det = len(sys.argv) > 5 and sys.argv[5] == "det"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nproc}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 8 // nproc

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.test_train_step import synthetic_batch, tiny_config
    from councilx.ckpt.manager import fetch_state_host
    from councilx.parallel.council_shard import CouncilShardTrainer
    from councilx.parallel.mesh import make_mesh
    from councilx.parallel.multihost import (is_primary, local_batch_size,
                                             make_global_batch)

    cfg = tiny_config(batch_size=4)
    if det:
        cfg.det_data_reduction = True
    mesh = make_mesh(8, council_parallel=2)
    trainer = CouncilShardTrainer(cfg, mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))

    # the same global batch as the single-process baseline, split by process
    r = np.random.RandomState(0)
    x_a, x_b = synthetic_batch(r, b=4)
    lb = local_batch_size(4)
    sl = slice(pid * lb, (pid + 1) * lb)
    for _ in range(2):
        ga = make_global_batch(mesh, np.asarray(x_a)[sl])
        gb = make_global_batch(mesh, np.asarray(x_b)[sl])
        state, metrics = trainer.train_step(state, ga, gb)

    host = fetch_state_host(state)  # collective: all processes participate
    if is_primary():
        flat = {}

        def add(prefix, tree):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    add(f"{prefix}/{k}", v)
            else:
                flat[prefix] = np.asarray(tree)

        add("gen", host.params["a2b"]["gen"])
        add("dis", host.params["a2b"]["dis"])
        flat["loss_gen_total"] = np.asarray(metrics["loss_gen_total"])
        np.savez(out_path, **flat)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
