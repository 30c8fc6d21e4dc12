"""Worker for test_multihost.py::test_train_loop_two_process — NOT a test.

Unlike mh_worker.py (which drives the trainer directly), this runs the FULL
``train()`` loop under 2 real processes: per-host synthetic loaders, global
batch assembly via jax.make_array_from_process_local_data, process-0-gated
logging/sample-sheet/checkpoint side effects, the collective sample() path,
and a multi-host resume.

usage: python tests/mh_loop_worker.py <pid> <nproc> <port> <out_dir>
"""

import os
import sys


def main():
    pid, nproc, port, out_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nproc}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.device_count() == 8

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from councilx.config import Config
    from councilx.train.loop import train

    cfg = Config.from_dict({
        "batch_size": 4, "compute_dtype": "float32", "max_iter": 100,
        "log_iter": 1, "image_save_iter": 2, "image_display_iter": 2,
        "snapshot_save_iter": 2, "display_size": 2,
        "num_devices": 8, "council_parallel": 2,
        "council": {"council_size": 2, "council_w": 0.2},
        "focus_loss": {"focus_enabled": True},
        "gen": {"dim": 4, "mlp_dim": 8, "style_dim": 2, "n_downsample": 2,
                "n_res": 1},
        "dis": {"dim": 4, "n_layer": 2, "num_scales": 2},
        "new_size": 16, "crop_image_height": 16, "crop_image_width": 16,
        "num_workers": 2,
    })

    summary = train(cfg, output_path=out_dir, run_name="mh",
                    synthetic=True, max_steps=4)
    assert summary["step"] == 4, summary
    # multi-host resume: both processes see the shared tmpdir, the
    # start-step agreement check must pass and training continue to 6
    summary = train(cfg, output_path=out_dir, run_name="mh",
                    synthetic=True, resume=True, max_steps=2)
    assert summary["step"] == 6, summary
    print(f"proc {pid}: OK")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
