#!/usr/bin/env python
"""Host-gap measurement for the real training loop (VERDICT r2 item 8).

bench.py measures the bare fused step (same device batch re-fed, no data
pipeline). This tool runs the REAL loop — train/loop.py with its synthetic
loader, host->device uint8 transfer, on-device augmentation, metric logging
— at the same headline config and reports the loop-level images/sec. The
delta vs bench.py's number IS the per-step host overhead; the loop already
overlaps host work with device execution (train_step dispatch is async; the
only sync points are the log_iter metric readbacks), so a small delta means
no double-buffering is needed.

Env: LOOP_BATCH (8), LOOP_STEPS (40), LOOP_COUNCIL (4), LOOP_LOG_ITER (10),
LOOP_IN_PRECISION (config default), LOOP_PREFETCH (config default; 0/1
toggles cfg.host_prefetch to measure the double-buffering delta).
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, ".")


def main():
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()

    from councilx.config import Config
    from councilx.train.loop import train

    batch = int(os.environ.get("LOOP_BATCH", "8"))
    steps = int(os.environ.get("LOOP_STEPS", "40"))
    council = int(os.environ.get("LOOP_COUNCIL", "4"))
    log_iter = int(os.environ.get("LOOP_LOG_ITER", "10"))

    cfg = Config.from_dict({
        "batch_size": batch,
        "compute_dtype": "bfloat16",
        "log_iter": log_iter,
        "image_save_iter": 0, "image_display_iter": 0,
        # no mid-run snapshot inside the timed window
        "snapshot_save_iter": 0,
        "max_iter": steps,
        **({"in_precision": os.environ["LOOP_IN_PRECISION"]}
           if "LOOP_IN_PRECISION" in os.environ else {}),
        **({"host_prefetch": bool(int(os.environ["LOOP_PREFETCH"]))}
           if "LOOP_PREFETCH" in os.environ else {}),
        "council": {"council_size": council, "council_w": 0.2,
                    "council_start_at_iter": 0},
        "focus_loss": {"focus_enabled": True},
        "gen": {"dim": 64, "mlp_dim": 256, "style_dim": 8,
                "n_downsample": 2, "n_res": 4},
        "dis": {"dim": 64, "n_layer": 4, "num_scales": 3},
        "new_size": 270, "crop_image_height": 256, "crop_image_width": 256,
    })
    out_dir = tempfile.mkdtemp(prefix="loop_bench_")
    res = train(cfg, output_path=out_dir, run_name="bench",
                synthetic=True, max_steps=steps)
    print(json.dumps({
        "metric": "loop_images_per_sec",
        "value": round(res["images_per_sec"], 3),
        "batch": batch, "council": council, "steps": steps,
        "note": ("last log_iter-window throughput of the REAL loop incl. "
                 "data pipeline; compare with bench.py's bare-step number "
                 "— the delta is the host-side gap"),
    }))


if __name__ == "__main__":
    main()
