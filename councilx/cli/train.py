"""Training CLI, argument-compatible with the reference train.py:

    councilx-train --config configs/male2female_council_folder.yaml \
        [--output_path outputs] [--resume] [--trainer council]

Extra flags (TPU build): --synthetic (no dataset needed), --max_steps,
--seed, --profile. (From a source checkout: ``python train.py ...``.)
"""

import argparse
import os

from councilx.config import load_config
from councilx.train.loop import train
from councilx.utils.platform import apply_env_platform


def main():
    apply_env_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True, help="yaml config path")
    p.add_argument("--output_path", default="outputs")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--trainer", default="council",
                   help="kept for reference CLI compatibility")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (smoke runs)")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of steps 10-15")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax NaN checking (SURVEY.md §5.2; slow — "
                        "debugging only)")
    # multi-host (SURVEY.md §5.8): run one process per host, all with the
    # same command + these three flags (or the COUNCILX_COORDINATOR /
    # COUNCILX_NUM_PROCESSES / COUNCILX_PROCESS_ID env vars)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (multi-host runs)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args()

    from councilx.parallel.multihost import maybe_init_distributed
    maybe_init_distributed(args.coordinator, args.num_processes,
                           args.process_id)

    if args.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)

    cfg = load_config(args.config)
    run_name = os.path.splitext(os.path.basename(args.config))[0]

    # graceful shutdown: SIGTERM/SIGINT finish the current step, write a
    # final checkpoint and exit 0 (the run is then --resume-able as a
    # bitwise continuation). A second signal falls back to the default
    # handler (hard kill). Single-process only: train() would ignore the
    # event under multi-host (a per-process early exit desynchronizes the
    # collectives), so don't install handlers there — the default
    # SIGINT/SIGTERM behavior stays intact instead of printing a promise
    # the loop won't keep.
    import threading
    stop_event = threading.Event()
    import jax
    if jax.process_count() == 1:
        import signal

        def _request_stop(signum, frame):
            # set the event FIRST — print() can raise a reentrant-IO
            # RuntimeError inside a handler if the signal lands mid-write,
            # and the shutdown request must already be recorded by then
            stop_event.set()
            signal.signal(signum, signal.SIG_DFL)
            print(f"signal {signum}: finishing the current step and "
                  "checkpointing (repeat to force-kill)", flush=True)

        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, _request_stop)

    summary = train(cfg, output_path=args.output_path, run_name=run_name,
                    resume=args.resume, synthetic=args.synthetic,
                    max_steps=args.max_steps, seed=args.seed,
                    profile_steps=range(10, 15) if args.profile else None,
                    stop_event=stop_event)
    print(summary)


if __name__ == "__main__":
    main()
