#!/usr/bin/env python
"""Serving-engine load test: closed-loop clients against the micro-batching
BatchingEngine on the real chip — throughput AND latency percentiles, the
two numbers a production deployment is sized by (bench_infer.py measures
the raw batched-translate ceiling; this measures what the dynamic-batching
serving path delivers against it).

C concurrent closed-loop clients each submit one image and wait for it,
repeatedly, for SERVE_SECONDS. The engine coalesces whatever lands in the
max_delay window into padded bucket batches. Pipeline on/off variants run
interleaved in ONE process (run-to-run drift through the tunnel is ~2x;
interleaving is the only honest A/B — CLAUDE.md).

Env: SERVE_SIZE (256), SERVE_MAX_BATCH (64), SERVE_DELAY_MS (5),
SERVE_CLIENTS ("1,8,32,64"), SERVE_SECONDS (12), SERVE_PIPELINE ("1,0"),
SERVE_WIRE ("u8,f32"), SERVE_BF16_PARAMS (1).

One JSON line per (pipeline, clients) point.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, ".")


def flagship_cfg(size):
    from councilx.config import Config
    return Config.from_dict({
        "batch_size": 1, "compute_dtype": "bfloat16",
        "council": {"council_size": 4, "council_w": 0.2},
        "focus_loss": {"focus_enabled": True},
        "gen": {"dim": 64, "mlp_dim": 256, "style_dim": 8,
                "n_downsample": 2, "n_res": 4},
        "dis": {"dim": 64, "n_layer": 4, "num_scales": 3},
        "new_size": size + 14, "crop_image_height": size,
        "crop_image_width": size,
    })


def run_point(engine, clients, seconds, xs):
    """Closed-loop load: `clients` threads, each submit->wait->repeat."""
    lat = []
    lat_lock = threading.Lock()
    stop = threading.Event()
    done = [0]

    def client(i):
        k = 0
        while not stop.is_set():
            t0 = time.perf_counter()
            engine.translate_sync(xs[(i + k) % len(xs)], seed=i * 1000 + k)
            dt = time.perf_counter() - t0
            with lat_lock:
                lat.append(dt)
                done[0] += 1
            k += 1

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    wall = time.perf_counter() - t0
    lat_ms = sorted(v * 1e3 for v in lat)

    def pct(p):
        return round(lat_ms[min(len(lat_ms) - 1,
                                int(p / 100 * len(lat_ms)))], 1)

    return {
        "images_per_sec": round(done[0] / wall, 1),
        "p50_ms": pct(50), "p95_ms": pct(95), "p99_ms": pct(99),
        "requests": done[0],
    }


def main():
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()

    import jax
    import numpy as np

    from councilx.inference.server import BatchingEngine
    from councilx.inference.translate import Translator

    size = int(os.environ.get("SERVE_SIZE", "256"))
    max_batch = int(os.environ.get("SERVE_MAX_BATCH", "64"))
    delay_ms = float(os.environ.get("SERVE_DELAY_MS", "5"))
    clients_list = [int(c) for c in
                    os.environ.get("SERVE_CLIENTS", "1,8,32,64").split(",")]
    seconds = float(os.environ.get("SERVE_SECONDS", "12"))
    pipelines = [bool(int(p)) for p in
                 os.environ.get("SERVE_PIPELINE", "1,0").split(",")]
    wires = os.environ.get("SERVE_WIRE", "u8,f32").split(",")
    bf16_params = bool(int(os.environ.get("SERVE_BF16_PARAMS", "1")))

    cfg = flagship_cfg(size)
    tr = Translator(cfg)
    dummy = np.zeros((1, size, size, 3), np.float32)
    params = tr.gen.init(jax.random.PRNGKey(0), dummy)["params"]
    if bf16_params:
        import jax.numpy as jnp
        params = jax.tree_util.tree_map(
            lambda l: l.astype(jnp.bfloat16)
            if l.dtype == jnp.float32 else l, params)

    r = np.random.RandomState(0)
    xs = {
        "f32": [r.uniform(-1, 1, (size, size, 3)).astype(np.float32)
                for _ in range(8)],
    }
    xs["u8"] = [((x + 1.0) * 127.5).astype(np.uint8) for x in xs["f32"]]

    engines = {}
    for wire in sorted(set(wires)):
        for pipe in sorted(set(pipelines)):
            e = BatchingEngine(tr, params, image_hw=(size, size),
                               max_batch=max_batch, max_delay_ms=delay_ms,
                               pipeline=pipe, wire_format=wire)
            e.start()
            engines[(wire, pipe)] = e
    # engines share one Translator -> each wire's buckets compile once
    t0 = time.perf_counter()
    warmed = set()
    for (wire, _), e in sorted(engines.items()):
        if wire not in warmed:
            e.warmup()
            warmed.add(wire)
    print(f"# warmup ({len(warmed)} wire formats x "
          f"{len(next(iter(engines.values())).buckets)} buckets): "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    # interleave wire/pipeline variants at each client count (A/B honesty)
    for clients in clients_list:
        for wire in wires:
            for pipe in pipelines:
                e = engines[(wire, pipe)]
                res = run_point(e, clients, seconds, xs[wire])
                snap = e.snapshot_stats()
                print(json.dumps({
                    "metric": "serve_images_per_sec",
                    "wire": wire, "pipeline": pipe, "clients": clients,
                    "size": size, "max_batch": max_batch,
                    "delay_ms": delay_ms,
                    **res,
                    "batch_hist_cum": snap["batch_size_histogram"],
                }), flush=True)
    for e in engines.values():
        e.stop()


if __name__ == "__main__":
    main()
