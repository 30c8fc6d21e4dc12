"""Batched translation server — production serving for a trained council
member (the serving-scale counterpart of the reference's interactive
test_gui.py / per-image test_on_folder.py; SURVEY.md §3.4/§3.5).

    councilx-serve --config configs/male2female_council_folder.yaml \
        --checkpoint outputs/run/checkpoints --member 0 [--port 8766] \
        [--max_batch 64] [--max_delay_ms 5] [--data_parallel N]

Concurrent POSTs are coalesced by councilx.inference.server.BatchingEngine
into padded static-shape batches (power-of-two bucket ladder, all compiled
at startup), run through the on-device uint8 translate path, and returned
as JPEG. Endpoints:

    POST /translate[?seed=N][&quality=Q][&z=f1,f2,...]
                                           image bytes in, JPEG out; z is
                                           an explicit style code (from
                                           /encode_style) — style-guided
                                           serving, the CLI --style_image
    POST /encode_style                     style image bytes in, its style
                                           code out as JSON {"z": [...]}
    GET  /healthz                          liveness + config summary
    GET  /stats                            batching/latency counters
"""

import argparse
import io
import json
import os
import urllib.parse

from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer



def preprocess_bytes(data: bytes, new_size: int, crop: int):
    """Image bytes -> (crop, crop, 3) uint8 — the exact CLI preprocessing
    (councilx.data.dataset.resize_crop_image: shorter-side bilinear resize
    + center crop, PIL path). Pixels stay uint8: the engine's wire format
    ships them raw and the device applies the same (x - 127.5) / 127.5
    normalize the CLI uses (4x less H2D than normalizing host-side)."""
    from PIL import Image

    from councilx.data.dataset import resize_crop_image

    return resize_crop_image(Image.open(io.BytesIO(data)), new_size, crop)


def build_engine(cfg, checkpoint: str, member, direction: str,
                 max_batch: int, max_delay_ms: float, data_parallel: int,
                 warmup: bool = True, calibration: str = None,
                 member_parallel: int = 0):
    import jax
    from councilx.inference.server import BatchingEngine
    from councilx.inference.translate import (MemberShardedTranslator,
                                              ShardedTranslator, Translator)
    from councilx.ckpt.manager import load_generator_params

    quant_stats = None
    if calibration:
        from councilx.ckpt.manager import load_params_npz
        quant_stats = load_params_npz(calibration)
    all_members = member == "all"
    if all_members and quant_stats is not None:
        raise SystemExit(
            "--member all cannot use --calibration: the activation scales "
            "are calibrated per member (tools/calibrate_quant.py --member); "
            "quantized ensemble serving would silently clip the other "
            "members' activations")
    if member_parallel > 1 and not all_members:
        raise SystemExit("--member_parallel shards the council axis — it "
                         "requires --member all")
    if member_parallel > 1 or (data_parallel > 1 and all_members):
        # ensemble serving shards the MEMBER axis (GSPMD cannot split the
        # vmapped council axis; shard_map path, see MemberShardedTranslator)
        # — council-8 at per-chip memory of council/shards members. With
        # BOTH flags the mesh is 2-D ('data','council'): batch shards too
        # (data_parallel * member_parallel devices, pod-scale serving).
        from councilx.parallel.mesh import make_member_mesh
        shards = member_parallel if member_parallel > 1 else data_parallel
        dp = data_parallel if member_parallel > 1 else 1
        if cfg.council.council_size % shards:
            raise SystemExit(
                f"member shards {shards} must divide "
                f"council_size {cfg.council.council_size}")
        translator = MemberShardedTranslator(
            cfg, make_member_mesh(shards, data_parallel=max(1, dp)))
    elif data_parallel > 1:
        from councilx.parallel.mesh import make_mesh
        translator = ShardedTranslator(cfg, make_mesh(data_parallel),
                                       quant_stats=quant_stats)
    else:
        translator = Translator(cfg, quant_stats=quant_stats)
    stacked = load_generator_params(checkpoint, cfg, direction)
    params = (stacked if all_members else
              jax.tree_util.tree_map(lambda l: l[int(member)], stacked))
    crop = cfg.data.crop_image_height
    engine = BatchingEngine(translator, params, image_hw=(crop, crop),
                            max_batch=max_batch, max_delay_ms=max_delay_ms,
                            all_members=all_members)
    engine.start()
    if warmup:
        engine.warmup()
    return engine


def make_handler(engine, cfg):
    import numpy as np
    from PIL import Image

    new_size = cfg.data.new_size
    crop = cfg.data.crop_image_height

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):      # quiet access log
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urllib.parse.urlparse(self.path).path
            if path == "/healthz":
                self._json({"ok": True, "serving_hw": list(engine.image_hw),
                            "buckets": engine.buckets,
                            "wire_format": engine.wire_format,
                            "members": engine.n_members,
                            "max_delay_ms": engine.max_delay_s * 1e3})
            elif path == "/stats":
                self._json(engine.snapshot_stats())
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path not in ("/translate", "/encode_style"):
                self._json({"error": "not found"}, 404)
                return
            q = urllib.parse.parse_qs(parsed.query)
            try:
                seed = int(q.get("seed", ["0"])[0])
                quality = int(q.get("quality", ["95"])[0])
            except ValueError:
                self._json({"error": "seed/quality must be integers"}, 400)
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                self._json({"error": "bad Content-Length header"}, 400)
                return
            if length <= 0:
                self._json({"error": "empty body"}, 400)
                return
            data = self.rfile.read(length)
            try:
                x = preprocess_bytes(data, new_size, crop)
            except Exception as e:
                self._json({"error": f"bad image: {e}"}, 400)
                return
            if parsed.path == "/encode_style":
                # style-guided serving step 1: image -> style code; pass it
                # back as /translate?z=f1,f2,... (the CLI's --style_image)
                try:
                    zv = engine.encode_style(x)
                except Exception as e:
                    self._json({"error": f"encode failed: {e}"}, 500)
                    return
                self._json({"z": [float(v) for v in zv]})
                return
            z = None
            if "z" in q:
                try:
                    z = np.asarray([float(v) for v in
                                    q["z"][0].split(",")], np.float32)
                except ValueError:
                    self._json({"error": "z must be comma-separated "
                                         "floats"}, 400)
                    return
                if z.shape != (engine.style_dim,):
                    self._json({"error": f"z needs {engine.style_dim} "
                                         f"values, got {z.size}"}, 400)
                    return
            try:
                # generous timeout: with --no_warmup the first request per
                # bucket pays a jit compile (minutes through a TPU tunnel)
                out = engine.translate_sync(x, z=z, seed=seed, timeout=1200)
            except Exception as e:
                self._json({"error": f"translate failed: {e}"}, 500)
                return
            out = np.asarray(out)
            if engine.all_members:      # (N,H,W,3) -> horizontal strip
                out = np.concatenate(list(out), axis=1)
            buf = io.BytesIO()
            Image.fromarray(out).save(buf, format="JPEG", quality=quality)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Members", str(engine.n_members))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main():
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()
    from councilx.config import load_config

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--member", default="0",
                   help="member index, or 'all' for council-ensemble "
                        "serving (every member's translation per request, "
                        "returned as a horizontal JPEG strip)")
    p.add_argument("--direction", default="a2b", choices=["a2b", "b2a"])
    p.add_argument("--port", type=int, default=8766)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--max_delay_ms", type=float, default=5.0)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard serving over this many devices: the BATCH "
                        "axis for a single member, the MEMBER axis with "
                        "--member all (must divide council_size)")
    p.add_argument("--member_parallel", type=int, default=0,
                   help="with --member all: shard the council axis over "
                        "this many devices explicitly; combine with "
                        "--data_parallel D for a 2-D (D x K) mesh that "
                        "shards the batch too (D*K devices)")
    p.add_argument("--no_warmup", action="store_true")
    p.add_argument("--quant", default=None,
                   choices=["none", "w8a8", "w8a8_static"],
                   help="override cfg.quant: W8A8 int8 generator convs. "
                        "w8a8_static (+--calibration) is the fast mode "
                        "(1.03-1.06x over bf16, BASELINE.md)")
    p.add_argument("--calibration", default=None,
                   help="quant_stats .npz from tools/calibrate_quant.py "
                        "(required for --quant w8a8_static)")
    args = p.parse_args()

    cfg = load_config(args.config)
    if args.quant is not None:
        cfg.quant = args.quant
    engine = build_engine(cfg, args.checkpoint, args.member, args.direction,
                          args.max_batch, args.max_delay_ms,
                          args.data_parallel, warmup=not args.no_warmup,
                          calibration=args.calibration,
                          member_parallel=args.member_parallel)
    server = ThreadingHTTPServer(("0.0.0.0", args.port),
                                 make_handler(engine, cfg))

    # graceful drain on SIGTERM (systemd/k8s stop): stop accepting, let
    # in-flight requests finish, flush the engine, exit 0. shutdown() must
    # run on another thread — it blocks until serve_forever (on THIS
    # thread) returns.
    import signal
    import threading

    def _drain(signum, frame):
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)

    print(f"serving member {args.member} on http://localhost:{args.port} "
          f"(buckets {engine.buckets}, delay {args.max_delay_ms} ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.stop()
        print("drained; exiting", flush=True)


if __name__ == "__main__":
    main()
