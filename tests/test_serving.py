"""Serving engine + HTTP server tests (round 3).

The BatchingEngine coalesces concurrent requests into padded static-shape
bucket batches; these tests pin down:
  * bucket-1 exactness vs the direct translate_u8 path
  * coalescing actually batches (fewer device calls than requests) without
    changing results beyond float reassociation (uint8 diff <= 1)
  * tail padding to the next bucket
  * mesh-constrained bucket ladders for sharded serving
  * the serve.py HTTP surface end-to-end (subprocess, like test_gui.py)
"""

import http.client
import io
import json
import os
import socket
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

import jax

from test_train_step import tiny_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_translator_params(cfg):
    from councilx.inference.translate import Translator

    tr = Translator(cfg)
    dummy = np.zeros((1, 32, 32, 3), np.float32)
    stacked = jax.vmap(tr.gen.init, in_axes=(0, None))(
        jax.random.split(jax.random.PRNGKey(0), 2), dummy)["params"]
    params = jax.tree_util.tree_map(lambda l: l[0], stacked)
    return tr, params, stacked


@pytest.fixture(scope="module")
def engine_setup():
    from councilx.inference.server import BatchingEngine

    cfg = tiny_config()
    tr, params, _ = _make_translator_params(cfg)
    engine = BatchingEngine(tr, params, image_hw=(32, 32), max_batch=8,
                            max_delay_ms=100.0, wire_format="f32")
    engine.start()
    yield engine, tr, params
    engine.stop()


@pytest.fixture(scope="module")
def u8_engine_setup():
    from councilx.inference.server import BatchingEngine

    cfg = tiny_config()
    tr, params, _ = _make_translator_params(cfg)
    engine = BatchingEngine(tr, params, image_hw=(32, 32), max_batch=8,
                            max_delay_ms=100.0)   # default wire: u8
    engine.start()
    yield engine, tr, params
    engine.stop()


@pytest.mark.smoke
class TestBucketLadder:
    def test_plain(self):
        from councilx.inference.server import _bucket_ladder
        assert _bucket_ladder(64, 1) == [1, 2, 4, 8, 16, 32, 64]

    def test_mesh_multiple(self):
        from councilx.inference.server import _bucket_ladder
        assert _bucket_ladder(64, 4) == [4, 8, 16, 32, 64]

    def test_non_pow2_cap(self):
        from councilx.inference.server import _bucket_ladder
        assert _bucket_ladder(48, 1) == [1, 2, 4, 8, 16, 32, 48]


class TestBatchingEngine:
    @pytest.mark.smoke  # the tier's one serving-engine test
    def test_single_request_exact(self, engine_setup, rng):
        """An idle engine serves a lone request at bucket 1 — output must be
        bit-identical to the direct batch-1 translate_u8 path."""
        engine, tr, params = engine_setup
        x = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
        z = engine.make_z(7)
        got = engine.translate_sync(x, z=z)
        want = tr.translate_u8(params, x[None], z=z[None])[0]
        np.testing.assert_array_equal(got, want)

    def test_concurrent_requests_coalesce(self, engine_setup, rng):
        """8 concurrent submits inside the 100 ms window must land in fewer
        device batches than requests, and each result must match the direct
        batch-1 output within one uint8 step (batched-vs-single float
        reassociation only)."""
        engine, tr, params = engine_setup
        b0 = engine.stats.batches
        xs = [rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
              for _ in range(8)]
        zs = [engine.make_z(i) for i in range(8)]
        futs = [None] * 8

        def post(i):
            futs[i] = engine.submit(xs[i], z=zs[i])

        threads = [threading.Thread(target=post, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        outs = [f.result(timeout=120) for f in futs]
        assert engine.stats.batches - b0 < 8
        for x, z, got in zip(xs, zs, outs):
            want = tr.translate_u8(params, x[None], z=z[None])[0]
            diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
            assert diff.max() <= 1

    def test_tail_padding(self, engine_setup, rng):
        """3 coalesced requests pad to bucket 4 and still return 3 valid
        results."""
        engine, _, _ = engine_setup
        p0 = engine.stats.padded_rows
        xs = [rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
              for _ in range(3)]
        futs = [None] * 3

        def post(i):
            futs[i] = engine.submit(xs[i], seed=i)

        threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        outs = [f.result(timeout=120) for f in futs]
        assert all(o.shape == (32, 32, 3) and o.dtype == np.uint8
                   for o in outs)
        # either they coalesced (padded to 4) or served singly (bucket 1,
        # no padding); both are legal — but any multi-request batch pads
        if engine.stats.padded_rows > p0:
            assert engine.stats.padded_rows - p0 in (1, 2)

    def test_bad_shape_rejected(self, engine_setup):
        engine, _, _ = engine_setup
        with pytest.raises(ValueError, match="serving shape"):
            engine.submit(np.zeros((16, 16, 3), np.float32))

    def test_make_z_reproducible(self, engine_setup):
        engine, _, _ = engine_setup
        np.testing.assert_array_equal(engine.make_z(42), engine.make_z(42))
        assert not np.array_equal(engine.make_z(42), engine.make_z(43))

    def test_stats_snapshot_keys(self, engine_setup):
        engine, _, _ = engine_setup
        snap = engine.snapshot_stats()
        for k in ("requests", "batches", "images_done", "padded_rows",
                  "mean_latency_ms", "batch_size_histogram"):
            assert k in snap


class TestU8Wire:
    def test_single_request_exact_vs_u8io(self, u8_engine_setup, rng):
        """uint8-wire engine output must be bit-identical to the direct
        translate_u8io path (device-side normalize, same formula)."""
        engine, tr, params = u8_engine_setup
        x = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
        z = engine.make_z(11)
        got = engine.translate_sync(x, z=z)
        want = tr.translate_u8io(params, x[None], z=z[None])[0]
        np.testing.assert_array_equal(got, want)

    def test_u8io_matches_f32_wire_bitwise(self, u8_engine_setup, rng):
        """Device-side normalize must reproduce the host normalize exactly:
        translate_u8io(u8) == translate_u8((u8 - 127.5) / 127.5)."""
        _, tr, params = u8_engine_setup
        x_u8 = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
        x_f32 = (x_u8.astype(np.float32) - 127.5) / 127.5
        z = np.zeros((2, tr.cfg.gen.style_dim), np.float32)
        np.testing.assert_array_equal(
            tr.translate_u8io(params, x_u8, z=z),
            tr.translate_u8(params, x_f32, z=z))

    def test_f32_input_rejected_on_u8_wire(self, u8_engine_setup):
        engine, _, _ = u8_engine_setup
        with pytest.raises(ValueError, match="wire format"):
            engine.submit(np.zeros((32, 32, 3), np.float32))

    def test_nonpipelined_engine_serves(self, rng):
        """pipeline=False (single-thread synchronous cycle) end-to-end."""
        from councilx.inference.server import BatchingEngine

        cfg = tiny_config()
        tr, params, _ = _make_translator_params(cfg)
        engine = BatchingEngine(tr, params, image_hw=(32, 32), max_batch=4,
                                max_delay_ms=1.0, pipeline=False)
        engine.start()
        try:
            x = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
            z = engine.make_z(3)
            got = engine.translate_sync(x, z=z)
            want = tr.translate_u8io(params, x[None], z=z[None])[0]
            np.testing.assert_array_equal(got, want)
        finally:
            engine.stop()


class TestAllMembersEngine:
    def test_ensemble_serving_exact(self, rng):
        """all_members=True resolves each request to every member's
        translation (N,H,W,3), bit-identical to the direct vmapped call."""
        from councilx.inference.server import BatchingEngine

        cfg = tiny_config()
        tr, _, stacked = _make_translator_params(cfg)
        engine = BatchingEngine(tr, stacked, image_hw=(32, 32), max_batch=4,
                                max_delay_ms=1.0, all_members=True)
        engine.start()
        try:
            assert engine.n_members == 2
            x = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
            z = engine.make_z(5)
            got = engine.translate_sync(x, z=z)
            assert got.shape == (2, 32, 32, 3) and got.dtype == np.uint8
            want = np.asarray(tr.translate_all_u8io_device(
                stacked, x[None], z[None]))[:, 0]
            np.testing.assert_array_equal(got, want)
            with pytest.raises(ValueError, match="per-member"):
                engine.encode_style(x)
        finally:
            engine.stop()

    def test_ensemble_members_differ(self, rng):
        """Distinct members produce distinct translations of one input
        (they are independently initialized)."""
        from councilx.inference.server import BatchingEngine

        cfg = tiny_config()
        tr, _, stacked = _make_translator_params(cfg)
        engine = BatchingEngine(tr, stacked, image_hw=(32, 32), max_batch=2,
                                max_delay_ms=1.0, all_members=True)
        engine.start()
        try:
            x = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
            out = engine.translate_sync(x, seed=1)
            assert not np.array_equal(out[0], out[1])
        finally:
            engine.stop()

    def test_all_members_rejects_mesh(self, rng):
        from jax.sharding import Mesh
        from councilx.inference.server import BatchingEngine
        from councilx.inference.translate import ShardedTranslator

        cfg = tiny_config()
        _, _, stacked = _make_translator_params(cfg)
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        tr = ShardedTranslator(cfg, mesh)
        with pytest.raises(ValueError, match="data-parallel mesh"):
            BatchingEngine(tr, stacked, image_hw=(32, 32), max_batch=4,
                           all_members=True)


class TestMemberShardedEngine:
    """Council-ensemble serving with the MEMBER axis sharded over a
    ('council',) mesh — shard_map, no collectives, bitwise equal to the
    single-device vmapped all-members path."""

    @staticmethod
    def _stacked4(cfg):
        from councilx.inference.translate import Translator

        tr = Translator(cfg)
        dummy = np.zeros((1, 32, 32, 3), np.float32)
        stacked = jax.vmap(tr.gen.init, in_axes=(0, None))(
            jax.random.split(jax.random.PRNGKey(0), 4), dummy)["params"]
        return tr, stacked

    def test_translator_matches_single_device(self, rng):
        from councilx.inference.translate import MemberShardedTranslator
        from councilx.parallel.mesh import make_member_mesh

        cfg = tiny_config(council={"council_size": 4, "council_w": 0.2})
        tr1, stacked = self._stacked4(cfg)
        x = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
        z = rng.randn(2, cfg.gen.style_dim).astype(np.float32)
        want = np.asarray(tr1.translate_all_u8io_device(stacked, x, z))
        for k in (2, 4):
            trm = MemberShardedTranslator(cfg, make_member_mesh(k))
            placed = trm.place_params(stacked)
            got = np.asarray(trm.translate_all_u8io_device(placed, x, z))
            np.testing.assert_array_equal(got, want)

    def test_translator_f32_all_members_path(self, rng):
        from councilx.inference.translate import MemberShardedTranslator
        from councilx.parallel.mesh import make_member_mesh

        cfg = tiny_config(council={"council_size": 4, "council_w": 0.2})
        tr1, stacked = self._stacked4(cfg)
        x = np.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), np.float32)
        z = rng.randn(4, 2, cfg.gen.style_dim).astype(np.float32)
        want = jax.device_get(tr1.translate_all_members(stacked, x, z=z))
        trm = MemberShardedTranslator(cfg, make_member_mesh(2))
        got = jax.device_get(
            trm.translate_all_members(trm.place_params(stacked), x, z=z))
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_engine_member_sharded_ensemble(self, rng):
        from councilx.inference.server import BatchingEngine
        from councilx.inference.translate import MemberShardedTranslator
        from councilx.parallel.mesh import make_member_mesh

        cfg = tiny_config(council={"council_size": 4, "council_w": 0.2})
        tr1, stacked = self._stacked4(cfg)
        trm = MemberShardedTranslator(cfg, make_member_mesh(2))
        engine = BatchingEngine(trm, stacked, image_hw=(32, 32),
                                max_batch=4, max_delay_ms=1.0,
                                all_members=True)
        engine.start()
        try:
            assert engine.n_members == 4
            assert engine.buckets == [1, 2, 4]   # member mesh: multiple=1
            x = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
            z = engine.make_z(9)
            got = engine.translate_sync(x, z=z)
            assert got.shape == (4, 32, 32, 3) and got.dtype == np.uint8
            want = np.asarray(tr1.translate_all_u8io_device(
                stacked, x[None], z[None]))[:, 0]
            np.testing.assert_array_equal(got, want)
        finally:
            engine.stop()

    def test_validation(self):
        from councilx.inference.server import BatchingEngine
        from councilx.inference.translate import MemberShardedTranslator
        from councilx.parallel.mesh import make_member_mesh, make_mesh

        cfg = tiny_config(council={"council_size": 4, "council_w": 0.2})
        _, stacked = self._stacked4(cfg)
        # mesh size must divide council_size
        with pytest.raises(ValueError, match="not divisible"):
            MemberShardedTranslator(cfg, make_member_mesh(3))
        # member mesh must be the ('council',) axis
        with pytest.raises(ValueError, match="council"):
            MemberShardedTranslator(cfg, make_mesh(2))
        # quantized ensemble serving is rejected (per-member scales)
        with pytest.raises(ValueError, match="per member"):
            MemberShardedTranslator(cfg, make_member_mesh(2),
                                    quant_stats={"x": np.ones(1)})
        # single-member engine refuses a member mesh
        trm = MemberShardedTranslator(cfg, make_member_mesh(2))
        with pytest.raises(ValueError, match="all_members=True"):
            BatchingEngine(trm, stacked, image_hw=(32, 32), max_batch=4)


class TestShardedEngine:
    def test_mesh_bucket_ladder_and_serve(self, rng):
        """Engine over a 4-device data mesh: buckets are multiples of 4 and
        a lone request pads to the smallest shardable bucket."""
        from councilx.inference.server import BatchingEngine
        from councilx.inference.translate import ShardedTranslator
        from councilx.parallel.mesh import make_mesh

        cfg = tiny_config()
        _, params, _ = _make_translator_params(cfg)
        tr = ShardedTranslator(cfg, make_mesh(4))
        engine = BatchingEngine(tr, params, image_hw=(32, 32), max_batch=8,
                                max_delay_ms=1.0)
        engine.start()
        try:
            assert engine.buckets == [4, 8]
            x = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
            out = engine.translate_sync(x, seed=0)
            assert out.shape == (32, 32, 3) and out.dtype == np.uint8
            assert engine.stats.padded_rows >= 3
        finally:
            engine.stop()

    def test_max_batch_must_divide(self):
        from councilx.inference.server import BatchingEngine
        from councilx.inference.translate import ShardedTranslator
        from councilx.parallel.mesh import make_mesh

        cfg = tiny_config()
        _, params, _ = _make_translator_params(cfg)
        tr = ShardedTranslator(cfg, make_mesh(4))
        with pytest.raises(ValueError, match="multiple"):
            BatchingEngine(tr, params, image_hw=(32, 32), max_batch=6)


# ---------------------------------------------------------------------------
# serve.py HTTP surface
# ---------------------------------------------------------------------------

SERVE_YAML = """
batch_size: 1
compute_dtype: float32
new_size: 20
crop_image_height: 16
crop_image_width: 16
gen: {dim: 8, mlp_dim: 16, style_dim: 3, n_downsample: 2, n_res: 1}
dis: {dim: 8, n_layer: 2, num_scales: 1}
council: {council_size: 2, council_w: 0.2}
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def serve_server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    cfg_path = tmp / "tiny.yaml"
    cfg_path.write_text(SERVE_YAML)

    from councilx.ckpt.manager import save_params_npz
    from councilx.config import load_config
    from councilx.inference.translate import Translator

    cfg = load_config(str(cfg_path))
    tr = Translator(cfg)
    dummy = np.zeros((1, 16, 16, 3), np.float32)
    params = jax.vmap(tr.gen.init, in_axes=(0, None))(
        jax.random.split(jax.random.PRNGKey(0), 2), dummy)["params"]
    ckpt = tmp / "gen.npz"
    save_params_npz(str(ckpt), params)

    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "--config", str(cfg_path), "--checkpoint", str(ckpt),
         "--member", "0", "--port", str(port), "--max_batch", "4",
         "--max_delay_ms", "2"],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    deadline = time.time() + 180
    last_err = None
    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode(errors="replace")
            raise RuntimeError(f"serve.py exited early:\n{out}")
        try:
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            c.request("GET", "/healthz")
            c.getresponse().read()
            c.close()
            break
        except OSError as e:
            last_err = e
            time.sleep(0.5)
    else:
        proc.terminate()
        raise RuntimeError(f"serve.py never came up: {last_err}")

    yield port
    # terminate() is SIGTERM: serve.py must drain (finish in-flight
    # requests, stop the engine) and exit 0, not die mid-request
    proc.terminate()
    proc.wait(timeout=30)
    assert proc.returncode == 0, \
        proc.stdout.read().decode(errors="replace")[-2000:]


def _get(port, path, timeout=300):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    c.request("GET", path)
    resp = c.getresponse()
    body = resp.read()
    c.close()
    return resp.status, resp.getheader("Content-Type"), body


def _post(port, path, body, timeout=300):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    c.request("POST", path, body=body)
    resp = c.getresponse()
    out = resp.read()
    c.close()
    return resp.status, resp.getheader("Content-Type"), out


def _jpeg_bytes(hw=24):
    from PIL import Image
    r = np.random.RandomState(3)
    buf = io.BytesIO()
    Image.fromarray(r.randint(0, 255, (hw, hw, 3), np.uint8)).save(
        buf, format="JPEG")
    return buf.getvalue()


class TestServeHTTP:
    def test_healthz(self, serve_server):
        status, _, body = _get(serve_server, "/healthz")
        meta = json.loads(body)
        assert status == 200 and meta["ok"]
        assert meta["serving_hw"] == [16, 16]
        assert meta["buckets"] == [1, 2, 4]

    def test_translate_roundtrip(self, serve_server):
        status, ctype, body = _post(serve_server, "/translate?seed=5",
                                    _jpeg_bytes())
        assert status == 200 and ctype == "image/jpeg"
        from PIL import Image
        img = Image.open(io.BytesIO(body))
        assert img.size == (16, 16)

    def test_translate_deterministic_per_seed(self, serve_server):
        raw = _jpeg_bytes()
        _, _, a = _post(serve_server, "/translate?seed=5", raw)
        _, _, b = _post(serve_server, "/translate?seed=5", raw)
        assert a == b

    def test_bad_image_400(self, serve_server):
        status, _, body = _post(serve_server, "/translate",
                                b"this is not an image")
        assert status == 400
        assert b"bad image" in body

    def test_empty_body_400(self, serve_server):
        status, _, _ = _post(serve_server, "/translate", b"")
        assert status == 400

    def test_stats(self, serve_server):
        status, _, body = _get(serve_server, "/stats")
        snap = json.loads(body)
        assert status == 200
        assert snap["requests"] >= 1 and snap["batches"] >= 1

    def test_style_guided_translate(self, serve_server):
        """/encode_style -> z vector -> /translate?z=... (the CLI's
        --style_image as a serving flow); explicit z is deterministic."""
        status, _, body = _post(serve_server, "/encode_style", _jpeg_bytes())
        assert status == 200
        z = json.loads(body)["z"]
        assert len(z) == 3 and all(np.isfinite(v) for v in z)
        zq = ",".join(f"{v:.6f}" for v in z)
        raw = _jpeg_bytes()
        s1, ctype, a = _post(serve_server, f"/translate?z={zq}", raw)
        s2, _, b = _post(serve_server, f"/translate?z={zq}", raw)
        assert s1 == s2 == 200 and ctype == "image/jpeg"
        assert a == b
        # a different style must change the output
        z2 = ",".join(f"{v + 1.5:.6f}" for v in z)
        _, _, c = _post(serve_server, f"/translate?z={z2}", raw)
        assert c != a

    def test_translate_bad_z_400(self, serve_server):
        status, _, body = _post(serve_server, "/translate?z=1.0,nope",
                                _jpeg_bytes())
        assert status == 400 and b"comma-separated" in body
        status, _, body = _post(serve_server, "/translate?z=1.0,2.0",
                                _jpeg_bytes())
        assert status == 400 and b"needs 3" in body


class TestServeHTTPMemberSharded:
    """serve.py --member all --data_parallel 2: the HTTP surface over the
    member-sharded ('council',) mesh — ensemble strip response with the
    member axis actually sharded across devices."""

    @pytest.fixture(scope="class")
    def member_server(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("serve_member")
        cfg_path = tmp / "tiny.yaml"
        cfg_path.write_text(SERVE_YAML)

        from councilx.ckpt.manager import save_params_npz
        from councilx.config import load_config
        from councilx.inference.translate import Translator

        cfg = load_config(str(cfg_path))
        tr = Translator(cfg)
        dummy = np.zeros((1, 16, 16, 3), np.float32)
        params = jax.vmap(tr.gen.init, in_axes=(0, None))(
            jax.random.split(jax.random.PRNGKey(0), 2), dummy)["params"]
        ckpt = tmp / "gen.npz"
        save_params_npz(str(ckpt), params)

        port = _free_port()
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        flags = env.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (flags +
                                " --xla_force_host_platform_device_count=8"
                                ).strip()
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "serve.py"),
             "--config", str(cfg_path), "--checkpoint", str(ckpt),
             "--member", "all", "--data_parallel", "2",
             "--port", str(port), "--max_batch", "4", "--max_delay_ms", "2"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        deadline = time.time() + 180
        last_err = None
        while time.time() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read().decode(errors="replace")
                raise RuntimeError(f"serve.py exited early:\n{out}")
            try:
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
                c.request("GET", "/healthz")
                c.getresponse().read()
                c.close()
                break
            except OSError as e:
                last_err = e
                time.sleep(0.5)
        else:
            proc.terminate()
            raise RuntimeError(f"serve.py never came up: {last_err}")
        yield port
        proc.terminate()
        proc.wait(timeout=30)
        assert proc.returncode == 0, \
            proc.stdout.read().decode(errors="replace")[-2000:]

    def test_ensemble_strip_over_member_mesh(self, member_server):
        from PIL import Image

        status, ctype, body = _post(member_server, "/translate?seed=4",
                                    _jpeg_bytes(hw=20))
        assert status == 200 and ctype == "image/jpeg"
        img = Image.open(io.BytesIO(body))
        # 2 members side by side at the 16px serving crop
        assert img.size == (32, 16)

    def test_ensemble_deterministic_per_seed(self, member_server):
        raw = _jpeg_bytes(hw=20)
        _, _, a = _post(member_server, "/translate?seed=7", raw)
        _, _, b = _post(member_server, "/translate?seed=7", raw)
        assert a == b


class TestMemberDataSharded2D:
    """2-D ('data','council') ensemble serving: members AND batch sharded
    (pod-scale; e.g. council-8 over 16 chips = 8 member x 2 batch shards)."""

    def test_2d_matches_single_device(self, rng):
        from councilx.inference.translate import MemberShardedTranslator
        from councilx.inference.translate import Translator
        from councilx.parallel.mesh import make_member_mesh

        cfg = tiny_config(council={"council_size": 4, "council_w": 0.2})
        tr1 = Translator(cfg)
        dummy = np.zeros((1, 32, 32, 3), np.float32)
        stacked = jax.vmap(tr1.gen.init, in_axes=(0, None))(
            jax.random.split(jax.random.PRNGKey(0), 4), dummy)["params"]
        x = rng.randint(0, 256, (4, 32, 32, 3)).astype(np.uint8)
        z = rng.randn(4, cfg.gen.style_dim).astype(np.float32)
        want = np.asarray(tr1.translate_all_u8io_device(stacked, x, z))
        trm = MemberShardedTranslator(
            cfg, make_member_mesh(4, data_parallel=2))   # 8 devices
        got = np.asarray(trm.translate_all_u8io_device(
            trm.place_params(stacked), x, z))
        np.testing.assert_array_equal(got, want)

    def test_2d_engine_bucket_multiple_and_serve(self, rng):
        from councilx.inference.server import BatchingEngine
        from councilx.inference.translate import MemberShardedTranslator
        from councilx.parallel.mesh import make_member_mesh

        cfg = tiny_config(council={"council_size": 2, "council_w": 0.2})
        from councilx.inference.translate import Translator
        tr1 = Translator(cfg)
        dummy = np.zeros((1, 32, 32, 3), np.float32)
        stacked = jax.vmap(tr1.gen.init, in_axes=(0, None))(
            jax.random.split(jax.random.PRNGKey(0), 2), dummy)["params"]
        trm = MemberShardedTranslator(
            cfg, make_member_mesh(2, data_parallel=2))
        engine = BatchingEngine(trm, stacked, image_hw=(32, 32),
                                max_batch=4, max_delay_ms=1.0,
                                all_members=True)
        # batch buckets snap to multiples of the data-axis size
        assert engine.buckets == [2, 4]
        engine.start()
        try:
            x = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
            z = engine.make_z(3)
            got = engine.translate_sync(x, z=z)
            want = np.asarray(tr1.translate_all_u8io_device(
                stacked, np.stack([x, x]),
                np.stack([z, z])))[:, 0]   # engine pads to bucket 2
            np.testing.assert_array_equal(got, want)
        finally:
            engine.stop()

    def test_2d_batch_divisibility_enforced(self, rng):
        from councilx.inference.translate import MemberShardedTranslator
        from councilx.parallel.mesh import make_member_mesh

        cfg = tiny_config(council={"council_size": 2, "council_w": 0.2})
        from councilx.inference.translate import Translator
        tr1 = Translator(cfg)
        dummy = np.zeros((1, 32, 32, 3), np.float32)
        stacked = jax.vmap(tr1.gen.init, in_axes=(0, None))(
            jax.random.split(jax.random.PRNGKey(0), 2), dummy)["params"]
        trm = MemberShardedTranslator(
            cfg, make_member_mesh(2, data_parallel=2))
        x = rng.randint(0, 256, (3, 32, 32, 3)).astype(np.uint8)
        with pytest.raises(ValueError, match="not divisible"):
            trm.translate_all_u8io_device(
                trm.place_params(stacked), x,
                np.zeros((3, cfg.gen.style_dim), np.float32))
