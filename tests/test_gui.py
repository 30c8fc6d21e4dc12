"""Automated coverage for gui.py (VERDICT round-1 item 9): drive the
meta/translate/img endpoints over real HTTP against a tiny model.

Spawns ``python gui.py`` as a subprocess (the server loop lives in main())
with a tiny config + npz checkpoint + 2-image folder, then exercises every
endpoint with http.client.
"""

import http.client
import json
import os
import socket
import subprocess
import sys
import time
import urllib.parse

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_YAML = """
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
def gui_server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gui")
    cfg_path = tmp / "tiny.yaml"
    cfg_path.write_text(TINY_YAML)

    # tiny input folder
    from PIL import Image
    folder = tmp / "imgs"
    folder.mkdir()
    r = np.random.RandomState(0)
    for name in ("a.png", "b.jpg"):
        Image.fromarray(r.randint(0, 255, (24, 24, 3), np.uint8)).save(
            folder / name)

    # tiny stacked checkpoint (npz)
    import jax
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
        [sys.executable, os.path.join(REPO, "gui.py"),
         "--config", str(cfg_path), "--checkpoint", str(ckpt),
         "--input_folder", str(folder), "--port", str(port)],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    # wait for the server to accept connections
    deadline = time.time() + 120
    last_err = None
    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode(errors="replace")
            raise RuntimeError(f"gui.py exited early:\n{out}")
        try:
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            c.request("GET", "/meta")
            c.getresponse().read()
            c.close()
            break
        except OSError as e:
            last_err = e
            time.sleep(0.5)
    else:
        proc.terminate()
        raise RuntimeError(f"gui.py never came up: {last_err}")

    yield port
    # terminate() is SIGTERM: gui.py must drain and exit 0
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


class TestGui:
    def test_index(self, gui_server):
        status, ctype, body = _get(gui_server, "/")
        assert status == 200 and b"councilx" in body

    def test_meta(self, gui_server):
        status, _, body = _get(gui_server, "/meta")
        meta = json.loads(body)
        assert status == 200
        assert meta["council_size"] == 2
        assert sorted(meta["images"]) == ["a.png", "b.jpg"]

    def test_translate_single_member_and_images(self, gui_server):
        q = urllib.parse.urlencode(
            {"image": "a.png", "member": "0", "seed": "3"})
        status, _, body = _get(gui_server, "/translate?" + q)
        assert status == 200
        panels = json.loads(body)["panels"]
        # input + 1 member translation + 1 mask (focus default on)
        titles = [p["title"] for p in panels]
        assert titles[0] == "input" and len(panels) == 3
        for p in panels:
            s, ctype, img = _get(gui_server, p["url"])
            assert s == 200 and ctype == "image/png"
            assert img[:8] == b"\x89PNG\r\n\x1a\n"

    def test_translate_all_members(self, gui_server):
        q = urllib.parse.urlencode(
            {"image": "b.jpg", "member": "all", "seed": "0"})
        status, _, body = _get(gui_server, "/translate?" + q)
        assert status == 200
        panels = json.loads(body)["panels"]
        # input + 2 members + 2 masks
        assert len(panels) == 5

    def test_seed_changes_output(self, gui_server):
        def img_bytes(seed):
            q = urllib.parse.urlencode(
                {"image": "a.png", "member": "0", "seed": seed})
            _, _, body = _get(gui_server, "/translate?" + q)
            member_panel = json.loads(body)["panels"][1]
            _, _, img = _get(gui_server, member_panel["url"])
            return img

        assert img_bytes("1") != img_bytes("2")

    def test_404(self, gui_server):
        status, _, _ = _get(gui_server, "/nope")
        assert status == 404
        status, _, _ = _get(gui_server, "/img?key=missing")
        assert status == 404
