"""Interactive translation demo — the reference test_gui.py equivalent.

A dependency-free web GUI (stdlib http.server) instead of the reference's
desktop toolkit: load a checkpoint, open http://localhost:8765, pick any
image from the input folder, choose a council member (or all), and resample
style codes live; shows the translation and (for focus models) the mask.

    councilx-gui --config configs/male2female_council_folder.yaml \
        --checkpoint outputs/run/checkpoints/step_00100000 [--port 8765]

Reference parity: test_on_folder.py/test_gui.py's encode -> sample z ->
decode -> mask-composite core (SURVEY.md §3.4/3.5), served interactively.
"""

import argparse
import io
import json
import os
import threading
import urllib.parse

from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


_PAGE = """<!DOCTYPE html>
<html><head><title>councilx demo</title><style>
body{font-family:sans-serif;margin:2em;background:#fafafa}
img{image-rendering:auto;border:1px solid #ccc;margin:4px}
.row{display:flex;gap:16px;flex-wrap:wrap}
.card{background:#fff;padding:12px;border-radius:8px;
      box-shadow:0 1px 3px rgba(0,0,0,.15)}
label{margin-right:1em}
</style></head><body>
<h2>councilx — Council-GAN interactive demo</h2>
<div class="card">
<label>image: <select id="img"></select></label>
<label>member: <select id="member"></select></label>
<label>style seed: <input id="seed" type="number" value="0" style="width:5em">
</label>
<button onclick="document.getElementById('seed').value=
  Math.floor(Math.random()*100000);go()">resample style</button>
<button onclick="go()">translate</button>
</div>
<div class="row" id="out"></div>
<script>
async function init(){
  const meta = await (await fetch('/meta')).json();
  const sel = document.getElementById('img');
  meta.images.forEach(p=>{const o=document.createElement('option');
    o.value=p;o.textContent=p;sel.appendChild(o);});
  const mem = document.getElementById('member');
  const opts = ['all'];
  for(let i=0;i<meta.council_size;i++) opts.push(String(i));
  opts.forEach(v=>{const o=document.createElement('option');
    o.value=v;o.textContent=v==='all'?'all members':'member '+v;
    mem.appendChild(o);});
  go();
}
async function go(){
  const img = document.getElementById('img').value;
  const member = document.getElementById('member').value;
  const seed = document.getElementById('seed').value;
  const out = document.getElementById('out');
  out.innerHTML = '<p>translating…</p>';
  const q = `image=${encodeURIComponent(img)}&member=${member}&seed=${seed}`;
  const meta = await (await fetch('/translate?'+q)).json();
  out.innerHTML = '';
  meta.panels.forEach(p=>{
    const card = document.createElement('div'); card.className='card';
    card.innerHTML = `<div>${p.title}</div><img src="${p.url}&_=${Date.now()}">`;
    out.appendChild(card);
  });
}
init();
</script></body></html>"""


def main():
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--input_folder", required=True)
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--direction", default="a2b", choices=["a2b", "b2a"])
    args = ap.parse_args()

    import jax
    import numpy as np
    from PIL import Image

    from councilx.config import load_config
    from councilx.data.dataset import _load_resize_crop, list_images
    from councilx.inference.translate import Translator, denormalize_to_uint8
    from councilx.ckpt.manager import load_generator_params

    cfg = load_config(args.config)
    gen_params = load_generator_params(args.checkpoint, cfg, args.direction)
    translator = Translator(cfg)
    images = [os.path.relpath(p, args.input_folder)
              for p in list_images(args.input_folder)]
    if not images:
        raise SystemExit(f"no images under {args.input_folder}")
    lock = threading.Lock()
    size = cfg.data.crop_image_height
    print(f"loaded checkpoint {args.checkpoint}; {len(images)} images; "
          f"council_size={cfg.council_size}")

    def render(image_rel, member, seed):
        path = os.path.join(args.input_folder, image_rel)
        arr = _load_resize_crop(path, cfg.data.new_size, size)
        x = (arr.astype(np.float32) - 127.5) / 127.5
        x = x[None]
        rng = jax.random.PRNGKey(int(seed))
        with lock:
            if member == "all":
                out, mask = translator.translate_all_members(
                    gen_params, x, rng=rng)
                outs = [np.asarray(out[i, 0]) for i in range(out.shape[0])]
                masks = ([np.asarray(mask[i, 0]) for i in range(out.shape[0])]
                         if mask is not None else None)
            else:
                out, mask = translator.translate(gen_params, x, rng=rng,
                                                 member=int(member))
                outs = [np.asarray(out[0])]
                masks = [np.asarray(mask[0])] if mask is not None else None
        panels = [("input", arr)]
        for i, o in enumerate(outs):
            panels.append((f"member {i if member == 'all' else member}",
                           denormalize_to_uint8(o)))
        if masks is not None:
            for i, mk in enumerate(masks):
                panels.append(
                    (f"mask {i if member == 'all' else member}",
                     (np.clip(mk, 0, 1) * 255).astype(np.uint8)
                     .repeat(3, axis=-1)))
        return panels

    cache = {}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="text/html"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            q = dict(urllib.parse.parse_qsl(url.query))
            if url.path == "/":
                self._send(200, _PAGE.encode())
            elif url.path == "/meta":
                self._send(200, json.dumps(
                    {"images": images,
                     "council_size": cfg.council_size}).encode(),
                    "application/json")
            elif url.path == "/translate":
                image = q.get("image", images[0])
                member = q.get("member", "all")
                seed = q.get("seed", "0")
                panels = render(image, member, seed)
                out = []
                for i, (title, arr) in enumerate(panels):
                    key = f"{image}|{member}|{seed}|{i}"
                    cache[key] = arr
                    out.append({"title": title,
                                "url": "/img?key="
                                       + urllib.parse.quote(key)})
                self._send(200, json.dumps({"panels": out}).encode(),
                           "application/json")
            elif url.path == "/img":
                arr = cache.get(q.get("key", ""))
                if arr is None:
                    self._send(404, b"gone")
                    return
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, "PNG")
                self._send(200, buf.getvalue(), "image/png")
            else:
                self._send(404, b"not found")

    srv = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)

    # graceful SIGTERM drain (same pattern as serve.py): shutdown() from
    # another thread makes serve_forever return, in-flight responses finish
    import signal

    def _drain(signum, frame):
        threading.Thread(target=srv.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)

    print(f"serving on http://localhost:{args.port}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
