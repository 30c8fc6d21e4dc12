"""Converter layout tests (VERDICT r1 item 5): run the .pt converters against
synthetically constructed state dicts with the EXACT torchvision key layout
(torch is installed; no downloads needed), assert the converted tree matches
the flax models' variable trees leaf-for-leaf, and produce a real FID number
end-to-end through tools/fid.py with the converted weights.

The torch-side schemas below are written out independently from torchvision's
module structure (inception_v3 / vgg16) — NOT derived from our flax modules —
so a naming or transpose bug on either side fails the test.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))


# ---------------------------------------------------------------------------
# torchvision inception_v3 state-dict schema (BasicConv2d list)
# ---------------------------------------------------------------------------

def _inception_convs():
    """[(torch scope, in_ch, out_ch, (kh, kw))] for every BasicConv2d in
    torchvision inception_v3, in module order."""
    convs = []

    def C(scope, cin, cout, k):
        convs.append((scope, cin, cout, k))

    C("Conv2d_1a_3x3", 3, 32, (3, 3))
    C("Conv2d_2a_3x3", 32, 32, (3, 3))
    C("Conv2d_2b_3x3", 32, 64, (3, 3))
    C("Conv2d_3b_1x1", 64, 80, (1, 1))
    C("Conv2d_4a_3x3", 80, 192, (3, 3))

    def block_a(scope, cin, pf):
        C(f"{scope}.branch1x1", cin, 64, (1, 1))
        C(f"{scope}.branch5x5_1", cin, 48, (1, 1))
        C(f"{scope}.branch5x5_2", 48, 64, (5, 5))
        C(f"{scope}.branch3x3dbl_1", cin, 64, (1, 1))
        C(f"{scope}.branch3x3dbl_2", 64, 96, (3, 3))
        C(f"{scope}.branch3x3dbl_3", 96, 96, (3, 3))
        C(f"{scope}.branch_pool", cin, pf, (1, 1))
        return 64 + 64 + 96 + pf

    c = block_a("Mixed_5b", 192, 32)
    c = block_a("Mixed_5c", c, 64)
    c = block_a("Mixed_5d", c, 64)

    C("Mixed_6a.branch3x3", c, 384, (3, 3))
    C("Mixed_6a.branch3x3dbl_1", c, 64, (1, 1))
    C("Mixed_6a.branch3x3dbl_2", 64, 96, (3, 3))
    C("Mixed_6a.branch3x3dbl_3", 96, 96, (3, 3))
    c = 384 + 96 + c  # 768

    def block_c(scope, cin, c7):
        C(f"{scope}.branch1x1", cin, 192, (1, 1))
        C(f"{scope}.branch7x7_1", cin, c7, (1, 1))
        C(f"{scope}.branch7x7_2", c7, c7, (1, 7))
        C(f"{scope}.branch7x7_3", c7, 192, (7, 1))
        C(f"{scope}.branch7x7dbl_1", cin, c7, (1, 1))
        C(f"{scope}.branch7x7dbl_2", c7, c7, (7, 1))
        C(f"{scope}.branch7x7dbl_3", c7, c7, (1, 7))
        C(f"{scope}.branch7x7dbl_4", c7, c7, (7, 1))
        C(f"{scope}.branch7x7dbl_5", c7, 192, (1, 7))
        C(f"{scope}.branch_pool", cin, 192, (1, 1))
        return 4 * 192

    for scope, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160),
                      ("Mixed_6d", 160), ("Mixed_6e", 192)):
        c = block_c(scope, c, c7)

    C("Mixed_7a.branch3x3_1", c, 192, (1, 1))
    C("Mixed_7a.branch3x3_2", 192, 320, (3, 3))
    C("Mixed_7a.branch7x7x3_1", c, 192, (1, 1))
    C("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7))
    C("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1))
    C("Mixed_7a.branch7x7x3_4", 192, 192, (3, 3))
    c = 320 + 192 + c  # 1280

    def block_e(scope, cin):
        C(f"{scope}.branch1x1", cin, 320, (1, 1))
        C(f"{scope}.branch3x3_1", cin, 384, (1, 1))
        C(f"{scope}.branch3x3_2a", 384, 384, (1, 3))
        C(f"{scope}.branch3x3_2b", 384, 384, (3, 1))
        C(f"{scope}.branch3x3dbl_1", cin, 448, (1, 1))
        C(f"{scope}.branch3x3dbl_2", 448, 384, (3, 3))
        C(f"{scope}.branch3x3dbl_3a", 384, 384, (1, 3))
        C(f"{scope}.branch3x3dbl_3b", 384, 384, (3, 1))
        C(f"{scope}.branch_pool", cin, 192, (1, 1))
        return 320 + 2 * 384 + 2 * 384 + 192

    c = block_e("Mixed_7b", c)
    c = block_e("Mixed_7c", c)
    assert c == 2048
    return convs


def _make_inception_state_dict(rng):
    sd = {}
    for scope, cin, cout, (kh, kw) in _inception_convs():
        sd[f"{scope}.conv.weight"] = torch.from_numpy(
            rng.randn(cout, cin, kh, kw).astype(np.float32) * 0.05)
        sd[f"{scope}.bn.weight"] = torch.from_numpy(
            rng.rand(cout).astype(np.float32) + 0.5)
        sd[f"{scope}.bn.bias"] = torch.from_numpy(
            rng.randn(cout).astype(np.float32) * 0.1)
        sd[f"{scope}.bn.running_mean"] = torch.from_numpy(
            rng.randn(cout).astype(np.float32) * 0.1)
        sd[f"{scope}.bn.running_var"] = torch.from_numpy(
            rng.rand(cout).astype(np.float32) + 0.5)
        sd[f"{scope}.bn.num_batches_tracked"] = torch.tensor(1000)
    # distractors the converter must drop
    sd["fc.weight"] = torch.zeros(1000, 2048)
    sd["fc.bias"] = torch.zeros(1000)
    for aux_scope, cin, cout, k in (
            ("AuxLogits.conv0", 768, 128, (1, 1)),
            ("AuxLogits.conv1", 128, 768, (5, 5))):
        sd[f"{aux_scope}.conv.weight"] = torch.zeros(cout, cin, *k)
        sd[f"{aux_scope}.bn.weight"] = torch.zeros(cout)
        sd[f"{aux_scope}.bn.bias"] = torch.zeros(cout)
        sd[f"{aux_scope}.bn.running_mean"] = torch.zeros(cout)
        sd[f"{aux_scope}.bn.running_var"] = torch.ones(cout)
    sd["AuxLogits.fc.weight"] = torch.zeros(1000, 768)
    sd["AuxLogits.fc.bias"] = torch.zeros(1000)
    return sd


def _tree_paths_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_paths_shapes(v, p))
        else:
            out[p] = tuple(v.shape)
    return out


@pytest.fixture(scope="module")
def converted_inception_npz(tmp_path_factory):
    from convert_inception_pt import convert as convert_inception
    rng = np.random.RandomState(0)
    sd = _make_inception_state_dict(rng)
    flat = convert_inception(sd)
    path = tmp_path_factory.mktemp("inc") / "inception.npz"
    np.savez(path, **flat)
    return str(path)


class TestInceptionConverter:
    def test_converted_tree_matches_flax_model_exactly(
            self, converted_inception_npz):
        from councilx.eval.inception import (InceptionV3Features,
                                             load_params_npz)
        got = _tree_paths_shapes(load_params_npz(converted_inception_npz))
        model = InceptionV3Features()
        want = _tree_paths_shapes(
            model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 299, 299, 3), jnp.float32)))
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        assert not missing, f"converter missed {len(missing)}: {missing[:5]}"
        assert not extra, f"converter emitted strays: {extra[:5]}"
        mismatched = [k for k in want if want[k] != got[k]]
        assert not mismatched, \
            f"{mismatched[:5]}: {[(want[k], got[k]) for k in mismatched[:5]]}"

    def test_converted_weights_run(self, converted_inception_npz):
        from councilx.eval.inception import (InceptionV3Features,
                                             load_params_npz)
        model = InceptionV3Features()
        variables = load_params_npz(converted_inception_npz)
        x = jnp.asarray(np.random.RandomState(1)
                        .uniform(-1, 1, (2, 75, 75, 3)).astype(np.float32))
        feats = model.apply(variables, x)
        assert feats.shape == (2, 2048)
        assert np.isfinite(np.asarray(feats)).all()

    def test_fid_cli_end_to_end_with_converted_weights(
            self, converted_inception_npz, tmp_path):
        from PIL import Image
        rng = np.random.RandomState(2)
        for sub in ("a", "b"):
            (tmp_path / sub).mkdir()
            for i in range(4):
                arr = rng.randint(0, 256, (64, 64, 3), np.uint8)
                Image.fromarray(arr).save(tmp_path / sub / f"{i}.jpg")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            [sys.executable, "tools/fid.py", str(tmp_path / "a"),
             str(tmp_path / "b"), "--weights", converted_inception_npz,
             "--kid", "--kid-subset-size", "4", "--batch-size", "2"],
            capture_output=True, text=True, timeout=900, cwd=_REPO, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
        out = json.loads(proc.stdout.strip().splitlines()[-1])
        assert np.isfinite(out["fid"]) and out["fid"] >= 0
        assert out["n_a"] == out["n_b"] == 4
        assert np.isfinite(out["kid_mean"])


# ---------------------------------------------------------------------------
# torchvision vgg16 state-dict schema
# ---------------------------------------------------------------------------

_VGG_FEATURE_CONVS = [  # (features index, in_ch, out_ch)
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]


def _make_vgg_state_dict(rng, naming="torchvision"):
    sd = {}
    name_of = {0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
               10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
               17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
               24: "conv5_1", 26: "conv5_2", 28: "conv5_3"}
    for idx, cin, cout in _VGG_FEATURE_CONVS:
        w = torch.from_numpy(rng.randn(cout, cin, 3, 3).astype(np.float32)
                             * 0.02)
        b = torch.from_numpy(rng.randn(cout).astype(np.float32) * 0.01)
        if naming == "torchvision":
            sd[f"features.{idx}.weight"] = w
            sd[f"features.{idx}.bias"] = b
        else:  # MUNIT-style plain names
            sd[f"{name_of[idx]}.weight"] = w
            sd[f"{name_of[idx]}.bias"] = b
    if naming == "torchvision":  # classifier distractors must be dropped
        sd["classifier.0.weight"] = torch.zeros(4096, 25088)
        sd["classifier.0.bias"] = torch.zeros(4096)
    return sd


class TestVggConverter:
    @pytest.mark.parametrize("naming", ["torchvision", "plain"])
    def test_converted_tree_matches_flax_model(self, naming, tmp_path):
        from convert_vgg_pt import convert as convert_vgg
        from councilx.nn.vgg import Vgg16Features, load_vgg_npz

        sd = _make_vgg_state_dict(np.random.RandomState(0), naming)
        flat = convert_vgg(sd)
        path = tmp_path / "vgg.npz"
        np.savez(path, **flat)

        got = _tree_paths_shapes(load_vgg_npz(str(path)))
        want = _tree_paths_shapes(
            Vgg16Features().init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 3)))["params"])
        assert got == want

    def test_converted_weights_compute_loss(self, tmp_path):
        from convert_vgg_pt import convert as convert_vgg
        from councilx.nn.vgg import compute_vgg_loss, load_vgg_npz

        sd = _make_vgg_state_dict(np.random.RandomState(1))
        path = tmp_path / "vgg.npz"
        np.savez(path, **convert_vgg(sd))
        params = load_vgg_npz(str(path))
        rng = np.random.RandomState(2)
        a = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
        loss = compute_vgg_loss(params, a, b)
        assert np.isfinite(float(loss)) and float(loss) > 0
        # identical inputs -> zero loss
        assert float(compute_vgg_loss(params, a, a)) == 0.0
