"""Packaging: the framework must be pip-installable (pyproject.toml) with
working console entry points, and the repo-root scripts must stay importable
shims (the reference's flat-script workflow; SURVEY.md §1 L5).

The wheel build runs offline (--no-build-isolation uses the baked-in
setuptools); no network and no site-packages mutation.
"""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def wheel_path(tmp_path_factory):
    # Build from a pristine tmp copy so the working tree never accumulates
    # build/ or *.egg-info/ churn (those artifacts were once committed by
    # accident; building out-of-tree makes a repeat impossible).
    src = str(tmp_path_factory.mktemp("src") / "councilx")
    shutil.copytree(
        REPO, src,
        ignore=shutil.ignore_patterns(
            ".git", "build", "*.egg-info", "__pycache__", ".pytest_cache",
            "outputs", "datasets"))
    out = tmp_path_factory.mktemp("wheel")
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "--wheel-dir", str(out), src],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"wheel build failed:\n{r.stdout}\n{r.stderr}"
    wheels = [p for p in os.listdir(out) if p.endswith(".whl")]
    assert len(wheels) == 1, wheels
    return os.path.join(out, wheels[0])


def test_wheel_contents(wheel_path):
    with zipfile.ZipFile(wheel_path) as z:
        names = z.namelist()
        # library + cli modules
        for mod in ("councilx/config.py", "councilx/train/trainer.py",
                    "councilx/cli/train.py", "councilx/cli/translate.py",
                    "councilx/cli/serve.py", "councilx/cli/gui.py",
                    "councilx/cli/eval.py", "councilx/cli/convert.py"):
            assert mod in names, f"{mod} missing from wheel"
        # the native loader source must ship (build-on-first-use via g++)
        assert "councilx/data/native/cxloader.cc" in names
        # console entry points
        meta = [n for n in names if n.endswith("entry_points.txt")]
        assert meta, names
        eps = z.read(meta[0]).decode()
        for script, target in (
                ("councilx-train", "councilx.cli.train:main"),
                ("councilx-translate", "councilx.cli.translate:main"),
                ("councilx-serve", "councilx.cli.serve:main"),
                ("councilx-gui", "councilx.cli.gui:main"),
                ("councilx-convert-pt", "councilx.cli.convert:main"),
                ("councilx-eval", "councilx.cli.eval:main")):
            assert f"{script} = {target}" in eps, eps
        # repo-root shims must NOT leak into the wheel as top-level modules
        assert not any(n.split("/")[0] in
                       ("train.py", "serve.py", "gui.py",
                        "test_on_folder.py") for n in names)


def test_entry_point_targets_importable():
    """Every [project.scripts] target resolves to a callable."""
    import councilx.cli.convert
    import councilx.cli.eval
    import councilx.cli.gui
    import councilx.cli.serve
    import councilx.cli.train
    import councilx.cli.translate
    for mod in (councilx.cli.train, councilx.cli.translate,
                councilx.cli.serve, councilx.cli.gui,
                councilx.cli.convert, councilx.cli.eval):
        assert callable(mod.main)


def test_root_shims_reexport():
    """The flat scripts keep their historical import surface."""
    sys.path.insert(0, REPO)
    try:
        import gui
        import serve
        import test_on_folder
        import train as train_script
        assert callable(train_script.main)
        assert callable(test_on_folder.main)
        assert callable(test_on_folder.load_generator_params)
        for sym in ("main", "build_engine", "make_handler",
                    "preprocess_bytes"):
            assert callable(getattr(serve, sym))
        assert callable(gui.main)
    finally:
        sys.path.remove(REPO)


def test_pt_conversion_moved_into_package():
    """convert_reference_gen_pt lives in the package (installed users get
    .pt interop without the repo checkout); the tool delegates to it."""
    from councilx.ckpt.torch_convert import (convert_reference_gen_pt,
                                             extract_member_state_dicts)
    sd = {"enc_content.model.0.conv.weight": 1}
    assert extract_member_state_dicts(sd, "a2b") == [sd]
    assert extract_member_state_dicts({"a2b_1": 2, "a2b_0": 1},
                                      "a2b") == [1, 2]
    assert extract_member_state_dicts({"a": [1, 2]}, "a2b") == [1, 2]
    assert extract_member_state_dicts({"b2a": 3}, "b2a") == [3]
    assert extract_member_state_dicts({"0": 1, "1": 2}, "a2b") == [1, 2]
    with pytest.raises(ValueError):
        extract_member_state_dicts({"unrelated": 1}, "a2b")
    sys.path.insert(0, os.path.join(REPO))
    try:
        from tools.convert_pt import convert_reference_gen_pt as tool_fn
        assert tool_fn is convert_reference_gen_pt
    finally:
        sys.path.remove(os.path.join(REPO))
