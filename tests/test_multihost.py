"""Multi-host training equivalence (SURVEY.md §5.8, VERDICT round-1 item 3).

Spawns 2 REAL processes x 4 virtual CPU devices (tests/mh_worker.py), each
loading only its half of the global batch and assembling it with
jax.make_array_from_process_local_data, and asserts the trained parameters
match a single-process 8-device run of the identical config.

Tolerance note (measured): cross-process gloo reductions sum in a
different order than single-process XLA all-reduces, giving ~1e-7-scale
gradient differences; Adam's normalized update amplifies any of those on
near-zero-gradient coords to full lr-scale steps (sign flips). After 2
steps the measured max |param diff| is 4.1e-4 = 2 steps x ~2*lr with 41%
of coords bit-identical and losses equal to 1e-6 rel — so the correct
equivalence assertion is |diff| <= a few lr per step plus tight loss
agreement, not rtol on params.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _flatten(prefix, tree, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}/{k}", v, out)
    else:
        out[prefix] = np.asarray(tree)


@pytest.mark.slow
def test_train_loop_two_process(tmp_path):
    """The FULL train() loop under 2 real processes: per-host loaders,
    global batch assembly, process-0-gated side effects, the collective
    sample() path, and a multi-host resume (tests/mh_loop_worker.py)."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "mh_loop_worker.py"),
         str(pid), "2", str(port), str(tmp_path)],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        # two concurrent processes each compile the full loop's graph set
        # (init, fused step, sample, augment, checkpoint gather) — ~20 min
        # of XLA CPU compiles before the 6 actual steps
        out, _ = p.communicate(timeout=2700)
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"proc {pid}: OK" in out
    # process-0-only side effects: metrics, sheets, html exist exactly once
    run = tmp_path / "mh"
    assert (run / "metrics.jsonl").exists()
    assert (run / "index.html").exists()
    assert (run / "images" / "current.jpg").exists()


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    from tests.test_train_step import synthetic_batch, tiny_config
    from councilx.parallel.council_shard import CouncilShardTrainer
    from councilx.parallel.mesh import make_mesh

    # ---- single-process baseline on the 8-device mesh
    cfg = tiny_config(batch_size=4)
    mesh = make_mesh(8, council_parallel=2)
    trainer = CouncilShardTrainer(cfg, mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    r = np.random.RandomState(0)
    x_a, x_b = synthetic_batch(r, b=4)
    for _ in range(2):
        state, metrics = trainer.train_step(state, x_a, x_b)
    base = {}
    _flatten("gen", jax.device_get(state.params["a2b"]["gen"]), base)
    _flatten("dis", jax.device_get(state.params["a2b"]["dis"]), base)
    base["loss_gen_total"] = np.asarray(metrics["loss_gen_total"])

    # ---- 2 real processes x 4 devices each
    port = _free_port()
    out_npz = tmp_path / "mh.npz"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "mh_worker.py"),
         str(pid), "2", str(port), str(out_npz)],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    assert out_npz.exists(), f"no output written:\n{outs[0][-4000:]}"

    n_steps, lr = 2, cfg.lr
    tol = 2.5 * lr * n_steps  # Adam per-step update magnitude is ~lr
    with np.load(out_npz) as got:
        keys = set(got.files)
        assert set(base) == keys
        np.testing.assert_allclose(
            got["loss_gen_total"], base["loss_gen_total"], rtol=1e-4,
            err_msg="multi-process loss diverged from single-process")
        n_equal = n_total = 0
        for k in sorted(base):
            if k == "loss_gen_total":
                continue
            d = np.abs(got[k] - base[k])
            assert d.size == 0 or float(d.max()) <= tol, \
                (f"multi-process diverged from single-process at {k}: "
                 f"max|diff|={float(d.max()):.2e} > {tol:.2e}")
            n_equal += int((d == 0).sum())
            n_total += d.size
        # most coords must be bit-identical — only near-zero-gradient
        # coords may sign-flip under reduction-order noise
        assert n_equal / max(n_total, 1) > 0.2, \
            f"only {n_equal}/{n_total} coords bit-identical"


@pytest.mark.slow
def test_two_process_det_reduction(tmp_path):
    """cfg.det_data_reduction (order-fixed cross-'data' reductions:
    all_gather + chained sum instead of psum) under 2 real processes,
    vs the single-process det run — and the MEASURED NEGATIVE RESULT
    that bounds what any reduction-order fix can buy.

    Hypothesis tested: psum's topology-dependent summation order is what
    makes multi-process training diverge from single-process (the
    lr-scale Adam sign flips documented above), so fixing the order
    should make them (near-)bitwise equal.

    Finding: FALSE. With every cross-'data' reduction order-fixed, most
    params agree to ULP level (dis kernels 3.7e-9, decoder convs ≤3e-7)
    — but the worst coordinate still lands at ~3.9e-4 = 2·lr·steps with
    only ~41% of coords bit-identical, the same statistics as the psum
    path. Root cause, isolated by experiment: the 1-proc and 2-proc
    EXECUTABLES compute different local numerics (the pure-forward
    loss_gen_total, identical inputs, differs 1.2e-6 relative; XLA blocks
    the shard-local conv reductions differently in the two programs),
    and Adam amplifies any near-zero-gradient noise to a ±lr sign flip
    no matter where the noise comes from. Same-topology repeats in fresh
    processes ARE 100% bit-identical (XLA CPU is deterministic), so
    cross-topology equality is unattainable at the JAX level, full stop.
    det_data_reduction therefore ships OFF by default as a documented
    experiment; the honest multi-host equivalence standard remains the
    lr-scale tolerance + tight loss agreement asserted above."""
    from tests.test_train_step import synthetic_batch, tiny_config
    from councilx.parallel.council_shard import CouncilShardTrainer
    from councilx.parallel.mesh import make_mesh

    # ---- single-process baseline, det mode, same 8-device mesh
    cfg = tiny_config(batch_size=4, det_data_reduction=True)
    mesh = make_mesh(8, council_parallel=2)
    trainer = CouncilShardTrainer(cfg, mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    r = np.random.RandomState(0)
    x_a, x_b = synthetic_batch(r, b=4)
    for _ in range(2):
        state, metrics = trainer.train_step(state, x_a, x_b)
    base = {}
    _flatten("gen", jax.device_get(state.params["a2b"]["gen"]), base)
    _flatten("dis", jax.device_get(state.params["a2b"]["dis"]), base)
    base["loss_gen_total"] = np.asarray(metrics["loss_gen_total"])

    # ---- 2 real processes x 4 devices each, det mode
    port = _free_port()
    out_npz = tmp_path / "mh_det.npz"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "mh_worker.py"),
         str(pid), "2", str(port), str(out_npz), "det"],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    assert out_npz.exists(), f"no output written:\n{outs[0][-4000:]}"

    with np.load(out_npz) as got:
        assert set(base) == set(got.files)
        # the loss metric aggregates hundreds of data-varying terms, so
        # per-executable ULP noise accumulates (~16 ULP measured at 12.24)
        np.testing.assert_allclose(got["loss_gen_total"],
                                   base["loss_gen_total"], rtol=1e-5)
        n_equal = n_total = 0
        worst, worst_key = 0.0, None
        for k in sorted(base):
            if k == "loss_gen_total":
                continue
            d = np.abs(got[k] - base[k])
            if d.size and float(d.max()) > worst:
                worst, worst_key = float(d.max()), k
            n_equal += int((d == 0).sum())
            n_total += d.size
        frac = n_equal / max(n_total, 1)
        print(f"det-mode topology agreement: max|diff|={worst:.2e} at "
              f"{worst_key}; {100 * frac:.1f}% bit-identical")
        # the honest cross-topology bound (see docstring): Adam turns
        # cross-EXECUTABLE local-numerics noise into ±lr steps on
        # near-zero-grad coords, with or without order-fixed reductions
        n_steps, lr = 2, cfg.lr
        assert worst <= 2.5 * lr * n_steps, \
            (f"det-mode cross-topology divergence beyond the Adam "
             f"sign-flip envelope at {worst_key}: {worst:.2e}")
        assert frac > 0.2, f"only {n_equal}/{n_total} coords bit-identical"
