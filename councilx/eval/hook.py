"""Periodic in-training FID (SURVEY.md §5.5 observability — beyond the
reference, which only ever inspects sample sheets by eye).

``cfg.eval_iter > 0`` translates a fixed set of test images every
``eval_iter`` steps and scores them against the target domain's test images
with InceptionV3-pool3 features (pytorch-fid input convention: 299px
PIL-bilinear, Fréchet in float64), logged as ``fid_<direction>`` beside the
loss curves in JSONL/TensorBoard. ``cfg.eval_member`` picks the member
scored: an index (default 0), or ``"all"`` for the paper's best-member
protocol — every member's ``fid_<direction>_m<k>`` is logged and
``fid_<direction>`` is their minimum (the translate is one vmapped call
either way; "all" only multiplies the Inception feature passes).

Protocol note: both sides are the data loader's ``new_size`` views — full
frames, translated at ``new_size`` (the generator is fully convolutional).
The in-training series is internally consistent and comparable ACROSS
steps; ``tools/eval_checkpoint.py`` instead reads the ORIGINAL files for
the target side, so compare in-training numbers to offline/paper numbers
only when ``new_size`` matches the original resolution — the hook warns
once at construction when it can see that they differ.

Multi-host: the translate runs on every process (trainer.sample gathers
sharded params — a collective); feature extraction + FID run on process 0
only, like all other side effects.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from councilx.config import Config


class TrainEvalHook:
    """Fixed eval inputs + cached target features; call at the eval cadence.

    Built once after the data loaders: takes up to ``cfg.eval_max_images``
    epoch-0 rows from each (unsharded, deterministic) test loader via
    ``DataLoader.head_rows`` — identical on every host, no producer
    thread, unaffected by resume fast-forward — and precomputes the
    target-domain Inception features. Each call translates with member 0
    at the CURRENT params via trainer.sample and returns
    {"fid_<dir>": value} on process 0 (empty dict elsewhere).
    """

    def __init__(self, cfg: Config, trainer, test_a, test_b):
        from councilx.data.ondevice import normalize_batch
        from councilx.eval.features import (extract_features,
                                            u8_to_inception_inputs)
        from councilx.eval.inception import (InceptionV3Features,
                                             init_random_params,
                                             load_params_npz)

        if cfg.eval_inception_weights == "random":
            # smoke-test mode: numbers are NOT comparable FID values
            model, variables = init_random_params(jax.random.PRNGKey(0))
        elif cfg.eval_inception_weights:
            model = InceptionV3Features()
            variables = load_params_npz(cfg.eval_inception_weights)
        else:
            raise ValueError(
                "eval_iter > 0 needs eval_inception_weights (an .npz from "
                "tools/convert_inception_pt.py, or the literal 'random' "
                "for smoke tests)")
        self._feat_fn = jax.jit(lambda x: model.apply(variables, x))
        self._extract = extract_features
        self._to_inception = u8_to_inception_inputs
        self.cfg = cfg
        self.directions = trainer.directions
        self.member = cfg.eval_member  # index | "all" (validated in config)
        self._warn_if_resized(test_a, test_b)

        raw = {"a": test_a.head_rows(cfg.eval_max_images),
               "b": test_b.head_rows(cfg.eval_max_images)}
        src = {"a2b": "a", "b2a": "b"}
        # full new_size frames, normalized — see the protocol note above
        self._inputs = {
            d: np.asarray(normalize_batch(jnp.asarray(raw[src[d]])))
            for d in self.directions}
        # target features once: a2b is scored against domain-B test images
        tgt = {"a2b": "b", "b2a": "a"}
        self._target_feats = {
            d: self._extract(self._feat_fn,
                             [self._to_inception(raw[tgt[d]])],
                             pad_batch=None)
            for d in self.directions}

    def _warn_if_resized(self, test_a, test_b) -> None:
        """Warn once when the loaders' new_size differs from the source
        files' native resolution — the in-training FID series is then NOT
        comparable to offline/paper numbers (see the protocol note)."""
        import warnings

        from PIL import Image

        for loader in (test_a, test_b):
            ds = getattr(loader, "dataset", None)
            paths = getattr(ds, "paths", None)
            if not paths:
                continue  # synthetic/in-memory data: nothing to compare
            try:
                with Image.open(paths[0]) as img:
                    native = min(img.size)
            except Exception:
                continue
            if native != self.cfg.data.new_size:
                warnings.warn(
                    f"in-training FID runs at new_size="
                    f"{self.cfg.data.new_size} but {paths[0]} is natively "
                    f"{native}px on its shorter side — the fid_* series is "
                    "self-consistent across steps but NOT comparable to "
                    "offline/paper FID; evaluate checkpoints with "
                    "councilx-eval for comparable numbers", stacklevel=3)
                return

    def __call__(self, trainer, state, primary: bool = True
                 ) -> Dict[str, float]:
        from councilx.eval.metrics import fid_from_features
        from councilx.inference.translate import denormalize_to_uint8

        out: Dict[str, float] = {}
        for d in self.directions:
            x = jnp.asarray(self._inputs[d])
            # fixed style draw -> the FID series is comparable across steps;
            # collective under sharded trainers — every process calls it
            x_t, _ = trainer.sample(state, x, direction=d,
                                    rng=jax.random.PRNGKey(7))
            if not primary:
                continue
            members = (range(x_t.shape[0]) if self.member == "all"
                       else [self.member])
            fids = {}
            for m in members:
                u8 = denormalize_to_uint8(np.asarray(x_t[m]))
                feats = self._extract(self._feat_fn,
                                      [self._to_inception(u8)],
                                      pad_batch=None)
                fids[m] = fid_from_features(feats, self._target_feats[d])
            if self.member == "all":
                for m, v in fids.items():
                    out[f"fid_{d}_m{m}"] = v
                # best-member protocol: the paper reports the member with
                # the lowest FID
                out[f"fid_{d}"] = min(fids.values())
            else:
                out[f"fid_{d}"] = fids[self.member]
        return out
