"""Periodic in-training FID (SURVEY.md §5.5 observability — beyond the
reference, which only ever inspects sample sheets by eye).

``cfg.eval_iter > 0`` translates a fixed set of test images with council
member 0 every ``eval_iter`` steps and scores them against the target
domain's test images with InceptionV3-pool3 FID (same protocol as
tools/eval_checkpoint.py: 299px PIL-bilinear, Fréchet in float64), logged
as ``fid_<direction>`` beside the loss curves in JSONL/TensorBoard.

Multi-host: the translate runs on every process (trainer.sample gathers
sharded params — a collective); feature extraction + FID run on process 0
only, like all other side effects.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from councilx.config import Config


def u8_to_inception_inputs(u8: np.ndarray) -> np.ndarray:
    """(B,H,W,3) uint8 -> (B,299,299,3) float32 in [-1,1], PIL bilinear —
    the pytorch-fid preprocessing used across the eval stack."""
    from PIL import Image

    out: List[np.ndarray] = []
    for row in np.asarray(u8):
        img = Image.fromarray(row).resize((299, 299), Image.BILINEAR)
        out.append(np.asarray(img, dtype=np.float32) / 127.5 - 1.0)
    return np.stack(out)


class TrainEvalHook:
    """Fixed eval inputs + cached target features; call at the eval cadence.

    Built once after the data loaders: draws up to ``cfg.eval_max_images``
    from each (finite, unsharded) test loader — identical on every host —
    and precomputes the target-domain Inception features. Each call
    translates with member 0 at the CURRENT params via trainer.sample and
    returns {"fid_<dir>": value} on process 0 (empty dict elsewhere).
    """

    def __init__(self, cfg: Config, trainer, test_a, test_b):
        from councilx.data.ondevice import augment_batch
        from councilx.eval.features import extract_features
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
        self.cfg = cfg
        self.directions = trainer.directions
        crop_h = cfg.data.crop_image_height
        crop_w = cfg.data.crop_image_width

        def take(loader) -> np.ndarray:
            rows: List[np.ndarray] = []
            for batch in loader:
                rows.extend(np.asarray(batch))
                if len(rows) >= cfg.eval_max_images:
                    break
            return np.stack(rows[:cfg.eval_max_images])

        raw = {"a2b": take(test_a), "b2a": take(test_b)}
        # deterministic center-crop eval view of the source domain
        self._inputs = {
            d: np.asarray(augment_batch(jax.random.PRNGKey(0),
                                        jnp.asarray(raw[src]), crop_h,
                                        crop_w, train=False))
            for d, src in (("a2b", "a2b"), ("b2a", "b2a"))}
        # target features once: a2b is scored against domain-B test images
        self._target_feats = {}
        for d, tgt in (("a2b", "b2a"), ("b2a", "a2b")):
            if d in self.directions:
                self._target_feats[d] = self._extract(
                    self._feat_fn,
                    [u8_to_inception_inputs(raw[tgt])],
                    pad_batch=None)

    def __call__(self, trainer, state, primary: bool = True
                 ) -> Dict[str, float]:
        from councilx.eval.metrics import fid_from_features
        from councilx.inference.translate import denormalize_to_uint8

        out: Dict[str, float] = {}
        for d in self.directions:
            x = jnp.asarray(self._inputs[d])
            # collective under sharded trainers — every process calls it
            # fixed style draw -> the FID series is comparable across steps
            x_t, _ = trainer.sample(state, x, direction=d,
                                    rng=jax.random.PRNGKey(7))
            if not primary:
                continue
            u8 = denormalize_to_uint8(np.asarray(x_t[0]))  # member 0
            feats = self._extract(self._feat_fn,
                                  [u8_to_inception_inputs(u8)],
                                  pad_batch=None)
            out[f"fid_{d}"] = fid_from_features(feats,
                                                self._target_feats[d])
        return out
