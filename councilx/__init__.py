"""councilx — TPU-native Council-GAN framework (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of Onr/Council-GAN (CVPR'20,
"Breaking the Cycle — Colleagues are all you need"): unpaired image-to-image
translation trained WITHOUT cycle consistency, via a *council* of N AdaIN
encoder–decoder generators pushed to mutual agreement by conditional council
discriminators, with multi-scale PatchGAN (LSGAN) discriminators and a
focus-mask mechanism.

TPU-first design decisions (vs the reference's single-GPU PyTorch):
  * the council is a stacked leading parameter axis driven by ``jax.vmap``,
    not a Python list of modules (reference: trainer_council.py holds
    ``gen_a2b_s`` / ``dis_a2b_s`` lists and loops over them serially);
  * the pairwise mutual-agreement loss is one batched (N x N) computation;
  * dis / council-dis / gen updates fuse into a single jitted train step
    (three optax optimizer groups);
  * data augmentation (resize / random-crop / hflip / normalize) runs
    on-device inside the jit'd step;
  * scaling is data-parallel over a ``jax.sharding.Mesh`` (ICI collectives
    inserted by XLA), with optional council-axis sharding;
  * hot ops have fused Pallas TPU kernels behind flags with XLA fallbacks.
"""

__version__ = "0.1.0"

from councilx.config import Config, load_config  # noqa: F401
