"""Checkpointing: orbax save/restore + reference .pt state-dict conversion."""

from councilx.ckpt.torch_convert import (  # noqa: F401
    convert_adain_gen,
    convert_ms_image_dis,
)
