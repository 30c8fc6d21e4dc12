"""Loss functions (functional, vmappable over the council axis).

The reference keeps all losses inline in trainer_council.py (§2.2 of
SURVEY.md); here they are small pure functions so the council member axis can
be vmapped and the whole step jitted.
"""

from councilx.losses.gan import (  # noqa: F401
    gan_dis_loss,
    gan_gen_loss,
)
from councilx.losses.council import (  # noqa: F401
    council_dis_loss,
    council_gen_loss,
)
from councilx.losses.focus import (  # noqa: F401
    mask_binary_loss,
    mask_size_loss,
    mask_tv_loss,
)
