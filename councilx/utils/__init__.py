"""Host-side utilities: output folders, metric logging, image grids, HTML."""

from councilx.utils.logging import MetricLogger, prepare_sub_folder  # noqa: F401
from councilx.utils.images import make_grid, save_image_grid, write_html  # noqa: F401
