"""Data pipeline: host-side decode/prefetch + on-device jitted augmentation.

Reference parity: data.py (ImageFolder/ImageFilelist) + utils.py
(get_all_data_loaders, get_data_loader_folder). TPU-native split: the host
only lists/decodes/resizes to a static shape and stacks uint8 batches; the
random crop / hflip / normalize run as XLA ops inside the jitted train step
(BASELINE.json north star: loader "fuses into an on-device XLA preprocessing
stage").
"""

from councilx.data.dataset import (  # noqa: F401
    ImageFolderDataset,
    ImageFilelistDataset,
    SyntheticImageDataset,
    is_image_file,
    list_images,
)
from councilx.data.loader import DataLoader, get_all_data_loaders  # noqa: F401
from councilx.data.ondevice import augment_batch, normalize_batch  # noqa: F401
