from psld_tpu.data.datasets import (  # noqa: F401
    AFHQv2Dataset,
    ArrayDataset,
    CIFAR10Dataset,
    CelebADataset,
    CelebAHQDataset,
    InpaintDataset,
    SDELatentDataset,
    SyntheticDataset,
)
from psld_tpu.data.loader import EpochLoader, get_dataset  # noqa: F401
