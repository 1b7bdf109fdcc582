from .analyze import AnalyzeHeader, read_analyze
from .pipeline import (
    RealPairsDataset,
    SliceDataset,
    VolumeSliceSource,
    eval_random_dataset,
    list_pairs,
    prefetch_to_device,
    real_pairs_dataset,
    split_volumes,
    synth_image_batch,
    volume2slices_datasets,
    volume_dataset,
)
from .synth import random_pair_batch, random_seg_batch, random_volume_batch

__all__ = [
    "AnalyzeHeader",
    "read_analyze",
    "RealPairsDataset",
    "SliceDataset",
    "VolumeSliceSource",
    "eval_random_dataset",
    "list_pairs",
    "prefetch_to_device",
    "real_pairs_dataset",
    "split_volumes",
    "synth_image_batch",
    "volume2slices_datasets",
    "volume_dataset",
    "random_pair_batch",
    "random_seg_batch",
    "random_volume_batch",
]
