from .synth import random_pair_batch, random_seg_batch, random_volume_batch

__all__ = ["random_pair_batch", "random_seg_batch", "random_volume_batch"]
