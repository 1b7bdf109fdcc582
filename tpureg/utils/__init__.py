from .cache import enable_compilation_cache
from .flow_io import flow_to_image, make_color_wheel, read_flo, read_gen, write_flo
from .meters import AverageMeter
from .profiling import IteratorTimer, TimerBlock, device_memory_stats, trace
from .seeding import key_seq, seed_everything

__all__ = [
    "AverageMeter",
    "enable_compilation_cache",
    "flow_to_image",
    "make_color_wheel",
    "read_flo",
    "read_gen",
    "write_flo",
    "IteratorTimer",
    "TimerBlock",
    "device_memory_stats",
    "trace",
    "key_seq",
    "seed_everything",
]
