from .meters import AverageMeter
from .seeding import seed_everything, key_seq

__all__ = ["AverageMeter", "seed_everything", "key_seq"]
