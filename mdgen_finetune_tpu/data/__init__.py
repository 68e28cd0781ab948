from .dataset import MDGenDataset, make_batch_iterator
from .featurize import featurize_atom14_batch

__all__ = ["MDGenDataset", "make_batch_iterator", "featurize_atom14_batch"]
