from .graph_dict import GraphDict
from .dataset import MemoryGraphList, MemoryGraphDataset
from .loader import GraphBatchLoader
