"""IO module (parity: ``kgcnn/io/loader.py``)."""
from .loader import GraphBatchLoader
