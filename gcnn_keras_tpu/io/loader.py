"""Batch loader location parity with the reference (``kgcnn/io/loader.py:9``);
the implementation lives in ``gcnn_keras_tpu.data.loader``."""
from ..data.loader import GraphBatchLoader
