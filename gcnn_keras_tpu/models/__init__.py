"""Model zoo — functional builders mirroring ``kgcnn/literature/``.

Each module exposes ``make_model(**config)`` returning a flax module whose
``__call__(batch: GraphBatch) -> dict`` produces named outputs, plus a
``model_default`` config dict for parity with the reference's
``@update_model_kwargs`` pattern (``kgcnn/model/utils.py:120``).
"""
from .registry import get_model_class, register_model, make_model_by_name
