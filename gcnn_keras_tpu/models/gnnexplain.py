"""GNNExplainer entry point (parity: ``kgcnn/literature/GNNExplain.py``).
The implementation lives in ``gcnn_keras_tpu.xai.gnn_explainer``."""
from ..xai.gnn_explainer import GNNExplainer


def make_model(**kwargs) -> GNNExplainer:
    return GNNExplainer(**kwargs)
