from .base import ExplanationMixin, ImportanceExplanationMethod
from .gnn_explainer import GNNExplainer
