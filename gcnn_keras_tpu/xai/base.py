"""XAI abstractions (parity: ``kgcnn/xai/base.py:10-41``)."""
from __future__ import annotations

from typing import Any, Tuple


class ExplanationMixin:
    """Models that produce their own node/edge importances (e.g. MEGAN)
    implement ``explain`` returning (node_importances, edge_importances)."""

    def explain(self, variables, batch, **kwargs) -> Tuple[Any, Any]:
        out = self.apply(variables, batch, **kwargs)
        return out.get("node_importances"), out.get("edge_importances")


class ImportanceExplanationMethod:
    """Post-hoc explanation method ABC: __call__(model_apply, variables,
    batch) -> (node_importances, edge_importances)."""

    def __call__(self, model_apply, variables, batch, **kwargs):
        raise NotImplementedError
