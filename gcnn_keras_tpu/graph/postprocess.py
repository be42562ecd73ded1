"""Graph postprocessors (parity: ``kgcnn/graph/postprocessor.py``).
The scaler-inverse postprocessor lives with the MD pipeline."""
from ..moldyn.base import ExtensiveEnergyForceScalerPostprocessor  # noqa: F401
