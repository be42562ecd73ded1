from .base import MolDynamicsModelPredictor
