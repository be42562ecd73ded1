from .base import MolDynamicsModelPredictor
from .trajectory import ScannedMD
