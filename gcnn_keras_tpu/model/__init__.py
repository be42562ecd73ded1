from .force import EnergyForceModel
