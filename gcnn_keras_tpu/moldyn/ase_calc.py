"""ASE calculator bridge (parity: ``kgcnn/moldyn/ase_calc.py:14,75``
AtomsToGraphConverter + KgcnnSingleCalculator). ASE is optional."""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class AtomsToGraphConverter:
    """Map ase.Atoms getters to GraphDict keys (``ase_calc.py:14``)."""

    def __init__(self, properties: Optional[Dict[str, str]] = None):
        self.properties = properties or {
            "node_number": "get_atomic_numbers",
            "node_coordinates": "get_positions",
        }

    def __call__(self, atoms) -> dict:
        g = {}
        for key, getter in self.properties.items():
            g[key] = np.asarray(getattr(atoms, getter)())
        if getattr(atoms, "pbc", None) is not None and np.any(atoms.pbc):
            g["graph_lattice"] = np.asarray(atoms.get_cell()[:], dtype=np.float32)
        return g


try:
    from ase.calculators.calculator import Calculator, all_changes

    class TPUGraphCalculator(Calculator):
        """ASE calculator delivering model energy/forces into MD loops
        (``ase_calc.py:75`` KgcnnSingleCalculator)."""

        implemented_properties = ["energy", "forces", "charges"]

        def __init__(self, model_predictor, converter: Optional[AtomsToGraphConverter] = None,
                     **kwargs):
            super().__init__(**kwargs)
            self.model_predictor = model_predictor
            self.converter = converter or AtomsToGraphConverter()

        def calculate(self, atoms=None, properties=None,
                      system_changes=all_changes):
            super().calculate(atoms=atoms, properties=properties,
                              system_changes=system_changes)
            graph = self.converter(self.atoms)
            result = self.model_predictor([graph])[0]
            if "energy" in result:
                self.results["energy"] = float(np.asarray(result["energy"]).reshape(-1)[0])
            if "force" in result:
                self.results["forces"] = np.asarray(result["force"])
            if "charge" in result:
                self.results["charges"] = np.asarray(result["charge"])

    KgcnnSingleCalculator = TPUGraphCalculator  # reference-name alias
except ImportError:  # ase not installed
    TPUGraphCalculator = None
    KgcnnSingleCalculator = None
