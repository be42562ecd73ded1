"""Molecule conversion pipeline (parity: ``kgcnn/mol/convert.py:168``
MolConverter): batch SMILES/xyz -> mol blocks with a thread pool, optional
external conformer generator (balloon) via subprocess."""
from __future__ import annotations

import logging
import subprocess
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

logger = logging.getLogger(__name__)


class MolConverter:
    def __init__(self, num_workers: int = 4, external_program: Optional[dict] = None,
                 sanitize: bool = True, add_hydrogen: bool = True,
                 make_conformers: bool = True, optimize_conformer: bool = True):
        self.num_workers = num_workers
        self.external_program = external_program
        self.sanitize = sanitize
        self.add_hydrogen = add_hydrogen
        self.make_conformers = make_conformers
        self.optimize_conformer = optimize_conformer

    def _one(self, smiles: str) -> Optional[str]:
        if self.external_program:
            return self._external(smiles)
        from .graph_rdkit import MolecularGraphRDKit
        mg = MolecularGraphRDKit().from_smiles(
            smiles, sanitize=self.sanitize, add_hydrogen=self.add_hydrogen,
            make_conformers=self.make_conformers,
            optimize_conformer=self.optimize_conformer)
        return mg.to_mol_block() if mg.mol is not None else None

    def _external(self, smiles: str) -> Optional[str]:
        """External conformer binary (balloon-style), parity:
        ``kgcnn/mol/external/ballloon.py``."""
        cfg = self.external_program
        cmd = [cfg["class_name"]] + list(cfg.get("config", {}).get("args", []))
        try:
            out = subprocess.run(cmd + [smiles], capture_output=True,
                                 timeout=cfg.get("timeout", 60), check=True)
            return out.stdout.decode()
        except Exception as e:
            logger.warning("external converter failed for %s: %s", smiles, e)
            return None

    def smile_to_mol(self, smiles_list: List[str]) -> List[Optional[str]]:
        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            return list(ex.map(self._one, smiles_list))

    def smile_to_sdf(self, smiles_list: List[str], output_file: str):
        blocks = self.smile_to_mol(smiles_list)
        with open(output_file, "w") as f:
            for b in blocks:
                if b:
                    f.write(b + "\n$$$$\n")
        return output_file
