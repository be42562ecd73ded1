"""Data preparation script (parity: reference ``prepare_data.py``, 395 LoC):
convert geometry/energy/gradient/charge/ESP files — or one extxyz — into a
pickled MemoryGraphDataset with neighbor lists and angle triples, converting
units to atomic units.

Usage:
    python prepare_data.py --extxyz geoms.extxyz --out dataset_dir
    python prepare_data.py --geoms geoms.xyz --energies energies.txt \
        --forces forces.xyz --charges charges.txt --esp esp.txt \
        --esp-grad esp_grad.xyz --out dataset_dir
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from gcnn_keras_tpu.data.dataset import MemoryGraphDataset
from gcnn_keras_tpu.mol.io import read_xyz_file, read_extxyz_file
from gcnn_keras_tpu.utils import constants

# reference defaults (prepare_data.py:28-60): cutoff 10 A -> Bohr, <=25 nbrs
DEFAULT_CUTOFF_A = 10.0
DEFAULT_MAX_NEIGHBORS = 25


def read_column_file(path):
    return np.loadtxt(path).reshape(-1) if path else None


def read_per_atom_file(path):
    """xyz-like per-atom vector file (e.g. forces.xyz / esp_grad.xyz)."""
    if not path:
        return None
    frames = read_xyz_file(path)
    return [np.array(xyz, dtype=np.float64) for _, xyz in frames]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--extxyz", default=None)
    ap.add_argument("--geoms", default=None)
    ap.add_argument("--energies", default=None)
    ap.add_argument("--forces", default=None)
    ap.add_argument("--charges", default=None, help="per-atom charges, one row per frame")
    ap.add_argument("--total-charges", default=None)
    ap.add_argument("--esp", default=None)
    ap.add_argument("--esp-grad", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cutoff", type=float, default=DEFAULT_CUTOFF_A)
    ap.add_argument("--max-neighbours", type=int, default=DEFAULT_MAX_NEIGHBORS)
    ap.add_argument("--units", choices=["angstrom_ev", "atomic"], default="atomic",
                    help="units of the INPUT files")
    ap.add_argument("--angles", action="store_true", help="add angle triples (HDNNP)")
    args = ap.parse_args()

    ds = MemoryGraphDataset(data_directory=args.out, dataset_name="prepared",
                            file_name="dataset")
    to_bohr = constants.angstrom_to_bohr
    to_hartree = constants.ev_to_hartree

    if args.extxyz:
        frames = read_extxyz_file(args.extxyz)
        for fr in frames:
            g = dict(fr)
            if args.units == "angstrom_ev":
                g["node_coordinates"] = g["node_coordinates"] * to_bohr
                if "energy" in g:
                    g["energy"] = g["energy"] * to_hartree
                if "force" in g:
                    g["force"] = g["force"] * (to_hartree / to_bohr)
            ds.append(g)
    else:
        geoms = read_xyz_file(args.geoms)
        energies = read_column_file(args.energies)
        forces = read_per_atom_file(args.forces)
        esp_grad = read_per_atom_file(args.esp_grad)
        charges = np.loadtxt(args.charges) if args.charges else None
        esp = np.loadtxt(args.esp) if args.esp else None
        total_charges = read_column_file(args.total_charges)
        for i, (z, xyz) in enumerate(geoms):
            xyz = np.array(xyz, dtype=np.float64)
            if args.units == "angstrom_ev":
                xyz = xyz * to_bohr
            g = {"node_number": np.array(z, dtype=np.int64),
                 "node_coordinates": xyz.astype(np.float32)}
            if energies is not None:
                e = energies[i] * (to_hartree if args.units == "angstrom_ev" else 1.0)
                g["energy"] = np.array([e], dtype=np.float32)
            if forces is not None:
                f = forces[i] * ((to_hartree / to_bohr)
                                 if args.units == "angstrom_ev" else 1.0)
                g["force"] = f.astype(np.float32)
            if charges is not None:
                g["charge"] = np.atleast_2d(charges)[i][:len(z)].astype(np.float32)
            if esp is not None:
                g["esp"] = np.atleast_2d(esp)[i][:len(z)].astype(np.float32)
            if esp_grad is not None:
                g["esp_grad"] = esp_grad[i].astype(np.float32)
            if total_charges is not None:
                g["total_charge"] = np.array([total_charges[i]], dtype=np.float32)
            else:
                g["total_charge"] = np.array(
                    [float(g["charge"].sum())] if "charge" in g else [0.0],
                    dtype=np.float32)
            ds.append(g)

    # coordinates are stored in Bohr; cutoff is given in Angstrom like the
    # reference (prepare_data.py:28-60)
    ds.map_list("set_range", max_distance=args.cutoff * to_bohr,
                max_neighbours=args.max_neighbours)
    if args.angles:
        ds.map_list("set_angle")
    for g in ds:
        g["edge_indices"] = g["range_indices"]

    os.makedirs(args.out, exist_ok=True)
    ds.save()
    print(f"prepared {len(ds)} frames -> {ds.file_path}.pickle")


if __name__ == "__main__":
    main()
