"""Axis helper (parity: ``kgcnn/ops/axis.py:36``)."""


def get_positive_axis(axis: int, rank: int) -> int:
    if axis < 0:
        axis += rank
    if not 0 <= axis < rank:
        raise ValueError(f"axis {axis} out of range for rank {rank}")
    return axis
