"""ACSF golden-value parity with the reference implementation.

Geometry fixture + expected descriptor values are the reference's published
test vectors (``/root/reference/test/test_hdnnp.py:8-134``) — behavioral
parity check of ACSFG2/ACSFG4 against kgcnn's numbers, on our flat-batch
implementation.
"""
import numpy as np
import jax

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_angle
from gcnn_keras_tpu.layers.conv.acsf import ACSFG2, ACSFG4

# third molecule of the reference fixture (three CH3-S units)
POS = np.array([
    [-0.8067180, 0.0475439, 1.5251484],
    [0.3116624, 0.2691858, 0.0786324],
    [-0.2255019, -0.2220590, 2.4060774],
    [-1.4979938, -0.7535269, 1.2757967],
    [-1.3445395, 0.9720244, 1.7264612],
    [-1.7790900, 0.0209031, -1.8054100],
    [-0.5677430, -1.0588900, -0.9579280],
    [-2.5303600, 0.4056500, -1.1116500],
    [-2.2931400, -0.5487300, -2.5840100],
    [-1.2769100, 0.8703580, -2.2718800],
    [2.5277800, 0.5632240, 1.8126600],
    [1.2848000, 1.6235700, 0.9897200],
    [3.2810100, 1.1954700, 2.2894300],
    [2.0753200, -0.0677200, 2.5815300],
    [3.0240100, -0.0818562, 1.0861300],
], dtype=np.float32)
Z = np.array([6, 16, 1, 1, 1, 6, 16, 1, 1, 1, 6, 16, 1, 1, 1], dtype=np.int64)

G2_EXPECTED_ATOM0 = np.array([
    7.011673, 2.1447349, 7.011673, 4.2706203, 1.4739769, 0.04355875,
    1.4739769, 1.3946176, 2.579667, 0.5183595, 2.579667, 2.230977])

G4_EXPECTED_ATOM0 = np.array([
    4.093878746032715, 3.8475711345672607, 0.45441314578056335,
    0.9100052118301392, 0.51732337474823, 0.2600725293159485,
    0.031431298702955246, 0.002341042272746563, 0.6844168305397034,
    2.004915952682495, 0.13527904450893402, 1.1940642595291138,
    0.0003382707363925874, 0.001611050684005022, 1.046786655933829e-05,
    0.0008169701904989779, 4.2289838790893555, 4.576600551605225,
    0.44851353764533997, 0.6955477595329285, 0.0896565243601799,
    0.054230786859989166, 0.00514655327424407, 0.001017893897369504,
    0.001709476695396006, 0.0008070105686783791, 0.00011411488230805844,
    2.8149503350505256e-07, 1.0225409408093356e-10, 4.827216057434747e-11,
    6.82589791980992e-12, 1.683791046045227e-14, 0.27127137780189514,
    1.2421965599060059, 0.0007643443532288074, 0.4701008200645447,
    0.00020793949079234153, 0.0013072892324998975, 9.969490122330171e-09,
    0.000549450283870101, 0.30053770542144775, 1.2993861436843872,
    0.0007059765048325062, 0.4033553898334503, 0.0027985533233731985,
    0.016471944749355316, 1.2086698575330956e-07, 0.005516418721526861])


def _full_edges(n):
    ei = [[i, j] for i in range(n) for j in range(n) if i != j]
    return np.array(ei, dtype=np.int64)


def _make_batch():
    g = {"node_number": Z, "node_coordinates": POS,
         "edge_indices": _full_edges(len(Z))}
    g = set_angle(g, range_indices="edge_indices")
    return batch_graphs([g], n_node_pad=16, n_edge_pad=256, n_angle_pad=4096)


def test_acsf_g2_golden():
    b = _make_batch()
    layer = ACSFG2(**ACSFG2.make_param_table(
        eta=[0.0, 0.3], rs=[0.0, 3.0], rc=10.0, elements=[1, 6, 16]))
    out = np.asarray(layer.apply({}, b))
    assert np.all(np.abs(out[0] - G2_EXPECTED_ATOM0) < 1e-4), out[0]


def test_acsf_g4_golden():
    b = _make_batch()
    layer = ACSFG4(**ACSFG4.make_param_table(
        eta=[0.0, 0.3], zeta=[1.0, 8.0], lamda=[-1.0, 1.0], rc=6.0,
        elements=[1, 6, 16]), multiplicity=2.0)
    out = np.asarray(layer.apply({}, b))
    assert np.all(np.abs(out[0] - G4_EXPECTED_ATOM0) < 1e-4), \
        np.abs(out[0] - G4_EXPECTED_ATOM0).max()
