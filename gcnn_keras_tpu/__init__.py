"""gcnn_keras_tpu — a TPU-native graph neural network framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``Tacitus523/gcnn_keras`` (kgcnn 2.2.3): graph neural networks for molecules,
materials and machine-learned interatomic potentials (SchNet, PAiNN,
HDNNP 2nd/4th generation with charge equilibration), built on flat padded
disjoint graph batches, jit-compiled end to end, with ``shard_map`` data /
edge parallelism over TPU meshes and Pallas kernels on the hot aggregation
paths.
"""

__version__ = "0.1.0"

from .batch import GraphBatch, batch_graphs, flat_to_padded, padded_to_flat
