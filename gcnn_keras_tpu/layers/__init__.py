from .aggr import (
    pool_edges_to_nodes, pool_weighted_edges_to_nodes, pool_nodes_to_graph,
    pool_edges_to_graph, relational_pool_edges_to_nodes, gather_nodes,
    gather_state,
)
from .geometry import (
    edge_vectors, edge_distances, gauss_basis, bessel_basis,
    cosine_cutoff_envelope, cosine_cutoff, fourier_basis,
    angle_triples, edge_directions,
)
from .mlp import MLP, RelationalMLP, Dense, RelationalDense
from .norm import GraphLayerNorm, GraphBatchNorm
from .message import MessagePassing
