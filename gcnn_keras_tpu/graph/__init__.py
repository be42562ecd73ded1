from .preprocess import (
    set_range, set_angle, set_range_periodic, make_undirected_edges,
    add_edge_self_loops, sort_edge_indices, set_edge_weights_uniform,
    normalize_edge_weights_symmetric, compute_reverse_edges_index_map,
    get_preprocessor, GraphPreprocessorBase,
)
