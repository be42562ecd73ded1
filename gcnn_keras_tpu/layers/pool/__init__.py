from .set2set import Set2Set
from .lstm import PoolingLocalEdgesLSTM
from .topk import PoolingTopK, UnPoolingTopK, AdjacencyPower
