from .set2set import Set2Set
from .topk import PoolingTopK, UnPoolingTopK, AdjacencyPower
