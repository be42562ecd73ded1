from .losses import masked_graph_mae, masked_graph_mse, masked_node_mae, force_loss
from .schedules import (
    linear_warmup_exponential_decay, linear_learning_rate, cosine_annealing,
    linear_warmup_linear_decay,
)
from .trainer import Trainer, TrainState
