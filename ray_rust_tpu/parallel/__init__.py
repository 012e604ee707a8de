from .shard import make_mesh, render_sharded, render_tiled_u8
from .train import render_loss, make_train_step, sgd_train_step, TrainState
from .multihost import (
    global_mesh,
    init_distributed,
    is_primary,
    render_multihost,
)
from .scaling import format_report, measure_scaling
