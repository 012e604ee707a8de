from .shard import make_mesh, render_sharded, render_tiled_u8
from .train import render_loss, make_train_step, sgd_train_step, TrainState
