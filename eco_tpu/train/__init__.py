from eco_tpu.train.solver import (
    SolverConfig,
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
    param_multipliers,
)
from eco_tpu.train.lr_policies import learning_rate
from eco_tpu.train.checkpoint import (
    load_model,
    restore,
    restore_weights,
    save_model,
    snapshot,
)
