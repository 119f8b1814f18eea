"""Training: optimizer/schedule, train state, jitted 3-branch QAT step."""

from onebit_asr_tpu.train.optim import make_optimizer, warmup_cosine_schedule  # noqa: F401
from onebit_asr_tpu.train.state import TrainState, create_train_state  # noqa: F401
from onebit_asr_tpu.train.step import (  # noqa: F401
    make_eval_step,
    make_fp32_train_step,
    make_sharded_train_step,
    make_train_step,
    sample_sp_mask,
)
