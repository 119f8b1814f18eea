"""Loss functions: on-device CTC, masked label-smoothed CE, KL distillation."""

from onebit_asr_tpu.losses.attention import (  # noqa: F401
    att_ce_loss,
    kl_logits,
    make_att_targets,
)
from onebit_asr_tpu.losses.ctc import ctc_loss  # noqa: F401
