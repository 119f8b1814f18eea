"""Parallelism: device mesh, sharding rules, data-parallel jit wiring."""

from onebit_asr_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    constrain,
    make_mesh,
    make_multislice_mesh,
    replicate,
    shard_batch,
)
from onebit_asr_tpu.parallel.fsdp import (  # noqa: F401
    fsdp_state_shardings,
    fsdp_state_specs,
    make_fsdp_train_step,
    shard_state_fsdp,
)
from onebit_asr_tpu.parallel.pipeline import (  # noqa: F401
    make_pipeline_train_step,
    pipeline_spec_tree,
    shard_state_pipeline,
)
from onebit_asr_tpu.parallel.sharding_rules import (  # noqa: F401
    shard_params_tp,
    shard_state_tp,
    tp_param_shardings,
    tp_state_shardings,
)
