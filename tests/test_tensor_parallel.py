"""Tensor-parallel sharding: 2D (model x data) mesh train step on 8 fake devices.

Megatron-style column/row-parallel layout over the scanned QuantDense
stacks; XLA's SPMD partitioner inserts the collectives. The sharded step
must agree numerically with the replicated one.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from onebit_asr_tpu.data import DummyDataModule
from onebit_asr_tpu.model.asr import ConformerASR
from onebit_asr_tpu.parallel import make_mesh, replicate
from onebit_asr_tpu.parallel.sharding_rules import shard_params_tp, tp_param_shardings
from onebit_asr_tpu.train import create_train_state, make_optimizer, make_train_step
from onebit_asr_tpu.utils.config import LossConfig, OptimConfig, SpecialTokens


def _setup():
    model = ConformerASR(
        vocab_size=16, enc_d_model=32, enc_layers=2, enc_heads=2, enc_d_ff=64,
        enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
        deterministic=False, compute_dtype=jnp.float32, remat=False,
    )
    dm = DummyDataModule(batch_size=4, max_frames=32, max_tokens=6, vocab_size=16)
    optimizer = make_optimizer(OptimConfig(warmup_steps=2), total_steps=16)
    batch = next(dm.train_batches())
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), batch, 2)
    step = jax.jit(make_train_step(model, optimizer, LossConfig(), SpecialTokens(), 2))
    return model, batch, state, step


def test_tp_sharding_rules_shapes():
    _, _, state, _ = _setup()
    mesh = make_mesh((2, 4), ("model", "data"))
    shardings = tp_param_shardings(state.params, mesh)
    blocks = shardings["encoder"]["blocks"]
    assert blocks["ff1"]["w1"]["kernel"].spec == P(None, None, "model")
    assert blocks["ff1"]["w2"]["kernel"].spec == P(None, "model", None)
    assert blocks["mhsa"]["q_proj"]["kernel"].spec == P(None, None, "model")
    assert blocks["mhsa"]["out_proj"]["kernel"].spec == P(None, "model", None)
    assert blocks["ff1"]["w1"]["alpha"].spec == P()
    assert shardings["decoder"]["layer0"]["ff1"]["kernel"].spec == P()


def test_tp_train_step_matches_replicated():
    assert len(jax.devices()) == 8
    model, batch, state, step = _setup()

    # replicated reference
    s_ref, aux_ref = step(state, batch)
    loss_ref = float(aux_ref["loss"])

    mesh = make_mesh((2, 4), ("model", "data"))
    tp_params = shard_params_tp(state.params, mesh)
    rest = replicate(mesh)
    data_sh = NamedSharding(mesh, P("data"))
    batch_tp = {k: jax.device_put(v, data_sh) for k, v in batch.items()}
    state_tp = state.replace(
        params=tp_params,
        opt_state=jax.device_put(state.opt_state, rest),
        rng=jax.device_put(state.rng, rest),
        step=jax.device_put(state.step, rest),
    )
    s_tp, aux_tp = step(state_tp, batch_tp)
    loss_tp = float(aux_tp["loss"])
    assert np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_ref, rtol=1e-4)
    # second step to exercise the updated (possibly resharded) state
    s_tp2, aux_tp2 = step(s_tp, batch_tp)
    assert np.isfinite(float(aux_tp2["loss"]))
