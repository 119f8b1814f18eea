"""FSDP / ZeRO-style state sharding (parallel/fsdp.py).

FSDP here is pure GSPMD layout: the TrainState's large leaves (params and
AdamW moments) shard one dim over the 'data' axis and the UNCHANGED jit
train step runs on top — XLA inserts the gathers. So the contract to pin
is (a) the math is identical to the replicated layout, (b) the state
really is sharded (per-device bytes drop), and (c) the layout survives an
optimizer step (outputs stay sharded, no silent re-replication).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from onebit_asr_tpu.data import DummyDataModule
from onebit_asr_tpu.model.asr import ConformerASR
from onebit_asr_tpu.parallel import (
    fsdp_state_shardings,
    make_mesh,
    replicate,
    shard_batch,
    shard_state_fsdp,
)
from onebit_asr_tpu.train import create_train_state, make_optimizer, make_train_step
from onebit_asr_tpu.utils.config import LossConfig, OptimConfig, SpecialTokens

L = 2


def _setup():
    model = ConformerASR(
        vocab_size=16, enc_d_model=32, enc_layers=L, enc_heads=2, enc_d_ff=64,
        enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
        deterministic=True, compute_dtype=jnp.float32, remat=False,
    )
    dm = DummyDataModule(batch_size=8, max_frames=32, max_tokens=6, vocab_size=16)
    batch = next(dm.train_batches())
    opt = make_optimizer(OptimConfig(warmup_steps=1), total_steps=8)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch, L)
    step = jax.jit(make_train_step(model, opt, LossConfig(), SpecialTokens(), L))
    return model, batch, opt, state, step


def test_fsdp_step_matches_replicated():
    """Same jitted step, FSDP-sharded vs replicated state: identical loss,
    grad norm, and updated params (GSPMD layout cannot change the math)."""
    _, batch, _, state, step = _setup()
    mesh = make_mesh(axes=("data",))

    s_rep = jax.device_put(state, replicate(mesh))
    b = shard_batch(batch, mesh)
    ref_state, ref_aux = step(s_rep, b)

    s_fsdp = shard_state_fsdp(state, mesh)
    new_state, aux = step(s_fsdp, b)

    np.testing.assert_allclose(
        float(aux["loss"]), float(ref_aux["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(aux["grad_norm"]), float(ref_aux["grad_norm"]), rtol=1e-4
    )
    for a, b_ in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(new_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b_)), rtol=2e-4,
            atol=2e-6,
        )


def test_fsdp_layout_shards_params_and_moments():
    """Large leaves (params and BOTH AdamW moments) are genuinely split:
    per-device shard extent = global/8 on the chosen dim; small leaves
    (biases, alphas) replicate."""
    _, _, _, state, _ = _setup()
    mesh = make_mesh(axes=("data",))
    s = shard_state_fsdp(state, mesh)

    def sharded_dim(leaf):
        spec = leaf.sharding.spec
        return any(x is not None for x in spec)

    big = s.params["encoder"]["blocks"]["ff1"]["w1"]["kernel"]
    assert sharded_dim(big)
    shard_elems = {x.data.size for x in big.addressable_shards}
    assert shard_elems == {big.size // 8}
    small = s.params["encoder"]["blocks"]["ff1"]["w1"]["alpha"]
    assert not sharded_dim(small)
    # AdamW moments shard with their params (the ZeRO memory win)
    mu = None
    for leaf in jax.tree.leaves(
        jax.tree.map(lambda x: x, s.opt_state),
    ):
        if getattr(leaf, "shape", None) == big.shape and leaf is not big:
            mu = leaf
            break
    assert mu is not None and sharded_dim(mu)


def test_fsdp_layout_survives_the_step():
    """After an optimizer step the new state keeps the FSDP layout (no
    silent re-replication — the memory win must persist across steps)."""
    _, batch, _, state, step = _setup()
    mesh = make_mesh(axes=("data",))
    s = shard_state_fsdp(state, mesh)
    b = shard_batch(batch, mesh)
    s2, _ = step(s, b)
    big = s2.params["encoder"]["blocks"]["ff1"]["w1"]["kernel"]
    assert {x.data.size for x in big.addressable_shards} == {big.size // 8}
    s3, aux3 = step(s2, b)
    assert np.isfinite(float(aux3["loss"]))
