"""SpecAugment as a keyed, batched, jit-friendly device op.

Reference semantics (src/data/dataset.py:150-209): per utterance, apply 2
frequency masks and 2 time masks, each of FIXED width min(mask_param, size)
— note the reference does NOT randomize the width, only the start — start
drawn uniformly from [0, max(1, size - width)), zero-filled, post-CMVN,
training only. Defaults: freq 27 x2, time 100 x2 (dataset.py:55-60).

One deliberate deviation, `time_mask_ratio` (SpecAugment's "p", Park et
al. 2019): each time mask is additionally capped at ratio * true_length.
The reference applies up-to-100-frame masks to utterances of ANY length —
on its documented 1% LibriSpeech subset (short utterances) a single mask
can blank essentially the whole utterance. A fully-blanked utterance feeds
the encoder exact-zero valid frames; at init, every pre-LN LayerNorm then
sees zero variance and its backward amplifies cotangents by rsqrt(eps) ≈
316 PER NORM, compounding across the depth to overflow (measured: 1e37
cotangents, then inf*0 = NaN — reproduced and root-caused in round 2; very
plausibly the mechanism behind the reference's own documented NaN defect,
README.md:17-18). With the cap no utterance can lose more than
num_time_masks * ratio of its frames. ratio=1.0 restores exact reference
behavior.

Masks are built as boolean index-range comparisons inside jit and applied
to the whole padded batch at once with per-utterance PRNG keys; time masks
are drawn against each utterance's true length, not the padded length.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from onebit_asr_tpu.utils.config import FrontendConfig


def _mask_axis_once(key, size_valid, mask_param, axis_len):
    """Return bool [axis_len] mask (True = zero out) with reference semantics."""
    width = jnp.minimum(mask_param, size_valid)
    hi = jnp.maximum(1, size_valid - width)  # exclusive upper bound for start
    start = jax.random.randint(key, (), 0, hi)
    pos = jnp.arange(axis_len)
    return (pos >= start) & (pos < start + width)


@partial(
    jax.jit, static_argnames=("num_freq_masks", "num_time_masks", "time_mask_ratio")
)
def spec_augment(
    key: jax.Array,
    feats: jnp.ndarray,
    feat_lens: jnp.ndarray,
    freq_mask_param: int = 27,
    time_mask_param: int = 100,
    num_freq_masks: int = 2,
    num_time_masks: int = 2,
    time_mask_ratio: float = 0.3,
) -> jnp.ndarray:
    """feats: [B, T, F] (post-CMVN); feat_lens: [B]. Returns masked feats."""
    B, T, F = feats.shape

    def per_utt(k, x, n):
        keys = jax.random.split(k, num_freq_masks + num_time_masks)
        zero = jnp.zeros((), x.dtype)
        for i in range(num_freq_masks):
            fm = _mask_axis_once(keys[i], jnp.asarray(F), freq_mask_param, F)
            x = jnp.where(fm[None, :], zero, x)
        # cap each time mask at ratio * true length (see module docstring)
        t_param = jnp.minimum(
            jnp.asarray(time_mask_param),
            jnp.floor(time_mask_ratio * n.astype(jnp.float32)).astype(n.dtype),
        )
        for j in range(num_time_masks):
            tm = _mask_axis_once(keys[num_freq_masks + j], n, t_param, T)
            x = jnp.where(tm[:, None], zero, x)
        return x

    keys = jax.random.split(key, B)
    return jax.vmap(per_utt)(keys, feats, feat_lens)


def spec_augment_from_config(key, feats, feat_lens, cfg: FrontendConfig):
    return spec_augment(
        key,
        feats,
        feat_lens,
        freq_mask_param=cfg.freq_mask_param,
        time_mask_param=cfg.time_mask_param,
        num_freq_masks=cfg.num_freq_masks,
        num_time_masks=cfg.num_time_masks,
        time_mask_ratio=cfg.time_mask_ratio,
    )


@partial(
    jax.jit, static_argnames=("num_freq_masks", "num_time_masks", "time_mask_ratio")
)
def _spec_augment_indexed(
    epoch_key, batch_index, feats, feat_lens,
    freq_mask_param, time_mask_param,
    num_freq_masks, num_time_masks, time_mask_ratio,
):
    key = jax.random.fold_in(epoch_key, batch_index)
    return spec_augment(
        key, feats, feat_lens, freq_mask_param, time_mask_param,
        num_freq_masks, num_time_masks, time_mask_ratio,
    )


def spec_augment_indexed_from_config(
    epoch_key, batch_index, feats, feat_lens, cfg: FrontendConfig
):
    """spec_augment with the per-batch key DERIVED INSIDE the jit.

    The producer-thread pattern `fold_in(key, i)` + `device_put` +
    `spec_augment(...)` issues several small synchronous device calls per
    batch; through a tunneled device each costs a network roundtrip and
    the input pipeline measured 473 ms/batch — 0.93 input_wait_frac on
    the round-5 capstone — vs 3 ms without augmentation. Folding the key
    math into the one jitted call makes the producer a single async
    dispatch per batch. Bit-identical masks: the same
    fold_in(epoch_key, i) → split chain runs, just on device inside jit
    (pinned by tests/test_data.py::test_spec_augment_indexed_identical).
    `batch_index` is an operand, not static — no per-batch recompile."""
    return _spec_augment_indexed(
        epoch_key, jnp.asarray(batch_index, jnp.uint32), feats, feat_lens,
        cfg.freq_mask_param, cfg.time_mask_param,
        cfg.num_freq_masks, cfg.num_time_masks, cfg.time_mask_ratio,
    )
