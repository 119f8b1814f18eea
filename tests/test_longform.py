"""Long-form chunked inference: exact for short files, sane for long ones."""

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.decode.longform import chunk_feats, longform_greedy_decode
from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask

ARGS = dict(
    vocab_size=16, enc_d_model=32, enc_layers=2, enc_heads=2, enc_d_ff=64,
    enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
    deterministic=True, compute_dtype=jnp.float32, remat=False,
)


def _model_and_params():
    model = ConformerASR(**ARGS)
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (1, 29, 80))
    v = model.init(key, feats, jnp.array([29]), precision_to_binary_mask(2, 2))
    return model, v["params"]


def test_chunking_covers_everything():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1000, 80)).astype(np.float32)
    chunks, lens, hop = chunk_feats(feats, 300, 60)
    assert hop == 240
    # every input frame appears in at least one window
    covered = np.zeros(1000, bool)
    for i in range(chunks.shape[0]):
        covered[i * hop : i * hop + int(lens[i])] = True
    assert covered.all()
    # windows reproduce the input
    np.testing.assert_array_equal(chunks[0, : int(lens[0])], feats[:300])


def test_short_file_is_exact_single_pass():
    model, params = _model_and_params()
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((97, 80)).astype(np.float32)
    bm = precision_to_binary_mask(2, 2)
    ids_long, n_long = longform_greedy_decode(
        model, params, feats, bm, blank_id=3, chunk_frames=300, overlap_frames=40
    )
    # direct reference pass
    from onebit_asr_tpu.decode.greedy import greedy_ctc_decode

    _, mask, logits = model.apply(
        {"params": params}, jnp.asarray(feats)[None], jnp.asarray([97]), bm
    )
    ids_ref, lens_ref = greedy_ctc_decode(logits, jnp.sum(mask, -1), 3)
    np.testing.assert_array_equal(ids_long, np.asarray(ids_ref[0, : int(lens_ref[0])]))


def test_long_file_runs_and_is_finite():
    model, params = _model_and_params()
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((1100, 80)).astype(np.float32)
    bm = precision_to_binary_mask(1, 2)
    ids, n = longform_greedy_decode(
        model, params, feats, bm, blank_id=3, chunk_frames=400, overlap_frames=80
    )
    assert n == len(ids)
    assert (ids >= 0).all() and (ids < ARGS["vocab_size"]).all()
    assert (ids != 3).all()  # no blanks in output
