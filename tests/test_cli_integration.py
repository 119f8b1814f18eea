"""CLI integration: prepare → train → resume → evaluate, all through main()s.

The full user journey on the synthetic backend with a tiny model — the
test-suite equivalent of the reference's manual run steps (README.md:1-13).
"""

import json
import os

import numpy as np
import pytest

TINY = [
    "--enc_layers", "2", "--enc_d_model", "32", "--enc_heads", "2",
    "--enc_d_ff", "64", "--enc_conv_kernel", "7", "--dec_layers", "1",
    "--dec_heads", "2", "--dec_d_ff", "64", "--warmup_steps", "2",
    "--compute_dtype", "float32", "--batch_size", "2",
]


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli"))


def test_train_eval_resume_cycle(workspace):
    from onebit_asr_tpu.cli.evaluate import main as eval_main
    from onebit_asr_tpu.cli.train import main as train_main

    save = os.path.join(workspace, "ckpt")
    rc = train_main(
        ["--dummy_data", "--epochs", "1", "--steps_per_epoch", "2",
         "--eval_batches", "1", "--save_dir", save, "--run_name", "it"] + TINY
    )
    assert rc == 0
    run_dir = os.path.join(save, "it")
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    metrics = [
        json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    assert metrics and "wer_2bit" in metrics[-1]

    # resume continues from the checkpointed step
    rc = train_main(
        ["--dummy_data", "--epochs", "2", "--steps_per_epoch", "2",
         "--eval_batches", "1", "--save_dir", save, "--run_name", "it",
         "--resume"] + TINY
    )
    assert rc == 0
    metrics2 = [
        json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    assert metrics2[-1]["step"] > metrics[-1]["step"]

    # standalone evaluation from the run dir (greedy + device beam)
    rc = eval_main(
        ["--checkpoint", run_dir, "--dummy_data", "--greedy",
         "--max_batches", "1", "--batch_size", "2"]
    )
    assert rc == 0
    rc = eval_main(
        ["--checkpoint", run_dir, "--dummy_data", "--max_batches", "1",
         "--batch_size", "2", "--beam_size", "4", "--precisions", "2"]
    )
    assert rc == 0


def test_fused_subsampler_flag_and_checkpoint_interchange(workspace):
    """--fused_subsampler trains through the CLI, and its checkpoint
    evaluates on the unfused path (identical parameter layout)."""
    import json as _json

    from onebit_asr_tpu.cli.evaluate import main as eval_main
    from onebit_asr_tpu.cli.train import main as train_main

    save = os.path.join(workspace, "ckpt_fused")
    rc = train_main(
        ["--dummy_data", "--epochs", "1", "--steps_per_epoch", "2",
         "--eval_batches", "1", "--save_dir", save, "--run_name", "fs",
         "--fused_subsampler"] + TINY
    )
    assert rc == 0
    run_dir = os.path.join(save, "fs")
    cfg = _json.load(open(os.path.join(run_dir, "config.json")))
    assert cfg["model"]["fused_subsampler"] is True
    # evaluate the fused-trained checkpoint with the unfused model: the
    # two paths share the conv1/conv2 variable layout by construction
    rc = eval_main(
        ["--checkpoint", run_dir, "--dummy_data", "--greedy",
         "--max_batches", "1", "--batch_size", "2", "--no_fused_kernels"]
    )
    assert rc == 0


def test_export_cli_roundtrip(workspace):
    """train → export offline artifact → run it standalone; export the
    streaming step from a chunked-causal run."""
    from onebit_asr_tpu.cli.export import main as export_main
    from onebit_asr_tpu.cli.train import main as train_main

    save = os.path.join(workspace, "ckpt_exp")
    rc = train_main(
        ["--dummy_data", "--epochs", "1", "--steps_per_epoch", "2",
         "--eval_batches", "1", "--save_dir", save, "--run_name", "ex"]
        + TINY
    )
    assert rc == 0
    run_dir = os.path.join(save, "ex")
    art = os.path.join(workspace, "offline.export")
    rc = export_main(
        ["offline", "--checkpoint", run_dir, "--out", art,
         "--precision", "2", "--batch", "2", "--frames", "64"]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(art, "module.jexp"))
    meta = json.load(open(os.path.join(art, "meta.json")))
    assert meta["kind"] == "offline" and meta["num_frames"] == 64
    # standalone decode through the artifact (random-noise smoke)
    rc = export_main(["run", "--artifact", art])
    assert rc == 0
    # decode a features file through it
    feats = np.random.default_rng(0).standard_normal((1, 48, 80))
    npz = os.path.join(workspace, "feats.npz")
    np.savez(npz, feats=feats.astype(np.float32))
    rc = export_main(["run", "--artifact", art, "--features", npz])
    assert rc == 0

    # fresh-process simulation: train_main set the rbg PRNG impl for this
    # process, which masked a real bug where export's main() never set it
    # and a standalone `python -m onebit_asr_tpu.cli.export` could not
    # restore any train-CLI checkpoint (rng key (2,) vs stored (4,)).
    # Flip the impl back to the JAX default and require export to recover.
    import jax

    jax.config.update("jax_default_prng_impl", "threefry2x32")
    try:
        rc = export_main(
            ["offline", "--checkpoint", run_dir, "--out", art,
             "--precision", "2", "--batch", "2", "--frames", "64"]
        )
        assert rc == 0
    finally:
        jax.config.update("jax_default_prng_impl", "rbg")

    # streaming artifact needs a chunked-causal checkpoint
    rc = train_main(
        ["--dummy_data", "--epochs", "1", "--steps_per_epoch", "2",
         "--eval_batches", "1", "--save_dir", save, "--run_name", "exs",
         "--attn_chunk_size", "4", "--attn_left_chunks", "1",
         "--causal_conv", "--conv_norm", "layer_norm"] + TINY
    )
    assert rc == 0
    art_s = os.path.join(workspace, "stream.export")
    rc = export_main(
        ["streaming", "--checkpoint", os.path.join(save, "exs"),
         "--out", art_s, "--precision", "2"]
    )
    assert rc == 0
    meta_s = json.load(open(os.path.join(art_s, "meta.json")))
    assert meta_s["kind"] == "streaming" and meta_s["chunk_size"] == 4


def test_evaluate_torch_checkpoint_cli(workspace):
    """The reference's deployment flow end-to-end on OUR CLI: torch.save a
    real reference-model checkpoint (+ sibling config.json, exactly the
    train.py:307-318 payload), then score WER at 32/2/1-bit through
    `evaluate --torch_checkpoint` with no Python glue (VERDICT r2 item 2;
    reference flow /root/reference/eval.py:209-291)."""
    import sys

    torch = pytest.importorskip("torch")
    for p in ("/root/reference", "/root/reference/onebit_asr"):
        if p not in sys.path:
            sys.path.insert(0, p)
    from conformer import ConformerASR as RefConformerASR

    from onebit_asr_tpu.cli.evaluate import main as eval_main

    hp = dict(input_dim=80, enc_d_model=32, enc_layers=2, enc_heads=2,
              enc_d_ff=64, enc_conv_kernel=7, dec_layers=1, dec_heads=2,
              dec_d_ff=64)
    torch.manual_seed(0)
    ref = RefConformerASR(
        input_dim=hp["input_dim"], vocab_size=32,
        enc_d_model=hp["enc_d_model"], enc_layers=hp["enc_layers"],
        enc_heads=hp["enc_heads"], enc_d_ff=hp["enc_d_ff"],
        enc_conv_kernel=hp["enc_conv_kernel"], dec_layers=hp["dec_layers"],
        dec_heads=hp["dec_heads"], dec_d_ff=hp["dec_d_ff"], pad_id=0,
    )
    run_dir = os.path.join(workspace, "ref_run")
    os.makedirs(run_dir, exist_ok=True)
    ckpt_path = os.path.join(run_dir, "best.pt")
    torch.save(
        {"epoch": 1, "model": ref.state_dict(), "args": dict(hp),
         "val_loss": 1.0},
        ckpt_path,
    )
    # sibling config.json, as the reference writes it (train.py:272-280)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump({**hp, "vocab_size": 32,
                   "special_ids": {"pad": 0, "bos": 1, "eos": 2, "blank": 3}},
                  f)

    rc = eval_main(
        ["--torch_checkpoint", ckpt_path, "--dummy_data", "--greedy",
         "--max_batches", "1", "--batch_size", "2", "--print_samples", "1"]
    )
    assert rc == 0
    # beam path too, single precision
    rc = eval_main(
        ["--torch_checkpoint", ckpt_path, "--dummy_data",
         "--max_batches", "1", "--batch_size", "2", "--beam_size", "4",
         "--precisions", "2"]
    )
    assert rc == 0


def test_tensor_parallel_train(workspace):
    """--tensor_parallel 2 trains through the CLI on the fake 8-device
    mesh (2-way model axis x 4-way data), composes with --grad_accum, and
    its checkpoint resumes AND evaluates on the plain replicated path
    (TP is a layout, not a format — topology-independent restore)."""
    from onebit_asr_tpu.cli.evaluate import main as eval_main
    from onebit_asr_tpu.cli.train import main as train_main

    save = os.path.join(workspace, "ckpt_tp")
    rc = train_main(
        ["--dummy_data", "--epochs", "1", "--steps_per_epoch", "2",
         "--eval_batches", "1", "--save_dir", save, "--run_name", "tp",
         "--tensor_parallel", "2", "--grad_accum", "2",
         "--batch_size", "8"] + TINY[:-2]
    )
    assert rc == 0
    run_dir = os.path.join(save, "tp")
    metrics = [
        json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    assert metrics and np.isfinite(metrics[-1]["train_loss"])
    rc = eval_main(
        ["--checkpoint", run_dir, "--dummy_data", "--greedy",
         "--max_batches", "1", "--batch_size", "2"]
    )
    assert rc == 0
    # invalid compositions are rejected up front
    rc = train_main(
        ["--dummy_data", "--tensor_parallel", "2", "--fsdp",
         "--batch_size", "8"] + TINY[:-2]
    )
    assert rc == 1


def test_fp32_control_train(workspace):
    """--fp32_control trains the no-QAT single-branch baseline end-to-end
    and evaluates fp32 only (VERDICT r3 item 7)."""
    from onebit_asr_tpu.cli.train import main as train_main

    save = os.path.join(workspace, "ckpt_fp32")
    rc = train_main(
        ["--dummy_data", "--epochs", "1", "--steps_per_epoch", "2",
         "--eval_batches", "1", "--save_dir", save, "--run_name", "fp32",
         "--fp32_control"] + TINY
    )
    assert rc == 0
    run_dir = os.path.join(save, "fp32")
    metrics = [
        json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    last = metrics[-1]
    assert "wer_32bit" in last and np.isfinite(last["train_loss"])
    # QAT-only metrics must be absent — one branch, one precision
    assert "wer_2bit" not in last and "loss_2bit" not in last
