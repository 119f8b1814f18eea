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
