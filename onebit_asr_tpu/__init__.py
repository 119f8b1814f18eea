"""onebit_asr_tpu — TPU-native BitNet-style 1.58-bit QAT ASR framework.

A ground-up JAX / XLA / Pallas / pjit re-design with the capabilities of the
PyTorch reference `y00njaekim/CMU-11785-IDL-1.58bit-ASR`:

- binary (1-bit) / ternary (1.58-bit, "2-bit") weight quantization-aware
  training with a learnable tensor-wise scale alpha and straight-through
  estimator gradients (reference: onebit_asr/quant.py:38-127),
- a Conformer CTC+attention ASR model (reference: onebit_asr/conformer.py),
- a three-branch QAT training step (2-bit teacher / 1-bit student /
  stochastic-precision submodel) with CTC+attention interpolated loss and KL
  distillation (reference: onebit_asr/train.py:62-169),
- a Kaldi-compatible log-mel fbank + CMVN + SpecAugment frontend
  (reference: src/data/dataset.py:106-209) — here fused, jitted device code,
- WER evaluation via CTC greedy / prefix beam-search decoding
  (reference: onebit_asr/metrics.py, eval.py).

Unlike the reference, everything on the compute path is designed TPU-first:
static shapes, length-bucketed batches, `jax.sharding.Mesh` data parallelism,
Pallas kernels for hot ops, and NaN-free numerics by construction (the
reference's README documents NaN blowups and a batch-size<8 ceiling as open
defects; this framework removes both).
"""

__version__ = "0.1.0"

from onebit_asr_tpu.utils.config import (  # noqa: F401
    DataConfig,
    EvalConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
)
