"""Data layer: manifest-based LibriSpeech pipeline, tokenizer, bucketing,
host→device prefetch, and the synthetic fake backend.

Replaces the reference's torch DataLoader stack (src/data/dataset.py,
onebit_asr/dataloader_stub.py) with a manifest-first design: lengths are
cached at prepare time (no startup feature sweep, reference
dataset.py:510-521), batches are length-bucketed to static shapes, and the
audio frontend runs as one fused device op per batch (ops/frontend.py).
"""

from onebit_asr_tpu.data.dummy import DummyDataModule
from onebit_asr_tpu.data.manifest import (
    ShardCache,
    Utterance,
    bucket_boundaries,
    bucketed_batches,
    read_manifest,
    write_manifest,
)
from onebit_asr_tpu.data.prefetch import prefetch

__all__ = [
    "DummyDataModule",
    "ShardCache",
    "Utterance",
    "bucket_boundaries",
    "bucketed_batches",
    "read_manifest",
    "write_manifest",
    "prefetch",
]
