"""Structured metrics logging: JSONL on disk, stdout, optional wandb.

The reference hard-requires a wandb API key file and exits without it
(/root/reference/onebit_asr/train.py:214-221). Here wandb is optional —
every run always gets a local `metrics.jsonl` (one JSON object per logged
step/epoch) plus stdout lines; if wandb is importable AND configured, the
same dicts are mirrored there (project/group/run-name convention preserved:
project ASR-1bit, reference train.py:222-232).
"""

from __future__ import annotations

import json
import os
import socket
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, run_dir: str, use_wandb: bool = False, config: Optional[dict] = None):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(
                    project="ASR-1bit",
                    group="tpu-conformer",
                    name=f"{socket.gethostname()}-{int(time.time())}",
                    config=config or {},
                    resume="allow",
                )
            except Exception as e:  # wandb genuinely optional
                print(f"[metrics] wandb unavailable ({e}); logging locally only")

    def log(self, payload: Dict[str, Any], step: Optional[int] = None) -> None:
        rec = {"ts": time.time(), **payload}
        if step is not None:
            rec["step"] = int(step)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(payload, step=step)

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
