"""Checkpoint / resume via Orbax — full train-state, true resume.

The reference saves per-epoch `ckpt_last.pt` / `best.pt` holding only model
+ optimizer state dicts (/root/reference/onebit_asr/train.py:307-318); its
`--resume` flag resumes nothing but the wandb run id (train.py:210, 230),
and RNG/schedule state are lost (SURVEY §5). Here the WHOLE TrainState
(params, optimizer state, step, PRNG key) plus the serialized config goes
through Orbax, so training resumes bit-exactly after preemption — schedule
position is implied by `step`, randomness by the stored key.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from onebit_asr_tpu.train.state import TrainState
from onebit_asr_tpu.utils.config import TrainConfig, config_to_json, train_config_from_json


class CheckpointManager:
    """Thin Orbax wrapper: save/restore TrainState + config + best tracking."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, metrics: Optional[dict] = None) -> None:
        step = int(state.step)
        latest = self._mgr.latest_step()
        if latest is not None and step <= latest:
            # Orbax silently refuses to save a step <= the directory's
            # latest — which happens when a save_dir is REUSED across runs
            # (observed: a fresh 2-step run "saved" into a directory
            # holding a stale step-3 checkpoint, and eval then restored
            # the stale weights). Surface it loudly; skip the no-op save
            # rather than crash a long resumed run.
            print(
                f"WARNING: not saving step {step} — {self.directory} "
                f"already holds step {latest} (stale run directory? use a "
                "fresh --run_name or delete the old checkpoints)"
            )
            return
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
            ),
            metrics=metrics,
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
            ),
        )
        return restored["state"]

    def close(self):
        self._mgr.close()


def save_config(directory: str, cfg: TrainConfig) -> None:
    """config.json next to checkpoints (reference train.py:272-280 parity)."""
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as f:
        f.write(config_to_json(cfg))


def load_config(directory: str) -> Optional[TrainConfig]:
    p = os.path.join(directory, "config.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return train_config_from_json(f.read())


def abstract_like(state: TrainState, sharding=None) -> TrainState:
    """Shape/dtype skeleton for restore-on-fresh-process.

    Every leaf carries an EXPLICIT sharding (default: single-device on the
    current process's default device). Without one, Orbax falls back to
    the sharding recorded at SAVE time — which, when the restore topology
    differs from the save topology (checkpoint written on an 8-device
    mesh, evaluated on one chip), either errors out or silently
    reassembles arrays at the wrong shape (observed: a [3,3,1,32] conv
    kernel restored as [3,3,1,64] — Orbax itself warns this path is
    "unsafe when restoring on a different topology"). An explicit
    sharding makes restore topology-independent; callers re-shard onto
    their mesh afterwards (the train CLI resume path always did).

    Pass `sharding` (a NamedSharding, or a pytree of them) to restore
    directly into a target layout instead.
    """
    if sharding is None:
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    if not isinstance(sharding, (dict, list, tuple)) and not hasattr(
        sharding, "params"
    ):
        sharding_tree = jax.tree.map(lambda x: sharding, state)
    else:
        sharding_tree = sharding
    return jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)
        if hasattr(x, "shape")
        else x,
        state,
        sharding_tree,
    )
