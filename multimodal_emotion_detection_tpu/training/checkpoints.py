"""Checkpointing: monitor/top-k/save-last semantics + auto-resume.

Mirrors the reference ModelCheckpoint contract
(/root/reference/src/train.py:504-511): monitor ``val/loss`` (min), keep
``save_top_k`` best files named ``epoch={e}-val_loss={v:.4f}.ckpt``, always
refresh ``last.ckpt``, and copy the winner to ``best.ckpt`` at the end
(ref :638-641).  Adds what the reference lacks (SURVEY.md §5 failure
detection row): ``latest()`` enables resume-after-preemption.

Format: flax msgpack of the full TrainState pytree + a JSON sidecar with
step/epoch/metric (stable across JAX versions, no directory trees).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _is_primary() -> bool:
    return jax.process_index() == 0


def _sync(tag: str) -> None:
    """Cross-process barrier (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def save_checkpoint(
    path: Path, state: Any, meta: Dict[str, Any], backend: str = "msgpack"
) -> None:
    """Multi-process contract: EVERY process calls this (the orbax backend
    is a collective — each process writes its addressable shards); host-side
    file writes (msgpack bytes, JSON sidecar) happen on process 0 only."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if backend == "orbax":
        _orbax_save(path, state)
    else:
        host_state = jax.device_get(state)
        if _is_primary():
            path.write_bytes(serialization.to_bytes(host_state))
    if _is_primary():
        path.with_suffix(path.suffix + ".json").write_text(
            json.dumps(meta, indent=2)
        )


def restore_checkpoint(path: Path, target: Any) -> Tuple[Any, Dict[str, Any]]:
    path = Path(path)
    if path.is_dir():  # orbax checkpoints are directories
        state = _orbax_restore(path, target)
    else:
        state = serialization.from_bytes(target, path.read_bytes())
    meta_path = path.with_suffix(path.suffix + ".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, meta


def _orbax_save(path: Path, state: Any) -> None:
    """Orbax backend: preserves array shardings natively (useful once the
    state is mesh-sharded and too large to gather to one host)."""
    import shutil

    import orbax.checkpoint as ocp

    # overwrite semantics: only process 0 clears the old directory, and
    # every process waits at the barrier before the collective save starts
    if _is_primary() and path.exists():
        shutil.rmtree(path, ignore_errors=True)
    _sync(f"orbax_pre_save:{path.name}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path.resolve(), state)


def _orbax_restore(path: Path, target: Any) -> Any:
    """Restore an orbax checkpoint, RE-SHARDING onto the target's layout.

    When the target tree's leaves are committed ``jax.Array``s (e.g. a
    TrainState placed by ``parallel.shard_state`` on the CURRENT mesh),
    restore args carry each leaf's NamedSharding, so a state saved from a
    ``{'data': 4, 'model': 2}`` mesh restores directly onto, say,
    ``{'data': 2, 'model': 4}`` without ever materializing the full tree
    on one host — the production path for states larger than host RAM.
    """
    import orbax.checkpoint as ocp

    def restore_args(leaf):
        if isinstance(leaf, jax.Array) and hasattr(leaf, "sharding"):
            return ocp.ArrayRestoreArgs(sharding=leaf.sharding,
                                        global_shape=leaf.shape,
                                        dtype=leaf.dtype)
        return ocp.RestoreArgs()

    args = jax.tree_util.tree_map(restore_args, target)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            path.resolve(),
            args=ocp.args.PyTreeRestore(
                item=target, restore_args=args
            ),
        )
    return restored


class CheckpointManager:
    def __init__(self, dirpath: Path, save_top_k: int = 1, mode: str = "min",
                 backend: str = "msgpack"):
        self.dirpath = Path(dirpath)
        self.dirpath.mkdir(parents=True, exist_ok=True)
        self.save_top_k = save_top_k
        self.mode = mode
        # 'msgpack' (single-file, host-gathered) or 'orbax' (directory,
        # sharding-preserving — the mesh default, see Trainer._build)
        self.backend = backend
        # (metric, path) of currently-kept top-k checkpoints
        self._kept: List[Tuple[float, Path]] = []
        self.best_model_path: Optional[Path] = None
        self.best_model_score: float = np.inf if mode == "min" else -np.inf
        self._recover_kept()

    def _recover_kept(self) -> None:
        """Rebuild top-k state from existing ``epoch=*-val_loss=*.ckpt`` files.

        After resume-from-last, a fresh manager would otherwise forget
        previously saved top-k checkpoints (never pruning stale ones) and
        ``best_model_path`` would fall back to the final state instead of
        the historically best one.
        """
        for path in self.dirpath.glob("epoch=*-val_loss=*.ckpt"):
            if path.suffix != ".ckpt" or path.name == "last.ckpt":
                continue
            try:
                metric = float(path.stem.split("val_loss=")[1])
            except (IndexError, ValueError):
                continue
            self._kept.append((metric, path))
        self._kept.sort(key=lambda kv: kv[0], reverse=(self.mode != "min"))
        if self._kept:
            self.best_model_score, self.best_model_path = self._kept[0]

    def _is_better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def on_epoch_end(
        self, state: Any, epoch: int, monitor_value: float
    ) -> None:
        meta = {
            "epoch": int(epoch),
            "step": int(jax.device_get(state.step)),
            "val_loss": float(monitor_value),
        }
        # save_last=True parity
        save_checkpoint(self.dirpath / "last.ckpt", state, meta,
                        backend=self.backend)

        if self.save_top_k == 0:
            return
        worst_kept = (
            max(self._kept)[0]
            if (self.mode == "min" and self._kept)
            else (min(self._kept)[0] if self._kept else None)
        )
        should_keep = len(self._kept) < self.save_top_k or (
            worst_kept is not None and self._is_better(monitor_value, worst_kept)
        )
        if not should_keep:
            return
        fname = f"epoch={epoch}-val_loss={monitor_value:.4f}.ckpt"
        path = self.dirpath / fname
        save_checkpoint(path, state, meta, backend=self.backend)
        # the 4-decimal filename can collide with a recovered entry (e.g.
        # resuming a deterministic run): REPLACE it, or the duplicate-path
        # pair gets pruned and deletes the file the kept entry points to
        self._kept = [(m, p) for m, p in self._kept if p != path]
        self._kept.append((float(monitor_value), path))
        self._kept.sort(key=lambda kv: kv[0], reverse=(self.mode != "min"))
        while len(self._kept) > self.save_top_k:
            _, drop = self._kept.pop()
            if any(p == drop for _, p in self._kept):
                continue  # another kept entry still references this file
            if _is_primary():  # bookkeeping on all processes, FS ops on 0
                if drop.is_dir():  # orbax checkpoints are directories
                    shutil.rmtree(drop, ignore_errors=True)
                else:
                    drop.unlink(missing_ok=True)
                drop.with_suffix(drop.suffix + ".json").unlink(missing_ok=True)
        if self._is_better(monitor_value, self.best_model_score):
            self.best_model_score = float(monitor_value)
            self.best_model_path = path

    def copy_best(self, target: Path) -> Optional[Path]:
        if self.best_model_path and self.best_model_path.exists():
            if not _is_primary():
                return Path(target)
            if self.best_model_path.is_dir():  # orbax directory checkpoint
                if Path(target).exists():
                    shutil.rmtree(target, ignore_errors=True)
                shutil.copytree(str(self.best_model_path), str(target))
            else:
                shutil.copy(str(self.best_model_path), str(target))
            shutil.copy(
                str(self.best_model_path) + ".json", str(target) + ".json"
            )
            return Path(target)
        return None

    def latest(self) -> Optional[Path]:
        last = self.dirpath / "last.ckpt"
        return last if last.exists() else None


class EarlyStopping:
    """monitor val/loss, mode min, patience N (ref train.py:513-518)."""

    def __init__(self, patience: int = 10, mode: str = "min",
                 min_delta: float = 0.0):
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best = np.inf if mode == "min" else -np.inf
        self.wait = 0
        self.stopped = False

    def update(self, value: float) -> bool:
        """Returns True if training should stop."""
        improved = (
            value < self.best - self.min_delta
            if self.mode == "min"
            else value > self.best + self.min_delta
        )
        if improved:
            self.best = float(value)
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.stopped = True
        return self.stopped
