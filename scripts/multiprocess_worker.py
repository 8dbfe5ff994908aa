"""One process of a multi-process (multi-host-style) CPU training run.

Executed by tests/test_parallel.py::test_multiprocess_distributed_training
(2 processes x 4 virtual CPU devices = the 8-device ('data','model') mesh
spanning both processes) — the JAX-native way to execute the multi-HOST
code path (jax.distributed.initialize, collective orbax checkpointing,
process-0-only logging) without a pod.  SURVEY.md §5 'distributed
communication backend' row; the reference has no distributed execution at
all (/root/reference/src/train.py:535-536 is accelerator='gpu', devices=1).

Usage: python multiprocess_worker.py <process_id> <num_processes> <port>
       <workdir>
Coordinator address/num/id are passed via JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID so the env-resolution path of
parallel.distributed.maybe_initialize is what actually runs.
"""

import json
import os
import sys
from pathlib import Path


def main() -> None:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = int(sys.argv[3])
    workdir = Path(sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(num_processes)
    os.environ["JAX_PROCESS_ID"] = str(process_id)

    from multimodal_emotion_detection_tpu.parallel.distributed import (
        maybe_initialize,
        process_info,
    )

    assert maybe_initialize(), "env-configured initialize did not trigger"
    info = process_info()
    assert info["process_count"] == num_processes, info
    assert info["local_devices"] == 4, info
    assert info["global_devices"] == 4 * num_processes, info

    from multimodal_emotion_detection_tpu.config import Config, apply_overrides
    from multimodal_emotion_detection_tpu.training.loop import Trainer

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from test_train import make_loaders, tiny_config  # same tiny geometry

    cfg = tiny_config()
    cfg.training.max_epochs = 2
    cfg.parallel.data_parallel = 4
    cfg.parallel.model_parallel = 2
    cfg.runtime.checkpoint_backend = "auto"  # must auto-switch to orbax

    save_dir = workdir / "run"  # SHARED dir: collective orbax writes
    train_loader, val_loader, _ = make_loaders(cfg)
    trainer = Trainer(cfg, save_dir=save_dir)
    trainer.fit(train_loader, val_loader)

    # the loop.py auto-switch: multi-process + backend 'auto' -> orbax
    assert trainer.checkpoints.backend == "orbax", trainer.checkpoints.backend
    assert (save_dir / "checkpoints" / "last.ckpt").is_dir(), "orbax dir"
    assert trainer.is_primary == (process_id == 0)

    losses_2ep = [h["val/loss"] for h in trainer.history]

    # resume-from-orbax across the process boundary: a fresh Trainer
    # restores the collectively-saved sharded state and trains one more
    cfg3 = tiny_config()
    cfg3.training.max_epochs = 3
    cfg3.parallel.data_parallel = 4
    cfg3.parallel.model_parallel = 2
    cfg3.runtime.checkpoint_backend = "auto"
    trainer3 = Trainer(cfg3, save_dir=save_dir)
    train_loader3, val_loader3, test_loader3 = make_loaders(cfg3)
    trainer3.fit(train_loader3, val_loader3, resume=True)
    assert trainer3.history[0]["epoch"] == 2, trainer3.history

    # trainer.test() collects per-row logits/preds/labels — on a
    # process-spanning mesh these are sharded over 'data', so the fetch
    # must reshard to replicated (loop.py _fetch_np), not device_get
    test_metrics, logits, preds, labels = trainer3.test(test_loader3)
    n_test = test_loader3.num_samples
    assert logits.shape[0] == n_test, (logits.shape, n_test)
    assert preds.shape == labels.shape == (n_test,), (preds.shape, n_test)
    # every process must see the same replicated global outputs
    (workdir / f"test_{process_id}.json").write_text(json.dumps({
        "test_acc": float(test_metrics["test/acc_agg"]),
        "preds_sum": int(preds.sum()),
        "logits_mean": float(logits.mean()),
    }))

    if process_id == 0:
        (workdir / "result.json").write_text(json.dumps({
            "val_losses": losses_2ep,
            "resumed_val_loss": trainer3.history[0]["val/loss"],
            "backend": trainer.checkpoints.backend,
            "process_info": info,
        }))
    # explicit cross-process sync before interpreter exit: teardown time
    # varies under load (orbax async threads, GC), and the atexit
    # distributed-shutdown barrier times out if one process reaches it
    # seconds after the other — observed as DEADLINE_EXCEEDED flakes when
    # the suite shares the machine with a bench run
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("worker-done")
    print(f"worker {process_id} OK", flush=True)


if __name__ == "__main__":
    main()
