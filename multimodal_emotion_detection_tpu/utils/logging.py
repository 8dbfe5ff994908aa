"""Metric logging: CSV (reference-schema) + optional TensorBoard.

Reproduces the dual-logger contract of /root/reference/src/train.py:523-530
(Lightning CSVLogger + TensorBoardLogger).  The CSV schema matches the
reference's ``csv_logs/version_*/metrics.csv`` column names exactly
(``train/loss``, ``val/acc``, ``val/entropy``, ``test/acc_agg``, ``epoch``,
``step``, ``lr-<Optimizer>`` ...), so curves diff directly against reference
artifacts.
"""

from __future__ import annotations

import csv
import time
from pathlib import Path
from typing import Dict, Optional


class CSVLogger:
    """Append-style CSV metrics logger with a stable, growing column set."""

    def __init__(self, save_dir: str | Path, name: str = "csv_logs"):
        root = Path(save_dir) / name
        version = 0
        while (root / f"version_{version}").exists():
            version += 1
        self.log_dir = root / f"version_{version}"
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.log_dir / "metrics.csv"
        self._rows: list[Dict[str, object]] = []
        self._columns: list[str] = []
        self._rewrites = 0  # full-file rewrites (tested: stays O(columns))

    def log_metrics(
        self, metrics: Dict[str, float], step: int, epoch: Optional[int] = None
    ) -> None:
        """Append one (possibly sparse) row.

        ``epoch=None`` leaves the epoch cell empty — the reference's
        LearningRateMonitor rows look exactly like that
        (grid_sweep_results/*/metrics.csv: ``0.001,0,,,...``).

        IO is append-only per row; the file is rewritten in full only
        when the COLUMN SET grows (a handful of times early in a run),
        so long ``log_every_n_steps`` runs stay O(rows) file IO, not
        O(rows²).
        """
        row: Dict[str, object] = {"step": step}
        if epoch is not None:
            row["epoch"] = epoch
        for key, value in metrics.items():
            row[key] = float(value)
        new_columns = [key for key in row if key not in self._columns]
        self._rows.append(row)
        if new_columns or not self._rows[:-1]:
            self._columns.extend(new_columns)
            self._rewrite()
        else:
            with open(self.path, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=self._columns).writerow(row)

    def _rewrite(self) -> None:
        self._rewrites += 1
        with open(self.path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._columns)
            writer.writeheader()
            for row in self._rows:
                writer.writerow(row)


class TensorBoardLogger:
    """Thin TB event writer; no-op if tensorboard is unavailable."""

    def __init__(self, save_dir: str | Path, name: str = "tb_logs"):
        self.enabled = False
        try:
            from torch.utils.tensorboard import SummaryWriter  # noqa: WPS433

            root = Path(save_dir) / name
            version = 0
            while (root / f"version_{version}").exists():
                version += 1
            self._writer = SummaryWriter(log_dir=str(root / f"version_{version}"))
            self.enabled = True
        except Exception:
            self._writer = None

    def log_metrics(
        self, metrics: Dict[str, float], step: int, epoch: Optional[int] = None
    ) -> None:
        if not self.enabled:
            return
        for key, value in metrics.items():
            self._writer.add_scalar(key, float(value), global_step=step)

    def close(self) -> None:
        if self.enabled:
            self._writer.close()


class StepTimer:
    """Wall-clock step/epoch timing + clips/sec/chip (the BASELINE.json
    headline metric).  The reference records no throughput at all
    (SURVEY.md §6); this makes it first-class."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._start: Optional[float] = None
        self._samples = 0
        self._elapsed = 0.0

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self, num_samples: int) -> float:
        assert self._start is not None
        dt = time.perf_counter() - self._start
        self._elapsed += dt
        self._samples += num_samples
        self._start = None
        return dt

    @property
    def samples_per_sec(self) -> float:
        return self._samples / self._elapsed if self._elapsed > 0 else 0.0

    @property
    def elapsed(self) -> float:
        return self._elapsed


class NullLogger:
    """Logger stand-in for non-primary processes in multi-process runs:
    metrics are identical on every process (global collectives), so only
    process 0 writes CSV/TB files — the rest get this no-op."""

    def log_metrics(self, *args, **kwargs) -> None:
        pass

    def close(self) -> None:
        pass
