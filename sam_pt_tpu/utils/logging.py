"""Experiment logging + profiling.

Replaces the reference's mandatory wandb backbone (SURVEY.md §5: wandb.init at
every entry point, summary metrics, video logging) with a local-first logger:
metrics stream to a JSONL file and stdout; if wandb happens to be installed
and WANDB_DISABLED is not set, it mirrors there transparently.

Also provides the TPU tracing hook (jax.profiler) the reference lacks
(SURVEY.md §5 'tracing/profiling': wall-clock only in the reference).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class RunLogger:
    def __init__(self, output_dir: str = "outputs/logs",
                 exp_id: Optional[str] = None, config: Optional[Dict] = None,
                 logging_cfg: Optional[Dict] = None):
        """`logging_cfg` is the composed `logging:` config group
        (configs/logging/*.yaml — reference surface configs/logging/base.yaml):
        {exp_id, wandb: {entity, project, ...}}. Explicit `exp_id` wins,
        falling back to logging_cfg['exp_id'], then 'run'; the wandb project
        falls back to the WANDB_PROJECT env var."""
        logging_cfg = logging_cfg or {}
        wandb_cfg = logging_cfg.get("wandb") or {}
        exp_id = exp_id or logging_cfg.get("exp_id") or "run"
        self.output_dir = output_dir
        self.exp_id = exp_id
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, f"{exp_id}.jsonl")
        self.summary: Dict[str, Any] = {}
        self._wandb = None
        if os.environ.get("WANDB_DISABLED", "").lower() not in ("1", "true"):
            try:
                import wandb  # optional

                self._wandb = wandb
                wandb.init(project=wandb_cfg.get("project")
                           or os.environ.get("WANDB_PROJECT", "sam-pt-tpu"),
                           entity=wandb_cfg.get("entity"),
                           name=exp_id, config=config or {})
                try:
                    if wandb_cfg.get("log_code", True) and wandb.run:
                        # reference uploads the run's code as a wandb
                        # artifact (sam_pt/vos_eval/eval.py:49 log_code("."))
                        wandb.run.log_code(wandb_cfg.get("log_code_root", "."))
                except Exception:
                    pass  # code upload is best-effort, never fatal
            except Exception:
                self._wandb = None
        if config:
            self._write({"type": "config", "config": config})

    def _write(self, record: Dict) -> None:
        record = dict(record)
        record.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        self._write({"type": "metrics", "step": step, **metrics})
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def set_summary(self, **kwargs) -> None:
        self.summary.update(kwargs)
        self._write({"type": "summary", **kwargs})
        if self._wandb is not None:
            for k, v in kwargs.items():
                self._wandb.run.summary[k] = v

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


@contextlib.contextmanager
def tpu_trace(output_dir: Optional[str]):
    """jax.profiler trace context; no-op when output_dir is None.

    Usage: `with tpu_trace(cfg.get('profile_dir')): ... jitted work ...`
    then inspect with TensorBoard / xprof.
    """
    if not output_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(output_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Per-stage wall-clock accumulation (SURVEY.md §5 per-stage timers)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        return dict(sorted(self.totals.items(), key=lambda kv: -kv[1]))
