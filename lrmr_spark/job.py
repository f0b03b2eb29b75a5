"""Job handles: attached results + detached background jobs.

Replaces the reference's etcd-backed detached job tracking
(/root/reference/job/manager_distributed.go:35-120,
/root/reference/running_job.go:33-202) with an in-process registry over
Spark job groups: ``status`` / ``wait`` / ``abort`` / ``metrics`` parity.
Cross-process attach-by-ID is scoped to Structured Streaming queries
(SURVEY §7.4.4) — Spark has no cluster-global batch-job registry.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Observation

__all__ = ["Result", "JobHandle", "start_background", "get_job", "list_jobs"]

# job statuses mirror /root/reference/job/status.go:11-18
RUNNING = "running"
SUCCEEDED = "succeeded"
FAILED = "failed"
ABORTED = "aborted"

_registry: dict[str, "JobHandle"] = {}
_registry_lock = threading.Lock()


@dataclass
class Result:
    """Attached-run result (mirror of /root/reference/driver/result.go:19-37)."""

    rows: list[Any]
    metrics: dict[str, Any] = field(default_factory=dict)

    def outputs(self):
        return iter(self.rows)


class JobHandle:
    """Detached job (mirror of /root/reference/running_job.go:33-77)."""

    def __init__(self, job_id: str, df: DataFrame, observations: list[Observation]):
        self.job_id = job_id
        self._df = df
        self._observations = observations
        self._spark = df.sparkSession
        self._status = RUNNING
        self._error: BaseException | None = None
        self._rows: list[Any] | None = None
        self._metrics: dict[str, Any] = {}
        self._done = threading.Event()
        self._started_at = time.time()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        sc = self._spark.sparkContext
        try:
            sc.setJobGroup(self.job_id, f"lrmr-spark background job {self.job_id}", True)
            self._rows = self._df.collect()
            for obs in self._observations:
                self._metrics.update(obs.get)
            if self._status == RUNNING:
                self._status = SUCCEEDED
        except BaseException as exc:  # surfaced via .error / .wait
            if self._status != ABORTED:
                self._status = FAILED
                self._error = exc
        finally:
            self._done.set()

    # -- mirror of running_job.go:79-143 ------------------------------
    @property
    def status(self) -> str:
        return self._status

    @property
    def error(self) -> BaseException | None:
        return self._error

    def metrics(self) -> dict[str, Any]:
        return dict(self._metrics)

    def wait(self, timeout: float | None = None) -> "JobHandle":
        self._done.wait(timeout)
        return self

    def abort(self) -> None:
        """Cooperative cancel via the Spark job group (the analogue of
        the reference's cluster-wide etcd abort event —
        /root/reference/running_job.go:152-194)."""
        if not self._done.is_set():
            self._status = ABORTED
            self._spark.sparkContext.cancelJobGroup(self.job_id)

    def result(self) -> Result:
        self.wait()
        if self._status != SUCCEEDED:
            raise RuntimeError(f"job {self.job_id} {self._status}") from self._error
        return Result(rows=self._rows or [], metrics=self.metrics())


def start_background(
    job_id: str, df: DataFrame, observations: list[Observation]
) -> JobHandle:
    handle = JobHandle(job_id, df, observations)
    with _registry_lock:
        _registry[job_id] = handle
    handle._thread.start()
    return handle


def get_job(job_id: str) -> JobHandle | None:
    """Attach by job ID (mirror of /root/reference/running_job.go:196-202,
    scoped to this process)."""
    with _registry_lock:
        return _registry.get(job_id)


def list_jobs() -> list[str]:
    with _registry_lock:
        return sorted(_registry)
