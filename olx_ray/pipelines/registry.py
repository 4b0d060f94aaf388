"""Job registry: the reference's control plane re-expressed (T1/D2/E3).

The reference keeps ``AppState(List[Job])`` in an ``AtomicCell`` and
forks one fiber per POST (``OlxServer.scala:21-27, 48-62``); ``/stop``
cancels every fiber (``:92-100``) and completed jobs remove themselves
by value-equality partition (D2, ``:49-54``). Here each job is a
driver-side thread running the crawl-round loop with a cooperative
stop flag checked at round boundaries — stronger than the reference's
mid-stream cancellation because every completed round is checkpointed,
so a stopped job resumes deterministically (E3 engine semantics,
SURVEY.md §3).

This is deliberately NOT a Dataset op: the job registry is control
state, exactly the driver-side role SURVEY.md §2.4 T1 assigns it."""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

import pyarrow as pa

from .crawl import CrawlConfig, CrawlResult, crawl_native


@dataclass
class Job:
    job_id: int
    name: str
    cfg: CrawlConfig
    thread: threading.Thread
    stop_flag: threading.Event
    result: list = field(default_factory=list)   # [CrawlResult] when done

    @property
    def running(self) -> bool:
        return self.thread.is_alive()


class JobRegistry:
    """start/list/stop for crawl jobs; one thread per job (the engine's
    fiber equivalent — Ray tasks do the actual work, the thread only
    drives the round loop)."""

    def __init__(self):
        self._jobs: list[Job] = []
        self._lock = threading.Lock()
        self._next_id = 1

    def start(self, name: str, cfg: CrawlConfig, seeds: pa.Table) -> Job:
        import dataclasses

        stop = threading.Event()
        # copy: mutating the CALLER's cfg would alias stop flags when
        # one cfg object is reused across start() calls
        cfg = dataclasses.replace(cfg, should_stop=stop.is_set)

        def run(job: "Job"):
            try:
                job.result.append(crawl_native(cfg, seeds))
            finally:
                # D2: completed jobs remove themselves from the registry
                with self._lock:
                    self._jobs = [j for j in self._jobs
                                  if j.job_id != job.job_id]

        with self._lock:
            job = Job(self._next_id, name, cfg,
                      threading.Thread(target=lambda: None), stop)
            job.thread = threading.Thread(target=run, args=(job,),
                                          daemon=True)
            self._next_id += 1
            self._jobs.append(job)
        job.thread.start()
        return job

    def jobs(self) -> list[Job]:
        with self._lock:
            return list(self._jobs)

    def stop_all(self, timeout: float = 120.0) -> None:
        """E3: cooperative cancel of every running job; each stops at its
        next round boundary with a complete checkpoint behind it."""
        for j in self.jobs():
            j.stop_flag.set()
        for j in self.jobs():
            j.thread.join(timeout)
        with self._lock:
            self._jobs = [j for j in self._jobs if j.thread.is_alive()]
