"""TaskManager: the queue with concurrency control.

Reference contract (src/lut_renderer/task_manager.py:219-315): signals
task_added / task_updated / task_progress / queue_finished / task_log;
methods add_task(s) / start_all / cancel_task / clear_completed /
remove_task / set_max_concurrency; status bookkeeping identical (FAILED
status strings carry the error suffix; queue_finished fires when the last
runner drains).

Concurrency is a dispatcher over plain threads instead of QThreadPool:
start_all snapshots PENDING tasks into a dispatch deque; at most
`max_concurrency` runner threads are live (default 1, like the reference's
main window; the class default there is 2 but the UI passes 1 —
main_window.py:210)."""

from __future__ import annotations

import threading
import time
from collections import deque
from typing import Dict, List, Optional

from ..models import Task, TaskStatus
from .runner import TaskRunner
from .signals import Signal


class TaskManager:
    def __init__(self, max_concurrency: int = 1, lut_strategy: str = "mxu"):
        self.task_added = Signal("task_added")        # (task_id)
        self.task_updated = Signal("task_updated")    # (task_id)
        self.task_progress = Signal("task_progress")  # (task_id, int)
        self.queue_finished = Signal("queue_finished")  # ()
        self.task_log = Signal("task_log")            # (task_id, str)

        self.tasks: Dict[str, Task] = {}
        self.runners: Dict[str, TaskRunner] = {}
        self._threads: Dict[str, threading.Thread] = {}
        self._pending: deque = deque()
        self._lock = threading.RLock()
        self._max = max(1, max_concurrency)
        self._lut_strategy = lut_strategy

    # -- queue management ---------------------------------------------------
    def set_max_concurrency(self, value: int) -> None:
        with self._lock:
            self._max = max(1, int(value))
        self._dispatch()

    def add_task(self, task: Task) -> None:
        with self._lock:
            self.tasks[task.task_id] = task
        self.task_added.emit(task.task_id)

    def add_tasks(self, tasks: List[Task]) -> None:
        for task in tasks:
            self.add_task(task)

    def start_all(self) -> None:
        with self._lock:
            for task_id, task in list(self.tasks.items()):
                if task.status != TaskStatus.PENDING:
                    continue
                if task_id in self.runners or task_id in self._pending:
                    continue
                self._pending.append(task_id)
        self._dispatch()

    def _dispatch(self) -> None:
        to_start = []
        with self._lock:
            while self._pending and len(self.runners) < self._max:
                task_id = self._pending.popleft()
                task = self.tasks.get(task_id)
                if task is None or task.status != TaskStatus.PENDING:
                    continue
                runner = TaskRunner(task, lut_strategy=self._lut_strategy)
                runner.progress.connect(self._on_progress)
                runner.status.connect(self._on_status)
                runner.finished.connect(self._on_finished)
                runner.log.connect(self._on_log)
                self.runners[task_id] = runner
                task.status = TaskStatus.RUNNING
                to_start.append((task_id, runner))
        for task_id, runner in to_start:
            self.task_updated.emit(task_id)
            thread = threading.Thread(
                target=runner.run, name=f"task-{task_id[:8]}", daemon=True
            )
            self._threads[task_id] = thread
            thread.start()

    # -- task control -------------------------------------------------------
    def cancel_task(self, task_id: str) -> None:
        with self._lock:
            runner = self.runners.get(task_id)
            if task_id in self._pending:
                self._pending.remove(task_id)
        if runner:
            runner.cancel()
        task = self.tasks.get(task_id)
        if task:
            task.status = TaskStatus.CANCELED
            self.task_updated.emit(task_id)

    def clear_completed(self) -> None:
        done = {TaskStatus.COMPLETED, TaskStatus.FAILED, TaskStatus.CANCELED}
        with self._lock:
            remove = [tid for tid, t in self.tasks.items() if t.status in done]
            for tid in remove:
                self.tasks.pop(tid, None)
                self.runners.pop(tid, None)
                self._threads.pop(tid, None)
        for tid in remove:
            self.task_updated.emit(tid)

    def remove_task(self, task_id: str) -> None:
        with self._lock:
            runner = self.runners.get(task_id)
            if task_id in self._pending:
                self._pending.remove(task_id)
        if runner:
            runner.cancel()
        with self._lock:
            self.runners.pop(task_id, None)
            self._threads.pop(task_id, None)
            existed = self.tasks.pop(task_id, None) is not None
        if existed:
            self.task_updated.emit(task_id)

    def wait_all(self, timeout: Optional[float] = None) -> bool:
        """Block until the queue drains (CLI convenience; not in reference)."""
        deadline = time.time() + timeout if timeout else None
        while True:
            with self._lock:
                threads = list(self._threads.values())
                idle = not self.runners and not self._pending
            if idle and not any(t.is_alive() for t in threads):
                return True
            if deadline and time.time() > deadline:
                return False
            time.sleep(0.05)

    # -- runner callbacks ---------------------------------------------------
    def _on_progress(self, task_id: str, progress: int) -> None:
        task = self.tasks.get(task_id)
        if not task:
            return
        task.progress = progress
        self.task_progress.emit(task_id, progress)

    def _on_status(self, task_id: str, status: str) -> None:
        task = self.tasks.get(task_id)
        if not task:
            return
        if status.startswith(TaskStatus.FAILED.value):
            task.status = TaskStatus.FAILED
            task.error = status
        elif status in TaskStatus._value2member_map_:
            task.status = TaskStatus(status)
        self.task_updated.emit(task_id)

    def _on_finished(self, task_id: str, status: str) -> None:
        task = self.tasks.get(task_id)
        if task:
            task.finished_at = time.time()
        with self._lock:
            self.runners.pop(task_id, None)
            any_left = bool(self.runners) or bool(self._pending)
        self._dispatch()
        with self._lock:
            any_left = bool(self.runners) or bool(self._pending)
        if not any_left:
            self.queue_finished.emit()

    def _on_log(self, task_id: str, message: str) -> None:
        self.task_log.emit(task_id, message)
