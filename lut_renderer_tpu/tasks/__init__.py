"""tasks — queue scheduler with the reference TaskManager's contract.

Reference: src/lut_renderer/task_manager.py (Qt signals + QThreadPool). This
build is framework-free: a small Signal class replaces Qt signals, worker
threads replace QRunnable, and cancellation flows through threading.Event
into the engine instead of SIGTERM-ing an external process.
"""

from .signals import Signal
from .runner import TaskRunner, extract_cover
from .manager import TaskManager

__all__ = ["Signal", "TaskRunner", "TaskManager", "extract_cover"]
