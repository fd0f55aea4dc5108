"""In-app log console.

Analog of the reference Console (reference: CudaRayTracer/src/Core/
Console.h:5-83): a bounded line buffer with filter, clear and copy,
auto-registered as a sink of the logging layer (the ImGuiSink pattern).
UI-agnostic — the web viewer renders `lines()`; tests read it directly.
"""

from __future__ import annotations

import threading
from collections import deque

from ..utils import logging as rtlog


class Console:
    def __init__(self, max_lines: int = 2000):
        self._lines: deque[str] = deque(maxlen=max_lines)
        self._lock = threading.Lock()
        self.autoscroll = True
        rtlog.add_console_sink(self._sink)

    def _sink(self, line: str, level: int):
        self.add_log(line)

    def add_log(self, line: str):
        """Console::AddLog (Console.h:25-39)."""
        with self._lock:
            self._lines.append(line)

    def clear(self):
        with self._lock:
            self._lines.clear()

    def lines(self, filter_text: str = "") -> list[str]:
        """Filtered view (the ImGuiTextFilter behavior, Console.h:41-82)."""
        with self._lock:
            snapshot = list(self._lines)
        if filter_text:
            snapshot = [ln for ln in snapshot if filter_text in ln]
        return snapshot

    def copy_text(self, filter_text: str = "") -> str:
        return "\n".join(self.lines(filter_text))

    def close(self):
        rtlog.remove_console_sink(self._sink)
