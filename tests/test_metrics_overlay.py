"""The in-video FPS/BW feedback loop (reference ``server.cpp:164-168``).

Every serving loop renders ``metrics.overlay_text()`` into the stream
immediately after ``status_line()`` has reset the 1 Hz counters — the
round-2 bug was that ``overlay_text`` computed from the freshly-reset
live counters and therefore always rendered ``FPS: 0 BW: 0 kbps``.
These tests pin the fix: the overlay reports the last *completed*
window's numbers, and a real loopback session feeds a nonzero FPS
string into the pipeline step.
"""

import dataclasses
import re
import threading
import time

import numpy as np

from cudavideostream_tpu.runtime.executor import ExecMetrics
from cudavideostream_tpu.runtime.server import DeltaStreamServer
from cudavideostream_tpu.runtime.sources import SyntheticSource


class TestOverlaySnapshot:
    def test_overlay_reports_last_window_after_reset(self):
        """overlay_text right after status_line must carry the window
        that status_line just printed, not the reset counters."""
        m = ExecMetrics()
        for _ in range(100):
            m.record(0.001, 500)
        m.last_print -= 1.0  # force the 1 Hz window to have elapsed
        line = m.status_line()
        assert line is not None and "FPS:" in line
        text = m.overlay_text()
        fps = int(re.search(r"FPS: (\d+)", text).group(1))
        bw = int(re.search(r"BW: (\d+) kbps", text).group(1))
        assert fps >= 50, text  # ~100 frames over ~1 s
        assert bw > 0, text
        # and it agrees with the printed status line's own fps
        line_fps = float(re.search(r"FPS:\s+(\d+)", line).group(1))
        assert abs(fps - line_fps) <= 1

    def test_overlay_before_first_window_is_zero(self):
        m = ExecMetrics()
        m.record(0.001, 500)
        assert m.overlay_text() == "FPS: 0 BW: 0 kbps"


class _TimedSource:
    """Wraps a source with a wall-clock deadline so a loopback test can
    run 'more than one second of frames' without picking a frame count.
    The clock starts only after ``warmup`` frames so the first-step jit
    compile doesn't consume the whole budget."""

    def __init__(self, inner, seconds, warmup=3):
        self.inner = inner
        self.seconds = seconds
        self.warmup = warmup
        self.n = 0
        self.deadline = None

    def base_frame(self):
        return self.inner.base_frame()

    def __iter__(self):
        return self

    def __next__(self):
        self.n += 1
        if self.n == self.warmup:
            self.deadline = time.perf_counter() + self.seconds
        if self.deadline is not None and time.perf_counter() > self.deadline:
            raise StopIteration
        return next(self.inner)


class TestOverlayLoopback:
    def test_served_stream_renders_nonzero_fps(self, small_config):
        """With overlay_status=True, after the first 1 Hz window the text
        handed to pipe.step must contain a nonzero FPS (the reference
        renders its true numbers, server.cpp:164-168)."""
        import socket

        cfg = dataclasses.replace(small_config, port=0)
        server = DeltaStreamServer(
            cfg,
            _TimedSource(SyntheticSource(cfg, seed=3), seconds=2.6),
            verbose=False,
            overlay_status=True,
        )
        texts = []
        orig = server.executor.process

        def spy(frame, text=""):
            texts.append(text)
            return orig(frame, text=text)

        server.executor.process = spy
        server.listen()
        t = threading.Thread(target=server.serve, daemon=True)
        t.start()

        # drain the stream so the server never blocks on the socket
        sock = socket.create_connection(("127.0.0.1", server.port))
        while True:
            if not sock.recv(1 << 16):
                break
        sock.close()
        t.join(timeout=30)

        rendered = [tx for tx in texts if tx]
        assert rendered, "no status overlay was ever rendered"
        fps_values = [
            int(re.search(r"FPS: (\d+)", tx).group(1)) for tx in rendered
        ]
        assert max(fps_values) > 0, (
            f"overlay never showed a nonzero FPS: {sorted(set(rendered))}"
        )
