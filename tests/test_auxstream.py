"""Live aux/visualizer side stream (``runtime/auxstream.py``) —
``th_noise_hdl`` parity (``threads.cpp:149-164``): the reference
dedicates a thread + pipe to displaying the visualizer frame in real
time; the rebuild serves it on a side socket that the client CLI and
the --http browser viewer attach to. The loopback test asserts the aux
bytes byte-equal the oracle's aux frame, per frame.
"""

import threading

import numpy as np
import pytest

from cudavideostream_tpu.config import StreamConfig, Visualizer
from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime.auxstream import (
    AuxStreamClient,
    AuxStreamSink,
)
from cudavideostream_tpu.runtime.client import DeltaStreamClient
from cudavideostream_tpu.runtime.server import DeltaStreamServer
from cudavideostream_tpu.runtime.sources import SyntheticSource


def _wait_for_client(sink, timeout=10.0):
    import time

    t0 = time.monotonic()
    while sink.n_clients == 0:
        if time.monotonic() - t0 > timeout:
            raise TimeoutError("aux client never attached")
        time.sleep(0.01)


class TestSinkClient:
    def test_lossless_roundtrip(self):
        """drop=False: every pushed frame arrives, in order."""
        h, w = 8, 16
        sink = AuxStreamSink(h, w, port=0, drop=False)
        cli = AuxStreamClient("127.0.0.1", sink.port)
        cli.connect()
        assert (cli.height, cli.width) == (h, w)
        _wait_for_client(sink)
        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 255, h * w * 3, endpoint=True,
                               dtype=np.uint8) for _ in range(5)]
        done = threading.Event()

        def pusher():
            for i, f in enumerate(frames):
                sink.push(i, f)
            done.set()

        threading.Thread(target=pusher, daemon=True).start()
        for i, want in enumerate(frames):
            idx, got = cli.read_frame()
            assert idx == i
            np.testing.assert_array_equal(got, want)
        assert done.wait(5)
        cli.close()
        sink.close()

    def test_latest_wins_drops(self):
        """drop=True: a viewer that falls behind receives a monotonic
        subset ending at the newest frame — and the push side never
        blocks (the documented divergence from the reference's blocking
        visualizer pipe)."""
        h, w = 32, 64
        sink = AuxStreamSink(h, w, port=0, drop=True)
        cli = AuxStreamClient("127.0.0.1", sink.port)
        cli.connect()
        _wait_for_client(sink)
        n = 200
        frame = np.zeros(h * w * 3, np.uint8)
        for i in range(n):
            frame[:4] = i % 256
            sink.push(i, frame)          # must never block
        got = []
        while not got or got[-1][0] != n - 1:
            idx, f = cli.read_frame()
            got.append((idx, int(f[0])))
        idxs = [g[0] for g in got]
        assert idxs == sorted(idxs)      # monotonic
        assert all(v == i % 256 for i, v in got)  # frames intact
        cli.close()
        sink.close()

    def test_dead_viewer_detaches(self):
        sink = AuxStreamSink(4, 4, port=0)
        cli = AuxStreamClient("127.0.0.1", sink.port)
        cli.connect()
        _wait_for_client(sink)
        cli.close()
        buf = np.zeros(48, np.uint8)
        for i in range(50):              # pushes survive the dead socket
            sink.push(i, buf)
        sink.close()

    def test_bad_magic_rejected(self):
        import socket

        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)

        def feeder():
            conn, _ = srv.accept()
            conn.sendall(b"NOPE" + b"\0" * 8)
            conn.close()

        threading.Thread(target=feeder, daemon=True).start()
        cli = AuxStreamClient("127.0.0.1", srv.getsockname()[1])
        with pytest.raises(ValueError, match="magic"):
            cli.connect()
        srv.close()


class TestServerAuxLoopback:
    def test_live_heatmap_byte_exact(self):
        """server --visualizer heatmap --aux-port: the aux viewer
        receives every visualizer frame byte-identical to the oracle's,
        while the main client reconstructs the delta stream — the two
        sockets of the reference's main loop (write + writeNoise,
        server.cpp:143-146) served concurrently."""
        cfg = StreamConfig(height=48, width=64, overlay_scale=4, port=0,
                           visualizer=Visualizer.HEATMAP)
        n_frames = 6
        sink = AuxStreamSink(cfg.height, cfg.width, port=0, drop=False)
        server = DeltaStreamServer(cfg, SyntheticSource(cfg, seed=9),
                                   verbose=False, overlay_status=False,
                                   aux_sink=sink)
        server.listen()
        t = threading.Thread(target=server.serve,
                             kwargs={"max_frames": n_frames}, daemon=True)
        t.start()
        aux_cli = AuxStreamClient("127.0.0.1", sink.port)
        aux_cli.connect()
        cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height,
                                cfg.width)
        cli.connect()
        replay = SyntheticSource(cfg, seed=9)
        prev = next(replay).copy()
        for k in range(n_frames):
            frame = next(replay)
            prev, _, _, _, eaux = ref.step_oracle(prev, frame, cfg)
            _, recon = cli.read_frame()
            np.testing.assert_array_equal(recon, prev)
            idx, aux = aux_cli.read_frame()
            assert idx == k
            np.testing.assert_array_equal(aux, eaux)
        cli.close()
        aux_cli.close()
        t.join(timeout=60)
        sink.close()


class TestCLI:
    def test_aux_port_requires_visualizer(self):
        from cudavideostream_tpu.runtime.server import main

        with pytest.raises(SystemExit):
            main(["--aux-port", "0"])
