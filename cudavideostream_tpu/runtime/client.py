"""The decoding client — peer of the reference ``client/opencv.cpp``.

Connects, reads the raw base frame, then loops reading
``[u32 pos][i32 xs[pos]][u8 vals[pos]]`` and applying the uint8 wrap-add
scatter (``client/opencv.cpp:64-66``). No GUI dependency: ``--check``
verifies stream integrity invariants, ``--save`` dumps reconstructed
frames to ``.npy``.

Run:  ``python -m cudavideostream_tpu.runtime.client --check --frames 100``
"""

from __future__ import annotations

import argparse
import socket
import sys
import time

import numpy as np

from cudavideostream_tpu import native
from cudavideostream_tpu.runtime import wire


class DeltaStreamClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 2734,
                 height: int = 1080, width: int = 1920,
                 record: str | None = None, wire_format: str = "auto"):
        self.host, self.port = host, port
        self.n_bytes = height * width * 3
        self.frame: np.ndarray | None = None
        self.sock: socket.socket | None = None
        # "auto" sniffs the 16-byte v2 magic; "v1"/"v2" pin the format
        self.wire_format = wire_format
        # tee every received byte to a session journal replayable with
        # runtime.replay (the wire stream is self-contained)
        self._rec = open(record, "wb") if record else None

    def _read_exact(self, n: int) -> bytes:
        data = wire.read_exact(self.sock, n)
        if self._rec:
            self._rec.write(data)
        return data

    def connect(self) -> None:
        self.sock = socket.create_connection((self.host, self.port))
        if self.wire_format in ("v2", "v3", "v4"):
            magic = {"v2": wire.MAGIC_V2, "v3": wire.MAGIC_V3,
                     "v4": wire.MAGIC_V4}[self.wire_format]
            got = self._read_exact(len(magic))
            if got != magic:
                raise ValueError(
                    f"server did not send the {self.wire_format} wire magic"
                )
        elif self.wire_format == "auto":
            head = self._read_exact(len(wire.MAGIC_V2))
            if head == wire.MAGIC_V2:
                self.wire_format = "v2"
                head = b""
            elif head == wire.MAGIC_V3:
                self.wire_format = "v3"
                head = b""
            elif head == wire.MAGIC_V4:
                self.wire_format = "v4"
                head = b""
            else:
                self.wire_format = "v1"
            rest = self._read_exact(self.n_bytes - len(head))
            self.frame = np.frombuffer(head + rest, dtype=np.uint8).copy()
            return
        self.frame = np.frombuffer(
            self._read_exact(self.n_bytes), dtype=np.uint8
        ).copy()

    def read_frame(self) -> tuple[int, np.ndarray]:
        """Read and apply one delta; returns (pos, reconstructed frame)."""
        # frame parsing lives in wire.py (one place per layout); the
        # _read_exact callable keeps the --record tee in the loop
        if self.wire_format in ("v3", "v4"):
            # one reader for both: mode 3 (winmask) only ever appears in
            # v4 streams, and read_frame_v3 rebuilds its window bits
            # into global xs
            pos, xs, vals, raw = wire.read_frame_v3(
                self._read_exact, self.n_bytes
            )
            if raw is not None:
                self.frame = raw
                return self.n_bytes, self.frame
        elif self.wire_format == "v2":
            pos, xs, vals = wire.read_payload_v2(self._read_exact)
        else:
            pos, xs, vals = wire.read_payload(self._read_exact)
        if pos:
            if xs.min() < 0 or xs.max() >= self.n_bytes:
                raise ValueError("payload index out of range")
            native.client_apply_np(self.frame, xs, vals)  # uint8 wrap-add
        return pos, self.frame

    def close(self) -> None:
        if self.sock:
            self.sock.close()
        if self._rec:
            self._rec.close()
            self._rec = None


def make_http_relay(listen_port: int, server_host: str, server_port: int,
                    height: int, width: int, verbose: bool = False,
                    aux_port: int | None = None):
    """Live browser bridge — parity with the reference client's display
    loop (``client/opencv.cpp:68-69``), sans GUI dependency.

    Returns a ``ThreadingHTTPServer`` bound to ``listen_port`` serving:

    * ``/`` — ``examples/viewer.html`` with the W/H defaults rewritten
      to this stream's geometry; its "live" button starts decoding;
    * ``/stream`` — connects to the delta-stream server and pipes the
      raw wire bytes through as an HTTP/1.0 close-delimited response;
      the browser decodes the stream incrementally (all three wire
      formats — the magic prefix self-describes);
    * ``/aux`` — (when ``aux_port`` is given) same pipe-through for the
      server's live visualizer side stream (``server --aux-port``); the
      viewer page shows it on a second canvas — the browser equivalent
      of the reference's dedicated noise-display thread
      (``threads.cpp:149-164``).

    Each ``/stream`` request opens its own upstream connection, so the
    solo server (sequential clients) and the broadcast server (parallel
    clients) both work. Caller runs ``serve_forever()``.
    """
    import http.server
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    viewer = os.path.join(repo_root, "examples", "viewer.html")
    upstream = (server_host, server_port)

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # noqa: A002 - stdlib signature
            if verbose:
                sys.stderr.write("[http] " + fmt % a + "\n")

        def do_GET(self):
            if self.path in ("/", "/index.html", "/viewer.html"):
                try:
                    with open(viewer, "rb") as f:
                        html = f.read()
                except OSError:
                    self.send_error(404, "examples/viewer.html not found")
                    return
                html = html.replace(
                    b'id="w" value="480"', f'id="w" value="{width}"'.encode()
                ).replace(
                    b'id="h" value="270"', f'id="h" value="{height}"'.encode()
                )
                if aux_port is not None:
                    html = html.replace(b"AUX_ENABLED = false",
                                        b"AUX_ENABLED = true")
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(html)))
                self.end_headers()
                self.wfile.write(html)
                return
            path = self.path.split("?")[0]
            if path == "/aux" and aux_port is not None:
                try:
                    up = socket.create_connection((server_host, aux_port))
                except OSError as e:
                    self.send_error(502, f"aux stream unreachable: {e}")
                    return
                self.send_response(200)
                self.send_header("Content-Type",
                                 "application/octet-stream")
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                try:
                    while True:
                        data = up.recv(1 << 16)
                        if not data:
                            break
                        self.wfile.write(data)
                except (BrokenPipeError, ConnectionResetError, OSError):
                    pass
                finally:
                    up.close()
                return
            if path == "/stream":
                try:
                    up = socket.create_connection(upstream)
                except OSError as e:
                    self.send_error(502, f"server {upstream} unreachable: {e}")
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                try:
                    while True:
                        data = up.recv(1 << 16)
                        if not data:
                            break
                        self.wfile.write(data)
                except (BrokenPipeError, ConnectionResetError, OSError):
                    pass  # browser went away; just drop the upstream too
                finally:
                    up.close()
                return
            self.send_error(404)

    return http.server.ThreadingHTTPServer(("0.0.0.0", listen_port), Handler)


def write_ppm(path: str, frame: np.ndarray, height: int, width: int) -> None:
    """Dependency-free viewable dump: binary PPM (P6), BGR -> RGB."""
    img = frame.reshape(height, width, 3)[:, :, ::-1]
    with open(path, "wb") as f:
        f.write(f"P6\n{width} {height}\n255\n".encode())
        f.write(np.ascontiguousarray(img).tobytes())


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="TPU delta-stream client")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=2734)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--check", action="store_true",
                   help="verify invariants and print a digest per second")
    p.add_argument("--save", help="save reconstructed frames to this .npy")
    p.add_argument("--ppm", help="dump every Nth frame as viewable .ppm "
                                 "images to this directory prefix")
    p.add_argument("--ppm-every", type=int, default=30)
    p.add_argument("--record", help="tee the raw wire stream to this file "
                                    "(replay with runtime.replay)")
    p.add_argument("--wire", default="auto",
                   choices=["auto", "v1", "v2", "v3", "v4"],
                   help="auto sniffs the v2/v3/v4 magic; v1 = reference "
                        "wire")
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="instead of decoding here, serve a LIVE browser "
                        "viewer on this port: / renders the canvas page, "
                        "/stream relays the raw wire bytes from the "
                        "server at --host/--port (open http://localhost:"
                        "PORT/ and press 'live')")
    p.add_argument("--aux", action="store_true",
                   help="attach to the server's AUX (visualizer) side "
                        "stream at --port instead of the delta stream "
                        "(server --aux-port; th_noise_hdl parity)")
    p.add_argument("--aux-port", type=int, default=None, metavar="PORT",
                   help="with --http: also relay the server's aux "
                        "stream from this port as /aux, and show the "
                        "visualizer panel in the browser viewer")
    args = p.parse_args(argv)

    if args.http is not None:
        srv = make_http_relay(args.http, args.host, args.port,
                              args.height, args.width, verbose=args.check,
                              aux_port=args.aux_port)
        print(f"live viewer at http://localhost:{args.http}/ "
              f"(relaying {args.host}:{args.port})", flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            srv.server_close()
        return 0

    if args.aux:
        from cudavideostream_tpu.runtime.auxstream import AuxStreamClient

        aux = AuxStreamClient(args.host, args.port)
        aux.connect()
        print(f"aux stream: {aux.height}x{aux.width}", flush=True)
        n = 0
        t0 = time.perf_counter()
        last = t0
        try:
            while args.frames is None or n < args.frames:
                idx, frame = aux.read_frame()
                n += 1
                if args.ppm and (n - 1) % args.ppm_every == 0:
                    write_ppm(f"{args.ppm}_{idx:06d}.ppm", frame,
                              aux.height, aux.width)
                now = time.perf_counter()
                if args.check and now - last >= 1.0:
                    print(f"aux frame {idx}: fps={n/(now-t0):.1f} "
                          f"digest={int(frame.sum())}", flush=True)
                    last = now
        except (ConnectionError, KeyboardInterrupt):
            pass
        finally:
            aux.close()
        print(f"received {n} aux frames", flush=True)
        return 0

    cli = DeltaStreamClient(args.host, args.port, args.height, args.width,
                            record=args.record, wire_format=args.wire)
    cli.connect()
    print(f"base frame received ({cli.n_bytes} bytes)", flush=True)
    saved = []
    n = 0
    t0 = time.perf_counter()
    last = t0
    try:
        while args.frames is None or n < args.frames:
            pos, frame = cli.read_frame()
            n += 1
            if args.save:
                saved.append(frame.copy())
            if args.ppm and (n - 1) % args.ppm_every == 0:
                write_ppm(f"{args.ppm}_{n:06d}.ppm", frame, args.height, args.width)
            now = time.perf_counter()
            if args.check and now - last >= 1.0:
                digest = int(frame.sum())
                print(
                    f"frame {n}: pos={pos} fps={n/(now-t0):.1f} "
                    f"digest={digest}",
                    flush=True,
                )
                last = now
    except (ConnectionError, KeyboardInterrupt):
        pass
    finally:
        cli.close()
    if args.save and saved:
        np.save(args.save, np.stack(saved))
        print(f"saved {len(saved)} frames to {args.save}")
    print(f"decoded {n} frames", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
