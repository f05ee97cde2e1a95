"""Frame sources: where frames come from.

The reference captures via OpenCV/V4L2 on a dedicated pthread feeding a
pipe-based ring (``threads.cpp:166-179``); capture dominates its wall
clock (~30-40 ms/frame, report.tex:782). Here a source is a simple
iterator protocol the executor pulls from; capture parallelism comes from
the executor's double-buffering rather than pipes.

Sources:

* :class:`SyntheticSource` — procedural 1080p scene (sensor noise +
  moving bright square), the benchmark-time stand-in the survey calls for
  (SURVEY.md §6: the rebuild must fix the capture bottleneck with a
  synthetic/file source).
* :class:`FileSource` — a ``.npy`` stack or raw BGR24 file, the analogue
  of the reference's file-based socket tests
  (``tests/test_socket_opencv_webcam/image_reader.cpp:63``).
* :class:`V4L2Source` — real camera via the native helper library
  (ioctl/mmap, like ``tests/cuda_streaming/v4l.cpp``); gated on the
  device and the built helper existing.
* :func:`device_synthetic_frames` — frames generated *on device* for
  transfer-free benchmarking.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

from cudavideostream_tpu.config import StreamConfig


class FrameSource:
    """Iterator protocol: ``__next__`` returns a flat uint8 frame."""

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:  # pragma: no cover - interface
        raise NotImplementedError

    def base_frame(self) -> np.ndarray:
        """First frame, used for the base-frame handshake."""
        return next(self)


class SyntheticSource(FrameSource):
    """Procedural scene: static textured background + per-frame sensor
    noise below the diff threshold + a moving bright rectangle above it.

    Calibrated so the changed-byte rate is in the ballpark of the
    reference's measured 5.93% (report.tex:2594).
    """

    def __init__(self, config: StreamConfig, seed: int = 0, noise: int = 10,
                 object_size: int = 200, speed: int = 12):
        self.cfg = config
        self.rng = np.random.default_rng(seed)
        self.noise = noise
        self.object_size = object_size
        self.speed = speed
        self.t = 0
        self.background = self.rng.integers(
            0, 255, config.frame_bytes, endpoint=True, dtype=np.uint8
        )

    def __next__(self) -> np.ndarray:
        cfg = self.cfg
        img = self.background.reshape(cfg.height, cfg.width, 3).astype(np.int16)
        if self.noise:
            img = img + self.rng.integers(
                -self.noise, self.noise, img.shape, endpoint=True, dtype=np.int16
            )
        s = max(1, min(self.object_size, cfg.height // 2, cfg.width // 2))
        y = (self.t * self.speed) % max(1, cfg.height - s)
        x = (self.t * self.speed * 2) % max(1, cfg.width - s)
        img[y : y + s, x : x + s] = 255
        self.t += 1
        return np.clip(img, 0, 255).astype(np.uint8).ravel()


class FileSource(FrameSource):
    """Frames from a ``.npy`` array of shape (n, H*W*3) or (n, H, W, 3),
    or a raw concatenated-BGR24 file; loops when exhausted."""

    def __init__(self, path: str, config: StreamConfig, loop: bool = True):
        self.cfg = config
        self.loop = loop
        if path.endswith(".npy"):
            arr = np.load(path)
            self.frames = arr.reshape(arr.shape[0], -1).astype(np.uint8)
        else:
            raw = np.fromfile(path, dtype=np.uint8)
            n = raw.size // config.frame_bytes
            if n == 0:
                raise ValueError(f"{path}: smaller than one frame")
            self.frames = raw[: n * config.frame_bytes].reshape(n, -1)
        if self.frames.shape[1] != config.frame_bytes:
            raise ValueError(
                f"{path}: frame size {self.frames.shape[1]} != {config.frame_bytes}"
            )
        self.i = 0

    def __next__(self) -> np.ndarray:
        if self.i >= len(self.frames):
            if not self.loop:
                raise StopIteration
            self.i = 0
        f = self.frames[self.i]
        self.i += 1
        return f


def decode_mjpg_frame(data: bytes, height: int, width: int) -> np.ndarray:
    """Decode one MJPG (JPEG) camera frame to flat BGR24 bytes.

    The reference captures 1080p as MJPG because raw BGR24 at 1080p30
    exceeds USB2 bandwidth (``threads.cpp:34-38``) and lets OpenCV
    decode; here the decode is Pillow (baked into the image). Raises
    ``RuntimeError`` on a geometry mismatch or undecodable frame.
    """
    import io

    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL is baked in
        raise RuntimeError(
            "MJPG camera stream needs Pillow to decode; install PIL or "
            "use a BGR24-capable device"
        ) from e
    try:
        img = Image.open(io.BytesIO(data))
        rgb = np.asarray(img.convert("RGB"), dtype=np.uint8)
    except Exception as e:
        raise RuntimeError(f"MJPG frame decode failed: {e}") from e
    if rgb.shape[:2] != (height, width):
        raise RuntimeError(
            f"MJPG frame is {rgb.shape[1]}x{rgb.shape[0]}, "
            f"expected {width}x{height}"
        )
    return rgb[..., ::-1].reshape(-1).copy()  # RGB -> BGR, flat


class V4L2Source(FrameSource):
    """Camera capture through the native helper (see native/csrc/cvstpu.c).

    The helper negotiates the pixel format: raw BGR24 preferred, MJPEG
    accepted (decoded host-side via :func:`decode_mjpg_frame` — real
    1080p30 USB cameras only do MJPG, like the reference's,
    ``threads.cpp:34-38``). Any other format is a hard error, never
    silently-garbage frames. Raises ``RuntimeError`` when the device or
    the helper is unavailable — callers fall back to Synthetic/File
    sources.
    """

    def __init__(self, config: StreamConfig, device: str = "/dev/video0"):
        self.cfg = config
        if not os.path.exists(device):
            raise RuntimeError(f"camera device {device} not present")
        from cudavideostream_tpu.native import load_native

        lib = load_native()
        if lib is None or not hasattr(lib, "v4l2_open"):
            raise RuntimeError("native v4l2 helper not built")
        self._lib = lib
        rc = lib.v4l2_open(device.encode(), config.width, config.height)
        if rc == -2000:
            raise RuntimeError(
                f"{device} offers neither BGR24 nor MJPG at "
                f"{config.width}x{config.height}"
            )
        if rc < 0:
            raise RuntimeError(f"v4l2_open({device}) failed: {rc}")
        self._mjpg = rc == 1
        self._handle = 0
        self._buf = np.empty(config.frame_bytes, dtype=np.uint8)

    def __next__(self) -> np.ndarray:
        import ctypes

        n = self._lib.v4l2_grab(
            self._handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._buf.size,
        )
        if n < 0:
            raise RuntimeError(f"v4l2_grab failed: {n}")
        if self._mjpg:
            return decode_mjpg_frame(
                self._buf[:n].tobytes(), self.cfg.height, self.cfg.width
            )
        if n != self.cfg.frame_bytes:
            raise RuntimeError(
                f"short BGR24 frame: {n} of {self.cfg.frame_bytes} bytes"
            )
        return self._buf.copy()

    def close(self) -> None:
        """Idempotent; MUST run before another V4L2Source can open (the
        native helper holds one process-wide camera handle)."""
        lib, self._lib = getattr(self, "_lib", None), None
        if lib is not None:
            lib.v4l2_close(self._handle)

    # the camera handle is process-global: a dropped/failed source must
    # not claim it forever (e.g. a decode error mid-stream abandons the
    # object; the next V4L2Source(...) would fail until process restart)
    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PrefetchSource(FrameSource):
    """Capture-prefetch thread — the reference's dedicated capture
    pthread (``th_cap_hdl``, ``threads.cpp:166-179``), whose whole point
    is overlapping the ~30-40 ms V4L2/MJPG grab (the reference's real
    fps ceiling, report.tex:782) with compute+send.

    Wraps any source: a daemon thread pulls ``next(inner)`` into a small
    bounded queue; the serving loop pops ready frames. Wins when source
    latency dominates the loop (a real camera); on the ~16 MB/s tunnel
    the serving loop is transfer-bound and overlap buys nothing
    (``benchmarks/ingest_overlap_results``), so the server default is
    OFF (``--prefetch`` opts in).

    The queue depth bounds staleness: depth 1 means at most one frame is
    captured ahead, matching the reference's one-in-flight ring handoff.
    Source exceptions (camera death mid-stream) re-raise in the consumer.
    """

    _DONE = object()

    def __init__(self, inner: FrameSource, depth: int = 1):
        import queue
        import threading

        if depth < 1:
            raise ValueError("prefetch depth must be >= 1")
        self.inner = inner
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exc: BaseException | None = None
        self._thread: threading.Thread | None = None

    def base_frame(self) -> np.ndarray:
        # handshake stays synchronous (the thread starts on first __next__)
        return self.inner.base_frame()

    def _run(self) -> None:
        import queue

        try:
            while not self._stop.is_set():
                frame = next(self.inner)
                while not self._stop.is_set():
                    try:
                        self._q.put(frame, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except StopIteration:
            self._q.put(self._DONE)
        except BaseException as e:  # camera died: surface it, don't hang
            self._exc = e
            self._q.put(self._DONE)

    def __next__(self) -> np.ndarray:
        import threading

        if self._thread is None:
            self._thread = threading.Thread(
                target=self._run, name="cvstpu-prefetch", daemon=True
            )
            self._thread.start()
        item = self._q.get()
        if item is self._DONE:
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item

    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None
        inner_close = getattr(self.inner, "close", None)
        if inner_close is not None:
            inner_close()


def make_source(kind: str, config: StreamConfig, path: Optional[str] = None,
                seed: int = 0) -> FrameSource:
    if kind == "synthetic":
        return SyntheticSource(config, seed=seed)
    if kind == "file":
        if not path:
            raise ValueError("file source needs --path")
        return FileSource(path, config)
    if kind == "v4l2":
        return V4L2Source(config, device=path or "/dev/video0")
    raise ValueError(f"unknown source kind {kind!r}")


def device_synthetic_frames(config: StreamConfig, seed: int = 0,
                            noise_bank: int = 0):
    """On-device procedural frame generator for transfer-free benchmarks.

    Returns ``(init_frame, next_frame)`` where ``next_frame(key, t)`` is
    jittable and produces the frame for timestep ``t`` entirely in HBM.

    ``noise_bank > 0`` pre-generates that many noise planes at init (same
    per-byte distribution as the per-frame hash) and cycles through them
    by ``t``: the per-frame cost drops from ~6 VPU hash ops per byte to
    one HBM plane read, so the benchmark charges the pipeline, not the
    source. Frames stay a pure function of ``(seed, t)``; consecutive
    planes are independent, so per-frame delta statistics match the
    hashed source (the bank's period only repeats *noise*, and the
    negative-feedback state evolves with the moving box regardless).
    """
    import jax
    import jax.numpy as jnp

    cfg = config
    h, w = cfg.height, cfg.width
    key = jax.random.PRNGKey(seed)
    # all ops in the (h, w*3) byte view — a (h, w, 3) view would force a
    # minor-dim-3 relayout of the whole frame every frame. Stored uint8:
    # an int32-resident background costs 4x the HBM read every frame
    # (25 MB vs 6.2 MB at 1080p) for values that are all <= 255.
    background = jax.random.randint(
        key, (h, w * 3), 0, 256, dtype=jnp.int32
    ).astype(jnp.uint8)

    def _hash_noise(seed32):
        """±10 per-byte sensor noise from a counter hash (see below)."""
        idx = jax.lax.broadcasted_iota(jnp.uint32, (h, w * 3), 0) * jnp.uint32(w * 3) + \
            jax.lax.broadcasted_iota(jnp.uint32, (h, w * 3), 1)
        z = idx * jnp.uint32(2654435761) + seed32
        z = (z ^ (z >> 15)) * jnp.uint32(0x2C1B3C6D)
        z = (z ^ (z >> 12)) * jnp.uint32(0x297A2D39)
        z = z ^ (z >> 15)
        # mod-21 bias is irrelevant for synthetic sensor noise
        return (z % 21).astype(jnp.int32) - 10

    def _box(t):
        s = max(1, min(200, h // 2, w // 2))
        y = (t * 12) % (h - s)
        x = (t * 24) % (w - s)
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w * 3), 0)
        xb = jax.lax.broadcasted_iota(jnp.int32, (h, w * 3), 1) // 3
        return (ys >= y) & (ys < y + s) & (xb >= x) & (xb < x + s)

    if noise_bank:
        # noisy planes precomputed (clipped uint8): per frame = one plane
        # read + the moving-box select, nothing else
        bank = jnp.stack([
            jnp.clip(
                background.astype(jnp.int32)
                + _hash_noise(jnp.uint32(seed * 0x9E3779B9 + 0x85EB + k)),
                0, 255,
            ).astype(jnp.uint8)
            for k in range(noise_bank)
        ])

        def next_frame(key, t):
            del key  # the bank is the randomness; t selects the plane
            plane = jax.lax.dynamic_index_in_dim(
                bank, t % noise_bank, keepdims=False
            )
            return jnp.where(_box(t), jnp.uint8(255), plane).reshape(-1)

        init = background.reshape(-1)
        return init, next_frame

    def next_frame(key, t):
        # counter-based integer hash instead of threefry: the RNG was
        # costing as much as the whole diff+compact kernel (~0.16 ms at
        # 1080p — measured against a same-run kernel calibration row),
        # and synthetic sensor noise needs decorrelation, not crypto.
        # Determinism is preserved: the per-step key still seeds the
        # hash, so frames are a pure function of (seed, t) as before.
        kd = jnp.asarray(jax.random.key_data(key), jnp.uint32).ravel()
        seed32 = kd[0] ^ (kd[-1] * jnp.uint32(2654435761))
        img = background + _hash_noise(seed32)
        img = jnp.where(_box(t), 255, img)
        return jnp.clip(img, 0, 255).astype(jnp.uint8).reshape(-1)

    init = background.reshape(-1)
    return init, next_frame
