"""Runtime configuration for the TPU delta-streaming framework.

The reference system (`/root/reference/server/include/common.h:1-20`) uses
compile-time ``#define``s: frame geometry hardcoded to 1920x1080 BGR24
(``kernels.cu:107-133``), ``LR_THRESHOLDS 20``, ``K 3`` conv kernel,
``NOISE_VISUALIZER`` mode select, and a hardcoded ``127.0.0.1:2734``
endpoint (``threads.cpp:187``, ``client/opencv.cpp:23``).

Here those become a frozen dataclass whose fields are static arguments to
``jax.jit`` — one compiled executable per configuration, which is the XLA
analogue of the reference's "recompile to change a flag" model, minus the
recompile-by-hand.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple


class Visualizer(enum.Enum):
    """Auxiliary-output mode, mirroring ``NOISE_VISUALIZER`` (common.h:10-11).

    ``NONE`` disables the aux frame; the numbered modes match the reference:
    1 heatmap, 2 red-black, 3 red-overlap, 4 grayscale, 5 binarization.
    """

    NONE = 0
    HEATMAP = 1
    RED_BLACK = 2
    RED_OVERLAP = 3
    GRAYSCALE = 4
    BINARIZE = 5


class CompactionBackend(enum.Enum):
    """How the sparse (pos, xs, vals) payload is produced.

    The reference compacts with ``atomicInc`` on the GPU
    (``kernels.cu:313-315``), which is nondeterministic in output order.
    All backends here are deterministic (ascending byte index), which the
    reference client is insensitive to (pure scatter-add,
    ``client/opencv.cpp:64-66``).
    """

    SORT = "sort"          # single XLA sort_key_val over packed (idx, val) keys
    PALLAS = "pallas"      # two-stage Pallas kernel: tile counts + tile compaction
    HOST = "host"          # device emits dense delta + bitmask; C/numpy host packs


class PayloadOverflowError(RuntimeError):
    """A frame changed more bytes than ``payload_capacity`` allows.

    ``payload_capacity`` is an explicit opt-in memory bound (the default,
    None, is the worst case and can never overflow — the reference's
    ``atomicInc`` bound of 6220801, kernels.cu:313). Exceeding it cannot
    be silently truncated: dropped deltas would already be absorbed into
    the server's previous-frame state, so the v1/v2 client would diverge
    permanently. Raise ``payload_capacity`` (or leave it None).

    Wire v3 servers recover instead of dying: mode 2 (raw) can express a
    full resync, so ``DeltaStreamServer`` catches this, fetches the
    executor's post-step state (``StreamExecutor.resync``), and ships it
    as one raw frame. Raisers that already hold the post-step
    previous-frame state attach it as ``state`` so the executor stays
    consistent with any host-side shadows that were updated before the
    overflow was detected (the HOST backend's packer updates its shadow
    in place while packing).
    """

    def __init__(self, msg: str, state=None):
        super().__init__(msg)
        self.state = state


@dataclasses.dataclass(frozen=True)
class StreamConfig:
    """Static configuration of the delta-stream pipeline.

    Defaults replicate the reference's shipped build: 1080p BGR24, threshold
    20, negative feedback on, no noise filter, no visualizer.
    """

    height: int = 1080
    width: int = 1920
    channels: int = 3

    # |delta| must be strictly greater than this to ship (kernels.cu:312).
    threshold: int = 20
    # Sub-threshold drift accumulates in the previous-frame buffer
    # (KERNEL2_NEGFEED_OPT, common.h:16, kernels.cu:318-323).
    negative_feedback: bool = True

    # Gaussian denoise convolution in the delta path (common.h:5-8,
    # kernels.cu:457-459). K is the kernel size; sigma defaults to the
    # reference's K*K/6 (server.cpp:43).
    noise_filter: bool = False
    conv_k: int = 3

    visualizer: Visualizer = Visualizer.NONE

    compaction: CompactionBackend = CompactionBackend.PALLAS
    # Payload capacity in bytes; None means worst case (= frame_bytes),
    # matching the reference's atomicInc bound of 6220801 (kernels.cu:313).
    # A frame that changes more bytes raises PayloadOverflowError (never
    # a silent truncation — that desyncs clients permanently); wire-v3
    # servers recover with one raw resync frame (server.py).
    payload_capacity: int | None = None
    # Hand the payload to the host as per-tile compacted blocks + counts
    # instead of one device-merged flat array. Skips the pipeline's only
    # dynamic-offset device stage; the host's scatter-gather sender
    # (wire_send_segments) assembles identical wire bytes for free.
    # PALLAS backend only; capacity is always worst-case in this mode.
    tiled_payload: bool = False
    # How the executor lands a tiled payload on the host (tiled_payload
    # only). "tiles" fetches per-tile blocks up to the last non-empty
    # tile (cheapest on fast links and clustered scenes); "flat" runs the
    # device-side merge and fetches the pos-prefix (fewest bytes moved —
    # wins on slow links and scattered scenes); "auto" picks per frame
    # from measured link throughput and merge cost. Wire bytes are
    # identical either way.
    fetch_mode: str = "auto"
    # Sub-tiled compaction granularity (tiled_payload + PALLAS only):
    # each DMA block compacts as independent subtile_rows-row units, so
    # the kernel's shift-pass loop shrinks from log2(tile_bytes) ~ 16 to
    # log2(subtile_rows*128) passes. At 1 — the default — the row phase
    # disappears entirely (the lane-cumsum matmul IS the prefix sum,
    # every shift is one circular lane roll): measured 0.39 -> 0.18 ms
    # at 1080p/6% uniform, the reference's own real-webcam density
    # (benchmarks/subtile_ab; report.tex:2594 measures 5.93% changed).
    # Wire BYTES are identical at any granularity. Cost: finer per-unit
    # counts metadata on the host link (48 KB/frame at 1080p sub=1 —
    # counts ship in the narrowest dtype that fits a unit) and more
    # host iovec segments; on tunnel-class (sub-PCIe) links set 8.
    # 0 = one unit per DMA block (the round-2 kernel).
    subtile_rows: int = 1
    # Pair-packed lane compaction (subtile_rows == 1 only): the 15-bit
    # units of two rows share one int32 lane, so the 7 roll+select
    # passes — the entire remaining compaction cost — run over half the
    # rows. Identical wire bytes; measured 0.195 -> ~0.16 ms at 1080p/6%
    # uniform (benchmarks/pair_ab). Auto-demotes to the plain layout
    # when the geometry doesn't support it (subtile_rows != 1 or an
    # unpaired tile height).
    pair_lanes: bool = True
    # Emit a packed change-bitmask (n/8 bytes, LSB-first — the
    # diff.pack_bitmask layout) alongside the tiled payload. One extra
    # fused elementwise pass on device (~2n bytes re-read); the landing
    # gains a third fetch flavor — bits window + merged vals prefix,
    # ~1 B per changed byte over the host<->device link vs the 2 B of
    # the narrow flat prefix — which wins whenever the changed span is
    # locally dense (> ~12.5% within its own bounding window, e.g. any
    # clustered scene). tiled_payload + PALLAS only.
    emit_bitmask: bool = False
    # Return "mask"-flavor landings as the raw bits window
    # (wire.MaskPayload) instead of rebuilding flat indices on the host —
    # the zero-index path for wire v4's winmask mode: the device's packed
    # change-bits go over the host link AND over the TCP wire untouched.
    # The consumer must understand MaskPayload (the v4 encoder does;
    # v1/v2/v3 senders fall back through MaskPayload.to_flat()).
    # Requires emit_bitmask.
    mask_payload: bool = False
    # BITMASK-ONLY kernel emission (logcompact emit="mask"): the kernel
    # never materializes the int32 index blocks — they were HALF of all
    # kernel HBM writes (24.9 MB/frame at 1080p, the committed HBM model
    # benchmarks/trace_flagship_tpu_v5e) and mask-flavor serving never
    # fetches them — and packs the change-bitmask in-kernel instead of
    # via a separate 2n-byte XLA pass. The device merge shrinks to a
    # vals-only compaction (logcompact.merge_vals). Byte indices are
    # rebuilt exactly from the bits host-side, so every wire format
    # still works. Requires emit_bitmask + fetch_mode="mask" (the
    # tiles/flat fetch flavors need the index blocks this mode deletes).
    maskonly_payload: bool = False

    # Text overlay (kernel2_char, kernels.cu:351-375): glyph cell scale,
    # and font style — "stroke" is a thin vector font in the visual
    # family of the reference's FONT_HERSHEY_PLAIN (threads.cpp:47);
    # "bitmap" is the embedded 5x7 pixel font.
    overlay_scale: int = 5
    overlay_font: str = "stroke"

    # TCP endpoint (threads.cpp:187).
    host: str = "127.0.0.1"
    port: int = 2734
    # Wire format: "v1" is the reference-compatible contract (default);
    # "v2" delta-encodes the ascending index stream (u16 gaps + escape
    # absolutes), ~40% fewer wire bytes; "v3" adaptively picks the
    # cheapest of delta16/bitmask/raw per frame (worst case ~one raw
    # frame, and the only format that can RECOVER from a
    # payload_capacity overflow — see PayloadOverflowError above);
    # "v4" adds the winmask mode (window change-bitmask — with
    # mask_payload the device's packed bits reach the client with zero
    # server-side translation). v2/v3/v4 need both ends to opt in (the
    # client auto-sniffs the magic).
    wire_format: str = "v1"

    @property
    def frame_shape(self) -> Tuple[int, int, int]:
        return (self.height, self.width, self.channels)

    @property
    def frame_bytes(self) -> int:
        return self.height * self.width * self.channels

    @property
    def capacity(self) -> int:
        cap = self.payload_capacity
        return self.frame_bytes if cap is None else cap

    def __post_init__(self):
        if self.channels != 3:
            raise ValueError("only 3-channel BGR frames are supported")
        if not (0 <= self.threshold <= 255):
            raise ValueError("threshold must be in [0, 255]")
        if self.conv_k < 1 or self.conv_k > 15:
            raise ValueError("conv_k out of supported range")
        if self.payload_capacity is not None and self.payload_capacity < 1:
            raise ValueError("payload_capacity must be positive (None = "
                             "worst case)")
        if self.overlay_scale < 1:
            raise ValueError("overlay_scale must be >= 1")
        if self.overlay_font not in ("stroke", "bitmap"):
            raise ValueError(f"unknown overlay_font {self.overlay_font!r}")
        if self.tiled_payload:
            if self.compaction is not CompactionBackend.PALLAS:
                raise ValueError("tiled_payload requires the PALLAS backend")
            if self.payload_capacity is not None:
                raise ValueError("tiled_payload is always worst-case capacity")
        if self.wire_format not in ("v1", "v2", "v3", "v4"):
            raise ValueError(f"unknown wire_format {self.wire_format!r}")
        if self.fetch_mode not in ("auto", "tiles", "flat", "mask"):
            raise ValueError(f"unknown fetch_mode {self.fetch_mode!r}")
        if self.fetch_mode != "auto" and not self.tiled_payload:
            raise ValueError(
                "fetch_mode tiles/flat/mask applies to tiled_payload"
            )
        if self.fetch_mode == "mask" and not self.emit_bitmask:
            raise ValueError("fetch_mode 'mask' requires emit_bitmask")
        if self.emit_bitmask and not self.tiled_payload:
            raise ValueError("emit_bitmask requires tiled_payload")
        if self.mask_payload and not self.emit_bitmask:
            raise ValueError("mask_payload requires emit_bitmask")
        if self.maskonly_payload:
            if not self.emit_bitmask:
                raise ValueError("maskonly_payload requires emit_bitmask")
            if self.fetch_mode != "mask":
                raise ValueError(
                    "maskonly_payload requires fetch_mode='mask' (the "
                    "tiles/flat fetch flavors need the index blocks "
                    "this emission deletes)"
                )
        if self.subtile_rows < 0 or (
            self.subtile_rows & (self.subtile_rows - 1)
        ):
            raise ValueError("subtile_rows must be 0 or a power of two")


DEFAULT_CONFIG = StreamConfig()
