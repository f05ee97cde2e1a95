"""Streaming executor: drives the pipeline and lands payloads on the host.

The reference overlaps capture / GPU / socket with three pthreads, four
pipes, and a ring of six pinned buffers (``threads.cpp:59-106``); its
variable-length DtoH is two ``cudaMemcpyAsync`` calls sized by ``pos``
after a sync (``kernels.cu:507-524``). The TPU equivalents here:

* async dispatch — ``pipeline.step`` returns immediately with device
  arrays; the next frame's HtoD upload overlaps the previous frame's
  payload fetch (XLA's async runtime plays the role of CUDA streams);
* variable-length fetch — XLA outputs are fixed-shape, so the executor
  fetches the 4-byte ``pos`` first, then pulls ``xs``/``vals`` prefixes
  through *power-of-two tiered* static slices: each tier is a distinct
  compiled slice (bounded set, compiled on demand and cached), which
  avoids both a full-capacity transfer and a recompile per distinct
  ``pos``;
* the 1 Hz ``FPS/FOR/READ/POS/BW`` status line (``server.cpp:150-171``)
  including the reference's bandwidth estimate ``(pos<<4)*fps`` — kept
  bug-compatible for parity — plus the true wire bandwidth.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np

from cudavideostream_tpu.config import PayloadOverflowError, StreamConfig
from cudavideostream_tpu.models import DeltaStreamPipeline
from cudavideostream_tpu.runtime import wire

# per-byte-value popcount / set-bit-position tables for the bitmask
# rebuild (LSB-first: bit k of byte j is frame byte 8*j + k)
_POPCOUNT = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1, bitorder="little"
).sum(axis=1).astype(np.intp)
_BITPOS = np.zeros((256, 8), np.uint8)
for _v in range(256):
    _idx = np.flatnonzero(
        np.unpackbits(np.uint8([_v]), bitorder="little"))
    _BITPOS[_v, : _idx.size] = _idx
del _v, _idx


class LinkStats:
    """EMA estimates of the host↔device link and of the device-side tile
    merge, feeding the density-adaptive fetch decision.

    ``bps`` starts unknown (None) and is learned from real ``device_get``
    calls; ``merge_s`` starts at a deliberately optimistic guess so the
    flat path gets tried once when the byte savings look large, after
    which its measured cost takes over.
    """

    # samples below this size are dominated by fixed per-call latency,
    # not throughput — recording them would make a fast link look slow
    # and lock "auto" into the wrong landing
    MIN_SAMPLE_BYTES = 65536

    def __init__(self, alpha: float = 0.3, merge_s_init: float = 1.5e-3):
        self.alpha = alpha
        self.bps: float | None = None
        self.merge_s = merge_s_init

    def record_fetch(self, nbytes: int, seconds: float) -> None:
        if nbytes < self.MIN_SAMPLE_BYTES or seconds <= 0:
            return
        bps = nbytes / seconds
        self.bps = bps if self.bps is None else (
            self.alpha * bps + (1 - self.alpha) * self.bps
        )

    def record_merge(self, seconds: float) -> None:
        self.merge_s = self.alpha * seconds + (1 - self.alpha) * self.merge_s

    def fetch_seconds(self, nbytes: int) -> float | None:
        return None if self.bps is None else nbytes / self.bps


class TieredFetcher:
    """Fetch ``arr[:pos]`` via the smallest power-of-two static slice.

    Static slice shapes keep jit cache hits; over-fetch is bounded 2x.
    Slices along the leading axis (works for flat payloads and for
    ``(n_tiles, tile_cap)`` tiled blocks alike); host numpy arrays pass
    through with a plain slice. Real device fetches are timed into
    ``stats`` when given one.
    """

    def __init__(self, capacity: int, min_tier: int = 4096,
                 stats: Optional[LinkStats] = None):
        import jax

        self._jax = jax
        self.capacity = capacity
        self.stats = stats
        self.tiers = []
        t = min_tier
        while t < capacity:
            self.tiers.append(t)
            t *= 2
        self.tiers.append(capacity)

    def tier(self, pos: int) -> int:
        """The slice length a fetch of ``pos`` entries would move."""
        for t in self.tiers:
            if pos <= t:
                return t
        return self.capacity

    def tier_checked(self, pos: int) -> int:
        """``tier()``, but fail loudly past capacity (see :meth:`fetch`:
        truncation would silently desync v1/v2 clients)."""
        for t in self.tiers:
            if pos <= t:
                return t
        raise PayloadOverflowError(
            f"frame changed {pos} bytes > payload_capacity {self.capacity}"
        )

    def _get(self, arr) -> np.ndarray:
        if self.stats is None:
            return np.asarray(self._jax.device_get(arr))
        t0 = time.perf_counter()
        out = np.asarray(self._jax.device_get(arr))
        self.stats.record_fetch(out.nbytes, time.perf_counter() - t0)
        return out

    def fetch(self, arr, pos: int) -> np.ndarray:
        if isinstance(arr, np.ndarray):
            return arr[:pos]
        if pos <= 0:
            return np.empty((0,) + arr.shape[1:], dtype=arr.dtype)
        # pos exceeding every tier means the configured payload_capacity
        # is blown: the true changed count no longer fits the arrays.
        # Truncating would silently desync v1/v2 clients (the dropped
        # deltas are already folded into the server's prev state) —
        # tier_checked fails loudly instead.
        return self._get(arr[: self.tier_checked(pos)])[:pos]


class _RungMemo:
    """Rung hysteresis for the fetch ladders (see TiledLander._range_len).

    The learned span/pos estimates jitter between adjacent ladder rungs
    batch after batch, and every rung is a distinct static-length
    dynamic-slice jit — a fresh ~0.55 s XLA compile on the tunnel
    backend at the batch boundary that first uses it (the every-16th-
    frame 1.3-2.1 s stalls in benchmarks/sustained_tpu_tunnel). The memo
    RATCHETS: it holds the last rung while the fresh pick sits no more
    than ``max(2 steps, 25%)`` below it (absorbing oscillation around a
    working point), grows immediately, and decays to the fresh rung
    after 4 consecutive holds more than one step above it — so a
    steady scene converges back to <= 2 ladder steps (~1/8) of slack
    within ~4 batches (the bound `tests/test_land_batch.py::
    TestDriftAwareSpec::test_converged_fetch_slack_bounded` pins),
    while a genuinely oscillating one keeps its peak rung and never
    re-compiles.

    PINNING (cross-session convergence): hysteresis bounds churn within
    a session, but every session's EMA trajectory differs slightly, so
    successive warm sessions each minted ~5-8 FRESH rungs — a 0.6-1.7 s
    compile stall apiece, forever (measured across four accumulating
    sessions, benchmarks/sustained_tpu_tunnel r5). A loaded link cache
    therefore PINS each memo to its persisted rung family: a fresh pick
    snaps UP to the smallest cached rung that covers it (over-fetch
    bounded at max(2x, 8 steps) — a few ms of link time vs the compile
    stall), and mints a new rung only when the need genuinely exceeds
    the family (a regime change worth a compile). Pinned scalars make
    the jit-key space finite, so cache accumulation reaches a fixed
    point instead of chasing drifting EMAs."""

    __slots__ = ("rung", "excess", "pinned", "seen")

    def __init__(self):
        self.rung = 0
        self.excess = 0
        self.pinned = ()   # sorted rung family from a loaded link cache
        self.seen = set()  # rungs this session actually returned

    def _snap(self, fresh: int, step: int, cap: int) -> int:
        """Smallest pinned rung covering ``fresh`` within the over-fetch
        bound, or 0 when the family has none (mint)."""
        bound = min(cap, max(2 * fresh, fresh + 8 * step))
        for p in self.pinned:
            if p >= fresh:
                return p if p <= bound else 0
        return 0

    def pick(self, fresh: int, step: int, cap: int) -> int:
        band = max(2 * step, fresh // 4)
        if self.rung and fresh <= self.rung <= min(fresh + band, cap):
            if self.rung > fresh + step:
                self.excess += 1
                if self.excess >= 4:
                    self.excess = 0
                    self.rung = self._snap(fresh, step, cap) or fresh
            else:
                self.excess = 0
        else:
            self.excess = 0
            self.rung = self._snap(fresh, step, cap) or fresh
        self.seen.add(self.rung)
        return self.rung


class OverlayHint:
    """Per-frame landing hint for a text-change ("volatile") frame:
    carries the new overlay text plus an upper bound on the overlay's
    payload entries (changed glyph cells x cell bytes). Truthy, so the
    legacy ``volatile=True/False`` call sites keep working."""

    __slots__ = ("text", "budget")

    def __init__(self, text: str, budget: int):
        self.text = text
        self.budget = budget

    def __bool__(self) -> bool:
        return True


class OverlayShadow:
    """Host-authored overlay payload entries for text-change frames.

    The status overlay re-ships its glyph bytes whenever the text
    changes (~1 Hz); the device span on those frames covers
    overlay + scene as one wide window, which used to force the
    exact-miss landing: a full-union bits fetch plus one extra ~30 ms
    link round trip per text change (``benchmarks/sustained_tpu_tunnel``
    r4 block). But the server already HOLDS every input needed to author
    the overlay's payload entries itself:

    * the blit is OPAQUE over the written columns — ``overlay_blit``
      copies full glyph cells, background included, exactly like the
      reference (``kernels.cu:351-375``) — so the current strip bytes
      there are a pure function of (atlas, text), both host-known;
    * under negative feedback, the device's previous-frame bytes equal
      ``base_frame + every payload entry ever shipped`` (the prev
      updates ARE the payload entries, ``reference_cpu.diff_encode``);
      this class maintains exactly that shadow over the strip rows,
      wrap-adding each landed payload's strip-range entries (addition
      commutes, so application order across frames is free);
    * the diff rule is stateless per byte (``|cur - prev| > thr``), so
      the overlay's exact ``(xs, vals)`` are computable host-side with
      zero device fetch.

    The landing then treats a text-change frame like a clean frame: the
    speculative scene window lands the scene, :meth:`delta` supplies the
    overlay entries, and a count + value-prefix gate proves exact
    coverage (any mismatch falls back to the miss path, which is always
    exact — see ``TiledLander._try_overlay_hit``). Enabled only for
    negative-feedback device pipelines: with ``negative_feedback=False``
    device prev = full cur, including scene bytes under unwritten
    columns the host never sees.
    """

    def __init__(self, pipe, base_frame: np.ndarray):
        cfg = pipe.config
        atlas = pipe.atlas_np
        self.cell_h = int(atlas.shape[1])
        self.cell_w = int(atlas.shape[2])
        self.cw3 = self.cell_w * 3
        self.w3 = cfg.width * 3
        self.strip_bytes = self.cell_h * self.w3
        from cudavideostream_tpu.models.pipeline import MAX_OVERLAY_CHARS

        self.max_chars = MAX_OVERLAY_CHARS
        self.n_fit = min(self.max_chars, cfg.width // self.cell_w)
        self._cells = atlas.reshape(atlas.shape[0], self.cell_h, self.cw3)
        self.enabled = self.n_fit > 0 and self.cell_h <= cfg.height
        # per-byte threshold over the strip (map slice or scalar)
        tm = pipe.threshold_map_np
        if tm is not None:
            self.thr = tm[: self.strip_bytes].reshape(
                self.cell_h, self.w3).astype(np.int32)
        else:
            self.thr = np.int32(cfg.threshold)
        self.shadow = None
        self.reinit(base_frame)

    def reinit(self, frame_bytes: np.ndarray) -> None:
        """(Re)sync the shadow from a full frame the client is known to
        hold: ``start()``, ``load_state``, and wire-v3 raw ``resync()``
        all replace the client state wholesale."""
        f = np.asarray(frame_bytes, np.uint8).ravel()
        self.shadow = f[: self.strip_bytes].reshape(
            self.cell_h, self.w3).copy()

    # -- host-side raster ---------------------------------------------
    def _render(self, text: str):
        """The blit's written region: ``(cell_h, nc*cw3)`` glyph-cell
        bytes + the written cell count. Byte-identical to the device
        ``overlay_blit`` by construction (both copy atlas cells)."""
        from cudavideostream_tpu.utils import fonts

        ids = fonts.encode_text(text, self.max_chars)
        nc = min(len(text), self.max_chars, self.n_fit)
        if nc == 0:
            return np.zeros((self.cell_h, 0), np.uint8), 0
        r = self._cells[np.asarray(ids[:nc], np.intp)]
        return r.transpose(1, 0, 2).reshape(self.cell_h, nc * self.cw3), nc

    def budget(self, old_text, new_text: str) -> int:
        """Upper bound on this text change's payload entries: changed
        glyph cells x cell bytes (an unchanged glyph produces identical
        strip bytes, hence zero diff; sub-threshold residue from an
        older change stays sub-threshold against the same raster)."""
        if not self.enabled:
            return 0
        old = old_text if old_text is not None else ""
        n_old = min(len(old), self.n_fit)
        n_new = min(len(new_text), self.n_fit)
        if old_text is None:
            # first raster: every written cell diffs against scene bytes
            ncells = n_new
        else:
            n = max(n_old, n_new)
            ncells = sum(
                1 for j in range(n)
                if (old[j] if j < n_old else None)
                != (new_text[j] if j < n_new else None)
            )
        return ncells * self.cell_h * self.cw3

    def delta(self, text: str):
        """Exact overlay payload entries for a frame carrying ``text``:
        ascending global ``(xs int32, vals uint8)`` over the WRITTEN
        columns (pure — the shadow advances only via
        :meth:`apply`). Returns None when the overlay cannot be authored
        (blit disabled, or the written region SHRANK — revealed columns
        expose scene bytes the host never sees; the caller falls back to
        the exact miss path)."""
        if not self.enabled or self.shadow is None:
            return None
        r, nc = self._render(text)
        w = nc * self.cw3
        prev_w = self.shadow[:, :w].astype(np.int32)
        df = r.astype(np.int32) - prev_w
        thr = self.thr[:, :w] if isinstance(self.thr, np.ndarray) else self.thr
        mask = np.abs(df) > thr
        rows, cols = np.nonzero(mask)          # row-major = ascending
        xs = (rows.astype(np.int64) * self.w3 + cols).astype(np.int32)
        vals = df[mask].astype(np.uint8)       # mod-256 wrap
        return xs, vals

    # -- shadow upkeep --------------------------------------------------
    def apply(self, xs: np.ndarray, vals: np.ndarray) -> None:
        """Wrap-add the strip-range entries of one landed payload
        (client_apply semantics; prev = where(mask, cur, prev) is the
        same bytes). Entries at/above ``strip_bytes`` are ignored."""
        if xs.size == 0:
            return
        k = int(np.searchsorted(xs, self.strip_bytes))
        if k == 0:
            return
        flat = self.shadow.reshape(-1)
        flat[xs[:k].astype(np.int64)] += vals[:k]

    def apply_result(self, res) -> None:
        """Extract + apply strip entries from any landed payload form."""
        if isinstance(res, tuple):
            self.apply(np.asarray(res[0]), np.asarray(res[1]))
            return
        if isinstance(res, wire.MaskPayload):
            if res.start_byte >= self.strip_bytes or res.pos == 0:
                return
            self.apply(*res.to_flat())
            return
        if isinstance(res, wire.TiledPayload):
            if res.pos == 0:
                return
            nz = np.flatnonzero(np.asarray(res.counts) > 0)
            if nz.size == 0 or res.xs[nz[0], 0] >= self.strip_bytes:
                return
            self.apply(*res.to_flat())


class TiledLander:
    """Landing strategy for per-tile payload blocks, shared by the solo
    executor, multiserve, and broadcast paths.

    Per call: either fetch the block RANGE covering the non-empty tiles
    (cheapest on fast links / clustered scenes) or run the device-side
    ``merge_tiles`` and fetch only the ``pos``-prefix (fewest bytes —
    wins on slow links / scattered scenes). ``"auto"`` predicts both
    times from measured link-throughput and merge-cost EMAs; until the
    link speed is known it takes the block path, which is what measures
    it. Wire bytes are identical either way.

    Latency discipline (the hardware sweep, benchmarks/loopback_tpu_tunnel
    r4, measured the old landing spending ~120 ms/frame in FOUR
    sequential ``device_get`` round trips over the ~30 ms-RTT tunnel —
    pure latency, not bytes):

    * every fetch a landing needs — all streams' block ranges and all
      flat-path prefixes — goes through ONE blocking ``device_get``;
    * the tiles path fetches the ``[t_lo, t_hi)`` RANGE of non-empty
      tiles via a jitted ``dynamic_slice`` (static length from a
      geometric ladder, dynamic start — no recompile as a clustered
      scene drifts through the frame, and leading static tiles cost
      nothing, unlike the old ``[0:t_hi)`` prefix);
    * the solo path (:meth:`land_fused` / :meth:`land_fused_many`)
      additionally SPECULATES: it fetches ``pos``, device-computed
      ``t_lo``/``t_hi`` span scalars, the counts WINDOW covering the
      previous frame's span (a few KB instead of the full counts array —
      48 KB/frame at 1080p ``sub_rows=1``), and the payload window —
      all in one round trip, topping up with a second fetch only when
      the scene jumped outside the window;
    * :meth:`land_fused_many` lands a DEPTH-K batch of frames through
      ONE ``device_get`` (one link round trip for K frames — the RTT
      amortization the reference gets from its ring of six in-flight
      buffers, ``threads.cpp:84-106``);
    * the flat landing is NARROW: the device emits the merged stream's
      xs as unit-local ``xs % tile_cap`` (uint8 at the product
      geometry), and the host rebuilds global indices from the counts
      window — 2 B per changed byte over the link instead of 5.
    """

    #: smallest range-slice length (units); ladder grows ~1.5x from here
    RANGE_MIN = 256
    #: smallest merged-prefix slice (entries); ladder grows ~1.25x
    FLAT_MIN = 8192

    def __init__(self, mode: str = "auto", link: Optional[LinkStats] = None,
                 return_mask: bool = False):
        # modes: "auto" / "tiles" / "flat" (see class docstring) and
        # "shards" — per-tile COUNT-PREFIX fetches for layouts whose
        # tiles are huge and few (the sharded payload layout: tile_cap =
        # frame_bytes / n_space). The whole-block tiles path would fetch
        # t_hi * tile_cap * 5 bytes (~the full frame, seconds on a
        # tunnel-class link) for a payload of a few KB; "shards" fetches
        # each non-empty tile's tier-rounded prefix instead, dispatching
        # every slice before one blocking get, and re-pads host-side
        # (host zeros are lazy pages; only payload bytes are written).
        self.mode = mode
        # return_mask: hand "mask"-flavor landings back as the raw bits
        # window (wire.MaskPayload) instead of rebuilding flat indices —
        # the zero-index path for wire v4 (config.mask_payload). The
        # popcount-vs-pos invariant the rebuild enforced moves to the v4
        # encoder (V4Encoder._encode_mask), which scans the window bytes
        # anyway to trim margins and size the encoding.
        self.return_mask = return_mask
        self.link = link or LinkStats()
        self._fetch_xs = None     # lazily sized from the first landing
        self._fetch_vals = None
        self._fetch_tiles = None
        self._shard_tier = None   # tier math for the "shards" mode
        self._range_slicers = {}  # key -> jitted dynamic-slice fn
        self._prewarm_keys = []   # rung keys from a loaded link cache
        # rung-hysteresis memos (see _RungMemo), one per churny call
        # site so distinct working points never thrash each other
        self._m_spec_L = _RungMemo()   # speculative window length
        self._m_spec_P = _RungMemo()   # speculative vals budget
        self._m_hint_P = _RungMemo()   # overlay-hint-widened budget
        self._m_miss_L = _RungMemo()   # miss-path exact-span window
        self._m_miss_P = _RungMemo()   # miss-path vals prefix
        self._hint_budget = 0          # last overlay-hint entry budget
        # land_fused speculation: ("tiles"|"flat"|"mask", window_start,
        # window_len_units, merged_prefix_len_entries, units_per_frame
        # velocity)
        self._spec = None
        # drift-aware margins (see _update_spec): observed per-frame
        # pos delta EMA + the last batch's tail scalars;
        # _vel_pf/_err_pf: signed window velocity + its prediction error
        self._dpos_pf = None
        self._vel_pf = None
        self._err_pf = None
        self._last_scalar = None  # (frame_no, pos, t_lo, t_hi)
        self._frame_no = 0        # frames landed (cross-batch velocity)
        self.fetch_counts = {"tiles": 0, "flat": 0, "mask": 0}
        self.spec_counts = {"hit": 0, "miss": 0}
        # host-authored overlay entries for text-change frames (solo
        # executors set this; see OverlayShadow)
        self._ov = None
        # cumulative host<->device payload bytes actually fetched —
        # the contention-immune half of the landing cost (time jitters
        # with the shared link; bytes are deterministic per config)
        self.fetched_bytes = 0

    def set_overlay(self, ov: OverlayShadow) -> None:
        """Enable host-authored overlay landings (see OverlayShadow)."""
        self._ov = ov

    # -- warm start (cross-session learning persistence) ---------------
    # The reference ships its FIRST frame at full speed because its ring
    # of six pinned buffers is preallocated (threads.cpp:84-106); here
    # the drift EMAs and the speculative window start blind instead, and
    # the measured cold-start transient was a third of a 300-frame
    # session (first-30 47.3 ms/frame vs last-30 8.6,
    # benchmarks/sustained_tpu_tunnel r4). export/seed move that learned
    # state across sessions (server --link-cache).
    def export_state(self) -> dict:
        """Learned speculation state as a JSON-safe dict."""
        return {
            "vel_pf": self._vel_pf,
            "err_pf": self._err_pf,
            "dpos_pf": self._dpos_pf,
            "spec": list(self._spec) if self._spec is not None else None,
            # the session's compiled fetch-rung set: every jitted
            # dynamic-slice signature the landing actually used. A new
            # process starts with an empty jit cache, so each rung's
            # FIRST mid-serve use pays a full XLA compile (~0.5-1 s on
            # the tunnel backend — measured as the stall frames in
            # benchmarks/sustained_tpu_tunnel); persisting the set lets
            # prewarm() compile them all before the first frame.
            "slicers": [list(k) for k in self._range_slicers],
            "hint_budget": self._hint_budget,
            # per-family rung sets (this session's picks UNION the
            # loaded family): the next session pins its memos to these,
            # so the jit-key space is finite and the accumulated cache
            # converges (see _RungMemo pinning)
            "rungs": {
                name: sorted(m.seen | set(m.pinned))
                for name, m in self._memos().items()
            },
        }

    def _memos(self) -> dict:
        """The rung-hysteresis memos by persisted family name."""
        return {
            "spec_L": self._m_spec_L, "spec_P": self._m_spec_P,
            "hint_P": self._m_hint_P, "miss_L": self._m_miss_L,
            "miss_P": self._m_miss_P,
        }

    def seed_state(self, st: dict) -> None:
        """Seed the drift EMAs (+ the speculative window when its flavor
        is valid for this lander's mode) from :meth:`export_state`
        output. Every seeded value is an ESTIMATE the landing already
        treats as fallible — a wrong seed costs at most one extra miss
        round trip per batch until the fast EMAs re-learn, never a byte.
        """
        for k in ("vel_pf", "err_pf", "dpos_pf"):
            v = st.get(k)
            if isinstance(v, (int, float)):
                setattr(self, f"_{k}", float(v))
        spec = st.get("spec")
        if (isinstance(spec, (list, tuple)) and len(spec) == 5
                and spec[0] in ("tiles", "flat", "mask")
                and (self.mode == "auto" or spec[0] == self.mode)):
            self._spec = (spec[0], int(spec[1]), int(spec[2]),
                          int(spec[3]), int(spec[4]))
            # the seeded window's rungs become the hysteresis working
            # points, so the first _update_spec holds them (and their
            # prewarmed jits) instead of minting adjacent rungs
            self._m_spec_L.rung = int(spec[2])
            self._m_spec_P.rung = int(spec[3])
        sl = st.get("slicers")
        if isinstance(sl, list):
            self._prewarm_keys = [
                tuple(k) for k in sl
                if isinstance(k, list) and 1 <= len(k) <= 5
            ]
        hb = st.get("hint_budget")
        if isinstance(hb, int) and hb > 0:
            self._hint_budget = hb
        rungs = st.get("rungs")
        if isinstance(rungs, dict):
            for name, memo in self._memos().items():
                vals = rungs.get(name)
                if isinstance(vals, list):
                    memo.pinned = tuple(sorted(
                        int(v) for v in vals
                        if isinstance(v, (int, float)) and v > 0))

    def prewarm(self, pos_d, counts_d, xs_t_d, vals_t_d,
                bits_d=None) -> int:
        """Compile the saved rung set against this pipeline's device
        arrays BEFORE the first frame lands.

        Without a persistent XLA compilation cache (none in this env),
        every fetch rung's first mid-serve use pays a full compile —
        ~0.5-1 s each over the tunnel backend, and a 300-frame sustained
        session touches ~15-20 distinct rungs as its windows evolve
        (the >p95 stall frames in ``benchmarks/sustained_tpu_tunnel``;
        fps_overall 17-19 against a 9 ms steady state). Compiling the
        previous session's exact rung set up front moves that cost out
        of the serving loop. Args are one pipeline step's device outputs
        (any step — only shapes/dtypes matter); a key that no longer
        builds (stale cache) is skipped, never fatal. Returns the number
        of jits compiled."""
        from cudavideostream_tpu.ops import logcompact

        keys = [tuple(k) for k in self._prewarm_keys]
        if ("probe",) not in keys:
            keys.append(("probe",))
        n_tiles, tile_cap = vals_t_d.shape
        self._ensure_fetchers(n_tiles, tile_cap)
        # also synthesize the keys the SEEDED spec window implies for its
        # very first batch (the saved set is what the previous session
        # USED; the spec it saved at exit may never have run a batch —
        # measured: the warm session's first boundary stalled exactly on
        # ('mask', L0, tc, P0, 0) and its overlay-hint variant)
        if (self._spec is not None and self._spec[0] == "mask"
                and bits_d is not None):
            L0, P0 = int(self._spec[2]), int(self._spec[3])
            cap = self._fetch_xs.capacity
            u_strip = self._ov_units(tile_cap) or 0
            for P in sorted({P0, self._flat_len(P0 + 1, cap)}):
                keys.append(("mask", L0, tile_cap, P, 0))
                if self._hint_budget and u_strip:
                    keys.append(("mask", L0, tile_cap,
                                 self._flat_len(P + self._hint_budget,
                                                cap), u_strip))
        # synthesize the PINNED families' cross product: with pinned
        # memos (see _RungMemo), mid-serve keys can only combine family
        # values, so compiling the combos here moves even a combo's
        # FIRST use out of the serving loop. Bounded (families are a
        # handful of rungs; the newest few win) and dedup'd below; a
        # combo that fails to build is skipped by the loop, never fatal.
        if self._m_spec_L.pinned and self._fetch_xs is not None:
            cap = self._fetch_xs.capacity
            u_strip = self._ov_units(tile_cap) or 0
            Ls = [L for L in self._m_spec_L.pinned if L <= n_tiles][-6:]
            Ps = [P for P in self._m_spec_P.pinned if P <= cap][-6:]
            hPs = [P for P in self._m_hint_P.pinned if P <= cap][-4:]
            for L in Ls:
                for P in Ps:
                    if bits_d is not None:
                        keys.append(("mask", L, tile_cap, P, 0))
                    else:
                        keys.append(("spec", L, tile_cap, P))
                if u_strip and bits_d is not None:
                    for P in hPs:
                        keys.append(("mask", L, tile_cap, P, u_strip))
            mLs = [L for L in self._m_miss_L.pinned if L <= n_tiles][-4:]
            mPs = [P for P in self._m_miss_P.pinned if P <= cap][-4:]
            for L in mLs:
                keys.append(("counts", L))
                if bits_d is not None:
                    for P in mPs:
                        keys.append(("maskw", L, tile_cap, P))
            for P in mPs:
                keys.append(("flatn", P, tile_cap))
        keys = list(dict.fromkeys(keys))
        z = np.int32(0)
        merged = None

        def get_merged():
            # also prewarms the merge jits themselves (first-batch cost)
            nonlocal merged
            if merged is None:
                merged = (
                    (None, logcompact.merge_vals(counts_d, vals_t_d))
                    if xs_t_d is None
                    else logcompact.merge_tiles(counts_d, xs_t_d, vals_t_d)
                )
            return merged

        n = 0
        for k in keys:
            try:
                kind = k[0]
                if kind == "probe":
                    self._probe_slicer()(pos_d, counts_d)
                elif kind == "spec":
                    _, L, tc, P = k
                    if P:
                        xm, vm = get_merged()
                        if xm is None:
                            continue
                        self._spec_slicer(L, tc, flat_P=P)(
                            pos_d, counts_d, xm, vm, z)
                    else:
                        if xs_t_d is None:
                            continue
                        self._spec_slicer(L, tc)(
                            pos_d, counts_d, xs_t_d, vals_t_d, z)
                elif kind == "mask":
                    _, L, tc, P, sU = k
                    if bits_d is None:
                        continue
                    self._mask_slicer(L, tc, P, sU)(
                        pos_d, counts_d, bits_d, get_merged()[1], z)
                elif kind == "maskw":
                    _, L, tc, P = k
                    if bits_d is None:
                        continue
                    self._mask_win(L, tc, P)(bits_d, get_merged()[1], z)
                elif kind == "counts":
                    _, L = k
                    self._counts_win(L)(counts_d, z)
                elif kind == "flatn":
                    _, P, tc = k
                    xm, vm = get_merged()
                    if xm is None:
                        continue
                    self._flat_narrow(P, tc)(xm, vm)
                elif isinstance(kind, int):
                    L, fused, tc = k
                    if xs_t_d is None:
                        continue
                    if fused:
                        self._slicer(L, True, tc)(
                            pos_d, counts_d, xs_t_d, vals_t_d, z)
                    else:
                        self._slicer(L, False, tc)(xs_t_d, vals_t_d, z)
                else:
                    continue
            except Exception:
                continue
            n += 1
        return n

    def _ov_units(self, tile_cap: int):
        """First unit index past the overlay strip, or None when the
        host-authored path is unavailable."""
        if self._ov is None or not self._ov.enabled:
            return None
        return -(-self._ov.strip_bytes // tile_cap)

    def _ov_apply(self, res) -> None:
        """Track every landed payload's strip-range entries into the
        overlay shadow (the shadow IS 'base + all shipped entries';
        skipping any landing would desync it — the value gate in
        _try_overlay_hit would then miss-fallback forever)."""
        if self._ov is not None and res is not None:
            self._ov.apply_result(res)

    def use_flat(self, pos: int, t_hi: int, tile_cap: int,
                 t_lo: int = 0) -> bool:
        """The per-frame decision (see class docstring)."""
        if self.mode == "tiles":
            return False
        if self.mode == "flat":
            return True
        if t_hi == 0:
            return False
        # the tiles path moves the [t_lo, t_hi) block range; xs ride the
        # narrowest unit-local dtype (see _compact_dtype), vals one byte
        narrow = self._compact_dtype(tile_cap)
        xs_bytes = 4 if narrow is None else np.dtype(narrow).itemsize
        block_bytes = (1 + xs_bytes) * (t_hi - t_lo) * tile_cap
        tier = (self._flat_len(pos, self._fetch_xs.capacity)
                if self._fetch_xs else pos)
        # the flat path fetches the merged prefix in the SAME narrow
        # unit-local dtype (global indices rebuilt host-side from the
        # counts window, _rebuild_flat_xs) — (1 + xs_bytes) per entry
        flat_bytes = (1 + xs_bytes) * tier
        t_tiles = self.link.fetch_seconds(block_bytes)
        if t_tiles is None:
            return False
        t_flat = self.link.merge_s + (self.link.fetch_seconds(flat_bytes) or 0.0)
        return t_flat < t_tiles

    def _pick_kind(self, pos: int, t_lo: int, t_hi: int, tile_cap: int,
                   has_bits: bool) -> str:
        """Per-frame fetch-flavor decision for the fused landing:
        cheapest estimated link time among

        * ``tiles`` — the ``[t_lo, t_hi)`` block range,
          ``(1+xs_bytes) * span * tile_cap`` bytes, no device merge;
        * ``flat``  — narrow merged prefix, ``(1+xs_bytes) * ~pos``
          bytes + the merge;
        * ``mask``  — packed change-bits window + merged vals prefix,
          ``span * tile_cap/8 + ~pos`` bytes + the merge (wins whenever
          the span's mean density exceeds ``1/(8*xs_bytes)`` ~ 12.5%,
          e.g. any clustered scene). Offered only when the pipeline
          emits the bitmask (``config.emit_bitmask``).
        """
        if self.mode in ("tiles", "flat"):
            return self.mode
        if self.mode == "mask":
            return "mask"
        narrow = self._compact_dtype(tile_cap)
        xs_bytes = 4 if narrow is None else np.dtype(narrow).itemsize
        span = t_hi - t_lo
        block_bytes = (1 + xs_bytes) * span * tile_cap
        t_tiles = self.link.fetch_seconds(block_bytes)
        if t_tiles is None:
            return "tiles"
        P = (self._flat_len(pos, self._fetch_xs.capacity)
             if self._fetch_xs else pos)
        t_flat = self.link.merge_s + (
            self.link.fetch_seconds((1 + xs_bytes) * P) or 0.0)
        best, t_best = ("flat", t_flat) if t_flat < t_tiles \
            else ("tiles", t_tiles)
        if has_bits:
            t_mask = self.link.merge_s + (
                self.link.fetch_seconds(span * (tile_cap // 8) + P) or 0.0)
            if t_mask < t_best:
                best = "mask"
        return best

    # ---- range-fetch machinery ------------------------------------------
    def _range_len(self, span: int, n_tiles: int, memo=None) -> int:
        """Slice length for a ``span``-unit range: ``span`` rounded up to
        a multiple of ``max(256, 2^(bits(span)-5))`` — a 5-bit-mantissa
        float. Over-fetch is bounded ~1/16 (the old 1.5x-geometric ladder
        overshot 30%+ right at the committed 4K serving spans), at most
        16 live rungs per octave, each rung one small lazily-compiled
        dynamic-slice jit.

        ``memo`` (a :class:`_RungMemo`) adds rung HYSTERESIS: each
        churny call site holds its last rung while the fresh pick
        oscillates below it, because every distinct rung is a fresh
        static-length jit compile mid-serve (see _RungMemo)."""
        span = max(int(span), 1)
        step = max(256, 1 << max(span.bit_length() - 5, 0))
        L = max(self.RANGE_MIN, -(-span // step) * step)
        L = min(L, n_tiles)
        if memo is not None:
            return memo.pick(L, step, n_tiles)
        return L

    def _flat_len(self, want: int, cap: int, memo=None) -> int:
        """Slice length for a ``want``-entry merged prefix: ``want``
        rounded up to a multiple of ``max(q/8, 2^(bits(want)-5))`` (a
        5-bit-mantissa float, over-fetch <= ~1/16). Finer than the
        TieredFetcher's power-of-two — and than the old 1.25x-geometric
        ladder, whose 25% worst-case overshoot was 23 KB/frame of pure
        slack at the committed 102-fps record config (want=74439 rounded
        to 98304; the flat prefix IS the payload bytes, so every slack
        entry is link time). Small frames scale the floor quantum down
        (cap/8, >=256): an 8192-entry floor would exceed a tiny frame's
        whole capacity and lock ``auto`` out of the flat path.
        ``memo`` = rung hysteresis, exactly as in :meth:`_range_len`."""
        q = min(self.FLAT_MIN, max(256, cap // 8))
        want = max(int(want), 1)
        step = max(q // 8, 1 << max(want.bit_length() - 5, 0))
        L = max(q, -(-want // step) * step)
        L = min(L, cap)
        if memo is not None:
            return memo.pick(L, step, cap)
        return L

    @staticmethod
    def _compact_dtype(tile_cap: int):
        """Narrowest dtype holding a unit-LOCAL index. Payload blocks are
        tile-locally compacted, so every entry's global index sits inside
        its own unit's byte range: ``local = global % tile_cap`` loses
        nothing, and the host rebuilds ``global = row * tile_cap + local``
        for free. At the product default (sub_rows=1, tile_cap=128) this
        shrinks a fetched unit from 640 B (int32 xs + uint8 vals) to
        256 B — 2.5x fewer bytes over the link, zero kernel changes."""
        import numpy as _np

        if tile_cap <= 256:
            return _np.uint8
        if tile_cap <= 65536:
            return _np.uint16
        return None

    def _slicer(self, length: int, fused: bool, tile_cap: int = 0):
        """Jitted ``[start : start+length)`` block slice — static length,
        DYNAMIC start: one compile per ladder rung, none as the window
        drifts (a plain ``arr[a:b]`` would recompile per distinct start).
        ``fused`` additionally passes pos/counts through, so the solo
        path's speculative fetch is one device round trip. With a
        ``tile_cap`` whose unit-local indices fit a narrow dtype, xs is
        compacted to ``xs % tile_cap`` on device (see _compact_dtype)."""
        key = (length, fused, tile_cap)
        fn = self._range_slicers.get(key)
        if fn is None:
            import jax
            from jax import lax

            narrow = self._compact_dtype(tile_cap) if tile_cap else None

            def slice_pair(xs, vs, start):
                xw = lax.dynamic_slice_in_dim(xs, start, length, 0)
                vw = lax.dynamic_slice_in_dim(vs, start, length, 0)
                if narrow is not None:
                    xw = (xw % tile_cap).astype(narrow)
                return xw, vw

            if fused:
                def f(pos_d, counts_d, xs, vs, start):
                    return (pos_d, counts_d) + slice_pair(xs, vs, start)
            else:
                f = slice_pair
            fn = jax.jit(f)
            self._range_slicers[key] = fn
        return fn

    def _spec_slicer(self, L: int, tile_cap: int, flat_P: int = 0):
        """Jitted speculative fused fetch for :meth:`land_fused_many`.

        Returns ``(pos, t_lo, t_hi, counts_window, xs_window,
        vals_window)`` in one dispatch: the span scalars are computed ON
        DEVICE (argmax over the nonzero mask), so the host never fetches
        the full counts array — only the ``L``-unit window at the
        dynamic ``start``. With ``flat_P`` the payload window is the
        ``[:flat_P]`` prefix of the (already merged) flat stream instead
        of the ``[start, start+L)`` block rows; both ride the narrow
        unit-local dtype when one fits (see ``_compact_dtype``)."""
        key = ("spec", L, tile_cap, flat_P)
        fn = self._range_slicers.get(key)
        if fn is None:
            import jax
            import jax.numpy as jnp
            from jax import lax

            narrow = self._compact_dtype(tile_cap)

            def f(pos_d, counts_d, xs, vs, start):
                nz = counts_d > 0
                any_nz = jnp.any(nz)
                t_lo = jnp.where(any_nz, jnp.argmax(nz), 0).astype(jnp.int32)
                t_hi = jnp.where(
                    any_nz, counts_d.shape[0] - jnp.argmax(nz[::-1]), 0
                ).astype(jnp.int32)
                cw = lax.dynamic_slice_in_dim(counts_d, start, L, 0)
                if flat_P:
                    xw, vw = xs[:flat_P], vs[:flat_P]
                else:
                    xw = lax.dynamic_slice_in_dim(xs, start, L, 0)
                    vw = lax.dynamic_slice_in_dim(vs, start, L, 0)
                if narrow is not None:
                    xw = (xw % tile_cap).astype(narrow)
                return pos_d, t_lo, t_hi, cw, xw, vw

            fn = jax.jit(f)
            self._range_slicers[key] = fn
        return fn

    def _mask_slicer(self, L: int, tile_cap: int, P: int,
                     strip_U: int = 0):
        """Jitted speculative fused fetch for the "mask" flavor:
        ``(pos, t_lo, t_hi, bits_window, vals_prefix)`` in one dispatch.
        The bits window is the packed change-bitmask for units
        ``[start, start+L)`` (``tile_cap/8`` bytes per unit); the vals
        prefix is the ``[:P]`` head of the merged flat stream. No xs
        stream moves at all — the host rebuilds indices from the bits
        (~1 B per changed byte total on locally dense scenes).

        ``strip_U > 0`` (overlay-hint frames only) appends the
        ``counts[:strip_U]`` overlay-strip window as a 6th output so the
        coverage gate can verify the host-authored entries' per-unit
        INDEX histogram against the device, not just their values (see
        ``_try_overlay_hit``); a few hundred bytes per hint frame."""
        key = ("mask", L, tile_cap, P, strip_U)
        fn = self._range_slicers.get(key)
        if fn is None:
            import jax
            import jax.numpy as jnp
            from jax import lax

            ub8 = tile_cap // 8

            def f(pos_d, counts_d, bits, vals_m, start):
                nz = counts_d > 0
                any_nz = jnp.any(nz)
                t_lo = jnp.where(any_nz, jnp.argmax(nz), 0).astype(jnp.int32)
                t_hi = jnp.where(
                    any_nz, counts_d.shape[0] - jnp.argmax(nz[::-1]), 0
                ).astype(jnp.int32)
                bw = lax.dynamic_slice_in_dim(bits, start * ub8, L * ub8, 0)
                out = (pos_d, t_lo, t_hi, bw, vals_m[:P])
                if strip_U:
                    out = out + (counts_d[:strip_U],)
                return out

            fn = jax.jit(f)
            self._range_slicers[key] = fn
        return fn

    def _mask_win(self, L: int, tile_cap: int, P: int):
        """Jitted exact-span mask fetch (the miss path): bits window for
        units ``[start, start+L)`` + merged vals ``[:P]`` prefix."""
        key = ("maskw", L, tile_cap, P)
        fn = self._range_slicers.get(key)
        if fn is None:
            import jax
            from jax import lax

            ub8 = tile_cap // 8

            def f(bits, vals_m, start):
                bw = lax.dynamic_slice_in_dim(bits, start * ub8, L * ub8, 0)
                return bw, vals_m[:P]

            fn = jax.jit(f)
            self._range_slicers[key] = fn
        return fn

    def _probe_slicer(self):
        """Jitted 12-byte probe: ``(pos, t_lo, t_hi)`` only — the cold
        first fetch when no speculative window exists yet."""
        key = ("probe",)
        fn = self._range_slicers.get(key)
        if fn is None:
            import jax
            import jax.numpy as jnp

            def f(pos_d, counts_d):
                nz = counts_d > 0
                any_nz = jnp.any(nz)
                t_lo = jnp.where(any_nz, jnp.argmax(nz), 0).astype(jnp.int32)
                t_hi = jnp.where(
                    any_nz, counts_d.shape[0] - jnp.argmax(nz[::-1]), 0
                ).astype(jnp.int32)
                return pos_d, t_lo, t_hi

            fn = jax.jit(f)
            self._range_slicers[key] = fn
        return fn

    def _counts_win(self, L: int):
        """Jitted ``counts[start : start+L)`` window slice."""
        key = ("counts", L)
        fn = self._range_slicers.get(key)
        if fn is None:
            import jax
            from jax import lax

            fn = jax.jit(
                lambda counts_d, start:
                lax.dynamic_slice_in_dim(counts_d, start, L, 0)
            )
            self._range_slicers[key] = fn
        return fn

    def _flat_narrow(self, P: int, tile_cap: int):
        """Jitted ``[:P]`` prefix of a merged flat stream, xs narrowed to
        the unit-local dtype when one fits."""
        key = ("flatn", P, tile_cap)
        fn = self._range_slicers.get(key)
        if fn is None:
            import jax

            narrow = self._compact_dtype(tile_cap)

            def f(xs_m, vals_m):
                xw = xs_m[:P]
                if narrow is not None:
                    xw = (xw % tile_cap).astype(narrow)
                return xw, vals_m[:P]

            fn = jax.jit(f)
            self._range_slicers[key] = fn
        return fn

    @staticmethod
    def _rebuild_xs(xs_w, counts_span, row0: int, t_lo: int, t_hi: int,
                    tile_cap: int):
        """Rows ``[t_lo, t_hi)`` of a fetched xs window starting at
        ``row0``, as int32 GLOBAL indices. Narrow (unit-local) windows
        are rebuilt as ``row * tile_cap + local``, masked to the counted
        prefix (``counts_span`` = counts for exactly ``[t_lo, t_hi)``)
        so padding stays exactly 0 (the invariant the int32 path ships
        natively)."""
        a = t_lo - row0
        w = xs_w[a: a + (t_hi - t_lo)]
        if w.dtype == np.int32:
            return w
        base = (np.arange(t_lo, t_hi, dtype=np.int32) * tile_cap)[:, None]
        valid = (
            np.arange(tile_cap, dtype=np.int32)[None, :]
            < np.asarray(counts_span, dtype=np.int32)[:, None]
        )
        return np.where(valid, w.astype(np.int32) + base, np.int32(0))

    @staticmethod
    def _rebuild_flat_xs(lo, counts_span, pos: int, t_lo: int,
                         tile_cap: int):
        """Global int32 xs for a NARROW merged prefix: entry ``k`` of the
        merged stream belongs to the unit whose counted prefix covers it
        (units concatenate in ascending order), so
        ``global = unit * tile_cap + local`` with the unit index repeated
        ``counts[unit]`` times. Exact because the merge preserves unit
        order and ``sum(counts_span) == pos``."""
        if lo.dtype == np.int32:     # no narrow dtype for this geometry
            return np.asarray(lo[:pos])
        c = np.asarray(counts_span, dtype=np.int64)
        units = np.arange(t_lo, t_lo + c.size, dtype=np.int64)
        base = np.repeat(units * tile_cap, c).astype(np.int32)
        return base + lo[:pos].astype(np.int32)

    def _try_overlay_hit(self, h, pos: int, st: int, tile_cap: int,
                         P: int, hint: OverlayHint):
        """Host-authored landing of a text-change frame: overlay entries
        come from :meth:`OverlayShadow.delta` (zero device fetch) and
        scene entries from the fetched bits window — the same
        speculative round trip a clean frame pays, instead of the
        full-union-span miss fetch plus an extra RTT.

        Exact-coverage gate: the two index sets are disjoint (the scene
        window is clamped past the strip at fetch time), so
        ``len(overlay) + popcount(bits) == pos`` proves every changed
        byte is covered exactly once; the overlay's host-computed values
        must equal the device vals-prefix head, AND the overlay entries'
        per-unit index histogram must equal the device's fetched
        ``counts[:u_strip]`` window (device vals/counts are
        authoritative — any mismatch means the shadow lost sync, and the
        frame falls back to the always-exact miss path; the histogram
        check makes the gate sound against a desynced shadow whose
        entry count and value sequence coincide but whose indices
        moved). Returns ascending flat ``(xs, vals)`` or None."""
        ov = self._ov
        if st * tile_cap < ov.strip_bytes or pos > P:
            return None
        o = ov.delta(hint.text)
        if o is None:
            return None
        oxs, ovals = o
        bw = np.asarray(h[3])
        pop_b = int(_POPCOUNT[bw].sum())
        if int(oxs.size) + pop_b != pos:
            return None
        vw = np.asarray(h[4])
        if not np.array_equal(vw[: oxs.size], ovals):
            return None
        if len(h) > 5:
            dc = np.asarray(h[5], dtype=np.int64)
            hc = np.bincount(
                np.asarray(oxs, dtype=np.int64) // tile_cap,
                minlength=dc.size)
            if hc.size > dc.size or not np.array_equal(hc, dc):
                return None
        xs_b = self._rebuild_mask_xs(bw, pop_b, st, tile_cap)
        return (np.concatenate([oxs, xs_b]), vw[:pos].copy())

    def _mask_result(self, bits_w, pos: int, start_unit: int,
                     tile_cap: int, vals_prefix):
        """One landed mask-flavor payload: the zero-index
        :class:`~cudavideostream_tpu.runtime.wire.MaskPayload` under
        ``return_mask`` (wire v4 forwards the bits untranslated), else
        flat ``(xs, vals)`` via the LUT rebuild."""
        if self.return_mask:
            return wire.MaskPayload(
                pos, start_unit * tile_cap,
                np.asarray(bits_w), np.asarray(vals_prefix),
            )
        return (
            self._rebuild_mask_xs(bits_w, pos, start_unit, tile_cap),
            np.asarray(vals_prefix[:pos]),
        )

    @staticmethod
    def _rebuild_mask_xs(bits_w, pos: int, start_unit: int, tile_cap: int):
        """Global int32 xs from a packed change-bitmask window covering
        units ``[start_unit, ...)``. Exact because the window spans
        every non-empty unit (``[t_lo, t_hi)`` from the device scalars),
        bits are set exactly where the kernel counted a changed byte,
        and LSB-first unpack order IS ascending byte order — the wire
        contract's payload order. Window bytes outside the changed span
        are zero by construction, so no crop is needed.

        LUT formulation: scan the window BYTES for nonzeros (8x fewer
        elements than unpacking first), then expand each nonzero byte's
        set-bit positions from a (256, 8) table — row-major boolean
        selection preserves ascending order. ~25% faster than
        unpackbits+flatnonzero on both dense and sparse windows
        (measured host-side; the rebuild was 6.75 ms/frame of the
        mask@3% landing before the drift-aware window shrank its
        input)."""
        b = np.asarray(bits_w)
        nzb = np.flatnonzero(b)
        vals = b[nzb]
        cnts = _POPCOUNT[vals]
        total = int(cnts.sum())
        if total != pos:
            raise RuntimeError(
                f"bitmask window rebuilt {total} indices, device "
                f"counted pos={pos} — the window missed changed units "
                "(invariant violation, never truncate)"
            )
        base = np.repeat(nzb * 8, cnts)
        sel = _BITPOS[vals]                       # (K, 8) per-byte slots
        keep = np.arange(8, dtype=np.uint8) < cnts[:, None]
        xs = (base + sel[keep]).astype(np.int32)
        return xs + np.int32(start_unit * tile_cap)

    @staticmethod
    def _single_device(arr) -> bool:
        """True for a device array living on ONE device. Blocks sharded
        across a mesh (the sharded executor's P("space") payload layout)
        must NOT go through the dynamic-slice range fetch: SPMD lowers a
        dynamic-slice over the sharded dim to the very all-gather the
        zero-collective layout exists to avoid — those keep the static
        prefix path."""
        sharding = getattr(arr, "sharding", None)
        if sharding is None:
            return False  # host array: no device fetch at all
        try:
            return len(sharding.device_set) == 1
        except Exception:
            return True

    def _ensure_fetchers(self, n_tiles: int, tile_cap: int) -> None:
        if self._fetch_xs is None:
            cap = n_tiles * tile_cap
            self._fetch_xs = TieredFetcher(cap, stats=self.link)
            self._fetch_vals = TieredFetcher(cap, stats=self.link)
            self._fetch_tiles = (
                TieredFetcher(n_tiles, min_tier=1, stats=self.link),
                TieredFetcher(n_tiles, min_tier=1, stats=self.link),
            )
            self._shard_tier = TieredFetcher(tile_cap, stats=self.link)

    def _land_shard_prefixes(self, plans):
        """The "shards" landing: per-tile tier-rounded prefix slices,
        all dispatched before ONE blocking get (a per-slice get would
        pay the link round-trip t_hi*2 times per frame)."""
        import jax

        reqs = []  # per plan: list of (tile, count, xs_slice, vals_slice)
        for pos, counts, _t_lo, t_hi, _flat, _cd, xs_t_d, vals_t_d in plans:
            part = []
            for s in range(t_hi):
                c = int(counts[s])
                if c:
                    t = self._shard_tier.tier(c)
                    part.append((s, c, xs_t_d[s, :t], vals_t_d[s, :t]))
            reqs.append(part)
        t0 = time.perf_counter()
        fetched = jax.device_get(
            [[(x, v) for _, _, x, v in part] for part in reqs]
        )
        nbytes = sum(x.nbytes + v.nbytes
                     for part in fetched for x, v in part)
        if nbytes:
            self.link.record_fetch(nbytes, time.perf_counter() - t0)
        out = []
        for (pos, counts, _t_lo, t_hi, *_), part, host in zip(plans, reqs, fetched):
            tile_cap = self._shard_tier.capacity
            xs_b = np.zeros((t_hi, tile_cap), np.int32)
            vals_b = np.zeros((t_hi, tile_cap), np.uint8)
            for (s, c, _, _), (xh, vh) in zip(part, host):
                xs_b[s, :c] = xh[:c]
                vals_b[s, :c] = vh[:c]
            self.fetch_counts["tiles"] += 1
            out.append(wire.TiledPayload(pos, counts[:t_hi], xs_b, vals_b))
        return out

    def land(self, pos: int, counts: np.ndarray, counts_d, xs_t_d, vals_t_d):
        """Land one tiled payload.

        ``counts`` is the host copy of ``counts_d``. Returns a
        :class:`~cudavideostream_tpu.runtime.wire.TiledPayload` (block
        path) or a flat ``(xs, vals)`` pair (merge path).
        """
        return self.land_many([(pos, counts, counts_d, xs_t_d, vals_t_d)])[0]

    def land_many(self, items):
        """Land several tiled payloads from one device step (multiserve:
        one item per stream). Decisions are per item, but every flat
        item's device merge dispatches BEFORE the single sync, and every
        fetch — all streams' block ranges and flat prefixes — goes
        through ONE blocking ``device_get``, so B landings cost one
        round trip of link latency, not 2B+.

        Each item is ``(pos, counts_host, counts_d, xs_t_d, vals_t_d)``;
        returns a same-length list of TiledPayload / flat ``(xs, vals)``.
        """
        from cudavideostream_tpu.ops import logcompact

        plans = []
        for pos, counts, counts_d, xs_t_d, vals_t_d in items:
            n_tiles, tile_cap = xs_t_d.shape
            self._ensure_fetchers(n_tiles, tile_cap)
            # fetch only the non-empty tile range: static regions of the
            # frame — leading and trailing — cost nothing on the link
            nz = np.nonzero(counts)[0]
            t_lo = int(nz[0]) if nz.size else 0
            t_hi = int(nz[-1]) + 1 if nz.size else 0
            flat = False if self.mode == "shards" else self.use_flat(
                pos, t_hi, tile_cap, t_lo=t_lo)
            plans.append((pos, counts, t_lo, t_hi, flat,
                          counts_d, xs_t_d, vals_t_d))
        if self.mode == "shards":
            return self._land_shard_prefixes(plans)
        # dispatch the merges AFTER the planning loop so merge_s measures
        # only merge dispatch + sync — the planning work (np.nonzero over
        # counts, fetcher setup) is paid by the tiles path too, and
        # booking it here would bias "auto" against the flat landing
        tm0 = time.perf_counter()
        merged = [
            logcompact.merge_tiles(counts_d, xs_t_d, vals_t_d) if flat else None
            for _, _, _, _, flat, counts_d, xs_t_d, vals_t_d in plans
        ]
        n_flat = sum(1 for m in merged if m is not None)
        if n_flat:
            # sync the merges with one 4-byte read BEFORE the timed
            # fetches: otherwise the first fetch blocks on the merge
            # work and its wait is booked as link time, corrupting bps
            last = next(m for m in reversed(merged) if m is not None)
            self._fetch_xs._jax.device_get(last[0][:1])
            merge_s = (time.perf_counter() - tm0) / n_flat
            if self.fetch_counts["flat"] > 0:
                # first flat landing skipped: it carries the one-time
                # jit compile, which would poison the EMA
                self.link.record_merge(merge_s)
        reqs = [self._plan_fetch(plan, m) for plan, m in zip(plans, merged)]
        fetched = self._get_batched([r[1] for r in reqs])
        return [
            self._assemble(plan, kind_meta, host)
            for plan, (kind_meta, _), host in zip(plans, reqs, fetched)
        ]

    def _plan_fetch(self, plan, m):
        """The (device or host) slice pair one landing needs. Returns
        ``((kind, *meta), slices)``, consumed by :meth:`_assemble` after
        the batched transfer — nothing here blocks."""
        pos, counts, t_lo, t_hi, flat, counts_d, xs_t_d, vals_t_d = plan
        if flat:
            if pos <= 0:
                return ("flat_empty",), ()
            xs_d, vals_d = m
            cap = self._fetch_xs.capacity
            if pos > cap:
                # unreachable for tiled layouts (pos <= total slots) but
                # kept for parity with tier_checked's fail-loud contract
                raise PayloadOverflowError(
                    f"frame changed {pos} bytes > payload capacity {cap}"
                )
            tile_cap = xs_t_d.shape[1]
            P = self._flat_len(pos, cap, memo=self._m_miss_P)
            lo_s, vw_s = self._flat_narrow(P, tile_cap)(xs_d, vals_d)
            return ("flat",), (lo_s, vw_s)
        if t_hi == 0:
            return ("tiles_empty",), ()
        if isinstance(xs_t_d, np.ndarray):
            # host blocks (oracle executors, tests): plain views
            return ("range", t_lo), (xs_t_d[t_lo:t_hi], vals_t_d[t_lo:t_hi])
        if not self._single_device(xs_t_d):
            # mesh-sharded blocks keep the static prefix slice (see
            # _single_device); the tier ladder bounds the compile set
            t = self._fetch_tiles[0].tier(t_hi)
            return ("range", 0), (xs_t_d[:t], vals_t_d[:t])
        n_tiles, tile_cap = xs_t_d.shape
        L = self._range_len(t_hi - t_lo, n_tiles, memo=self._m_miss_L)
        start = min(t_lo, n_tiles - L)
        xs_s, vals_s = self._slicer(L, False, tile_cap)(
            xs_t_d, vals_t_d, np.int32(start)
        )
        return ("range", start), (xs_s, vals_s)

    def _get_batched(self, slice_tuples):
        """ONE blocking ``device_get`` for every landing's slices; host
        tuples pass through untouched."""
        import jax

        dev = [p for p in slice_tuples
               if p and not isinstance(p[0], np.ndarray)]
        if not dev:
            return list(slice_tuples)
        t0 = time.perf_counter()
        host = jax.device_get(dev)
        dt = time.perf_counter() - t0
        nbytes = sum(a.nbytes for tup in host for a in tup)
        self.fetched_bytes += nbytes
        if nbytes:
            self.link.record_fetch(nbytes, dt)
        it = iter(host)
        return [
            p if not p or isinstance(p[0], np.ndarray) else next(it)
            for p in slice_tuples
        ]

    def _assemble(self, plan, kind_meta, host):
        """Build the landing result from fetched host slices."""
        pos, counts, t_lo, t_hi = plan[0], plan[1], plan[2], plan[3]
        kind = kind_meta[0]
        if kind == "flat":
            self.fetch_counts["flat"] += 1
            lo_h, vals_h = host
            xs = self._rebuild_flat_xs(
                lo_h, counts[t_lo:t_hi], pos, t_lo, plan[6].shape[1]
            )
            return xs, np.asarray(vals_h[:pos])
        if kind == "flat_empty":
            self.fetch_counts["flat"] += 1
            return np.empty(0, np.int32), np.empty(0, np.uint8)
        self.fetch_counts["tiles"] += 1
        if kind == "tiles_empty":
            tile_cap = plan[6].shape[1]
            return wire.TiledPayload(
                pos, counts[:0],
                np.empty((0, tile_cap), np.int32),
                np.empty((0, tile_cap), np.uint8),
            )
        start = kind_meta[1]
        xs_h, vals_h = host
        a = t_lo - start
        tile_cap = plan[6].shape[1]
        # rows pair with counts[t_lo:t_hi]; leading/trailing all-empty
        # tiles are dropped entirely (wire bytes are identical — xs
        # entries carry GLOBAL byte indices, so tile rows are
        # self-describing)
        return wire.TiledPayload(
            pos, counts[t_lo:t_hi],
            self._rebuild_xs(
                xs_h, counts[t_lo:t_hi], start, t_lo, t_hi, tile_cap
            ),
            vals_h[a: a + (t_hi - t_lo)],
        )

    def land_fused(self, pos_d, counts_d, xs_t_d, vals_t_d, bits_d=None,
                   volatile: bool = False):
        """Solo landing with SPECULATIVE single-round-trip fetch — the
        depth-1 case of :meth:`land_fused_many`."""
        return self.land_fused_many(
            [(pos_d, counts_d, xs_t_d, vals_t_d, bits_d)],
            volatile=[volatile],
        )[0]

    def land_fused_many(self, items, volatile=None):
        """Land a DEPTH-K batch of frames' tiled payloads.

        The generic landing costs two link round trips PER FRAME
        (counts, then the slices the counts prove necessary). On a
        ~30 ms-RTT link that latency dominates the whole serving loop
        (the r4 hardware sweep, benchmarks/loopback_tpu_tunnel), so this
        path (a) bets that the scene moves slowly and (b) amortizes the
        round trip over the whole batch:

        * phase 1 — ONE ``device_get`` fetches, for every frame:
          ``pos``, device-computed ``t_lo``/``t_hi`` span scalars, the
          counts window at the previous batch's span, and the payload
          window (block rows, or the narrow merged prefix when the
          speculation mode is "flat");
        * phase 2 — frames the window missed (scene cut, density flip,
          cold start) share ONE more batched get.

        Correctness never depends on the bet: a miss re-fetches exactly
        what the device scalars prove necessary. ``items`` is a list of
        ``(pos_d, counts_d, xs_t_d, vals_t_d[, bits_d])`` (``bits_d`` =
        the pipeline's packed change-bitmask, enabling the "mask"
        flavor — see :meth:`_pick_kind`); returns a same-length list of
        ``(pos, TiledPayload | (xs, vals))``.
        """
        from cudavideostream_tpu.ops import logcompact

        K = len(items)
        n_tiles, tile_cap = items[0][3].shape
        self._ensure_fetchers(n_tiles, tile_cap)
        # bitmask-only payloads (config.maskonly_payload) carry no index
        # blocks: it[2] is None, and only the "mask" flavor can land them
        maskonly = any(it[2] is None for it in items)
        single = all(
            (it[2] is None or self._single_device(it[2]))
            and self._single_device(it[3])
            for it in items
        )
        if maskonly and (not single or self.mode != "mask"):
            raise ValueError(
                "bitmask-only payloads land through fetch_mode 'mask' "
                "on a single device (no index blocks exist to fetch)"
            )
        if not single or self.mode not in ("tiles", "auto", "flat", "mask"):
            return self._land_generic_many(items)
        has_bits = all(len(it) > 4 and it[4] is not None for it in items)
        if self.mode == "mask" and not has_bits:
            raise ValueError(
                "fetch_mode 'mask' needs the pipeline's packed bitmask "
                "(config.emit_bitmask)"
            )

        results: list = [None] * K
        scalars: list = [None] * K      # (pos, t_lo, t_hi) per item
        merged: list = [None] * K
        spec = self._spec
        misses: list = []
        flags_in = volatile if volatile is not None else [False] * K
        hints = [f if isinstance(f, OverlayHint) else None
                 for f in flags_in]
        mask_P: list = [0] * K          # per-frame vals budget (mask)
        # ordering guard for the overlay shadow: delta() for frame i
        # must read the shadow AFTER frames j<i applied. Applications
        # themselves commute (wrap-adds), so only the READS need care:
        # once an earlier frame that may touch the strip goes to the
        # miss list, later hint frames in this batch miss too.
        strip_dirty = False
        strip_end = (self._ov.strip_bytes
                     if self._ov is not None and self._ov.enabled else 0)
        if spec is None:
            probe = self._probe_slicer()
            host = self._get_batched(
                [probe(it[0], it[1]) for it in items]
            )
            scalars = [tuple(int(x) for x in h) for h in host]
            misses = list(range(K))
        else:
            smode, start0, L0, P0, vel = spec
            # per-frame PREDICTED window start: the window rides the
            # scene's observed velocity instead of widening by K*drift —
            # at K=16 the static union window fetched ~7x the span's
            # bits/blocks per frame (margin 4*K*drift); the predicted
            # one pays only span + 4*K*err, err = |observed - predicted|
            starts = [
                max(0, min(start0 + i * vel, n_tiles - L0))
                for i in range(K)
            ]
            if smode == "flat":
                for i, it in enumerate(items):
                    merged[i] = logcompact.merge_tiles(it[1], it[2], it[3])
                sl = self._spec_slicer(L0, tile_cap, flat_P=P0)
                dev = [
                    sl(it[0], it[1], m[0], m[1], np.int32(s))
                    for it, m, s in zip(items, merged, starts)
                ]
            elif smode == "mask":
                # vals-only merge for bitmask-only payloads: the mask
                # fetch never moves xs, so merging them is pure waste
                for i, it in enumerate(items):
                    merged[i] = (
                        (None, logcompact.merge_vals(it[1], it[3]))
                        if it[2] is None
                        else logcompact.merge_tiles(it[1], it[2], it[3])
                    )
                # text-change frames ride the SAME speculative round
                # trip: vals budget widened by the host-known overlay
                # bound, scene window clamped past the strip (the
                # coverage gate needs disjointness — _try_overlay_hit)
                u_strip = self._ov_units(tile_cap)
                cap = self._fetch_xs.capacity
                dev = []
                for i, (it, m) in enumerate(zip(items, merged)):
                    P = P0
                    strip_U = 0
                    if hints[i] is not None and u_strip is not None:
                        self._hint_budget = hints[i].budget
                        P = self._flat_len(P0 + hints[i].budget, cap,
                                           memo=self._m_hint_P)
                        starts[i] = max(
                            starts[i], min(u_strip, n_tiles - L0))
                        strip_U = u_strip
                    mask_P[i] = P
                    dev.append(self._mask_slicer(L0, tile_cap, P, strip_U)(
                        it[0], it[1], it[4], m[1], np.int32(starts[i])))
            else:
                sl = self._spec_slicer(L0, tile_cap)
                dev = [
                    sl(it[0], it[1], it[2], it[3], np.int32(s))
                    for it, s in zip(items, starts)
                ]
            host = self._get_batched(dev)
            for i, h in enumerate(host):
                pos, t_lo, t_hi = int(h[0]), int(h[1]), int(h[2])
                scalars[i] = (pos, t_lo, t_hi)
                if t_hi == 0:
                    results[i] = (pos, self._empty_result(
                        smode != "tiles", tile_cap))
                    continue
                st = starts[i]
                covered = st <= t_lo and t_hi <= st + L0
                want = self._pick_kind(pos, t_lo, t_hi, tile_cap, has_bits)
                if smode == "mask":
                    res = None
                    if hints[i] is not None and self._ov is not None:
                        if not strip_dirty:
                            res = self._try_overlay_hit(
                                h, pos, st, tile_cap, mask_P[i], hints[i])
                    elif want == "mask" and covered and pos <= mask_P[i]:
                        res = self._mask_result(
                            h[3], pos, st, tile_cap, h[4])
                    if res is not None:
                        self.spec_counts["hit"] += 1
                        self.fetch_counts["mask"] += 1
                        results[i] = (pos, res)
                        self._ov_apply(res)
                    else:
                        self.spec_counts["miss"] += 1
                        misses.append(i)
                        if t_lo * tile_cap < strip_end:
                            strip_dirty = True
                    continue
                cw, xw, vw = h[3], h[4], h[5]
                span = cw[t_lo - st: t_hi - st] if covered else None
                if smode == "flat" and want == "flat" and covered \
                        and pos <= P0:
                    self.spec_counts["hit"] += 1
                    self.fetch_counts["flat"] += 1
                    results[i] = (pos, (
                        self._rebuild_flat_xs(xw, span, pos, t_lo, tile_cap),
                        np.asarray(vw[:pos]),
                    ))
                    self._ov_apply(results[i][1])
                elif smode == "tiles" and want == "tiles" and covered:
                    self.spec_counts["hit"] += 1
                    self.fetch_counts["tiles"] += 1
                    a = t_lo - st
                    results[i] = (pos, wire.TiledPayload(
                        pos, span,
                        self._rebuild_xs(
                            xw, span, st, t_lo, t_hi, tile_cap),
                        vw[a: a + (t_hi - t_lo)],
                    ))
                    self._ov_apply(results[i][1])
                else:
                    self.spec_counts["miss"] += 1
                    misses.append(i)

        if misses:
            reqs = []
            for i in misses:
                pos, t_lo, t_hi = scalars[i]
                if t_hi == 0:
                    # cold-start empty frame (phase-1 empties returned
                    # above; flat-vs-tiles is moot at pos == 0)
                    results[i] = (pos, self._empty_result(False, tile_cap))
                    continue
                counts_d, xs_t_d, vals_t_d = items[i][1:4]
                want = self._pick_kind(pos, t_lo, t_hi, tile_cap, has_bits)
                Lc = self._range_len(t_hi - t_lo, n_tiles,
                                     memo=self._m_miss_L)
                startc = max(0, min(t_lo, n_tiles - Lc))
                if want == "mask":
                    if merged[i] is None:
                        merged[i] = (
                            (None, logcompact.merge_vals(counts_d, vals_t_d))
                            if xs_t_d is None
                            else logcompact.merge_tiles(
                                counts_d, xs_t_d, vals_t_d)
                        )
                    P = self._flat_len(pos, self._fetch_xs.capacity,
                                       memo=self._m_miss_P)
                    bw_s, vw_s = self._mask_win(Lc, tile_cap, P)(
                        items[i][4], merged[i][1], np.int32(startc))
                    reqs.append((i, ("mask2", startc), (bw_s, vw_s)))
                    continue
                cw_s = self._counts_win(Lc)(counts_d, np.int32(startc))
                if want == "flat":
                    if merged[i] is None:
                        merged[i] = logcompact.merge_tiles(
                            counts_d, xs_t_d, vals_t_d)
                    P = self._flat_len(pos, self._fetch_xs.capacity,
                                       memo=self._m_miss_P)
                    lo_s, vw_s = self._flat_narrow(P, tile_cap)(
                        merged[i][0], merged[i][1])
                    reqs.append((i, ("flat2", startc), (cw_s, lo_s, vw_s)))
                else:
                    xw_s, vw_s = self._slicer(Lc, False, tile_cap)(
                        xs_t_d, vals_t_d, np.int32(startc))
                    reqs.append((i, ("tiles2", startc), (cw_s, xw_s, vw_s)))
            fetched = self._get_batched([r[2] for r in reqs])
            for (i, meta, _), host in zip(reqs, fetched):
                pos, t_lo, t_hi = scalars[i]
                startc = meta[1]
                if meta[0] == "mask2":
                    bw, vw = host
                    self.fetch_counts["mask"] += 1
                    results[i] = (pos, self._mask_result(
                        bw, pos, startc, tile_cap, vw))
                elif meta[0] == "flat2":
                    cw, xw, vw = host
                    span = cw[t_lo - startc: t_hi - startc]
                    self.fetch_counts["flat"] += 1
                    results[i] = (pos, (
                        self._rebuild_flat_xs(xw, span, pos, t_lo, tile_cap),
                        np.asarray(vw[:pos]),
                    ))
                else:
                    cw, xw, vw = host
                    span = cw[t_lo - startc: t_hi - startc]
                    self.fetch_counts["tiles"] += 1
                    a = t_lo - startc
                    results[i] = (pos, wire.TiledPayload(
                        pos, span,
                        self._rebuild_xs(
                            xw, span, startc, t_lo, t_hi, tile_cap),
                        vw[a: a + (t_hi - t_lo)],
                    ))
                # miss-path landings track the shadow too (applications
                # commute with the phase-1 ones — wrap-adds)
                self._ov_apply(results[i][1])

        self._update_spec(scalars, K, n_tiles, tile_cap, has_bits,
                          volatile=volatile)
        return results

    def _empty_result(self, flat: bool, tile_cap: int):
        if flat:
            self.fetch_counts["flat"] += 1
            return np.empty(0, np.int32), np.empty(0, np.uint8)
        self.fetch_counts["tiles"] += 1
        return wire.TiledPayload(
            0, np.zeros(0, np.int32),
            np.empty((0, tile_cap), np.int32),
            np.empty((0, tile_cap), np.uint8),
        )

    def _update_spec(self, scalars, K: int, n_tiles: int,
                     tile_cap: int, has_bits: bool = False,
                     volatile=None) -> None:
        """Re-center the speculative window for the NEXT batch from the
        batch's last CLEAN frame.

        ``volatile`` marks frames whose span the host KNOWS is polluted
        by a one-off far-away write — the status overlay re-ships its
        glyph bytes whenever the text changes (1 Hz), and on those
        frames the device span covers overlay+scene as one wide window.
        Those frames are excluded from velocity/error learning and from
        re-centering (they land through the miss path, which is exact);
        without the exclusion every ~30th frame injected a huge
        fake-velocity sample and the error EMA kept the window wide
        (measured: 218 KB/frame fetched vs ~95 expected,
        benchmarks/sustained_tpu_tunnel r4 block).

        The spatial window is VELOCITY-PREDICTED: the batch's scalars
        expose the scene's signed per-frame motion (consecutive
        ``t_lo``/``t_hi`` deltas within the batch, plus the jump since
        the last batch), so the next batch's frame *i* slices its window
        at ``start + i*vel`` (the slicers take ``start`` dynamically —
        same jit) and the margin only absorbs the PREDICTION ERROR
        ``4*K*err``, not the full ``4*K*drift`` union. The difference is
        the whole fetch at depth: at K=16 the old union window moved
        ~7x the span's bits per frame (mask@1% clustered: 73 KB fetched
        for a 7.8 KB span — why mask@K=16 measured no faster than the
        2x-bigger flat prefix, benchmarks/loopback_tpu_tunnel r4 rows);
        a linear drift predicts with err ~0 and the window collapses to
        span + 128 units. The blind ``span//4 * K`` prior is kept as a
        CAP and as the cold-start fallback; a miss is never wrong, just
        one extra round trip, and it feeds the next estimate. Empty
        frames keep the previous window (a blank frame says nothing
        about where the scene will resume)."""
        base_no = self._frame_no
        self._frame_no += K
        flags = volatile if volatile is not None else [False] * K
        # frames eligible for LEARNING: non-empty and not volatile
        idxs = [i for i in range(K)
                if scalars[i] is not None and scalars[i][2] > 0
                and not flags[i]]
        # anchor for window centering: the last clean frame; fall back
        # to the last live frame (a batch that is all overlay updates
        # still needs a window somewhere) without touching the EMAs
        anchor = idxs[-1] if idxs else next(
            (i for i in range(K - 1, -1, -1)
             if scalars[i] is not None and scalars[i][2] > 0), None)
        if anchor is None:
            return
        pos, t_lo, t_hi = scalars[anchor]
        want = self._pick_kind(pos, t_lo, t_hi, tile_cap, has_bits)
        span = t_hi - t_lo
        # observed per-frame motion: signed velocity samples from
        # originally-ADJACENT clean pairs, plus the cross-batch jump
        # (frame-number-normalized — batches may land anchors anywhere)
        vels: list = []
        d_pos = 0
        pairs = [(scalars[a], scalars[b])
                 for a, b in zip(idxs, idxs[1:]) if b == a + 1]
        for (p0, a0, b0), (p1, a1, b1) in pairs:
            vels.append(0.5 * ((a1 - a0) + (b1 - b0)))
            d_pos = max(d_pos, abs(p1 - p0))
        cross = None
        if self._last_scalar is not None and idxs:
            ln, lp, la, lb = self._last_scalar
            steps = base_no + anchor - ln
            if steps > 0:
                vels.append(0.5 * ((t_lo - la) + (t_hi - lb)) / steps)
                d_pos = max(d_pos, (abs(pos - lp) + steps - 1) // steps)
                cross = (steps, la, lb)
        if idxs:
            self._last_scalar = (base_no + anchor, pos, t_lo, t_hi)
        blind = max(64, span // 4) * K
        if not vels and self._vel_pf is None:
            margin = blind           # cold start: no motion observed yet
            vel = 0
        else:
            v_obs = sum(vels) / len(vels) if vels else self._vel_pf
            if self._vel_pf is None:
                self._vel_pf = float(v_obs)
            else:                    # fast EMA: misses re-learn quickly
                self._vel_pf = 0.5 * self._vel_pf + 0.5 * v_obs
            vel = int(round(self._vel_pf))
            # prediction error: worst endpoint deviation from the
            # velocity model across this batch's adjacent clean pairs
            # AND the cross-batch jump (per-frame-normalized).  At
            # landing depth 1 `pairs` is always empty — the cross-batch
            # sample is the ONLY error evidence there; without it every
            # K=1 batch fed err=0.0, the EMA decayed to ~0 and the
            # margin pinned at 64 units, so a jittery scene paid a
            # ~30 ms speculative-miss round trip per frame.  Batches
            # with no evidence at all skip the EMA update entirely.
            errs = []
            for (p0, a0, b0), (p1, a1, b1) in pairs:
                errs.append(max(abs((a1 - a0) - self._vel_pf),
                                abs((b1 - b0) - self._vel_pf)))
            if cross is not None:
                steps, la, lb = cross
                errs.append(max(abs((t_lo - la) / steps - self._vel_pf),
                                abs((t_hi - lb) / steps - self._vel_pf)))
            if errs:
                err = max(errs)
                if self._err_pf is None:
                    self._err_pf = err
                else:
                    self._err_pf = 0.5 * self._err_pf + 0.5 * err
            if self._err_pf is None:
                margin = blind
            else:
                margin = min(blind, max(64, int(4 * K * self._err_pf)))
        L = self._range_len(span + 2 * margin, n_tiles,
                            memo=self._m_spec_L)
        # frame 0 of the next batch is (K - anchor) frames past the
        # anchor: project the window center forward by that much
        start = max(0, min(t_lo + (K - anchor) * vel - margin,
                           n_tiles - L))
        if want in ("flat", "mask"):
            # P covers pos GROWTH over the next K frames, not spatial
            # drift: the merged prefix's first pos entries ARE the
            # payload wherever the scene sits. Headroom = 6x the observed
            # per-frame pos delta, floored at 1024/frame while the delta
            # EMA is cold and 256/frame once it has samples (the 1024
            # floor alone was 8 KB/frame of slack at the 102-fps record
            # config, where the scene's pos is near-constant); capped at
            # the blind 25% prior. A too-tight P costs a 30 ms miss
            # round trip — but only for the one batch that jumps, and
            # the miss feeds the next estimate.
            floor = 1024 * K if self._dpos_pf is None else 256 * K
            if self._dpos_pf is None:
                self._dpos_pf = float(d_pos)
            else:
                self._dpos_pf = 0.5 * self._dpos_pf + 0.5 * d_pos
            grow = min(max(pos // 4, 2048 * K),
                       max(floor, int(6 * K * self._dpos_pf)))
            P = self._flat_len(pos + grow, self._fetch_xs.capacity,
                               memo=self._m_spec_P)
            self._spec = (want, start, L, P, vel)
        else:
            self._spec = ("tiles", start, L, 0, vel)

    def _land_generic_many(self, items):
        """Fallback for mesh-sharded / host payload blocks and the
        "shards" mode: fetch ``(pos, counts)`` for every item in one
        batched get, then delegate to the :meth:`land_many` machinery
        (which keeps the SPMD-safe static-prefix slicing for sharded
        arrays)."""
        import jax

        heads = []
        for it in items:
            pos_d, counts_d = it[0], it[1]
            if isinstance(counts_d, np.ndarray):
                heads.append((np.asarray(pos_d), counts_d))
            else:
                heads.append(None)
        dev = [(it[0], it[1]) for it, h in zip(items, heads) if h is None]
        if dev:
            fetched = iter(jax.device_get(dev))
            heads = [h if h is not None else next(fetched) for h in heads]
        landed = self.land_many([
            (int(ph), np.asarray(ch), it[1], it[2], it[3])
            for (ph, ch), it in zip(heads, items)
        ])
        out = [
            (int(ph), res) for (ph, _), res in zip(heads, landed)
        ]
        for _, res in out:          # keep the overlay shadow in sync
            self._ov_apply(res)
        return out


class StreamExecutor:
    """Owns pipeline + device state; yields host payloads per frame."""

    def __init__(self, config: StreamConfig, pipeline: Optional[DeltaStreamPipeline] = None):
        self.cfg = config
        self.pipe = pipeline or DeltaStreamPipeline(config)
        self._state = None
        # sub-tiled payloads merge through the two-stage pair-compaction
        # path (flat emit re-measured at 0.80 ms at 1080p either layout,
        # benchmarks/subtile_ab — the 12 ms unit-serial chain is gone);
        # start the merge-cost EMA at a mildly pessimistic prior for the
        # extra pair-kernel passes and let measurements take over
        merge_init = 4e-3 if config.subtile_rows else 1.5e-3
        self.link = LinkStats(merge_s_init=merge_init)
        self._fetch_xs = TieredFetcher(config.capacity, stats=self.link)
        self._fetch_vals = TieredFetcher(config.capacity, stats=self.link)
        self._lander = TiledLander(config.fetch_mode, self.link,
                                   return_mask=config.mask_payload)
        self.metrics = ExecMetrics()

    @property
    def fetch_counts(self):
        return self._lander.fetch_counts

    def start(self, base_frame: np.ndarray) -> np.ndarray:
        """Initialize device state; returns the base frame bytes to ship."""
        base = np.asarray(base_frame, dtype=np.uint8).ravel()
        self._base_np = base  # kept for prewarm_fetch's no-op dispatch
        self._state = self.pipe.init_state(base)
        # host-authored overlay landings (OverlayShadow): sound only
        # when device prev == base + shipped entries — i.e. negative
        # feedback on a device pipeline (the HOST backend keeps its own
        # prev shadow and lands through a different path entirely)
        if (self.cfg.tiled_payload and self.cfg.negative_feedback
                and self.cfg.compaction.value == "pallas"):
            self._lander.set_overlay(OverlayShadow(self.pipe, base))
        self._last_text = None
        return base

    def process(
        self, frame: np.ndarray, text: str = ""
    ) -> Tuple[int, np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """Run one frame; returns host-side ``(pos, xs, vals, aux)``.

        With ``tiled_payload`` configured, ``xs`` is a
        :class:`~cudavideostream_tpu.runtime.wire.TiledPayload` and
        ``vals`` is None — senders pass it to the native scatter-gather
        writer, library users call ``.to_flat()``.
        """
        if self._state is None:
            raise RuntimeError("call start(base_frame) first")
        t0, rest = self._dispatch(frame, text)
        return self._land(t0, rest, self._text_changed)

    def _dispatch(self, frame, text: str):
        """Run the pipeline step and advance device state.

        On a :class:`PayloadOverflowError` that carries the post-step
        state (the HOST backend raises before returning), the state still
        advances — so a caller that recovers via :meth:`resync` ships a
        frame consistent with the pipeline's own shadows.
        """
        t0 = time.perf_counter()
        # the overlay re-blits every frame but SHIPS bytes only when the
        # text changes — and the host knows exactly when that is. The
        # flag reaches the lander as the frame's "volatile" bit so the
        # speculative window neither learns velocity from the overlay's
        # span jump nor re-centers on it. When the host can AUTHOR the
        # overlay entries itself (OverlayShadow), the flag carries the
        # new text + entry budget and the frame lands through the normal
        # speculative window; otherwise it just misses and re-fetches
        # exactly (~1/s, shared batched get).
        last = getattr(self, "_last_text", None)
        changed = text != last
        self._last_text = text
        ov = self._lander._ov
        if changed and ov is not None:
            self._text_changed = OverlayHint(text, ov.budget(last, text))
        else:
            self._text_changed = changed
        try:
            out = self.pipe.step(self._state, frame, text=text)
        except PayloadOverflowError as e:
            if e.state is not None:
                self._state = e.state
            raise
        self._state = out[0]
        return t0, out[1:]

    def resync(self) -> np.ndarray:
        """Full current frame for a wire-v3 raw recovery.

        After a :class:`PayloadOverflowError`, the deltas are already
        folded into the device state, so the only consistent way to keep
        the client is to replace its state wholesale — wire v3's raw
        mode. Returns the post-step previous-frame bytes; pipelined
        subclasses also drop their pending payload (its deltas are
        subsumed by the raw frame and would corrupt a client that
        applied them on top of it).
        """
        if self._state is None:
            raise RuntimeError("no state to resync from")
        arr = np.asarray(self._state, dtype=np.uint8).ravel()
        if self._lander._ov is not None:
            # the raw frame replaces the client state wholesale; any
            # entries the shadow missed (e.g. a PayloadOverflowError
            # dropped a landing) are subsumed — resync it too
            self._lander._ov.reinit(arr)
        return arr

    def _use_flat_fetch(self, pos: int, t_hi: int, tile_cap: int) -> bool:
        """The lander's density-adaptive decision (kept as a method for
        tests and introspection)."""
        return self._lander.use_flat(pos, t_hi, tile_cap)

    def _land(self, t0: float, rest, volatile: bool = False
              ) -> Tuple[int, np.ndarray, np.ndarray, Optional[np.ndarray]]:
        if self.cfg.tiled_payload:
            # (pos, counts, xs_t, vals_t[, bits], aux) — bits rides when
            # the pipeline emits the packed change-bitmask; bitmask-only
            # payloads carry (pos, counts, vals_t, bits, aux), no xs
            if self.cfg.maskonly_payload:
                pos_d, counts_d, vals_t_d, bits_d = rest[:4]
                xs_t_d = None
            else:
                pos_d, counts_d, xs_t_d, vals_t_d = rest[:4]
                bits_d = rest[4] if len(rest) == 6 else None
            aux_d = rest[-1]
            # single fused (often speculative) landing: pos + counts +
            # payload window in as few link round trips as possible —
            # see TiledLander.land_fused
            pos, res = self._lander.land_fused(
                pos_d, counts_d, xs_t_d, vals_t_d, bits_d,
                volatile=volatile,
            )
            aux = np.asarray(aux_d) if aux_d is not None else None
            self.metrics.record(time.perf_counter() - t0, pos)
            if isinstance(res, (wire.TiledPayload, wire.MaskPayload)):
                return pos, res, None, aux
            xs, vals = res
            return pos, xs, vals, aux
        pos_d, xs_d, vals_d, aux_d = rest
        pos = int(np.asarray(pos_d))
        if isinstance(xs_d, np.ndarray) or pos <= 0:
            xs = self._fetch_xs.fetch(xs_d, pos)
            vals = self._fetch_vals.fetch(vals_d, pos)
        else:
            # one device_get for both prefixes (one link round trip)
            import jax

            t = self._fetch_xs.tier_checked(pos)
            t1 = time.perf_counter()
            xs, vals = jax.device_get((xs_d[:t], vals_d[:t]))
            self.link.record_fetch(
                xs.nbytes + vals.nbytes, time.perf_counter() - t1
            )
            xs, vals = xs[:pos], vals[:pos]
        aux = np.asarray(aux_d) if aux_d is not None else None
        self.metrics.record(time.perf_counter() - t0, pos)
        return pos, xs, vals, aux


    def flush(self):
        """No pending work in the synchronous executor."""
        return None

    # -- checkpoint / resume (beyond reference: it has nothing to persist,
    # SURVEY.md §5 — here the stream state is the previous-frame buffer,
    # so a restarted server can resume without a fresh base-frame
    # handshake for clients that kept their reconstruction) -------------
    def save_state(self, path: str) -> None:
        if self._state is None:
            raise RuntimeError("no state to save")
        np.savez(
            path,
            prev=np.asarray(self._state),
            geometry=np.array([self.cfg.height, self.cfg.width]),
            threshold=np.array([self.cfg.threshold]),
            negative_feedback=np.array([int(self.cfg.negative_feedback)]),
        )

    def load_state(self, path: str) -> None:
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        if tuple(data["geometry"]) != (self.cfg.height, self.cfg.width):
            raise ValueError("checkpoint geometry mismatch")
        # threshold / negative_feedback shape the prev buffer's contents
        # (sub-threshold drift accumulates in it): resuming under a
        # different setting would silently change delta semantics vs the
        # stream the checkpoint came from — refuse, don't guess
        if int(data["threshold"][0]) != self.cfg.threshold:
            raise ValueError(
                f"checkpoint threshold {int(data['threshold'][0])} != "
                f"config threshold {self.cfg.threshold}"
            )
        if "negative_feedback" in data and bool(
            data["negative_feedback"][0]
        ) != self.cfg.negative_feedback:
            raise ValueError(
                "checkpoint negative_feedback mismatch "
                f"(saved {bool(data['negative_feedback'][0])}, "
                f"config {self.cfg.negative_feedback})"
            )
        self._state = self.pipe.init_state(data["prev"])
        self._base_np = np.asarray(data["prev"], dtype=np.uint8).ravel()
        if self._lander._ov is not None:
            self._lander._ov.reinit(data["prev"])
        self._last_text = None

    # -- lander warm start (server --link-cache / --calibrate) ----------
    # The r4 sustained run spent a third of a 300-frame session in the
    # cold-start learning transient (LinkStats unknown, spec window
    # blind-wide: first-30 47.3 ms/frame vs last-30 8.6,
    # benchmarks/sustained_tpu_tunnel). The stream state already
    # checkpoints (save_state); this persists the LEARNED link +
    # speculation state alongside. Every cached value is advisory — a
    # stale cache costs at most extra miss round trips, never a byte.
    LINK_CACHE_VERSION = 1

    def _link_fingerprint(self) -> list:
        # everything the cached window geometry is only valid under: a
        # spec (start, L, P) proven in-range last session stays in-range
        # exactly when tile count and fetch capacity are unchanged.
        # emit flavor matters too: maskonly runs a different tile
        # geometry than generic mask at the same frame size (1080p
        # 512- vs 496-lane tiles, logcompact._tile_geometry_mask), so a
        # cross-flavor seed would shift every window by ~3%
        return [self.cfg.frame_bytes, self.cfg.capacity,
                self.cfg.fetch_mode, self.cfg.subtile_rows,
                self.cfg.tiled_payload, self.cfg.emit_bitmask,
                self.cfg.maskonly_payload]

    def save_link_cache(self, path: str) -> None:
        import json

        data = {
            "version": self.LINK_CACHE_VERSION,
            "fingerprint": self._link_fingerprint(),
            "bps": self.link.bps,
            "merge_s": self.link.merge_s,
            "lander": self._lander.export_state(),
        }
        with open(path, "w") as f:
            json.dump(data, f)

    def load_link_cache(self, path: str) -> bool:
        """Seed link/speculation state from a prior session's cache.
        Returns False (and changes nothing) on a missing, unreadable, or
        mismatched cache — warm start is an optimization, never a
        requirement."""
        import json
        import os

        if not os.path.exists(path):
            return False
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            return False
        if (data.get("version") != self.LINK_CACHE_VERSION
                or data.get("fingerprint") != self._link_fingerprint()):
            return False
        if isinstance(data.get("bps"), (int, float)) and data["bps"] > 0:
            self.link.bps = float(data["bps"])
        if isinstance(data.get("merge_s"), (int, float)) \
                and data["merge_s"] > 0:
            self.link.merge_s = float(data["merge_s"])
        if isinstance(data.get("lander"), dict):
            self._lander.seed_state(data["lander"])
        return True

    def prewarm_fetch(self) -> int:
        """Compile the landing's fetch jits (the link cache's saved rung
        set, :meth:`TiledLander.prewarm`) before the first frame.

        Runs ONE no-op pipeline step on the base frame (cur == prev →
        pos = 0, new state byte-identical; the step is donated, so the
        returned state replaces ours) purely to obtain device arrays of
        the serving shapes, then compiles each saved rung against them.
        Pre-serving only: after frames have landed, the base frame no
        longer matches the device state and the no-op step would emit a
        real (unshipped) delta, desyncing clients. Returns the number of
        jits compiled (0 when the config has no fused landing)."""
        if self._state is None:
            raise RuntimeError("call start(base_frame) first")
        if self._lander._frame_no:
            raise RuntimeError("prewarm_fetch is a pre-serving warmup")
        if not (self.cfg.tiled_payload
                and self.cfg.compaction.value == "pallas"):
            return 0
        out = self.pipe.step(self._state, self._base_np, text="")
        self._state = out[0]
        rest = out[1:]
        if self.cfg.maskonly_payload:
            pos_d, counts_d, vals_t_d, bits_d = rest[:4]
            xs_t_d = None
        else:
            pos_d, counts_d, xs_t_d, vals_t_d = rest[:4]
            bits_d = rest[4] if len(rest) == 6 else None
        return self._lander.prewarm(pos_d, counts_d, xs_t_d, vals_t_d,
                                    bits_d)

    def calibrate_link(self, rounds: int = 2,
                       nbytes: int = 1 << 19) -> None:
        """Seed ``LinkStats.bps`` with real device round trips BEFORE the
        first frame — the no-cache half of warm start. Two 512 KiB gets
        cost ~70 ms once on the tunnel-class link; the blind-bps
        transient they replace was worth seconds (the lander's fetch
        decisions assume a fast link until proven otherwise)."""
        import jax
        import jax.numpy as jnp

        buf = jax.device_put(jnp.zeros(nbytes, jnp.uint8))
        jax.device_get(buf)          # materialize + warm the path
        for _ in range(max(0, rounds)):
            t1 = time.perf_counter()
            jax.device_get(buf)
            self.link.record_fetch(nbytes, time.perf_counter() - t1)


class PipelinedExecutor(StreamExecutor):
    """One-frame-deep software pipeline: dispatch frame N, then land frame
    N-1's payload while N computes — the executor-level equivalent of the
    reference's capture/compute/send thread overlap
    (``threads.cpp:166-237``). The output stream lags one frame; call
    :meth:`flush` after the last frame to drain the pending payload.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._pending = None  # (t0, step outputs past new_prev)

    def process(self, frame, text: str = ""):
        if self._state is None:
            raise RuntimeError("call start(base_frame) first")
        t0, rest = self._dispatch(frame, text)
        prev, self._pending = self._pending, (t0, rest, self._text_changed)
        if prev is None:
            return None
        return self._land(*prev)

    def flush(self):
        prev, self._pending = self._pending, None
        return self._land(*prev) if prev is not None else None

    def resync(self) -> np.ndarray:
        # the pending payload's deltas are vs a state the raw frame
        # replaces — a client that applied them afterwards would corrupt
        self._pending = None
        return super().resync()


class BatchedLandExecutor(StreamExecutor):
    """Depth-K landing batch: dispatch K frames' pipeline steps, then
    land ALL K payloads through one (speculative) ``device_get`` round
    trip (:meth:`TiledLander.land_fused_many`).

    On a high-latency host↔device link the per-frame round trip is the
    serving bottleneck (~30 ms RTT on the tunnel vs ~0.15 ms of device
    compute — benchmarks/loopback_tpu_tunnel); batching K frames per
    landing divides that latency by K at the cost of K frames of output
    latency. This is the same throughput/latency trade the reference
    makes with its ring of six in-flight pinned buffers
    (``threads.cpp:84-106``) — frames are pipelined K-deep, not
    dropped. :meth:`process` returns ``None`` until the batch fills,
    then a LIST of per-frame results (oldest first); callers must also
    drain :meth:`flush`, which returns a list too.
    """

    def __init__(self, config: StreamConfig,
                 pipeline: Optional[DeltaStreamPipeline] = None,
                 depth: int = 4):
        super().__init__(config, pipeline)
        if not config.tiled_payload:
            raise ValueError(
                "BatchedLandExecutor requires tiled_payload=True (the "
                "batched landing speaks the per-tile block layout)"
            )
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.depth = depth
        self._queue: list = []  # (t0, step outputs past new_prev)

    def process(self, frame, text: str = ""):
        if self._state is None:
            raise RuntimeError("call start(base_frame) first")
        t0, rest = self._dispatch(frame, text)
        self._queue.append((t0, rest, self._text_changed))
        if len(self._queue) < self.depth:
            return None
        return self._land_queue()

    def _land_queue(self):
        q, self._queue = self._queue, []
        if self.cfg.maskonly_payload:
            items = [(r[0], r[1], None, r[2], r[3]) for _, r, _ch in q]
        else:
            items = [
                (r[0], r[1], r[2], r[3], r[4] if len(r) == 6 else None)
                for _, r, _ch in q
            ]
        landed = self._lander.land_fused_many(
            items, volatile=[ch for _, _, ch in q],
        )
        out = []
        for (t0, rest, _ch), (pos, res) in zip(q, landed):
            aux_d = rest[-1]
            aux = np.asarray(aux_d) if aux_d is not None else None
            self.metrics.record(time.perf_counter() - t0, pos)
            if isinstance(res, (wire.TiledPayload, wire.MaskPayload)):
                out.append((pos, res, None, aux))
            else:
                xs, vals = res
                out.append((pos, xs, vals, aux))
        return out

    def flush(self):
        """Land whatever is queued (the sub-depth tail); list result."""
        return self._land_queue() if self._queue else None

    def resync(self) -> np.ndarray:
        # queued payloads' deltas are vs states the raw frame replaces
        self._queue = []
        return super().resync()


class ExecMetrics:
    """1 Hz status line state (reference ``server.cpp:150-171``)."""

    def __init__(self):
        self.last_print = time.perf_counter()
        self.frame_time = 0.0
        self.read_time = 0.0
        self.pos = 0
        self.frames = 0
        self.total_frames = 0
        self.wire_bytes = 0
        # snapshot of the last completed 1 Hz window, taken by
        # status_line() BEFORE it resets the counters — overlay_text()
        # must read these, not the live counters (which are zero right
        # after the reset, exactly when callers render the overlay)
        self.win_fps = 0.0
        self.win_bw_ref = 0

    def record(self, frame_s: float, pos: int,
               wire_bytes: Optional[int] = None) -> None:
        self.frame_time = frame_s
        self.pos = pos
        self.frames += 1
        self.total_frames += 1
        # default: the v1 framing cost; v2 senders pass actual bytes
        self.wire_bytes += 4 + 5 * pos if wire_bytes is None else wire_bytes

    def status_line(self, read_s: float = 0.0) -> Optional[str]:
        """Returns the status string once per second, else None."""
        now = time.perf_counter()
        if now - self.last_print < 1.0:
            return None
        dt = now - self.last_print
        fps = self.frames / dt
        # reference BW estimate: each changed byte counted as 16 bits
        # ((pos<<4)*fps*1e-3 kbps, server.cpp:159) — kept for parity
        bw_ref = int((self.pos << 4) * fps * 1e-3)
        bw_true = int(8 * self.wire_bytes / dt * 1e-3)
        self.win_fps = fps
        self.win_bw_ref = bw_ref
        line = (
            f"FPS: {fps:5.0f}\tFOR: {1e3*self.frame_time:6.2f} ms\t"
            f"READ: {1e3*read_s:6.2f}\tPOS: {self.pos:7d}\t"
            f"BW: {bw_ref:6d} kbps (wire: {bw_true} kbps)"
        )
        self.last_print = now
        self.frames = 0
        self.wire_bytes = 0
        return line

    def overlay_text(self) -> str:
        """The string rendered into the video (``server.cpp:166-168``).

        Reports the last completed 1 Hz window's fps/BW. Every serving
        loop calls this immediately after :meth:`status_line` has reset
        the live counters, so computing from ``self.frames`` here would
        always yield 0 (the round-2 overlay bug) — the window snapshot
        is the only value that is correct at that call site.
        """
        return f"FPS: {int(self.win_fps)} BW: {self.win_bw_ref} kbps"
