"""Wire bytes per frame vs change density, by format (v1/v2/v3).

Measures the actual serialized bytes each wire format emits at 1080p
for a density sweep — random changed-byte patterns (worst case for
delta16's gap coding) and a clustered pattern (a moving object, the
delta16 sweet spot). The v3 column also reports the mode it picked.

Writes ``benchmarks/wire_bytes_density``. Pure host-side (the wire
layer serializes host payloads), so this runs anywhere and is exactly
reproducible — no chip, no timing jitter.

Reference context: the reference ships 5 bytes/changed byte always
(``threads.cpp:224-231``); its own report measures a ~5.9% density
scene (report.tex:2594), where v1 already costs 29.5% of a raw frame
every frame. Past 20% density v1 EXCEEDS the raw frame; its worst case
is 5x. v3 caps every frame at ``n + 1`` bytes.
"""

from __future__ import annotations

import os

import numpy as np

from cudavideostream_tpu.runtime import wire

H, W = 1080, 1920
N = H * W * 3
MODES = {0: "delta16", 1: "bitmask", 2: "raw", 3: "winmask"}


def payload_random(rng, frac):
    k = int(N * frac)
    xs = np.sort(rng.choice(N, size=k, replace=False)).astype(np.int64)
    vals = rng.integers(1, 255, k, endpoint=True, dtype=np.uint8)
    return k, xs, vals


def payload_clustered(rng, frac):
    """One contiguous changed region (moving-object regime)."""
    k = int(N * frac)
    start = int(rng.integers(0, max(1, N - k)))
    xs = np.arange(start, start + k, dtype=np.int64)
    vals = rng.integers(1, 255, k, endpoint=True, dtype=np.uint8)
    return k, xs, vals


def run(out_path=None):
    rng = np.random.default_rng(0)
    out_path = out_path or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "wire_bytes_density"
    )
    rows = []
    fracs = (0.001, 0.01, 0.03, 0.0593, 0.10, 0.20, 0.40, 0.72, 0.90, 1.0)
    for pattern, make in (("random", payload_random),
                          ("clustered", payload_clustered)):
        for frac in fracs:
            pos, xs, vals = make(rng, frac)
            v1 = 4 + 5 * pos
            v2 = len(wire.pack_payload_v2(pos, xs, vals))
            frame_after = np.zeros(N, np.uint8)
            v3buf = wire.encode_frame_v3(pos, xs, vals, frame_after)
            v4buf = wire.encode_frame_v4(pos, xs, vals, frame_after)
            rows.append((pattern, frac, pos, v1, v2, len(v3buf),
                         MODES[v3buf[0]], len(v4buf), MODES[v4buf[0]]))
    with open(out_path, "w") as f:
        f.write("# pattern\tdensity\tpos\tv1_bytes\tv2_bytes\tv3_bytes\t"
                "v3_mode\tv4_bytes\tv4_mode"
                "  (1080p, n=%d; v1 worst case 5n; v3/v4 cap n+1)\n" % N)
        for r in rows:
            f.write("%s\t%.4f\t%d\t%d\t%d\t%d\t%s\t%d\t%s\n" % r)
        f.write("# raw frame = %d B; v1 @100%% = %d B (5.00x frame); "
                "v3 @100%% = %d B (1.00x)\n"
                "# v4 adds mode 3 winmask ([pos][start][win][bits][vals]):"
                " ~1.13 B/changed byte on clustered scenes vs delta16's 3"
                " — wins whenever the changed span is locally dense"
                " (> ~12.5%% of its bounding window)\n"
                % (N, 4 + 5 * N, 1 + N))
    print(f"wrote {out_path}")
    for r in rows:
        print("%-9s %.4f pos=%8d v1=%9d v2=%9d v3=%9d %-7s v4=%9d %s" % r)


if __name__ == "__main__":
    run()
