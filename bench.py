"""Headline benchmark: 1080p frames/sec/chip for diff-encode + compact.

Matches BASELINE.json's metric ("1080p frames/sec/chip (diff-encode+
compact); ms/frame per filter kernel"). The steady-state loop runs
entirely on device — frames are generated in HBM by a procedural source
(SURVEY.md §6: the rebuild must fix the reference's capture bottleneck
with a synthetic source at benchmark time) and T pipeline steps are
chained in one ``lax.scan``, so the measurement is chip throughput, not
host-tunnel bandwidth. A payload byte-exactness check against the CPU
oracle gates the number.

Prints ONE json line to stdout:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/26}
(26 fps = the reference's best end-to-end rate on its own hardware,
REPORT/report.tex:914; its kernel-only ceiling ~292 fps = 3.42 ms
kernel2.)

``--full`` additionally prints the per-filter-kernel ms table (stderr).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_FPS = 26.0


def _bench_config(cfg, atlas_text, frames, iters, skip_check, label="",
                  noise_bank=8):
    """fps of the fused step under ``cfg``, scan-chained on device, gated
    by a byte-exactness check of one step against the CPU oracle.

    ``noise_bank=8`` (default): the synthetic source cycles pre-generated
    noise planes instead of hashing 6.2M bytes per frame — the hash cost
    ~0.16 ms/frame of VPU work that belongs to the source, not the
    pipeline under measurement (same per-byte noise distribution either
    way; ``--noise-bank 0`` restores the per-frame hash)."""
    import jax
    import jax.numpy as jnp

    from cudavideostream_tpu.models import DeltaStreamPipeline
    from cudavideostream_tpu.ops import reference_cpu as ref
    from cudavideostream_tpu.runtime.sources import device_synthetic_frames
    from cudavideostream_tpu.utils import fonts

    pipe = DeltaStreamPipeline(cfg)
    init_frame, next_frame = device_synthetic_frames(
        cfg, seed=0, noise_bank=noise_bank
    )

    ids = jnp.asarray(fonts.encode_text(atlas_text, 28), jnp.int32)
    n_chars = jnp.int32(len(atlas_text))
    T = frames
    tiled = cfg.tiled_payload
    maskonly = cfg.maskonly_payload
    has_aux = cfg.visualizer.value != 0

    def scan_step(carry, t):
        prev, key = carry
        key, sub = jax.random.split(key)
        frame = next_frame(sub, t)
        out = pipe._step_impl(prev, frame, ids, n_chars)
        prev = out[0]
        if maskonly:
            # bitmask-only payload: (pos, counts, vals_t, bits) — no
            # int32 index blocks exist (config.maskonly_payload)
            pos, _counts, vals, xs = out[1:5]   # xs := bits for digest
        elif tiled:
            pos, counts, xs, vals = out[1:5]
        else:
            pos, xs, vals = out[1:4]
        # digest forces full payload materialization (int32 wrap is fine)
        digest = jnp.sum(xs) + jnp.sum(vals.astype(jnp.int32))
        if has_aux:
            digest = digest + jnp.sum(out[-1].astype(jnp.int32))
        return (prev, key), (pos, digest)

    @jax.jit
    def run_scan(prev, key):
        return jax.lax.scan(scan_step, (prev, key), jnp.arange(T))

    prev0 = jnp.asarray(np.asarray(init_frame))
    key0 = jax.random.PRNGKey(7)

    t0 = time.perf_counter()
    (prev, key), (pos_hist, digests) = run_scan(prev0, key0)
    _ = jax.device_get(pos_hist)
    compile_s = time.perf_counter() - t0
    print(
        f"[{label}] compile+first scan: {compile_s:.1f}s  "
        f"pos={np.asarray(pos_hist)[:4]}...",
        file=sys.stderr,
    )

    # byte-exactness gate: one step's payload vs the CPU oracle
    if not skip_check:
        key, sub = jax.random.split(key0)
        frame1 = next_frame(sub, jnp.int32(0))
        out = pipe._step_impl(
            jnp.asarray(np.asarray(init_frame)).copy(), frame1, ids, n_chars
        )
        new_prev = out[0]
        if maskonly:
            pos_d, counts, vals_t, bits = out[1:5]
            counts = np.asarray(counts)
            vals = np.concatenate(
                [np.asarray(vals_t)[t, : counts[t]] for t in range(len(counts))]
            )
            # indices rebuild exactly from the packed change-bits
            # (LSB-first unpack order IS ascending byte order)
            xs = np.flatnonzero(
                np.unpackbits(np.asarray(bits), bitorder="little")
            ).astype(np.int32)
            pos = int(pos_d)
            assert xs.size == pos, (xs.size, pos)
        elif tiled:
            pos, counts, xs_t, vals_t = out[1:5]
            counts = np.asarray(counts)
            xs = np.concatenate(
                [np.asarray(xs_t)[t, : counts[t]] for t in range(len(counts))]
            )
            vals = np.concatenate(
                [np.asarray(vals_t)[t, : counts[t]] for t in range(len(counts))]
            )
        else:
            pos, xs, vals = out[1:4]
            xs, vals = np.asarray(xs), np.asarray(vals)
        pos = int(pos)
        f_h = np.asarray(frame1)
        p_h = np.asarray(init_frame)
        exp_prev, exp_pos, exp_xs, exp_vals, exp_aux = ref.step_oracle(
            p_h, f_h, cfg, atlas=pipe.atlas_np,
            char_ids=fonts.encode_text(atlas_text),
        )
        assert pos == exp_pos, (pos, exp_pos)
        np.testing.assert_array_equal(xs[:pos], exp_xs)
        np.testing.assert_array_equal(vals[:pos], exp_vals)
        np.testing.assert_array_equal(np.asarray(new_prev), exp_prev)
        if has_aux and exp_aux is not None:
            np.testing.assert_array_equal(np.asarray(out[-1]), exp_aux)
        print(f"[{label}] byte-exact vs oracle: OK (pos={pos})", file=sys.stderr)

    # timed region: per-scan timings, median reported — the shared chip
    # suffers transient multi-x contention from other tenants, and the
    # median of T-frame scans is robust to spikes while still honest
    # about sustained load (all samples go to stderr)
    from cudavideostream_tpu.utils.timing import measure_rtt

    out = run_scan(prev0, key0)
    _ = jax.device_get(out[1][0].ravel()[0])
    rtt = measure_rtt(out[1][0])

    raw = []
    for _ in range(iters):
        t0 = time.perf_counter()
        (prev0, key0), out = run_scan(prev0, key0)
        _ = jax.device_get(out[0].ravel()[0])
        raw.append(time.perf_counter() - t0)
    # RTT is a floor cost, so a contended-window estimate taken before
    # the loop can EXCEED a quiet scan's wall time and flip samples
    # negative; re-measure after the loop, keep the smaller estimate,
    # and discard any still-non-positive sample (those are the fastest
    # scans — dropping them only biases the median down, never up)
    rtt = min(rtt, measure_rtt(out[0]))
    times = [t - rtt for t in raw if t - rtt > 0] or raw
    fps_samples = sorted(T / t for t in times)
    print(f"[{label}] per-scan fps samples (rtt={rtt*1e3:.1f} ms): "
          + " ".join(f"{f:.0f}" for f in fps_samples), file=sys.stderr)
    return fps_samples[len(fps_samples) // 2]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=48, help="scan length")
    p.add_argument("--iters", type=int, default=9, help="scan invocations")
    p.add_argument("--full", action="store_true", help="per-kernel table")
    p.add_argument("--skip-check", action="store_true")
    p.add_argument("--emit", default="tiled", choices=["tiled", "flat"],
                   help="payload layout for the headline (tiled = the "
                        "product wire path via wire_send_segments; flat = "
                        "the library API with the device merge epilogue)")
    p.add_argument("--subtile", type=int, default=None,
                   help="override config.subtile_rows for the headline "
                        "(A/B the sub-tiled compaction granularity)")
    p.add_argument("--noise-bank", type=int, default=8,
                   help="pre-generated noise planes for the synthetic "
                        "source (0 = hash 6.2M bytes per frame — charges "
                        "~0.16 ms of source cost to every step)")
    p.add_argument("--all-variants", action="store_true",
                   help="additionally bench every named pipeline variant; "
                        "writes benchmarks/variants_tpu_v5e.json")
    p.add_argument("--one-variant", default=None, help=argparse.SUPPRESS)
    args = p.parse_args(argv)
    from cudavideostream_tpu.utils.xla_cache import \
        maybe_enable_compilation_cache

    maybe_enable_compilation_cache()

    if args.one_variant:
        return _one_variant(args)

    import dataclasses

    import jax

    from cudavideostream_tpu.config import StreamConfig

    on_tpu = jax.default_backend() not in ("cpu",)
    base_cfg = StreamConfig() if on_tpu else StreamConfig(height=48, width=64)
    cfg = dataclasses.replace(base_cfg, tiled_payload=(args.emit == "tiled"))
    if args.subtile is not None:
        cfg = dataclasses.replace(cfg, subtile_rows=args.subtile)
    print(
        f"bench: {cfg.height}x{cfg.width} on {jax.devices()[0].platform} "
        f"(emit={args.emit})",
        file=sys.stderr,
    )
    text = "FPS: 240 BW: 14000 kbps"
    fps = _bench_config(cfg, text, args.frames, args.iters, args.skip_check,
                        label="headline", noise_bank=args.noise_bank)

    if args.full:
        _kernel_table(cfg, file=sys.stderr)

    variants_failed = False
    if args.all_variants:
        # one variant per SUBPROCESS: measuring several 1080p pipelines
        # in one process inflates later rows up to 2x (measured while
        # re-recording benchmarks/mesh_vs_solo — executable/buffer state
        # from earlier pipelines degrades later ones on the chip)
        import os
        import subprocess

        from cudavideostream_tpu.models import variants as variants_mod

        results = {}
        failed = []
        for name in variants_mod.available():
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--one-variant", name, "--emit", args.emit,
                   "--frames", str(args.frames), "--iters", str(args.iters),
                   "--noise-bank", str(args.noise_bank)]
            if args.skip_check:
                cmd.append("--skip-check")
            proc = subprocess.run(cmd, capture_output=True, text=True)
            # the child keeps the one-JSON-line-on-stdout invariant: its
            # single stdout line is {"metric": "variant_fps:<name>", ...}
            vfps = None
            for line in proc.stdout.splitlines():
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("metric") == f"variant_fps:{name}":
                    vfps = float(rec["value"])
            if proc.returncode != 0 or vfps is None:
                # a child whose byte-exact oracle gate raised MUST fail
                # the whole run: this is the on-chip byte-exactness
                # regression net (CLAUDE.md), not an advisory sweep
                failed.append(name)
                print(f"[{name}] FAILED (rc={proc.returncode}):\n"
                      f"{proc.stdout}\n{proc.stderr}", file=sys.stderr)
                continue
            results[name] = round(vfps, 2)
            print(f"[{name}] {vfps:9.2f} fps  ({vfps/BASELINE_FPS:.1f}x baseline)",
                  file=sys.stderr)

        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "benchmarks", "variants_tpu_v5e.json",
        )
        if failed:
            # refuse to write a json that silently omits failed variants
            print(f"NOT writing {out_path}: failed variants {failed}",
                  file=sys.stderr)
        else:
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)
            print(f"wrote {out_path}", file=sys.stderr)
        variants_failed = bool(failed)

    print(
        json.dumps(
            {
                "metric": "1080p_fps_per_chip_diff_encode_compact",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )
    return 1 if variants_failed else 0


def _one_variant(args) -> int:
    """Bench ONE named variant in this (fresh) process. Keeps the
    repo-wide invariant that bench.py prints exactly ONE json line on
    stdout: the marker the --all-variants parent parses IS that line
    (``{"metric": "variant_fps:<name>", ...}``)."""
    import dataclasses

    import jax

    from cudavideostream_tpu.models import variants as variants_mod

    on_tpu = jax.default_backend() not in ("cpu",)
    vcfg = variants_mod.get_config(args.one_variant)
    if not vcfg.maskonly_payload:
        # maskonly REQUIRES the tiled layout; every other variant A/Bs
        # under the requested emit
        vcfg = dataclasses.replace(
            vcfg, tiled_payload=(args.emit == "tiled"))
    if not on_tpu:
        vcfg = dataclasses.replace(vcfg, height=48, width=64)
    text = "FPS: 240 BW: 14000 kbps"
    vfps = _bench_config(
        vcfg, text, args.frames, args.iters, args.skip_check,
        label=args.one_variant, noise_bank=args.noise_bank,
    )
    print(
        json.dumps(
            {
                "metric": f"variant_fps:{args.one_variant}",
                "value": round(vfps, 2),
                "unit": "fps",
                "vs_baseline": round(vfps / BASELINE_FPS, 2),
            }
        )
    )
    return 0


def _kernel_table(cfg, file=sys.stderr) -> None:
    """Per-kernel ms table (scan-chained; see benchmarks/kernels.py)."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks import kernels

    kernels.run()


if __name__ == "__main__":
    sys.exit(main())
