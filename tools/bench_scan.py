"""Library-scan benchmark: the real `-R -a` shape, not the kernel shape.

Generates a mixed corpus (multiple sample rates, mono/stereo, varied
lengths, a few corrupt files), then measures:
  1. cold scan: host unpack + bucketing + per-bucket compile + device
     batches + manifest write;
  2. steady scan: same corpus again with compiles cached (new manifest);
  3. resume: re-scan with the manifest — everything must come from cache.

Usage: python tools/bench_scan.py [--tracks 120] [--out /tmp/scan_corpus]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_corpus(root: str, n_tracks: int, seed: int = 11):
    from mp3rgain_tpu.testing import fixtures

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    shapes = [
        (44100, fixtures.MODE_JOINT, 2, 192),
        (44100, fixtures.MODE_STEREO, 2, 128),
        (48000, fixtures.MODE_JOINT, 2, 160),
        (32000, fixtures.MODE_JOINT, 2, 96),
        (22050, fixtures.MODE_JOINT, 2, 64),
        (24000, fixtures.MODE_MONO, 1, 48),
        (16000, fixtures.MODE_MONO, 1, 32),
        (11025, fixtures.MODE_MONO, 1, 24),
        (8000, fixtures.MODE_MONO, 1, 16),
    ]
    paths = []
    audio_total = 0.0
    for i in range(n_tracks):
        sr, mode, ch, kbps = shapes[i % len(shapes)]
        seconds = float(rng.uniform(15, 90))
        t = np.arange(int(sr * seconds)) / sr
        f0 = float(rng.uniform(120, 2000))
        wave = 0.35 * np.sin(2 * np.pi * f0 * t)
        wave += 0.1 * rng.standard_normal(len(t))
        pcm = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        if ch == 2:
            pcm = np.stack([pcm, np.roll(pcm, 7)], axis=1)
        p = os.path.join(root, f"track_{i:04d}_{sr}_{ch}ch.mp3")
        # Temp-write + rename so a killed run can't leave a truncated
        # file that a later run would skip (reuse checks size, not just
        # existence).
        if not os.path.exists(p) or os.path.getsize(p) == 0:
            tmp = p + ".tmp"
            with open(tmp, "wb") as f:
                f.write(fixtures.encode_mp3(pcm, sr, bitrate=kbps, mode=mode))
            os.replace(tmp, p)
        paths.append(p)
        audio_total += seconds
    # Corrupt files: must be isolated, not poison the scan.
    for j in range(3):
        p = os.path.join(root, f"corrupt_{j}.mp3")
        with open(p, "wb") as f:
            f.write(os.urandom(2048 + 512 * j))
        paths.append(p)
    return paths, audio_total


def run_scan(paths, manifest):
    from mp3rgain_tpu import scan

    t0 = time.monotonic()
    result = scan.scan_files(paths, manifest_path=manifest)
    wall = time.monotonic() - t0
    n_ok = sum(
        1 for v in result.results.values() if not isinstance(v, Exception)
    )
    n_err = len(result.results) - n_ok
    return result, wall, n_ok, n_err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=120)
    ap.add_argument("--out", default="/tmp/scan_corpus")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    t0 = time.monotonic()
    paths, audio_total = build_corpus(args.out, args.tracks)
    print(f"corpus: {args.tracks} tracks + 3 corrupt, "
          f"{audio_total / 60:.1f} min audio, built in "
          f"{time.monotonic() - t0:.1f}s", file=sys.stderr)

    manifest = os.path.join(args.out, "manifest.json")
    for f in (manifest,):
        if os.path.exists(f):
            os.remove(f)

    _, cold, ok, err = run_scan(paths, manifest)
    print(f"cold scan (compiles): {cold:.1f}s  "
          f"{audio_total / cold:.0f}x rt  ok={ok} err={err}",
          file=sys.stderr)
    assert err == 3, f"expected 3 isolated failures, got {err}"

    # Steady state as the MEDIAN of 3 passes (pass-to-pass variance on
    # tunneled runtimes is real; best-of-N overstates).
    steadies = []
    for k in range(3):
        os.remove(manifest)
        res2, steady, ok, err = run_scan(paths, manifest)
        steadies.append(steady)
        print(f"steady scan pass {k + 1}: {steady:.1f}s  "
              f"{audio_total / steady:.0f}x rt  "
              f"{res2.audio_hours_per_sec:.3f} audio-hours/sec",
              file=sys.stderr)
    steady = sorted(steadies)[1]

    res3, resume, ok, err = run_scan(paths, manifest)
    print(f"resume from manifest: {resume:.2f}s  resumed={res3.resumed}",
          file=sys.stderr)
    assert res3.resumed == args.tracks

    print(json.dumps({
        "metric": "library_scan_throughput",
        "tracks": args.tracks,
        "audio_seconds": round(audio_total, 1),
        "cold_s": round(cold, 2),
        "cold_over_steady": round(cold / steady, 2),
        "steady_s": round(steady, 2),
        "steady_passes_s": [round(s, 2) for s in steadies],
        "steady_x_realtime": round(audio_total / steady, 1),
        "resume_s": round(resume, 3),
    }))

    if not args.keep:
        shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
