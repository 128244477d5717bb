"""M4A library-scan benchmark (BASELINE config 4 acceptance shape).

Builds an M4A corpus, then measures cold (compiles) and steady
scan_files passes. The AAC pipeline is host-front-end + h2d bound on a
1-core host, so this is primarily a host/transfer benchmark; the device
share is ~1% (tools note: aac device pipeline ~8,500x).

Usage: python tools/bench_scan_aac.py [--tracks 48] [--seconds 60]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_corpus(root: str, n_tracks: int, seconds: float, seed: int = 5):
    from mp3rgain_tpu.testing import fixtures

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    audio_total = 0.0
    for i in range(n_tracks):
        sr = 44100 if i % 3 else 48000
        secs = float(rng.uniform(0.7, 1.3)) * seconds
        t = np.arange(int(sr * secs)) / sr
        f0 = float(rng.uniform(150, 1500))
        wave = 0.35 * np.sin(2 * np.pi * f0 * t)
        wave += 0.1 * rng.standard_normal(len(t))
        pcm = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        pcm = np.stack([pcm, np.roll(pcm, 5)], axis=1)
        p = os.path.join(root, f"track_{i:04d}_{sr}.m4a")
        if not os.path.exists(p) or os.path.getsize(p) == 0:
            tmp = p + ".tmp"
            data = fixtures.encode_m4a(
                pcm.astype(np.float32) / 32768.0, sr, bitrate=192000
            )
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, p)
        paths.append(p)
        audio_total += secs
    return paths, audio_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--out", default="/tmp/scan_aac_corpus")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import jax

    from mp3rgain_tpu import scan

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)
    t0 = time.monotonic()
    paths, audio_total = build_corpus(args.out, args.tracks, args.seconds)
    print(f"corpus: {args.tracks} m4a tracks, {audio_total / 60:.1f} min "
          f"audio, built in {time.monotonic() - t0:.1f}s", file=sys.stderr)

    results = {}
    for label in ("cold", "steady1", "steady2"):
        mf = os.path.join(args.out, f"manifest_{label}.json")
        if os.path.exists(mf):
            os.remove(mf)
        t0 = time.monotonic()
        res = scan.scan_files(paths, manifest_path=mf)
        wall = time.monotonic() - t0
        nerr = sum(
            1 for v in res.results.values() if isinstance(v, Exception)
        )
        assert nerr == 0, f"{nerr} failures"
        results[label] = wall
        print(f"{label}: {wall:.1f}s  {audio_total / wall:.0f}x rt",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "m4a_scan_throughput",
        "tracks": args.tracks,
        "audio_seconds": round(audio_total, 1),
        "cold_s": round(results["cold"], 2),
        "steady_s": round(min(results["steady1"], results["steady2"]), 2),
        "steady_x_realtime": round(
            audio_total / min(results["steady1"], results["steady2"]), 1
        ),
    }))

    if not args.keep:
        import shutil

        shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
