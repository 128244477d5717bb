"""Probe h2d transfer rate by dtype and shape (tunnel diagnostics).

The AAC scan's pooled int8 payload measured 40-94 MB/s steady while the
MP3 int32 manifest moves at 370-1,200 MB/s in the same process — this
probe isolates whether the gap is dtype, shape, or content.
"""

import sys
import time

import numpy as np

import jax


def put(label, a, reps=3):
    rates = []
    for _ in range(reps):
        t0 = time.monotonic()
        d = jax.device_put(a)
        d.block_until_ready()
        dt = time.monotonic() - t0
        rates.append(a.nbytes / 1e6 / dt)
        del d
    print(f"{label:44s} {a.nbytes / 1e6:7.0f} MB  "
          + "  ".join(f"{r:7.0f}" for r in rates) + "  MB/s",
          flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)
    rng = np.random.default_rng(3)
    nbytes = 200 * 1024 * 1024

    i32 = rng.integers(-2**31, 2**31 - 1, nbytes // 4, dtype=np.int32)
    put("int32 flat random", i32)
    put("int32 (g,8,2048) random", i32.reshape(-1, 8, 2048))
    i8 = rng.integers(-128, 128, nbytes, dtype=np.int8)
    put("int8 flat random", i8)
    put("int8 (B,F,1024) random", i8.reshape(32, -1, 1024))
    sparse = np.zeros(nbytes, np.int8)
    idx = rng.integers(0, nbytes, nbytes // 8)
    sparse[idx] = rng.integers(-128, 128, len(idx), dtype=np.int8)
    put("int8 mostly-zero", sparse)
    i16 = rng.integers(-2**15, 2**15 - 1, nbytes // 2, dtype=np.int16)
    put("int16 flat random", i16)
    u16 = i16.view(np.uint16)
    put("uint16 flat random", u16)
    f16 = (rng.standard_normal(nbytes // 2)).astype(np.float16)
    put("float16 flat random", f16)
    f32 = rng.standard_normal(nbytes // 4).astype(np.float32)
    put("float32 flat random", f32)


if __name__ == "__main__":
    main()
