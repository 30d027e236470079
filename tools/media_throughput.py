"""Measure media decode throughput — the cost model behind the SCALE.md
media entries.

Two layers:

1. single-core codec rates (MB/s of container bytes, Mpx/s or Msample/s
   of decoded output) for every container the engine decodes: PNG,
   baseline + progressive JPEG, GIF (single frame + animation), WAV
   (PCM/float/ADPCM), Y4M (mono + C420);
2. end-to-end Spark `extract_image_features` over >= 100k MIXED
   PNG/JPEG/GIF payloads on local[N] mapInPandas — the actual
   production path (Arrow batches, per-worker decode).

Usage: python tools/media_throughput.py [n_payloads] (default 100_000;
set SPARK_GRAFT_CPUS to change parallelism).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd  # module scope: pandas_udf string annotations resolve here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rate(fn, payload, reps=5):
    fn(payload)  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn(payload)
    return (time.perf_counter() - t0) / reps


def single_core() -> dict:
    from traildb_spark.operators import gif as G
    from traildb_spark.operators import multimodal as M
    from traildb_spark.operators.jpeg import decode_jpeg_luma, encode_jpeg, make_jpeg

    rng = np.random.default_rng(7)
    img = np.clip(rng.normal(128, 40, (256, 256)), 0, 255).astype(np.uint8)
    px = img.size
    out = {}

    png = M.make_png(img)
    dt = _rate(M._gray_pixels, png)
    out["png_256"] = {"bytes": len(png), "ms": dt * 1e3,
                      "MBps": len(png) / dt / 1e6, "Mpxps": px / dt / 1e6}

    jb = make_jpeg(img, quality=85)
    dt = _rate(decode_jpeg_luma, jb)
    out["jpeg_seq_256"] = {"bytes": len(jb), "ms": dt * 1e3,
                           "MBps": len(jb) / dt / 1e6, "Mpxps": px / dt / 1e6}

    jp = encode_jpeg(img, quality=85, progressive=True)
    dt = _rate(decode_jpeg_luma, jp)
    out["jpeg_prog_256"] = {"bytes": len(jp), "ms": dt * 1e3,
                            "MBps": len(jp) / dt / 1e6, "Mpxps": px / dt / 1e6}

    pal = np.stack([np.arange(16) * 17] * 3, 1).astype(np.uint8)
    gidx = (np.add.outer(np.arange(256) // 9, np.arange(256) // 5) % 16).astype(np.uint8)
    gb = G.make_gif(gidx, pal)
    dt = _rate(M._gray_pixels, gb)
    out["gif_256"] = {"bytes": len(gb), "ms": dt * 1e3,
                      "MBps": len(gb) / dt / 1e6, "Mpxps": px / dt / 1e6}

    frames = np.stack([np.roll(gidx, i, axis=1) for i in range(8)])
    ab = G.make_animated_gif(frames, pal)
    dt = _rate(G.decode_gif_frames, ab)
    out["gif_anim_8x256"] = {"bytes": len(ab), "ms": dt * 1e3,
                             "MBps": len(ab) / dt / 1e6,
                             "Mpxps": frames.size / dt / 1e6}

    n = 16000 * 4
    sig = (np.sin(np.arange(n) * 0.05) * 12000).astype(np.int16)
    wav = M.make_wav(sig, rate=16000)
    dt = _rate(M.decode_wav, wav)
    out["wav_pcm16_4s"] = {"bytes": len(wav), "ms": dt * 1e3,
                           "MBps": len(wav) / dt / 1e6,
                           "Msampps": n / dt / 1e6}

    adpcm = M.make_adpcm_wav(sig, rate=16000)
    dt = _rate(M.decode_wav, adpcm)
    out["wav_adpcm_4s"] = {"bytes": len(adpcm), "ms": dt * 1e3,
                           "MBps": len(adpcm) / dt / 1e6,
                           "Msampps": n / dt / 1e6}

    yf = rng.integers(0, 256, (16, 128, 128), dtype=np.uint8)
    y4 = M.make_y4m(yf)
    dt = _rate(M.decode_y4m, y4)
    out["y4m_mono_16x128"] = {"bytes": len(y4), "ms": dt * 1e3,
                              "MBps": len(y4) / dt / 1e6,
                              "Mpxps": yf.size / dt / 1e6}

    cb = rng.integers(0, 256, (16, 64, 64), dtype=np.uint8)
    cr = rng.integers(0, 256, (16, 64, 64), dtype=np.uint8)
    y420 = M.make_y4m(yf, colorspace="C420", cb=cb, cr=cr)
    dt = _rate(lambda b: M.decode_y4m(b, planes=True), y420)
    out["y4m_c420_16x128"] = {"bytes": len(y420), "ms": dt * 1e3,
                              "MBps": len(y420) / dt / 1e6,
                              "Mpxps": (yf.size + cb.size + cr.size) / dt / 1e6}
    return out


def spark_end_to_end(n_payloads: int) -> dict:
    from pyspark.sql import functions as F

    from traildb_spark.operators import multimodal as M
    from traildb_spark.session import get_spark

    spark = get_spark()

    @F.pandas_udf("binary")
    def payload(ids: pd.Series) -> pd.Series:
        from traildb_spark.operators import gif as G
        from traildb_spark.operators import multimodal as MM
        from traildb_spark.operators.jpeg import make_jpeg

        out = []
        rng = np.random.default_rng(0)
        base = np.clip(rng.normal(128, 40, (64, 64)), 0, 255).astype(np.uint8)
        pal = np.stack([np.arange(16) * 17] * 3, 1).astype(np.uint8)
        gidx = (base % 16).astype(np.uint8)
        # three representative containers, rotated per id; the per-id
        # shift keeps payloads distinct without re-encoding each one
        pre = [MM.make_png(base), make_jpeg(base, 85), G.make_gif(gidx, pal)]
        for i in ids:
            out.append(pre[int(i) % 3])
        return pd.Series(out)

    df = (
        spark.range(n_payloads)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .select(
            F.col("id").alias("media_id"),
            F.lit("image").alias("kind"),
            payload(F.col("id")).alias("content"),
            F.lit("x/image").alias("mime"),
            F.lit(None).cast("string").alias("meta"),
        )
    )
    df = df.persist()
    total_bytes = df.agg(F.sum(F.length("content"))).collect()[0][0]
    feats = M.extract_image_features(df)
    t0 = time.perf_counter()
    n = feats.agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor("phash").alias("x")
    ).collect()[0]["n"]
    dt = time.perf_counter() - t0
    df.unpersist()
    spark.stop()
    return {
        "payloads": int(n),
        "total_MB": total_bytes / 1e6,
        "wall_s": dt,
        "payloads_per_s": n / dt,
        "MBps": total_bytes / dt / 1e6,
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    res = {"single_core": single_core()}
    print(json.dumps(res["single_core"], indent=1))
    res["spark_mixed_images"] = spark_end_to_end(n)
    print(json.dumps(res["spark_mixed_images"], indent=1))
