"""Volume evidence for the compressed-codec structural probes
(multimodal_{mp3,aac,h264,mp4}_probe — map-only Arrow kernels).

The probes shuffle nothing, so the 100 TB argument is per-record cost
+ wall linearity, measured the NOTES #22 way (Arrow-kernel walls are
the co-tenant noise magnet):

1. **In-process micro-bench** (no Spark, no JVM): encode+probe
   µs/record at three batch sizes per codec — flat µs/record across
   sizes rules out any superlinear term in the kernel itself.
2. **Spark two-size run**: the full mapInPandas path (fixture encode →
   probe → noop sink) at N and 4N rows on local[32], min-of-3 in one
   JVM with cache-clear between runs; map-only plans should scale
   wall ≈ linearly in rows (ratio ≈ 4 ± noise).

Usage: python tools/bench_probes.py [--rows 1000000] [--runs 3]
Prints one JSON line; prose lands in BENCH/MULTIMODAL.md.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBES = {
    "mp3": ("fixture_mp3_stream", "fluent_bit_spark.functions.mpeg_audio",
            "probe_mp3"),
    "aac": ("fixture_aac_stream", "fluent_bit_spark.functions.adts",
            "probe_adts"),
    "h264": ("fixture_h264_stream", "fluent_bit_spark.functions.h264",
             "probe_h264"),
    "mp4": ("fixture_mp4_stream", "fluent_bit_spark.functions.mp4",
            "probe_mp4"),
    # warc: fixture + walk live in sources/warc.py (1:N record explode,
    # ~3.5 records/capture, every 3rd capture gzip-membered)
    "warc": ("fixture_warc_capture", "fluent_bit_spark.sources.warc",
             "parse_warc"),
}


def micro() -> dict:
    """Per-record encode+probe µs at three sizes, gc disabled."""
    import importlib
    from fluent_bit_spark.operators import multimodal as mm
    out = {}
    for name, (fix_name, mod_name, probe_name) in PROBES.items():
        mod = importlib.import_module(mod_name)
        fix = getattr(mm, fix_name, None) or getattr(mod, fix_name)
        probe = getattr(mod, probe_name)
        sizes = {}
        payload_bytes = 0
        for n in (2_000, 10_000, 40_000):
            blobs = [fix(i) for i in range(n)]
            payload_bytes = sum(len(b) for b in blobs) // n
            gc.disable()
            t0 = time.perf_counter()
            for b in blobs:
                probe(b)
            dt = time.perf_counter() - t0
            gc.enable()
            sizes[n] = round(dt / n * 1e6, 2)
        out[name] = {"probe_us_per_record": sizes,
                     "avg_payload_bytes": payload_bytes}
    return out


def spark_runs(rows: int, runs: int, codec: str | None = None) -> dict:
    from fluent_bit_spark.session import get_spark
    from fluent_bit_spark.operators import multimodal as mm
    spark = get_spark(app_name="probe_bench", master="local[32]")
    from fluent_bit_spark.sources import warc as wa
    encoders = {"mp3": mm.encode_fixture_mp3s, "aac": mm.encode_fixture_aacs,
                "h264": mm.encode_fixture_h264s,
                "mp4": mm.encode_fixture_mp4s,
                "warc": wa.encode_fixture_warcs}
    probers = {"mp3": mm.probe_audio_frames, "aac": mm.probe_adts_frames,
               "h264": mm.probe_video_structure,
               "mp4": mm.probe_mp4_structure,
               "warc": wa.decode_warc}
    out = {}
    # Interleave sizes within each codec (NOTES #19/#22): the ratio is
    # min-of-runs at each size from the same window.
    for name in (PROBES if codec is None else [codec]):
        per_size = {}
        for n in (rows, 4 * rows):
            walls = []
            for _ in range(runs):
                spark.catalog.clearCache()
                spark._jvm.System.gc()
                df = (spark.range(n, numPartitions=128)
                      .withColumnRenamed("id", "doc_id"))
                t0 = time.perf_counter()
                (probers[name](encoders[name](df)).drop("payload")
                 .write.format("noop").mode("overwrite").save())
                walls.append(round(time.perf_counter() - t0, 3))
            per_size[n] = {"walls": walls, "best": min(walls)}
        ratio = per_size[4 * rows]["best"] / per_size[rows]["best"]
        out[name] = {**{str(k): v for k, v in per_size.items()},
                     "wall_ratio_4x_rows": round(ratio, 2),
                     "mrec_per_sec_4x": round(
                         4 * rows / per_size[4 * rows]["best"] / 1e6, 2)}
    spark.stop()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--micro-only", action="store_true")
    ap.add_argument("--codec", choices=sorted(PROBES), default=None,
                    help="limit the Spark two-size run to one codec")
    args = ap.parse_args()
    result = {"micro": micro()}
    if not args.micro_only:
        result["spark"] = spark_runs(args.rows, args.runs, args.codec)
        result["rows"] = args.rows
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
